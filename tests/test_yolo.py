"""Detector model tests: shapes, decode, conv parity vs torch, batched path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_embeddings_tpu.config import DetectorConfig
from multimodal_embeddings_tpu.models.yolo import (
    SCALES,
    DocLayoutYOLO,
    REG_MAX,
    STRIDES,
)
from multimodal_embeddings_tpu.models.yolo_decode import (
    Detections,
    decode_predictions,
    dfl_expectation,
    scale_boxes_to_original,
)
from multimodal_embeddings_tpu.models.layers import ConvBnAct
from multimodal_embeddings_tpu.models.weights import (
    deterministic_init,
    flatten_params,
    load_checkpoint,
    save_checkpoint,
)


SIZE = 256  # small static input for CPU tests


@pytest.fixture(scope="module")
def tiny_model():
    model = DocLayoutYOLO(num_classes=10, variant="n")
    x = jnp.zeros((1, SIZE, SIZE, 3))
    variables = deterministic_init(model, x, seed=0)
    return model, variables


class TestModel:
    def test_output_shapes(self, tiny_model):
        model, variables = tiny_model
        x = jnp.zeros((2, SIZE, SIZE, 3))
        outputs = model.apply(variables, x, train=False)
        assert len(outputs) == 3
        for (reg, cls), stride in zip(outputs, STRIDES):
            assert reg.shape == (2, SIZE // stride, SIZE // stride, 4 * REG_MAX)
            assert cls.shape == (2, SIZE // stride, SIZE // stride, 10)

    def test_deterministic_init(self):
        model = DocLayoutYOLO(num_classes=10, variant="n")
        x = jnp.zeros((1, SIZE, SIZE, 3))
        v1 = deterministic_init(model, x, seed=0)
        v2 = deterministic_init(model, x, seed=0)
        f1, f2 = flatten_params(v1), flatten_params(v2)
        assert set(f1) == set(f2)
        for k in f1:
            np.testing.assert_array_equal(f1[k], f2[k])

    def test_param_count_scales(self):
        counts = {}
        for variant in ("n", "m"):
            model = DocLayoutYOLO(num_classes=10, variant=variant)
            v = deterministic_init(model, jnp.zeros((1, 64, 64, 3)), seed=0)
            counts[variant] = sum(p.size for p in jax.tree.leaves(v["params"]))
        # v10n ~2.3M, v10m ~15M (±40% tolerance for head/config variation)
        assert 1.3e6 < counts["n"] < 3.5e6, counts
        assert 9e6 < counts["m"] < 25e6, counts

    def test_checkpoint_roundtrip(self, tiny_model, tmp_path):
        model, variables = tiny_model
        path = str(tmp_path / "det.npz")
        save_checkpoint(variables, path)
        loaded = load_checkpoint(path, variables)
        x = jnp.ones((1, SIZE, SIZE, 3)) * 0.5
        out_a = model.apply(variables, x, train=False)
        out_b = model.apply(loaded, x, train=False)
        np.testing.assert_array_equal(
            np.asarray(out_a[0][0]), np.asarray(out_b[0][0])
        )


class TestConvParity:
    def test_conv_bn_silu_matches_torch(self):
        """Numerical parity of the fundamental cell against torch CPU."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
        module = ConvBnAct(out_channels=12, kernel_size=3, strides=1)
        variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(module.apply(variables, jnp.asarray(x), train=False))

        kernel = np.asarray(variables["params"]["conv"]["kernel"])  # HWIO
        bn = variables["params"]["bn"]
        stats = variables["batch_stats"]["bn"]

        tconv = torch.nn.Conv2d(8, 12, 3, padding=1, bias=False)
        tconv.weight.data = torch.tensor(np.transpose(kernel, (3, 2, 0, 1)))
        tbn = torch.nn.BatchNorm2d(12, eps=1e-3)
        tbn.weight.data = torch.tensor(np.asarray(bn["scale"]))
        tbn.bias.data = torch.tensor(np.asarray(bn["bias"]))
        tbn.running_mean.data = torch.tensor(np.asarray(stats["mean"]))
        tbn.running_var.data = torch.tensor(np.asarray(stats["var"]))
        tbn.eval()
        with torch.no_grad():
            tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
            want = torch.nn.functional.silu(tbn(tconv(tx))).numpy()
        want = np.transpose(want, (0, 2, 3, 1))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestDecode:
    def test_dfl_expectation_bounds(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(3, 7, 4 * REG_MAX)).astype(np.float32))
        dist = np.asarray(dfl_expectation(logits))
        assert dist.shape == (3, 7, 4)
        assert (dist >= 0).all() and (dist <= REG_MAX - 1).all()

    def test_dfl_peaked_bin(self):
        logits = np.full((1, 1, 4 * REG_MAX), -20.0, np.float32)
        for side in range(4):
            logits[0, 0, side * REG_MAX + 5] = 20.0
        dist = np.asarray(dfl_expectation(jnp.asarray(logits)))
        np.testing.assert_allclose(dist, 5.0, atol=1e-4)

    def test_decode_known_box(self):
        """A single hot anchor at a known location decodes to the expected
        xyxy box and survives NMS."""
        shapes = [(8, 8), (4, 4), (2, 2)]
        levels = []
        for (h, w), stride in zip(shapes, STRIDES):
            reg = np.full((1, h, w, 4 * REG_MAX), -20.0, np.float32)
            cls = np.full((1, h, w, 10), -20.0, np.float32)
            levels.append([reg, cls])
        # anchor (2, 3) at stride 8 → center (28, 20); distances 2 bins each
        for side in range(4):
            levels[0][0][0, 2, 3, side * REG_MAX + 2] = 20.0
        levels[0][1][0, 2, 3, 4] = 8.0  # class 4, sigmoid ≈ 0.9997
        det = decode_predictions(
            [tuple(l) for l in levels], max_det=10, conf_threshold=0.1
        )
        valid = np.asarray(det.valid[0])
        assert valid.sum() == 1
        box = np.asarray(det.boxes[0])[valid][0]
        np.testing.assert_allclose(box, [28 - 16, 20 - 16, 28 + 16, 20 + 16], atol=1e-3)
        assert int(np.asarray(det.classes[0])[valid][0]) == 4
        assert np.asarray(det.scores[0])[valid][0] > 0.99

    def test_decode_output_score_sorted(self):
        rng = np.random.default_rng(1)
        levels = []
        for (h, w), stride in zip([(8, 8), (4, 4), (2, 2)], STRIDES):
            reg = rng.normal(size=(2, h, w, 4 * REG_MAX)).astype(np.float32)
            cls = rng.normal(size=(2, h, w, 10)).astype(np.float32)
            levels.append((jnp.asarray(reg), jnp.asarray(cls)))
        det = decode_predictions(levels, max_det=30, conf_threshold=0.0)
        scores = np.asarray(det.scores)
        for b in range(2):
            s = scores[b]
            assert (np.diff(s) <= 1e-6).all()  # descending

    def test_scale_boxes_roundtrip(self):
        boxes = np.array([[100.0, 50.0, 200.0, 150.0]])
        out = scale_boxes_to_original(boxes, scale=0.5, pad=(10, 20), original_hw=(400, 500))
        np.testing.assert_allclose(out, [[160.0, 80.0, 360.0, 280.0]])
        clipped = scale_boxes_to_original(
            np.array([[-30.0, -30.0, 1e5, 1e5]]), 1.0, (0, 0), (400, 500)
        )
        np.testing.assert_allclose(clipped, [[0.0, 0.0, 500.0, 400.0]])


class TestOrbaxCheckpoint:
    def test_roundtrip(self, tiny_model, tmp_path):
        from multimodal_embeddings_tpu.models.weights import (
            load_checkpoint_orbax,
            save_checkpoint_orbax,
        )

        model, variables = tiny_model
        path = str(tmp_path / "orbax_ckpt")
        save_checkpoint_orbax(variables, path)
        restored = load_checkpoint_orbax(path, variables)
        x = jnp.ones((1, SIZE, SIZE, 3)) * 0.25
        out_a = model.apply(variables, x, train=False)
        out_b = model.apply(restored, x, train=False)
        np.testing.assert_array_equal(
            np.asarray(out_a[0][0]), np.asarray(out_b[0][0])
        )


class TestSafetensors:
    def test_roundtrip(self, tiny_model, tmp_path):
        from multimodal_embeddings_tpu.models.weights import (
            load_checkpoint,
            save_checkpoint_safetensors,
        )

        model, variables = tiny_model
        path = str(tmp_path / "det.safetensors")
        save_checkpoint_safetensors(variables, path)
        loaded = load_checkpoint(path, variables)
        x = jnp.ones((1, SIZE, SIZE, 3)) * 0.75
        np.testing.assert_array_equal(
            np.asarray(model.apply(variables, x, train=False)[0][0]),
            np.asarray(model.apply(loaded, x, train=False)[0][0]),
        )


class TestS2DStem:
    def test_exact_and_tree_compatible(self):
        """Space-to-depth stem produces identical outputs from identical
        parameters (checkpoint-compatible exact rewrite)."""
        import jax.tree_util as jtu

        from multimodal_embeddings_tpu.models.layers import ConvBnAct

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
        plain = ConvBnAct(out_channels=16, kernel_size=3, strides=2)
        s2d = ConvBnAct(out_channels=16, kernel_size=3, strides=2, s2d=True)
        variables = plain.init(jax.random.PRNGKey(0), x)
        tree_a = {
            jtu.keystr(k): tuple(v.shape)
            for k, v in jtu.tree_leaves_with_path(variables)
        }
        tree_b = {
            jtu.keystr(k): tuple(v.shape)
            for k, v in jtu.tree_leaves_with_path(s2d.init(jax.random.PRNGKey(0), x))
        }
        assert tree_a == tree_b
        a = plain.apply(variables, x, train=False)
        b = s2d.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_full_model_outputs_match(self):
        """Whole detector with s2d stem matches the plain stem from the same
        checkpoint."""
        model_a = DocLayoutYOLO(num_classes=10, variant="n", s2d_stem=False)
        model_b = DocLayoutYOLO(num_classes=10, variant="n", s2d_stem=True)
        x = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
        )
        variables = deterministic_init(model_a, x, seed=0)
        out_a = model_a.apply(variables, x, train=False)
        out_b = model_b.apply(variables, x, train=False)
        for (ra, ca), (rb, cb) in zip(out_a, out_b):
            np.testing.assert_allclose(np.asarray(ra), np.asarray(rb), atol=2e-4)
            np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=2e-4)


class TestGLCRM:
    """DocLayout-YOLO GL-CRM backbone (arXiv 2410.12628): the DocStructBench
    architecture the reference loads (1_doclayout_bboxes.py:120-130)."""

    def test_forward_shapes(self):
        model = DocLayoutYOLO(num_classes=10, variant="n", glcrm=True)
        x = jnp.zeros((1, SIZE, SIZE, 3))
        variables = deterministic_init(model, x, seed=0)
        outputs = model.apply(variables, x, train=False)
        assert len(outputs) == 3
        for (reg, cls), stride in zip(outputs, STRIDES):
            assert reg.shape == (1, SIZE // stride, SIZE // stride, 4 * REG_MAX)
            assert cls.shape == (1, SIZE // stride, SIZE // stride, 10)

    def test_differs_from_base_and_is_deterministic(self):
        x = jnp.ones((1, SIZE, SIZE, 3)) * 0.5
        base = DocLayoutYOLO(num_classes=10, variant="n", glcrm=False)
        crm = DocLayoutYOLO(num_classes=10, variant="n", glcrm=True)
        vb = deterministic_init(base, x, seed=0)
        vc = deterministic_init(crm, x, seed=0)
        yb = base.apply(vb, x, train=False)[0][1]
        yc = crm.apply(vc, x, train=False)[0][1]
        assert yb.shape == yc.shape
        assert not np.allclose(np.asarray(yb), np.asarray(yc))
        yc2 = crm.apply(vc, x, train=False)[0][1]
        np.testing.assert_array_equal(np.asarray(yc), np.asarray(yc2))


class TestPallasConvs:
    """CRM inner convs routed through the Pallas spatial-on-lanes kernel
    (kernels/conv.py) — checkpoint-tree-identical, output-equivalent to the
    XLA NHWC path with the BatchNorm folded (interpret mode on CPU)."""

    def test_crm_block_tree_and_outputs_match(self):
        import jax.tree_util as jtu

        from multimodal_embeddings_tpu.models.layers import CRMBottleneck

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
        plain = CRMBottleneck(out_channels=8, dilation=2)
        pallas = CRMBottleneck(out_channels=8, dilation=2, pallas=True)
        variables = plain.init(jax.random.PRNGKey(0), x)
        tree_a = {
            jtu.keystr(k): tuple(v.shape)
            for k, v in jtu.tree_leaves_with_path(variables)
        }
        tree_b = {
            jtu.keystr(k): tuple(v.shape)
            for k, v in jtu.tree_leaves_with_path(
                pallas.init(jax.random.PRNGKey(0), x)
            )
        }
        assert tree_a == tree_b
        # same seed -> same values for either declaration order
        va = jtu.tree_leaves(variables)
        vb = jtu.tree_leaves(pallas.init(jax.random.PRNGKey(0), x))
        for a, b in zip(va, vb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out_a = plain.apply(variables, x, train=False)
        out_b = pallas.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), atol=2e-4
        )

    def test_crm_block_nontrivial_bn_stats(self):
        """Non-default BN stats exercise the folding arithmetic."""
        from flax.core import unfreeze

        from multimodal_embeddings_tpu.models.layers import CRMBottleneck

        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
        plain = CRMBottleneck(out_channels=8, dilation=2)
        pallas = CRMBottleneck(out_channels=8, dilation=2, pallas=True)
        variables = unfreeze(plain.init(jax.random.PRNGKey(1), x))
        for cv in ("cv1", "cv2"):
            bn = variables["batch_stats"][cv]["bn"]
            bn["mean"] = jnp.asarray(
                rng.normal(size=bn["mean"].shape).astype(np.float32)
            )
            bn["var"] = jnp.asarray(
                rng.uniform(0.5, 2.0, bn["var"].shape).astype(np.float32)
            )
            pr = variables["params"][cv]["bn"]
            pr["scale"] = jnp.asarray(
                rng.uniform(0.5, 1.5, pr["scale"].shape).astype(np.float32)
            )
            pr["bias"] = jnp.asarray(
                rng.normal(size=pr["bias"].shape).astype(np.float32)
            )
        out_a = plain.apply(variables, x, train=False)
        out_b = pallas.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), atol=2e-4
        )

    def test_stage_nchw_tree_and_outputs_match(self):
        """Whole-stage NCHW G2L_CRM (one layout boundary at the stage edge,
        1x1s as channel matmuls) is checkpoint-tree-identical and output-
        equivalent to the NHWC stage, including non-default BN stats."""
        import jax.tree_util as jtu
        from flax.core import unfreeze

        from multimodal_embeddings_tpu.models.layers import G2L_CRM

        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 24)).astype(np.float32))
        plain = G2L_CRM(24, n=2, dilation=2)
        staged = G2L_CRM(24, n=2, dilation=2, pallas_max_channels=96)
        variables = unfreeze(plain.init(jax.random.PRNGKey(2), x))
        tree_a = {
            jtu.keystr(k): tuple(v.shape)
            for k, v in jtu.tree_leaves_with_path(variables)
        }
        tree_b = {
            jtu.keystr(k): tuple(v.shape)
            for k, v in jtu.tree_leaves_with_path(
                staged.init(jax.random.PRNGKey(2), x)
            )
        }
        assert tree_a == tree_b
        va = jtu.tree_leaves(variables)
        vb = jtu.tree_leaves(staged.init(jax.random.PRNGKey(2), x))
        for a, b in zip(va, vb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # nontrivial BN statistics exercise the 1x1 folding arithmetic
        for cv in ("cv1", "cv2"):
            bn = variables["batch_stats"][cv]["bn"]
            bn["mean"] = jnp.asarray(
                rng.normal(size=bn["mean"].shape).astype(np.float32)
            )
            bn["var"] = jnp.asarray(
                rng.uniform(0.5, 2.0, bn["var"].shape).astype(np.float32)
            )
        out_a = plain.apply(variables, x, train=False)
        out_b = staged.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), atol=2e-4
        )

    @pytest.mark.parametrize("mode", ["stage", "block"])
    def test_full_model_outputs_match(self, mode):
        """Whole GL-CRM detector with pallas_convs routes c2f_2/c2f_3 inner
        blocks through the kernel and matches the XLA path from the same
        checkpoint."""
        model_a = DocLayoutYOLO(num_classes=10, variant="n", glcrm=True)
        model_b = DocLayoutYOLO(
            num_classes=10,
            variant="n",
            glcrm=True,
            pallas_convs=96,
            pallas_mode=mode,
        )
        x = jnp.asarray(
            np.random.default_rng(7).uniform(0, 1, (1, 128, 128, 3)).astype(
                np.float32
            )
        )
        variables = deterministic_init(model_a, x, seed=0)
        out_a = model_a.apply(variables, x, train=False)
        out_b = model_b.apply(variables, x, train=False)
        for (ra, ca), (rb, cb) in zip(out_a, out_b):
            np.testing.assert_allclose(np.asarray(ra), np.asarray(rb), atol=2e-3)
            np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=2e-3)
