"""QwenVL document-parser tests: model forward, cached generation, HTML
utilities."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from multimodal_embeddings_tpu.analysis.doc_parser import (
    BBoxElement,
    DocumentParser,
    clean_and_format_html,
    draw_bbox,
    extract_bbox_elements,
    round_to_patch_grid,
)
from multimodal_embeddings_tpu.models.qwen_vl import (
    QwenVLConfig,
    QwenVLModel,
    greedy_generate,
)
from multimodal_embeddings_tpu.models.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def tiny_qwen():
    config = QwenVLConfig.tiny()
    model = QwenVLModel(config)
    ids = jnp.ones((1, 12), jnp.int32)
    imgs = jnp.zeros((1, 56, 56, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ids, imgs)
    import flax.linen as fnn

    return model, fnn.unbox(variables)


class TestModel:
    def test_prefill_shapes(self, tiny_qwen):
        model, variables = tiny_qwen
        ids = jnp.ones((2, 10), jnp.int32)
        imgs = jnp.zeros((2, 56, 56, 3), jnp.float32)
        logits, caches, delta = model.apply(variables, ids, imgs)
        assert logits.shape == (2, 10, model.config.text.vocab_size)
        assert len(caches) == model.config.text.layers
        k, v = caches[0]
        assert k.shape == (2, model.config.text.max_len, 2, 16)

    def test_image_splicing_changes_logits(self, tiny_qwen):
        model, variables = tiny_qwen
        pad = model.config.image_pad_id
        ids = np.ones((1, 12), np.int32)
        ids[0, 3:7] = pad  # 4 pads = (56/28)^2 vision tokens
        img_a = jnp.zeros((1, 56, 56, 3), jnp.float32)
        img_b = jnp.ones((1, 56, 56, 3), jnp.float32)
        la, _, _ = model.apply(variables, jnp.asarray(ids), img_a)
        lb, _, _ = model.apply(variables, jnp.asarray(ids), img_b)
        assert not np.allclose(np.asarray(la), np.asarray(lb))
        # without pads the image has no entry point → logits equal
        ids_nopad = np.ones((1, 12), np.int32)
        la2, _, _ = model.apply(variables, jnp.asarray(ids_nopad), img_a)
        lb2, _, _ = model.apply(variables, jnp.asarray(ids_nopad), img_b)
        np.testing.assert_array_equal(np.asarray(la2), np.asarray(lb2))

    def test_cached_decode_matches_full_forward(self, tiny_qwen):
        """The incremental KV-cache path must produce the same logits as
        recomputing the full sequence. Cache MECHANICS are verified exact
        at kv_dtype=float32; the bf16 serving default (the notebook's HF
        bf16 cache numerics) gets a coarser bound — its only difference
        is the one storage rounding of K/V."""
        import dataclasses as dc

        from multimodal_embeddings_tpu.models.qwen_vl import QwenVLModel

        model, variables = tiny_qwen
        rng = np.random.default_rng(0)
        prompt = rng.integers(6, 200, (1, 8)).astype(np.int32)
        next_tok = rng.integers(6, 200, (1, 1)).astype(np.int32)

        full = np.concatenate([prompt, next_tok], axis=1)
        logits_full, _, _ = model.apply(variables, jnp.asarray(full), None)

        for kvd, atol in [("float32", 2e-4), ("bfloat16", 3e-2)]:
            m = QwenVLModel(
                dc.replace(
                    model.config,
                    text=dc.replace(model.config.text, kv_dtype=kvd),
                )
            )
            logits_p, caches, _ = m.apply(variables, jnp.asarray(prompt), None)
            step_logits, _ = m.apply(
                variables,
                jnp.asarray(next_tok),
                caches,
                8,
                method=m.decode_step,
            )
            np.testing.assert_allclose(
                np.asarray(step_logits[:, -1]),
                np.asarray(logits_full[:, -1]),
                atol=atol,
                err_msg=f"kv_dtype={kvd}",
            )

    def test_greedy_generate(self, tiny_qwen):
        model, variables = tiny_qwen
        prompt = np.array([[1, 10, 20, 30]], np.int32)
        out = greedy_generate(model, variables, prompt, max_new_tokens=6)
        assert out.shape == (1, 6)
        out2 = greedy_generate(model, variables, prompt, max_new_tokens=6)
        np.testing.assert_array_equal(out, out2)  # deterministic

    def test_generate_fns_take_weights_as_arguments(self, tiny_qwen):
        """The jitted prefill/decode must treat the parameter tree as a
        runtime ARGUMENT (closed-over multi-GB trees inline into the HLO
        and kill the remote compiler at 3B+ parse scale — CLAUDE.md): the
        same compiled pair must produce different tokens for different
        weight trees."""
        import jax

        from multimodal_embeddings_tpu.models.qwen_vl import (
            build_generate_fns,
        )

        model, variables = tiny_qwen
        prompt = np.array([[1, 10, 20, 30]], np.int32)
        prefill, decode = build_generate_fns(model, prompt.shape[1], 6)

        def run(v):
            last, caches, delta = prefill(v, jnp.asarray(prompt), None)
            return np.asarray(decode(v, last, caches, delta))

        out_a = run(variables)
        variables_b = jax.tree.map(lambda x: x * 1.7, variables)
        out_b = run(variables_b)
        assert out_a.shape == out_b.shape == (1, 6)
        # scaled weights change the greedy path; identical outputs would
        # mean the first tree was baked into the program as constants
        assert not np.array_equal(out_a, out_b)
        np.testing.assert_array_equal(out_a, run(variables))


class TestHTMLUtils:
    HTML = (
        "<html><body>"
        "<h2 data-bbox='10 20 200 60'>Headline</h2>"
        "<ol data-bbox='0 0 500 400'>"
        "<li data-bbox='10 80 490 120' style=\"color:red;font-size:12px\">item one</li>"
        "</ol>"
        "<p data-polygon='1 2 3 4 5 6 7 8' data-bbox='10 140 490 180'>Body text</p>"
        "</body></html>"
    )

    def test_extract_elements(self):
        els = extract_bbox_elements(self.HTML)
        tags = {e.tag for e in els}
        assert "ol" not in tags  # containers skipped
        assert {"h2", "li", "p"} == tags
        h2 = next(e for e in els if e.tag == "h2")
        assert h2.bbox == (10, 20, 200, 60) and h2.text == "Headline"

    def test_clean_html(self):
        cleaned = clean_and_format_html(self.HTML)
        assert "data-bbox" not in cleaned
        assert "data-polygon" not in cleaned
        assert "color:red" not in cleaned
        assert "font-size:12px" in cleaned  # non-color styles survive
        assert "Headline" in cleaned and "Body text" in cleaned

    def test_draw_bbox(self, tmp_path):
        img_path = str(tmp_path / "page.png")
        Image.new("RGB", (500, 400), "white").save(img_path)
        out_path = str(tmp_path / "boxed.png")
        img = draw_bbox(img_path, 500, 400, self.HTML, output_path=out_path)
        assert img.size == (500, 400)
        arr = np.asarray(Image.open(out_path))
        assert (arr[20, 10:200, 0] > 200).all() and (arr[20, 10:200, 1] < 100).all()

    def test_round_to_patch_grid(self):
        assert round_to_patch_grid(1000, 800) == (1008, 812)
        assert round_to_patch_grid(10, 10) == (28, 28)


class TestEndToEndParse:
    def test_document_parser(self, tiny_qwen, tmp_path):
        model, variables = tiny_qwen
        img_path = str(tmp_path / "doc.png")
        Image.new("RGB", (300, 200), "white").save(img_path)
        parser = DocumentParser(model, variables, ByteTokenizer(), image_size=56)
        html, in_h, in_w = parser.parse(img_path, max_new_tokens=8)
        assert isinstance(html, str)
        # data-bbox coordinates live in the model's actual input space
        # (fixed square resize), so the returned dims reflect image_size
        assert (in_w, in_h) == (56, 56)

    def test_early_stop_decode_token_equal(self, tiny_qwen):
        """The early-exit while_loop decode (HF generate's all-rows-EOS
        stopping contract) must emit exactly the fixed-length scan's
        tokens — both when EOS never fires and when it fires early."""
        import dataclasses as dc

        from multimodal_embeddings_tpu.models.qwen_vl import QwenVLModel

        model, variables = tiny_qwen
        ids = np.ones((2, 12), np.int32)
        ids[:, 3:7] = model.config.image_pad_id
        rng = np.random.default_rng(5)
        imgs = rng.random((2, 56, 56, 3)).astype(np.float32)
        scan_out = greedy_generate(
            model, variables, ids, imgs, max_new_tokens=8, early_stop=False
        )
        early_out = greedy_generate(
            model, variables, ids, imgs, max_new_tokens=8, early_stop=True
        )
        np.testing.assert_array_equal(early_out, scan_out)

        # force an early EOS: re-declare the 3rd emitted token as EOS
        eos_tok = int(scan_out[0, 2])
        model2 = QwenVLModel(dc.replace(model.config, eos_id=eos_tok))
        scan2 = greedy_generate(
            model2, variables, ids, imgs, max_new_tokens=8, early_stop=False
        )
        early2 = greedy_generate(
            model2, variables, ids, imgs, max_new_tokens=8, early_stop=True
        )
        np.testing.assert_array_equal(early2, scan2)
        assert (scan2[0] == eos_tok).any()  # EOS actually fired

    def test_ragged_eos_injection_token_equal(self, tiny_qwen):
        """The bench-only ragged-EOS knob (decode's optional force_steps
        argument — scripts/parse_bench.py --eos_ragged): row i emits EOS
        from output position force_steps[i] on, scan and while_loop
        variants are token-identical, and tokens BEFORE the stop are the
        unforced decode's tokens."""
        import jax.numpy as jnp

        from multimodal_embeddings_tpu.models.qwen_vl import (
            build_generate_fns,
        )

        model, variables = tiny_qwen
        eos = model.config.eos_id
        ids = np.ones((3, 12), np.int32)
        ids[:, 3:7] = model.config.image_pad_id
        rng = np.random.default_rng(7)
        imgs = rng.random((3, 56, 56, 3)).astype(np.float32)
        prompt = jnp.asarray(ids)
        force = jnp.asarray(np.int32([2, 5, 8]))

        prefill, scan_dec = build_generate_fns(model, 12, 8, early_stop=False)
        _, early_dec = build_generate_fns(model, 12, 8, early_stop=True)
        last, caches, delta = prefill(variables, prompt, jnp.asarray(imgs))
        base = np.asarray(scan_dec(variables, last, caches, delta))
        scan_f = np.asarray(scan_dec(variables, last, caches, delta, force))
        early_f = np.asarray(early_dec(variables, last, caches, delta, force))

        np.testing.assert_array_equal(early_f, scan_f)
        for i, s in enumerate([2, 5, 8]):
            assert (scan_f[i, s:] == eos).all()
            np.testing.assert_array_equal(scan_f[i, :s], base[i, :s])

    def test_parse_batch_matches_single(self, tiny_qwen, tmp_path):
        """Batched parsing (the TPU throughput shape: decode is
        weight-streaming bound, so B pages share one weight read per step)
        must return exactly the per-page results in input order — every
        generate op is batch-row-independent."""
        model, variables = tiny_qwen
        rng = np.random.default_rng(7)
        paths = []
        for i in range(3):
            p = str(tmp_path / f"page{i}.png")
            arr = rng.integers(0, 256, size=(200, 300, 3), dtype=np.uint8)
            Image.fromarray(arr).save(p)
            paths.append(p)
        parser = DocumentParser(model, variables, ByteTokenizer(), image_size=56)
        singles = [parser.parse(p, max_new_tokens=8) for p in paths]
        batched = parser.parse_batch(paths, max_new_tokens=8)
        assert batched == singles

    def test_parse_batch_dynamic_resolution_buckets(self, tiny_qwen, tmp_path):
        """Under dynamic resolution, pages bucket by their smart-resize
        grid; results still come back in input order with per-page dims."""
        model, variables = tiny_qwen
        sizes = [(300, 200), (100, 260), (300, 200)]  # two grid buckets
        paths = []
        for i, (w, h) in enumerate(sizes):
            p = str(tmp_path / f"dyn{i}.png")
            Image.new("RGB", (w, h), ("white", "gray", "black")[i]).save(p)
            paths.append(p)
        parser = DocumentParser(
            model, variables, ByteTokenizer(), image_size=56,
            dynamic_resolution=True, max_pixels=4 * 28 * 28,
        )
        singles = [parser.parse(p, max_new_tokens=6) for p in paths]
        batched = parser.parse_batch(paths, max_new_tokens=6)
        assert batched == singles
        assert (batched[0][1], batched[0][2]) != (batched[1][1], batched[1][2])


class TestQwen25Fidelity:
    """Qwen2.5-VL specifics: window attention, vision 2D RoPE, text M-RoPE
    (notebook cell 39512aca loads this architecture)."""

    def test_window_inf_matches_full_attention(self):
        import dataclasses as dc

        from multimodal_embeddings_tpu.models.qwen_vl import QwenVisionTower

        cfg_full = dc.replace(QwenVLConfig.tiny().vision, window_size=None)
        # window covering the whole 4x4 patch grid → same computation
        cfg_inf = dc.replace(cfg_full, window_size=14 * 100, fullatt_block_indexes=())
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 56, 56, 3)), jnp.float32
        )
        tower_full = QwenVisionTower(cfg_full, out_dim=64)
        tower_inf = QwenVisionTower(cfg_inf, out_dim=64)
        v_full = tower_full.init(jax.random.PRNGKey(1), imgs)
        out_full = tower_full.apply(v_full, imgs)
        out_inf = tower_inf.apply(v_full, imgs)  # same params: window is not a param
        np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_inf))

    def test_small_window_restricts_attention(self):
        import dataclasses as dc

        from multimodal_embeddings_tpu.models.qwen_vl import QwenVisionTower

        cfg_full = dc.replace(QwenVLConfig.tiny().vision, window_size=None)
        cfg_win = dc.replace(
            cfg_full, window_size=2 * 14, fullatt_block_indexes=()
        )  # 2x2-patch windows on the 4x4 grid
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 56, 56, 3)), jnp.float32
        )
        tower_full = QwenVisionTower(cfg_full, out_dim=64)
        tower_win = QwenVisionTower(cfg_win, out_dim=64)
        v = tower_full.init(jax.random.PRNGKey(1), imgs)
        assert not np.allclose(
            np.asarray(tower_full.apply(v, imgs)),
            np.asarray(tower_win.apply(v, imgs)),
        )

    def test_window_padding_matches_bigger_window(self):
        """Non-divisible grids: pad+mask must equal one full window."""
        from multimodal_embeddings_tpu.models.qwen_vl import _window_attention

        rng = np.random.default_rng(2)
        gh, gw = 3, 5
        q = jnp.asarray(rng.normal(size=(2, gh * gw, 2, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(2, gh * gw, 2, 8)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(2, gh * gw, 2, 8)), jnp.float32)
        out_pad = _window_attention(q, k, v, gh, gw, win=5)  # pads rows 3..4
        from multimodal_embeddings_tpu.models.transformer import sdpa

        np.testing.assert_allclose(
            np.asarray(out_pad), np.asarray(sdpa(q, k, v)), atol=1e-5
        )

    def test_mrope_position_ids_hand_example(self):
        from multimodal_embeddings_tpu.models.qwen_vl import (
            qwen_mrope_position_ids,
        )

        ids = np.ones((1, 10), np.int32)
        ids[0, 3:7] = 5  # 4 image pads, merged grid (2, 2)
        pos, delta = qwen_mrope_position_ids(jnp.asarray(ids), 5, (2, 2))
        pos = np.asarray(pos)
        np.testing.assert_array_equal(pos[0, 0], [0, 1, 2, 3, 3, 3, 3, 5, 6, 7])
        np.testing.assert_array_equal(pos[1, 0], [0, 1, 2, 3, 3, 4, 4, 5, 6, 7])
        np.testing.assert_array_equal(pos[2, 0], [0, 1, 2, 3, 4, 3, 4, 5, 6, 7])
        assert int(delta[0]) == -2  # max position 7, seq len 10

    def test_text_only_mrope_equals_plain_rope(self):
        from multimodal_embeddings_tpu.models.qwen_vl import (
            mrope_tables,
            qwen_mrope_position_ids,
        )
        from multimodal_embeddings_tpu.models.transformer import rope_frequencies

        ids = jnp.ones((2, 9), jnp.int32)
        pos, delta = qwen_mrope_position_ids(ids, 5, None)
        cos, sin = mrope_tables(pos, 16, 1e6, (2, 3, 3))
        cos_ref, sin_ref = rope_frequencies(16, 9, 1e6)
        np.testing.assert_allclose(np.asarray(cos[0]), np.asarray(cos_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sin[1]), np.asarray(sin_ref), atol=1e-6)
        assert np.all(np.asarray(delta) == 0)

    def test_cached_decode_matches_full_forward_with_image(self, tiny_qwen):
        """Decode-step M-RoPE must account for the image position delta:
        incremental logits equal the full recompute (exact cache mechanics
        verified at kv_dtype=float32; see the no-image twin for why)."""
        import dataclasses as dc

        from multimodal_embeddings_tpu.models.qwen_vl import QwenVLModel

        model, variables = tiny_qwen
        rng = np.random.default_rng(1)
        prompt = rng.integers(6, 200, (1, 8)).astype(np.int32)
        prompt[0, 2:6] = model.config.image_pad_id  # (56/28)^2 = 4 pads
        imgs = jnp.asarray(rng.normal(size=(1, 56, 56, 3)), jnp.float32)
        next_tok = rng.integers(6, 200, (1, 1)).astype(np.int32)

        m = QwenVLModel(
            dc.replace(
                model.config,
                text=dc.replace(model.config.text, kv_dtype="float32"),
            )
        )
        logits_p, caches, delta = m.apply(variables, jnp.asarray(prompt), imgs)
        step_logits, _ = m.apply(
            variables,
            jnp.asarray(next_tok),
            caches,
            8,
            delta,
            method=m.decode_step,
        )
        full = np.concatenate([prompt, next_tok], axis=1)
        logits_full, _, _ = m.apply(variables, jnp.asarray(full), imgs)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, -1]),
            np.asarray(logits_full[:, -1]),
            atol=2e-4,
        )

    def test_vision_rope_tables(self):
        from multimodal_embeddings_tpu.models.qwen_vl import vision_rope_2d

        cos, sin = vision_rope_2d(3, 4, 16)
        assert cos.shape == (12, 8) and sin.shape == (12, 8)
        # patch (0,0) has zero angles
        np.testing.assert_allclose(np.asarray(cos[0]), 1.0)
        np.testing.assert_allclose(np.asarray(sin[0]), 0.0)
        # row angle half must differ between rows, col half between cols
        assert not np.allclose(np.asarray(cos[0]), np.asarray(cos[4]))  # row 1
        assert not np.allclose(np.asarray(cos[0]), np.asarray(cos[1]))  # col 1


class TestDynamicResolution:
    def test_smart_resize(self):
        from multimodal_embeddings_tpu.analysis.doc_parser import smart_resize

        # already grid-aligned, inside budget → unchanged
        assert smart_resize(280, 280, 28, 784, 280 * 280) == (280, 280)
        # aspect preserved under the pixel budget
        h, w = smart_resize(2000, 3000, 28, 784, 448 * 448)
        assert h % 28 == 0 and w % 28 == 0
        assert h * w <= 448 * 448
        assert abs((w / h) - 1.5) < 0.25
        # tiny images scale UP to min_pixels
        h, w = smart_resize(10, 10, 28, 784, 448 * 448)
        assert h * w >= 784
        with pytest.raises(ValueError):
            smart_resize(10, 9000, 28)

    def test_parse_native_aspect(self, tiny_qwen, tmp_path):
        """Dynamic resolution runs the vision tower on a NON-SQUARE grid
        and reports the native-aspect input dims."""
        model, variables = tiny_qwen
        img_path = str(tmp_path / "wide.png")
        Image.new("RGB", (300, 200), "white").save(img_path)
        parser = DocumentParser(
            model, variables, ByteTokenizer(), image_size=56,
            dynamic_resolution=True,
        )
        html, in_h, in_w = parser.parse(img_path, max_new_tokens=6)
        assert (in_h, in_w) == (28, 56)  # 1x2 merged grid, aspect kept
        assert isinstance(html, str)


class TestQuantized:
    """int8 weight-only Qwen serving (models/quantized.py through
    QwenBlock/lm_head) — the TPU-native counterpart of the notebook's
    bitsandbytes 4/8-bit loads (cell 39512aca)."""

    def _pair(self):
        import dataclasses

        from flax.linen import unbox
        from multimodal_embeddings_tpu.models.quantized import (
            quantize_dense_tree,
        )

        config = QwenVLConfig.tiny()
        qconfig = dataclasses.replace(config, quantize=True)
        model = QwenVLModel(config, dtype=jnp.float32)
        qmodel = QwenVLModel(qconfig, dtype=jnp.float32)
        rng = np.random.default_rng(11)
        prompt = rng.integers(10, config.text.vocab_size, (2, 8)).astype(np.int32)
        variables = unbox(model.init(jax.random.PRNGKey(7), jnp.asarray(prompt)))
        target = jax.eval_shape(
            lambda: qmodel.init(jax.random.PRNGKey(7), jnp.asarray(prompt))
        )
        qvars = {
            "params": quantize_dense_tree(
                variables["params"], unbox(target)["params"]
            )
        }
        return model, qmodel, variables, qvars, prompt

    def test_quantized_tree_structure(self):
        model, qmodel, variables, qvars, prompt = self._pair()
        lm = qvars["params"]["lm_head"]
        assert lm["kernel_q"].dtype == jnp.int8
        assert lm["kernel_scale"].shape == (1, model.config.text.vocab_size)
        blk = qvars["params"]["layer0"]
        assert blk["q"]["kernel_q"].dtype == jnp.int8
        assert blk["mlp"]["gate"]["kernel_q"].dtype == jnp.int8
        # biases carried over from the fp tree
        np.testing.assert_array_equal(
            np.asarray(blk["q"]["bias"]),
            np.asarray(variables["params"]["layer0"]["q"]["bias"]),
        )

    def test_quantized_logits_close_to_fp(self):
        model, qmodel, variables, qvars, prompt = self._pair()
        ref, _, _ = model.apply(variables, jnp.asarray(prompt), None)
        got, _, _ = qmodel.apply(qvars, jnp.asarray(prompt), None)
        ref = np.asarray(ref, np.float64).reshape(-1, ref.shape[-1])
        got = np.asarray(got, np.float64).reshape(-1, got.shape[-1])
        cos = np.sum(ref * got, -1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1)
        )
        assert cos.min() > 0.99, cos.min()

    def test_quantized_generate_runs(self):
        model, qmodel, variables, qvars, prompt = self._pair()
        out = greedy_generate(qmodel, qvars, prompt, max_new_tokens=4)
        assert out.shape == (2, 4)
        assert np.all(out >= 0) and np.all(out < model.config.text.vocab_size)

    def _pair_int4(self):
        """int4 sibling of _pair (packed nibbles, group scales) — the
        storage class behind the new ``3b-int4`` parse config (decode is
        weight-streaming bound, r4-09/r4-11; int4 halves the streamed
        bytes again)."""
        import dataclasses

        from flax.linen import unbox
        from multimodal_embeddings_tpu.models.quantized import (
            quantize_dense_tree,
        )

        config = QwenVLConfig.tiny()
        qconfig = dataclasses.replace(config, quantize="int4")
        model = QwenVLModel(config, dtype=jnp.float32)
        qmodel = QwenVLModel(qconfig, dtype=jnp.float32)
        rng = np.random.default_rng(13)
        prompt = rng.integers(10, config.text.vocab_size, (2, 8)).astype(np.int32)
        variables = unbox(model.init(jax.random.PRNGKey(7), jnp.asarray(prompt)))
        target = jax.eval_shape(
            lambda: qmodel.init(jax.random.PRNGKey(7), jnp.asarray(prompt))
        )
        qvars = {
            "params": quantize_dense_tree(
                variables["params"], unbox(target)["params"]
            )
        }
        return model, qmodel, variables, qvars, prompt

    def test_int4_logits_close_to_fp(self):
        model, qmodel, variables, qvars, prompt = self._pair_int4()
        ref, _, _ = model.apply(variables, jnp.asarray(prompt), None)
        got, _, _ = qmodel.apply(qvars, jnp.asarray(prompt), None)
        ref = np.asarray(ref, np.float64).reshape(-1, ref.shape[-1])
        got = np.asarray(got, np.float64).reshape(-1, got.shape[-1])
        cos = np.sum(ref * got, -1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1)
        )
        # int4's 16 levels/group carry ~16x int8's quantization noise at
        # the tiny config's widths (measured 0.979 min cosine here; the
        # int8 sibling gates at 0.99)
        assert cos.min() > 0.97, cos.min()

    def test_int4_generate_runs(self):
        model, qmodel, variables, qvars, prompt = self._pair_int4()
        out = greedy_generate(qmodel, qvars, prompt, max_new_tokens=4)
        assert out.shape == (2, 4)
        assert np.all(out >= 0) and np.all(out < model.config.text.vocab_size)

    def test_3b_int4_config(self):
        """The 3b-int4 serving config exists and carries the packed-int4
        storage class (cli/parse.py --size 3b-int4)."""
        config = QwenVLConfig.qwen25_vl_3b_int4()
        assert config.quantize == "int4"
        assert config.text.layers == QwenVLConfig.qwen25_vl_3b().text.layers


class TestFullSizeConfigs:
    def test_qwen25_vl_32b_is_32b(self):
        """The flagship notebook configuration (32B with 4-bit quant) must
        actually be a ~32B-parameter decoder (abstract eval)."""
        config = QwenVLConfig.qwen25_vl_32b()
        model = QwenVLModel(config, dtype=jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32), None
            )
        )
        n = sum(
            int(np.prod(l.shape)) for l in jax.tree.leaves(shapes["params"])
        )
        assert 30e9 < n < 36e9, n

    def test_qwen25_vl_32b_int8_fit_math(self):
        """int8 + 4-stage PP must fit 16GB/chip (the serving plan in the
        config docstring): per-stage weight bytes < 11GB."""
        import dataclasses

        config = QwenVLConfig.qwen25_vl_32b_int8()
        assert config.quantize
        model = QwenVLModel(config, dtype=jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32), None
            )
        )
        params = shapes["params"]
        bytes_total = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree.leaves(params)
        )
        # decoder layers dominate; a 4-stage split carries ~1/4 of them
        layer_bytes = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for i in range(config.text.layers)
            for l in jax.tree.leaves(params[f"layer{i}"])
        )
        stage0_extra = bytes_total - layer_bytes  # embed+head+vision
        per_stage = layer_bytes / 4 + stage0_extra
        assert per_stage < 11 * 2**30, per_stage / 2**30


class TestParseCLI:
    """cli/parse.py — the notebook's user surface as a stage CLI (raw
    QwenVL HTML + cleaned HTML + optional bbox overlay + index JSON)."""

    def test_parse_cli_artifacts(self, tmp_path, monkeypatch):
        import json

        from multimodal_embeddings_tpu.cli.parse import main

        monkeypatch.chdir(tmp_path)
        os.makedirs("pages")
        Image.new("RGB", (120, 90), "white").save("pages/doc.png")
        rc = main(
            [
                "--input_folder", "pages",
                "--output_folder", "out",
                "--size", "tiny",
                "--max_new_tokens", "8",
                "--draw_bbox",
            ]
        )
        assert rc == 0
        names = sorted(os.listdir("out"))
        assert names == [
            "doc.clean.html",
            "doc.qwen.html",
            "doc_bbox.jpg",
            "parse_index.json",
        ]
        index = json.load(open("out/parse_index.json"))
        assert index[0]["input_width"] == index[0]["input_height"] == 56
        # the clean pass must strip any data-bbox/style attrs
        clean = open("out/doc.clean.html").read()
        assert "data-bbox" not in clean

    def test_parse_cli_synthetic_quantized(self, tmp_path, monkeypatch):
        """--size tiny-int8 exercises the checkpoint-less quantized parse
        path (synthetic_int8_init instead of the f32 twin — the same
        route the single-chip 7b-int8 on-hardware config takes)."""
        from multimodal_embeddings_tpu.cli.parse import main

        monkeypatch.chdir(tmp_path)
        os.makedirs("pages")
        Image.new("RGB", (100, 80), "white").save("pages/doc.png")
        rc = main(
            [
                "--input_folder", "pages",
                "--output_folder", "out",
                "--size", "tiny-int8",
                "--max_new_tokens", "4",
            ]
        )
        assert rc == 0
        assert os.path.exists("out/doc.qwen.html")

    def test_parse_cli_batch_matches(self, tmp_path, monkeypatch):
        """--batch_size 2 (pages stacked into one generate program) must
        emit byte-identical artifacts to the sequential parse, including
        the odd final chunk."""
        import json

        from multimodal_embeddings_tpu.cli.parse import main

        monkeypatch.chdir(tmp_path)
        os.makedirs("pages")
        rng = np.random.default_rng(3)
        for i in range(3):
            arr = rng.integers(0, 256, size=(90, 120, 3), dtype=np.uint8)
            Image.fromarray(arr).save(f"pages/doc{i}.png")
        base = ["--input_folder", "pages", "--size", "tiny",
                "--max_new_tokens", "6"]
        assert main([*base, "--output_folder", "out_1"]) == 0
        assert main([*base, "--output_folder", "out_b",
                     "--batch_size", "2"]) == 0
        for i in range(3):
            for suffix in ("qwen.html", "clean.html"):
                a = open(f"out_1/doc{i}.{suffix}").read()
                b = open(f"out_b/doc{i}.{suffix}").read()
                assert a == b, (i, suffix)
        idx_1 = json.load(open("out_1/parse_index.json"))
        idx_b = json.load(open("out_b/parse_index.json"))
        assert idx_1 == idx_b

    def test_parse_cli_data_parallel_matches(self, tmp_path, monkeypatch):
        """--data_parallel 2 (pages sharded over the mesh data axis, one
        SPMD generate program) must emit byte-identical artifacts to the
        single-device parse — including an odd page count, which pads the
        final batch by repeating its last page and drops the surplus."""
        from multimodal_embeddings_tpu.cli.parse import main

        monkeypatch.chdir(tmp_path)
        os.makedirs("pages")
        rng = np.random.default_rng(11)
        for i in range(3):
            arr = rng.integers(0, 256, size=(90, 120, 3), dtype=np.uint8)
            Image.fromarray(arr).save(f"pages/doc{i}.png")
        base = ["--input_folder", "pages", "--size", "tiny",
                "--max_new_tokens", "6"]
        assert main([*base, "--output_folder", "out_1"]) == 0
        assert main([*base, "--output_folder", "out_dp",
                     "--data_parallel", "2", "--batch_size", "2"]) == 0
        for i in range(3):
            for suffix in ("qwen.html", "clean.html"):
                a = open(f"out_1/doc{i}.{suffix}").read()
                b = open(f"out_dp/doc{i}.{suffix}").read()
                assert a == b, (i, suffix)

    def test_parse_cli_pipeline_parallel_matches(self, tmp_path, monkeypatch):
        """--pipeline_parallel 2 (the 32B serving shape: decoder stack
        over a stage ring) must emit byte-identical HTML artifacts to the
        single-device parse — the generate path is token-equal, so the
        whole artifact tree is deterministic."""
        from multimodal_embeddings_tpu.cli.parse import main

        monkeypatch.chdir(tmp_path)
        os.makedirs("pages")
        Image.new("RGB", (120, 90), "white").save("pages/doc.png")
        base = ["--input_folder", "pages", "--size", "tiny",
                "--max_new_tokens", "6"]
        assert main([*base, "--output_folder", "out_1"]) == 0
        assert main([*base, "--output_folder", "out_pp",
                     "--pipeline_parallel", "2"]) == 0
        for name in ("doc.qwen.html", "doc.clean.html"):
            a = open(f"out_1/{name}").read()
            b = open(f"out_pp/{name}").read()
            assert a == b, name
