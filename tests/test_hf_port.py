"""Structural tests for the HF key maps: every mapped target must exist in
our parameter trees (coverage check without real checkpoints)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_embeddings_tpu.models.hf_port import make_mme5_key_map, qwen25_vl_key_map
from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
from multimodal_embeddings_tpu.models.qwen_vl import QwenVLConfig, QwenVLModel
from multimodal_embeddings_tpu.models.weights import flatten_params


def synthetic_mllama_keys(config):
    keys = [
        "language_model.model.embed_tokens.weight",
        "language_model.model.norm.weight",
        "multi_modal_projector.weight",
        "multi_modal_projector.bias",
        "vision_model.patch_embedding.weight",
        "vision_model.class_embedding",
        "vision_model.layernorm_pre.weight",
        "vision_model.layernorm_pre.bias",
        "vision_model.layernorm_post.weight",
        "vision_model.layernorm_post.bias",
        "vision_model.pre_tile_positional_embedding.embedding.weight",
        "vision_model.pre_tile_positional_embedding.gate",
        "vision_model.post_tile_positional_embedding.embedding.weight",
        "vision_model.post_tile_positional_embedding.gate",
        "vision_model.gated_positional_embedding.embedding",
        "vision_model.gated_positional_embedding.gate",
        "vision_model.gated_positional_embedding.tile_embedding.weight",
    ]
    for i in range(config.text.layers):
        if i in config.text.cross_attn_layers:
            keys += [
                f"language_model.model.layers.{i}.cross_attn.q_proj.weight",
                f"language_model.model.layers.{i}.cross_attn.k_proj.weight",
                f"language_model.model.layers.{i}.cross_attn.v_proj.weight",
                f"language_model.model.layers.{i}.cross_attn.o_proj.weight",
                f"language_model.model.layers.{i}.cross_attn.q_norm.weight",
                f"language_model.model.layers.{i}.cross_attn.k_norm.weight",
                f"language_model.model.layers.{i}.cross_attn_attn_gate",
                f"language_model.model.layers.{i}.cross_attn_mlp_gate",
                f"language_model.model.layers.{i}.input_layernorm.weight",
                f"language_model.model.layers.{i}.post_attention_layernorm.weight",
                f"language_model.model.layers.{i}.mlp.gate_proj.weight",
                f"language_model.model.layers.{i}.mlp.up_proj.weight",
                f"language_model.model.layers.{i}.mlp.down_proj.weight",
            ]
        else:
            keys += [
                f"language_model.model.layers.{i}.self_attn.q_proj.weight",
                f"language_model.model.layers.{i}.self_attn.k_proj.weight",
                f"language_model.model.layers.{i}.self_attn.v_proj.weight",
                f"language_model.model.layers.{i}.self_attn.o_proj.weight",
                f"language_model.model.layers.{i}.input_layernorm.weight",
                f"language_model.model.layers.{i}.post_attention_layernorm.weight",
                f"language_model.model.layers.{i}.mlp.gate_proj.weight",
                f"language_model.model.layers.{i}.mlp.up_proj.weight",
                f"language_model.model.layers.{i}.mlp.down_proj.weight",
            ]
    for i in range(config.vision.layers):
        for part in (
            "input_layernorm.weight",
            "input_layernorm.bias",
            "post_attention_layernorm.weight",
            "post_attention_layernorm.bias",
            "self_attn.q_proj.weight",
            "self_attn.k_proj.weight",
            "self_attn.v_proj.weight",
            "self_attn.o_proj.weight",
            "mlp.fc1.weight",
            "mlp.fc1.bias",
            "mlp.fc2.weight",
            "mlp.fc2.bias",
        ):
            keys.append(f"vision_model.transformer.layers.{i}.{part}")
    for i in range(config.vision.global_layers):
        keys.append(f"vision_model.global_transformer.layers.{i}.gate_attn")
        keys.append(f"vision_model.global_transformer.layers.{i}.gate_ffn")
        for part in (
            "input_layernorm.weight",
            "input_layernorm.bias",
            "post_attention_layernorm.weight",
            "post_attention_layernorm.bias",
            "self_attn.q_proj.weight",
            "self_attn.k_proj.weight",
            "self_attn.v_proj.weight",
            "self_attn.o_proj.weight",
            "mlp.fc1.weight",
            "mlp.fc1.bias",
            "mlp.fc2.weight",
            "mlp.fc2.bias",
        ):
            keys.append(f"vision_model.global_transformer.layers.{i}.{part}")
    return keys


class TestMmE5Map:
    def test_all_mapped_targets_exist(self):
        config = MllamaConfig.tiny()
        model = MmE5Embedder(config)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, 8), jnp.int32),
            jnp.ones((1, 8), jnp.int32),
            jnp.zeros((1, 28, 28, 3)),
        )
        import flax.linen as fnn

        flat = set(flatten_params(fnn.unbox(variables)).keys())
        mme5_key_map = make_mme5_key_map(config)
        mapped, unmapped = 0, []
        covered = set()
        for key in synthetic_mllama_keys(config):
            target = mme5_key_map(key)
            if target is None:
                unmapped.append(key)
                continue
            assert target in flat, f"{key} -> {target} not in model"
            covered.add(target)
            mapped += 1
        assert mapped > 40
        assert not unmapped, unmapped
        # FULL surjectivity: every parameter in our tree must be reachable
        # from some checkpoint key — nothing in the model is unportable
        uncovered = sorted(flat - covered)
        assert not uncovered, uncovered

    def test_unknown_keys_skipped(self):
        mme5_key_map = make_mme5_key_map(MllamaConfig.tiny())
        assert mme5_key_map("language_model.lm_head.weight") is None
        assert mme5_key_map("something.else") is None


class TestQwenMap:
    def test_all_mapped_targets_exist(self):
        config = QwenVLConfig.tiny()
        model = QwenVLModel(config)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, 8), jnp.int32),
            jnp.zeros((1, 56, 56, 3)),
        )
        import flax.linen as fnn

        flat = set(flatten_params(fnn.unbox(variables)).keys())
        keys = [
            "model.embed_tokens.weight",
            "model.norm.weight",
            "lm_head.weight",
            "visual.patch_embed.proj.weight",
            "visual.merger.mlp.0.weight",
            "visual.merger.mlp.2.bias",
        ]
        for i in range(config.text.layers):
            keys += [
                f"model.layers.{i}.self_attn.q_proj.weight",
                f"model.layers.{i}.self_attn.q_proj.bias",
                f"model.layers.{i}.self_attn.o_proj.weight",
                f"model.layers.{i}.mlp.gate_proj.weight",
                f"model.layers.{i}.input_layernorm.weight",
            ]
        for i in range(config.vision.layers):
            keys += [
                f"visual.blocks.{i}.attn.qkv.weight",
                f"visual.blocks.{i}.norm1.weight",
                f"visual.blocks.{i}.mlp.fc1.weight",
            ]
        for key in keys:
            target = qwen25_vl_key_map(key)
            assert target is not None, key
            assert target in flat, f"{key} -> {target} not in model"


class TestTorchTensorAdaptation:
    def test_linear_2d_transposed(self):
        from multimodal_embeddings_tpu.models.weights import adapt_torch_tensor

        rng = np.random.default_rng(0)
        torch_w = rng.normal(size=(12, 8)).astype(np.float32)  # (out, in)
        got = adapt_torch_tensor(torch_w, (8, 12), "model.layers.0.mlp.gate_proj.weight")
        np.testing.assert_array_equal(got, torch_w.T)

    def test_square_linear_transposed_not_identity(self):
        from multimodal_embeddings_tpu.models.weights import adapt_torch_tensor

        rng = np.random.default_rng(1)
        torch_w = rng.normal(size=(6, 6)).astype(np.float32)
        got = adapt_torch_tensor(torch_w, (6, 6), "visual.merger.mlp.0.weight")
        np.testing.assert_array_equal(got, torch_w.T)  # Linear → transpose

    def test_embedding_direct(self):
        from multimodal_embeddings_tpu.models.weights import adapt_torch_tensor

        rng = np.random.default_rng(2)
        table = rng.normal(size=(100, 16)).astype(np.float32)
        got = adapt_torch_tensor(table, (100, 16), "model.embed_tokens.weight")
        np.testing.assert_array_equal(got, table)  # no transpose

    def test_densegeneral_3d_reshape(self):
        from multimodal_embeddings_tpu.models.weights import adapt_torch_tensor

        # torch q_proj: (out=H*D, in); flax: (in, H, D)
        in_dim, heads, dim = 8, 4, 2
        torch_w = np.arange(in_dim * heads * dim, dtype=np.float32).reshape(
            heads * dim, in_dim
        )
        got = adapt_torch_tensor(torch_w, (in_dim, heads, dim), "self_attn.q_proj.weight")
        # row-major semantics: out axis (H*D) splits into (H, D)
        want = torch_w.T.reshape(in_dim, heads, dim)
        np.testing.assert_array_equal(got, want)
        # functional equivalence: x @ W_flax.reshape(in,-1) == x @ torch_w.T
        x = np.ones((1, in_dim), np.float32)
        np.testing.assert_allclose(
            x @ got.reshape(in_dim, -1), x @ torch_w.T
        )

    def test_oproj_3d_reshape(self):
        from multimodal_embeddings_tpu.models.weights import adapt_torch_tensor

        # torch o_proj: (out, in=H*D); flax: (H, D, out)
        heads, dim, out = 4, 2, 8
        torch_w = np.arange(out * heads * dim, dtype=np.float32).reshape(
            out, heads * dim
        )
        got = adapt_torch_tensor(torch_w, (heads, dim, out), "self_attn.o_proj.weight")
        want = torch_w.T.reshape(heads, dim, out)
        np.testing.assert_array_equal(got, want)

    def test_conv_hwio(self):
        from multimodal_embeddings_tpu.models.weights import adapt_torch_tensor

        torch_w = np.zeros((16, 3, 7, 7), np.float32)  # OIHW
        got = adapt_torch_tensor(torch_w, (7, 7, 3, 16), "patch_embed.weight")
        assert got.shape == (7, 7, 3, 16)

    def test_size_mismatch_raises(self):
        from multimodal_embeddings_tpu.models.weights import adapt_torch_tensor

        with pytest.raises(ValueError):
            adapt_torch_tensor(np.zeros((4, 5), np.float32), (4, 6), "x.weight")


class TestDocLayoutMap:
    def test_structural_coverage(self):
        """Every mapped ultralytics key must land on an existing parameter;
        conversely most of our detector tree must be reachable."""
        from multimodal_embeddings_tpu.models.hf_port import doclayout_key_map
        from multimodal_embeddings_tpu.models.weights import deterministic_init
        from multimodal_embeddings_tpu.models.yolo import DocLayoutYOLO

        model = DocLayoutYOLO(num_classes=10, variant="n")
        variables = deterministic_init(model, jnp.zeros((1, 64, 64, 3)), seed=0)
        flat = set(flatten_params(variables).keys())

        # synthesize ultralytics-style keys for a few representative modules
        keys = [
            "model.0.conv.weight",
            "model.0.bn.weight",
            "model.0.bn.running_mean",
            "model.2.cv1.conv.weight",
            "model.2.m.0.cv1.conv.weight",
            "model.8.m.0.cv1.0.conv.weight",  # CIB dw1
            "model.8.m.0.cv1.3.bn.bias",  # CIB pw2
            "model.9.cv2.conv.weight",  # SPPF
            "model.10.attn.qkv.conv.weight",  # PSA
            "model.10.ffn.0.conv.weight",
            "model.13.cv2.bn.running_var",
            "model.23.one2one_cv2.0.0.conv.weight",
            "model.23.one2one_cv2.1.2.weight",
            "model.23.one2one_cv3.2.0.0.conv.weight",
            "model.23.one2one_cv3.0.2.bias",
        ]
        for key in keys:
            target = doclayout_key_map(key)
            assert target is not None, key
            assert target in flat, f"{key} -> {target}"

        skipped = [
            "model.0.bn.num_batches_tracked",
            "model.23.cv2.0.0.conv.weight",  # one-to-many branch
            "model.11.unknown",  # upsample has no params
        ]
        for key in skipped:
            assert doclayout_key_map(key) is None, key


# ---------------------------------------------------------------------------
# Full synthetic inverse-state-dict round trip (DocStructBench tree)
# ---------------------------------------------------------------------------

_INDEX_OF_MODULE = {
    "backbone/stem": 0,
    "backbone/down2": 1,
    "backbone/c2f_2": 2,
    "backbone/down3": 3,
    "backbone/c2f_3": 4,
    "backbone/down4": 5,
    "backbone/c2f_4": 6,
    "backbone/down5": 7,
    "backbone/c2fcib_5": 8,
    "backbone/sppf": 9,
    "backbone/psa": 10,
    "neck/td_c2f_4": 13,
    "neck/td_c2f_3": 16,
    "neck/bu_down_3": 17,
    "neck/bu_c2fcib_4": 19,
    "neck/bu_down_4": 20,
    "neck/bu_c2fcib_5": 22,
}

_CIB_SEQ = {"dw1": 0, "pw1": 1, "dw2": 2, "pw2": 3, "dw3": 4}
_HEAD_CLS_SEQ = {"dw1": (0, 0), "pw1": (0, 1), "dw2": (1, 0), "pw2": (1, 1)}


def _conv_bn_torch_leaf(collection, leaf):
    """Inverse of hf_port._conv_bn: our ConvBnAct leaf -> ultralytics leaf."""
    if collection == "params":
        return {"conv/kernel": "conv.weight", "bn/scale": "bn.weight",
                "bn/bias": "bn.bias"}[leaf]
    return {"bn/mean": "bn.running_mean", "bn/var": "bn.running_var"}[leaf]


def inverse_doclayout_key(flat_key):
    """Our flat flax key -> the ultralytics torch key that must map to it."""
    collection, rest = flat_key.split("/", 1)
    parts = rest.split("/")
    if parts[0] == "head":
        name = parts[1]
        leaf = "/".join(parts[2:])
        import re as _re

        m = _re.match(r"(reg|cls)(\d)_(.+)", name)
        branch, level, sub = m.group(1), m.group(2), m.group(3)
        if branch == "reg":
            if sub == "out":
                return f"model.23.one2one_cv2.{level}.2." + (
                    "weight" if leaf == "kernel" else "bias"
                )
            seq = int(sub[-1]) - 1  # cv1 -> 0, cv2 -> 1
            return (
                f"model.23.one2one_cv2.{level}.{seq}."
                + _conv_bn_torch_leaf(collection, leaf)
            )
        if sub == "out":
            return f"model.23.one2one_cv3.{level}.2." + (
                "weight" if leaf == "kernel" else "bias"
            )
        outer, inner = _HEAD_CLS_SEQ[sub]
        return (
            f"model.23.one2one_cv3.{level}.{outer}.{inner}."
            + _conv_bn_torch_leaf(collection, leaf)
        )

    module = "/".join(parts[:2])
    idx = _INDEX_OF_MODULE[module]
    tail = parts[2:]
    if tail[0] in ("conv", "bn"):  # bare Conv (stem/down2/down3/bu_down_3)
        return f"model.{idx}." + _conv_bn_torch_leaf(collection, "/".join(tail))
    if tail[0] in ("cv1", "cv2", "ffn1", "ffn2"):
        torch_mod = {"ffn1": "ffn.0", "ffn2": "ffn.1"}.get(tail[0], tail[0])
        return f"model.{idx}.{torch_mod}." + _conv_bn_torch_leaf(
            collection, "/".join(tail[1:])
        )
    if tail[0] == "attn":  # PSA attention
        return f"model.{idx}.attn.{tail[1]}." + _conv_bn_torch_leaf(
            collection, "/".join(tail[2:])
        )
    if tail[0].startswith("m"):  # C2f / G2L_CRM / C2fCIB inner block
        inner = int(tail[0][1:])
        if tail[1] == "gate":  # GL-CRM controllable gate (bare conv + bias)
            return f"model.{idx}.m.{inner}.gate." + (
                "weight" if tail[2] == "kernel" else "bias"
            )
        if tail[1] in _CIB_SEQ:  # CIB sequential cv1.<0..4>
            return (
                f"model.{idx}.m.{inner}.cv1.{_CIB_SEQ[tail[1]]}."
                + _conv_bn_torch_leaf(collection, "/".join(tail[2:]))
            )
        return f"model.{idx}.m.{inner}.{tail[1]}." + _conv_bn_torch_leaf(
            collection, "/".join(tail[2:])
        )
    raise AssertionError(f"no inverse for {flat_key}")


class TestDocLayoutFullRoundTrip:
    @pytest.mark.parametrize("glcrm", [False, True])
    def test_inverse_state_dict_round_trip(self, glcrm, tmp_path):
        """Build a torch state dict covering OUR ENTIRE parameter tree via
        the inverse key map, port it back through doclayout_key_map, and
        require every tensor to land bit-identically: zero unmapped keys in
        either direction for the full DocStructBench (GL-CRM) tree."""
        torch = pytest.importorskip("torch")
        from multimodal_embeddings_tpu.models.hf_port import doclayout_key_map
        from multimodal_embeddings_tpu.models.weights import (
            deterministic_init,
            load_torch_state_dict,
        )
        from multimodal_embeddings_tpu.models.yolo import DocLayoutYOLO

        model = DocLayoutYOLO(num_classes=10, variant="n", glcrm=glcrm)
        variables = deterministic_init(model, jnp.zeros((1, 64, 64, 3)), seed=3)
        flat = flatten_params(variables)

        state = {}
        for fkey, arr in flat.items():
            tkey = inverse_doclayout_key(fkey)
            assert doclayout_key_map(tkey) == fkey, (tkey, fkey)
            if arr.ndim == 4:  # HWIO -> OIHW
                tarr = np.transpose(arr, (3, 2, 0, 1))
            else:
                tarr = arr
            state[tkey] = torch.from_numpy(np.ascontiguousarray(tarr))
        # distractors the map must skip
        state["model.0.bn.num_batches_tracked"] = torch.zeros(1)
        state["model.23.cv2.0.0.conv.weight"] = torch.zeros(1, 1, 1, 1)

        path = str(tmp_path / "synthetic_docstructbench.pt")
        torch.save(state, path)

        zeros = jax.tree.map(np.zeros_like, variables)
        restored = load_torch_state_dict(path, zeros, doclayout_key_map)
        restored_flat = flatten_params(restored)
        assert set(restored_flat) == set(flat)
        for fkey in flat:
            np.testing.assert_array_equal(
                restored_flat[fkey], flat[fkey], err_msg=fkey
            )

    def test_glcrm_has_gate_params(self):
        from multimodal_embeddings_tpu.models.weights import deterministic_init
        from multimodal_embeddings_tpu.models.yolo import DocLayoutYOLO

        model = DocLayoutYOLO(num_classes=10, variant="n", glcrm=True)
        variables = deterministic_init(model, jnp.zeros((1, 64, 64, 3)), seed=0)
        flat = flatten_params(variables)
        gates = [k for k in flat if "/gate/" in k]
        assert any("c2f_2/m0/gate/kernel" in k for k in gates)
        assert any("c2f_4/m0/gate/kernel" in k for k in gates)
        # neck and P5 stay base v10
        assert not any(k.startswith("params/neck") and "/gate/" in k for k in flat)
        assert not any("c2fcib_5" in k and "/gate/" in k for k in flat)
