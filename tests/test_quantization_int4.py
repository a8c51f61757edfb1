"""Weight-only int4 kernels + module wiring (interpret-mode on CPU).

The reference's 32B flagship loads 4-bit
(``QWEN2_5_document_parsing.ipynb`` cell ``39512aca``,
``BitsAndBytesConfig(load_in_4bit=True)``); these tests lock the
TPU-native int4 path: packing round-trips, group-wise scale error
bounds, kernel == dequant-matmul, the Int4DenseGeneral drop-in, and the
f32→int4 tree conversion used for checkpoint→serving.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_embeddings_tpu.kernels.quantization_int4 import (
    Q4Tensor,
    dequantize_int4,
    int4_apply,
    int4_group_size,
    int4_matmul,
    quantize_tensor_int4,
    unpack_int4,
)


def test_group_size_selection():
    assert int4_group_size(512) == 128
    assert int4_group_size(384) == 128
    assert int4_group_size(64) == 64  # smaller than a group: one group
    assert int4_group_size(200) == 200  # non-multiple: one group
    with pytest.raises(ValueError):
        int4_group_size(33)


def test_pack_unpack_exact():
    """Packing is lossless over the quantized integer grid."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 48)).astype(np.float32))
    qt = quantize_tensor_int4(w, group_size=128)
    assert qt.packed.dtype == jnp.uint8
    assert qt.packed.shape == (128, 48)
    assert qt.scale.shape == (2, 48)
    vals = np.asarray(unpack_int4(qt))
    assert vals.min() >= -8 and vals.max() <= 7
    # independently recompute the quantized grid
    wg = np.asarray(w, np.float64).reshape(2, 128, 48)
    scale = np.asarray(qt.scale, np.float64).reshape(2, 1, 48)
    expect = np.clip(np.round(wg / scale), -8, 7).reshape(256, 48)
    np.testing.assert_array_equal(vals, expect)


def test_roundtrip_error_bound():
    """|w − deq(q)| ≤ scale/2 per group (round-to-nearest)."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(384, 64)).astype(np.float32))
    qt = quantize_tensor_int4(w)
    deq = np.asarray(dequantize_int4(qt, jnp.float32), np.float64)
    err = np.abs(deq - np.asarray(w, np.float64)).reshape(3, 128, 64)
    bound = np.asarray(qt.scale, np.float64).reshape(3, 1, 64) * 0.5 + 1e-6
    assert (err <= bound).all()


def test_groupwise_beats_per_tensor_on_outliers():
    """The point of group scales: one outlier row only damages its own
    group, not the whole channel."""
    rng = np.random.default_rng(2)
    w = rng.normal(size=(256, 32)).astype(np.float32) * 0.02
    w[200, :] = 5.0  # outlier in group 1
    qt = quantize_tensor_int4(jnp.asarray(w), group_size=128)
    scale = np.asarray(qt.scale)
    # group 0's scale reflects only its own ~N(0, 0.02) rows; group 1's
    # carries the 5.0 outlier
    assert (scale[1] > 50 * scale[0]).all(), (scale[0].max(), scale[1].min())
    deq = np.asarray(dequantize_int4(qt, jnp.float32))
    err_g0 = np.abs(deq[:128] - w[:128]).max()
    assert err_g0 <= scale[0].max() * 0.5 + 1e-6, err_g0
    # a single per-channel (per-tensor-column) scale would carry the
    # outlier into every row's grid step: 5.0/7/2 ≈ 0.36 worst-case error
    assert err_g0 < 0.01


@pytest.mark.parametrize(
    "m,k,n,g",
    [(8, 64, 32, 64), (130, 384, 96, 128), (1, 512, 128, 128), (4, 256, 8, 128)],
)
def test_int4_matmul_matches_dequant(m, k, n, g):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    qt = quantize_tensor_int4(w, group_size=g)
    ref = (x.astype(jnp.float32) @ dequantize_int4(qt, jnp.float32)).astype(
        jnp.bfloat16
    )
    out = int4_matmul(x, qt.packed, qt.scale, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


@pytest.mark.parametrize("gs", [2, 4, 8])
def test_int4_matmul_multi_group_steps(gs):
    """groups_per_step > 1 (the chain-19 blocking lesson applied to int4:
    one group per k-step ran K=4096 matmuls as 32 tiny-block steps) is
    bit-identical to the single-group path."""
    rng = np.random.default_rng(5)
    m, k, n = 16, 128 * 8, 256
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    qt = quantize_tensor_int4(w, group_size=128)
    base = int4_matmul(x, qt.packed, qt.scale, interpret=True)
    out = int4_matmul(
        x, qt.packed, qt.scale, interpret=True, groups_per_step=gs
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(base, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_int4_mixed_tower_split():
    """quantize='int4-mixed': bf16 vision tower + packed-int4 text."""
    import dataclasses

    import jax

    from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder

    cfg = dataclasses.replace(MllamaConfig.tiny(), quantize="int4-mixed")
    model = MmE5Embedder(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 200, (1, 8)), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    size = cfg.vision.image_size
    images = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32))
    struct = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, ids, mask, images)
    )

    def leaf_dtypes(tree):
        return {str(l.dtype) for l in jax.tree.leaves(tree)}

    assert "uint8" not in leaf_dtypes(struct["params"]["vision_model"])
    assert "uint8" in leaf_dtypes(struct["params"]["text_model"])


def test_int4_apply_leading_dims_fallback():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    qt = quantize_tensor_int4(w)
    out = int4_apply(x, qt, use_kernel=False)
    assert out.shape == (2, 5, 48)
    ref = x @ dequantize_int4(qt, x.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_int4_cosine_preserved():
    """End-goal proxy: group-128 int4 weights keep matmul outputs high
    cosine (the 4-bit analogue of the int8 0.999 gate; 4-bit carries
    ~16x coarser grids, the gate is correspondingly looser)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    qt = quantize_tensor_int4(w)
    ref = np.asarray(x @ w)
    out = np.asarray(x @ dequantize_int4(qt, jnp.float32))
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
    )
    assert cos.min() > 0.99, cos.min()


def test_int4_dense_general_matches_dequant():
    from multimodal_embeddings_tpu.models.quantized import (
        Int4DenseGeneral,
        quantize_dense_tree,
    )

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(3, 7, 64)).astype(np.float32))
    w = rng.normal(size=(64, 4, 8)).astype(np.float32)

    model = Int4DenseGeneral(features=(4, 8), axis=-1, dtype=jnp.float32)
    target = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    qparams = quantize_dense_tree({"kernel": w}, target["params"])
    assert qparams["kernel_q4"].dtype == jnp.uint8
    assert qparams["kernel_q4"].shape == (32, 32)
    out = model.apply({"params": qparams}, x)
    assert out.shape == (3, 7, 4, 8)

    qt = Q4Tensor(packed=qparams["kernel_q4"], scale=jnp.asarray(qparams["kernel_scale"]))
    ref = (x.reshape(-1, 64) @ dequantize_int4(qt, jnp.float32)).reshape(3, 7, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_quantized_mme5_embedder_int4_matches_f32():
    """Tiny Mllama embedder: f32 tree → int4 tree keeps the embedding
    direction, and packed storage beats int8's by ~2x on dense kernels."""
    from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
    from multimodal_embeddings_tpu.models.quantized import quantize_dense_tree
    from multimodal_embeddings_tpu.parallel.sharding import unbox

    cfg = MllamaConfig.tiny()
    model = MmE5Embedder(cfg, dtype=jnp.float32)
    qmodel = MmE5Embedder(
        dataclasses.replace(cfg, quantize="int4"), dtype=jnp.float32
    )
    q8model = MmE5Embedder(
        dataclasses.replace(cfg, quantize="int8"), dtype=jnp.float32
    )

    rng = np.random.default_rng(0)
    b, L = 2, 16
    ids = jnp.asarray(rng.integers(1, 200, (b, L)), jnp.int32)
    mask = jnp.ones((b, L), jnp.int32)
    size = cfg.vision.image_size
    images = jnp.asarray(rng.uniform(-1, 1, (b, size, size, 3)).astype(np.float32))

    variables = unbox(model.init(jax.random.key(0), ids, mask, images))
    emb_f32 = model.apply(variables, ids, mask, images)

    target = jax.eval_shape(
        lambda: qmodel.init(jax.random.key(0), ids, mask, images)
    )
    qvars = {"params": quantize_dense_tree(variables["params"], target["params"])}
    emb_q = qmodel.apply(qvars, ids, mask, images)

    dtypes = {str(l.dtype) for l in jax.tree.leaves(qvars)}
    assert "uint8" in dtypes, dtypes

    t8 = jax.eval_shape(lambda: q8model.init(jax.random.key(0), ids, mask, images))
    q8vars = {"params": quantize_dense_tree(variables["params"], t8["params"])}

    def quant_bytes(tree, key):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for path, l in flat
            if any(getattr(p, "key", None) == key for p in path)
        )

    # the packed int4 value storage is exactly half of int8's
    assert quant_bytes(qvars, "kernel_q4") * 2 == quant_bytes(q8vars, "kernel_q")

    a, bb = np.asarray(emb_f32), np.asarray(emb_q)
    cos = np.sum(a * bb, -1)  # both L2-normalized
    assert cos.min() > 0.97, cos


def test_qwen_block_int4_close_to_f32():
    """Tiny QwenBlock with int4 weights stays close to the f32 block
    (the 32B-serving numerics gate at test scale)."""
    from multimodal_embeddings_tpu.models.qwen_vl import (
        QwenTextConfig,
        QwenBlock,
    )
    from multimodal_embeddings_tpu.models.quantized import quantize_dense_tree
    from multimodal_embeddings_tpu.models.transformer import rope_frequencies
    from multimodal_embeddings_tpu.parallel.sharding import unbox

    cfg = QwenTextConfig(
        vocab_size=256, hidden=64, layers=1, heads=4, kv_heads=2,
        head_dim=16, mlp_hidden=128, max_len=32,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 64)).astype(np.float32) * 0.1)
    cos, sin = rope_frequencies(cfg.head_dim, 8, cfg.rope_theta)
    cos = jnp.broadcast_to(cos[None], (2, 8, cos.shape[-1]))
    sin = jnp.broadcast_to(sin[None], (2, 8, sin.shape[-1]))

    block = QwenBlock(cfg, dtype=jnp.float32)
    variables = unbox(block.init(jax.random.key(0), x, cos, sin))
    ref, _ = block.apply(variables, x, cos, sin)

    qblock = QwenBlock(cfg, dtype=jnp.float32, quantize="int4")
    target = jax.eval_shape(lambda: qblock.init(jax.random.key(0), x, cos, sin))
    qparams = {"params": quantize_dense_tree(variables["params"], target["params"])}
    out, _ = qblock.apply(qparams, x, cos, sin)

    a, b = np.asarray(ref, np.float64), np.asarray(out, np.float64)
    cos_sim = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos_sim > 0.99, cos_sim


def test_qwen_32b_int4_config_fit_math():
    """The published 32B layout under int4: packed dense storage halves
    int8's decoder bytes; 2 PP stages fit 16GB chips with headroom."""
    from multimodal_embeddings_tpu.models.qwen_vl import QwenVLConfig

    cfg = QwenVLConfig.qwen25_vl_32b_int4()
    assert cfg.quantize == "int4"
    t = cfg.text
    # per-layer dense params (q/k/v/o + gate/up/down), packed at 0.5 B
    per_layer = (
        t.hidden * t.heads * t.head_dim  # q
        + 2 * t.hidden * t.kv_heads * t.head_dim  # k, v
        + t.heads * t.head_dim * t.hidden  # o
        + 3 * t.hidden * t.mlp_hidden  # gate, up, down
    )
    dense_gb = t.layers * per_layer * 0.5 / 2**30
    assert 13 < dense_gb < 17, dense_gb  # ~14.6GB packed decoder
    # 2-stage PP: ~half the decoder per chip + embeds on stage edges
    assert dense_gb / 2 < 9


def test_pp_greedy_generate_int4(devices8):
    """The notebook's literal 32B plan (4-bit + pipeline): int4 weights
    through the PP ring reproduce the single-device int4 greedy_generate
    token-for-token (same kernels, same rounding)."""
    from multimodal_embeddings_tpu.models.quantized import quantize_dense_tree
    from multimodal_embeddings_tpu.models.qwen_pp import pp_greedy_generate
    from multimodal_embeddings_tpu.models.qwen_vl import (
        QwenVLConfig,
        QwenVLModel,
        greedy_generate,
    )
    from multimodal_embeddings_tpu.parallel.pipeline import make_pp_mesh
    from multimodal_embeddings_tpu.parallel.sharding import unbox

    config = QwenVLConfig.tiny()
    qconfig = dataclasses.replace(config, quantize="int4")
    model = QwenVLModel(config, dtype=jnp.float32)
    qmodel = QwenVLModel(qconfig, dtype=jnp.float32)
    rng = np.random.default_rng(29)
    prompt = rng.integers(10, config.text.vocab_size, (2, 6)).astype(np.int32)

    variables = unbox(model.init(jax.random.key(3), jnp.asarray(prompt)))
    target = jax.eval_shape(
        lambda: qmodel.init(jax.random.key(3), jnp.asarray(prompt))
    )
    qvars = {
        "params": quantize_dense_tree(
            variables["params"], unbox(target)["params"]
        )
    }
    lm = qvars["params"]["lm_head"]
    assert lm["kernel_q4"].dtype == jnp.uint8

    ref = greedy_generate(qmodel, qvars, prompt, images=None, max_new_tokens=4)
    mesh = make_pp_mesh(2, devices8)
    got = pp_greedy_generate(
        qconfig, qvars, prompt, mesh=mesh, n_stages=2, max_new_tokens=4
    )
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_serve_cli_quantize_int4_flag():
    """--quantize int4 reaches the embedder config; bare --quantize is the
    measured serving default (int8-mixed, chain 20: 1.41× pure int8)."""
    from multimodal_embeddings_tpu.cli.serve import build_parser

    args = build_parser().parse_args(["--quantize", "int4"])
    assert args.quantize == "int4"
    args = build_parser().parse_args(["--quantize"])
    assert args.quantize == "int8-mixed"
    args = build_parser().parse_args([])
    assert args.quantize is False


def test_synthetic_int8_init_handles_int4_trees():
    """Checkpoint-less int4 serving: the synthetic init fills packed
    uint8 leaves without materializing an f32 twin."""
    from multimodal_embeddings_tpu.models.quantized import (
        Int4DenseGeneral,
        synthetic_int8_init,
    )

    model = Int4DenseGeneral(features=8, axis=-1, dtype=jnp.float32)
    x = jnp.zeros((2, 64), jnp.float32)
    variables = synthetic_int8_init(model, (x,))
    packed = variables["params"]["kernel_q4"]
    assert packed.dtype == np.uint8 and packed.shape == (32, 8)
    out = model.apply(jax.tree.map(jnp.asarray, variables), x)
    assert out.shape == (2, 8)
