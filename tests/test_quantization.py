"""Weight-only int8 quantization kernels (interpret-mode on the CPU mesh).

Parity contract: the serving embedder is bit-free to quantize as long as
embedding cosine stays ≥0.999 (PARITY.md gate) — these tests lock the
kernel-level error bounds that make that reachable (|w−deq(q)| ≤ scale/2,
unbiased stochastic rounding, matmul == dequant-matmul).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_embeddings_tpu.kernels.quantization import (
    dequantize,
    int8_apply,
    int8_matmul,
    quantize_tensor,
    stochastic_round_quantize,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    qt = quantize_tensor(w, contract_axes=(0,))
    assert qt.q.dtype == jnp.int8
    assert qt.scale.shape == (1, 48)
    deq = dequantize(qt, jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    bound = np.asarray(qt.scale)[0] * 0.5 + 1e-6
    assert (err <= bound[None, :]).all()


def test_quantize_higher_rank_contract_axes():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 4, 16)).astype(np.float32))
    qt = quantize_tensor(w, contract_axes=(0,))
    assert qt.scale.shape == (1, 4, 16)
    deq = dequantize(qt, jnp.float32)
    assert np.abs(np.asarray(deq) - np.asarray(w)).max() < np.asarray(qt.scale).max()


def test_stochastic_rounding_unbiased():
    # a constant tensor strictly between two int8 levels: round-to-nearest
    # always picks one side; stochastic rounding must average to the value
    # pin each column's amax to 1.0 (row 0) so scale = 1/127 and the body
    # rows sit at w/scale = 44.45, strictly between levels 44 and 45
    w = jnp.full((256, 128), 0.35, jnp.float32)
    w = w.at[0, :].set(1.0)
    qs = [
        stochastic_round_quantize(w, (0,), seed=s, interpret=True).q
        for s in range(8)
    ]
    mean_q = np.mean([np.asarray(q)[1:, :].astype(np.float64) for q in qs])
    target = 0.35 * 127.0  # 44.45
    assert abs(mean_q - target) < 0.15, mean_q
    # every sample is one of the two adjacent levels
    for q in qs:
        vals = np.unique(np.asarray(q)[1:, :])
        assert set(vals.tolist()) <= {44, 45}, vals


def test_stochastic_rounding_exact_integers_stable():
    # a column whose values are exact multiples of its scale must never
    # wobble under stochastic rounding (floor(k + u) == k for u ∈ [0,1))
    col = np.float32([127.0, -127.0, 0.0, 63.5, -63.5, 127.0, -127.0, 0.0])
    w = jnp.asarray(np.stack([col, col / 2.0], axis=1)) / 127.0
    qt = stochastic_round_quantize(w, (0,), seed=3, interpret=True)
    # per-column scale puts w/scale == col exactly; the ±63.5 entries sit
    # between levels and may round either way — check only the exact ones
    expect = np.int8([127, -127, 0, 64, -64, 127, -127, 0])
    exact = np.abs(col - np.round(col)) < 1e-6
    got = np.asarray(qt.q)
    np.testing.assert_array_equal(got[exact, 0], expect[exact])
    np.testing.assert_array_equal(got[exact, 1], expect[exact])


@pytest.mark.parametrize("m,k,n", [(8, 64, 32), (130, 384, 96), (1, 512, 128)])
def test_int8_matmul_matches_dequant(m, k, n):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    qt = quantize_tensor(w, (0,))
    ref = (x.astype(jnp.float32) @ dequantize(qt, jnp.float32)).astype(jnp.bfloat16)
    out = int8_matmul(x, qt.q, qt.scale, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_int8_apply_leading_dims():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    qt = quantize_tensor(w, (0,))
    out = int8_apply(x, qt, use_kernel=False)
    assert out.shape == (2, 5, 48)
    ref = x @ dequantize(qt, jnp.float32).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_quantized_cosine_preserved():
    """End-goal proxy: int8 weights keep matmul outputs ≥0.999 cosine."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    qt = quantize_tensor(w, (0,))
    ref = np.asarray(x @ w)
    out = np.asarray(x @ dequantize(qt, jnp.float32))
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
    )
    assert cos.min() > 0.999, cos.min()


def test_quantized_mme5_embedder_matches_f32():
    """Tiny Mllama embedder: f32 tree → int8 tree conversion preserves the
    embedding direction (the PARITY.md cosine gate path for 11B int8
    single-chip serving), and the storage actually shrinks."""
    import dataclasses

    from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
    from multimodal_embeddings_tpu.models.quantized import (
        param_bytes,
        quantize_dense_tree,
    )
    from multimodal_embeddings_tpu.parallel.sharding import unbox

    cfg = MllamaConfig.tiny()
    model = MmE5Embedder(cfg, dtype=jnp.float32)
    qmodel = MmE5Embedder(dataclasses.replace(cfg, quantize=True), dtype=jnp.float32)

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

    # int8 leaves exist and dominate the dense storage
    dtypes = {str(l.dtype) for l in jax.tree.leaves(qvars)}
    assert "int8" in dtypes, dtypes
    assert param_bytes(qvars["params"]) < 0.55 * param_bytes(
        unbox(variables)["params"]
    )

    a, bb = np.asarray(emb_f32), np.asarray(emb_q)
    cos = np.sum(a * bb, -1)  # both L2-normalized
    assert cos.min() > 0.99, cos


def test_mixed_quantization_splits_towers():
    """quantize="int8-mixed": the VISION tower stays full-precision
    DenseGeneral (compute-bound at serving M — 11B trace chain 17) while
    the TEXT stack quantizes; conversion + forward still work and agree
    with f32 at the cosine gate."""
    import dataclasses

    from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
    from multimodal_embeddings_tpu.models.quantized import quantize_dense_tree
    from multimodal_embeddings_tpu.parallel.sharding import unbox

    cfg = MllamaConfig.tiny()
    model = MmE5Embedder(cfg, dtype=jnp.float32)
    qmodel = MmE5Embedder(
        dataclasses.replace(cfg, quantize="int8-mixed"), dtype=jnp.float32
    )

    rng = np.random.default_rng(0)
    b, L = 2, 16
    ids = jnp.asarray(rng.integers(1, 200, (b, L)), jnp.int32)
    mask = jnp.ones((b, L), jnp.int32)
    size = cfg.vision.image_size
    images = jnp.asarray(rng.uniform(-1, 1, (b, size, size, 3)).astype(np.float32))

    variables = unbox(model.init(jax.random.key(0), ids, mask, images))
    target = jax.eval_shape(
        lambda: qmodel.init(jax.random.key(0), ids, mask, images)
    )

    def leaf_dtypes(tree):
        return {str(l.dtype) for l in jax.tree.leaves(tree)}

    assert "int8" not in leaf_dtypes(target["params"]["vision_model"])
    assert "int8" in leaf_dtypes(target["params"]["text_model"])

    qvars = {"params": quantize_dense_tree(variables["params"], target["params"])}
    emb_f32 = model.apply(variables, ids, mask, images)
    emb_q = qmodel.apply(qvars, ids, mask, images)
    cos = np.sum(np.asarray(emb_f32) * np.asarray(emb_q), -1)
    assert cos.min() > 0.99, cos


def test_embedder_facade_int8():
    """EmbedderConfig(quantize=True) builds a working int8 mme5 embedder
    (the reference API surface, ``embedder.py:36-254``, over int8 storage)."""
    from multimodal_embeddings_tpu.config import EmbedderConfig
    from multimodal_embeddings_tpu.models.embedder import MultimodalEmbedder
    from multimodal_embeddings_tpu.models.mme5 import MllamaConfig

    emb = MultimodalEmbedder(
        EmbedderConfig(family="mme5", dtype="float32", quantize=True),
        model_config=MllamaConfig.tiny(),
    )
    dtypes = {str(l.dtype) for l in jax.tree.leaves(emb.variables)}
    assert "int8" in dtypes, dtypes
    img = (np.random.default_rng(0).uniform(0, 255, (64, 48, 3))).astype(np.uint8)
    vecs = emb.get_image_embeddings([img])
    assert vecs[0] is not None
    np.testing.assert_allclose(np.linalg.norm(vecs[0]), 1.0, atol=1e-5)


def test_embedder_facade_int8_rejects_mesh(devices8):
    from multimodal_embeddings_tpu.config import EmbedderConfig, MeshConfig
    from multimodal_embeddings_tpu.core.mesh import make_mesh
    from multimodal_embeddings_tpu.models.embedder import MultimodalEmbedder
    from multimodal_embeddings_tpu.models.mme5 import MllamaConfig

    mesh = make_mesh(MeshConfig(shape=(4, 2)), devices=devices8)
    with pytest.raises(ValueError):
        MultimodalEmbedder(
            EmbedderConfig(family="mme5", dtype="float32", quantize=True),
            mesh=mesh,
            model_config=MllamaConfig.tiny(),
        )


def test_stochastic_rounding_higher_rank():
    """The >2D path (DenseGeneral kernels like (in, heads, head_dim))
    collapses to 2D, quantizes, and restores the original layout."""
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.normal(size=(32, 4, 8)).astype(np.float32))
    qt = stochastic_round_quantize(w, (0,), seed=5, interpret=True)
    assert qt.q.shape == w.shape and qt.q.dtype == jnp.int8
    assert qt.scale.shape == (1, 4, 8)
    # stochastic rounding stays within one level of round-to-nearest
    deq = np.asarray(qt.q, np.float64) * np.asarray(qt.scale, np.float64)
    err = np.abs(deq - np.asarray(w, np.float64))
    bound = np.asarray(qt.scale, np.float64) + 1e-6  # floor+u: ≤ 1 level
    assert (err <= bound).all()


def test_pick_blocks_mid_m_classes_match_measured_winners():
    """The round-5 tune sweep (scripts/int8_tune_results.json,
    text_{qo,gateup,down}_{256,512}x...) measured the decoupled-text
    M=256/512 matmul classes the chain r4-01 text_chunk A/B ran
    off-table; lock the picker to the per-class winners (or a config
    measured within ~6% of the winner across the class)."""
    from multimodal_embeddings_tpu.kernels.quantization import pick_blocks

    # text_chunk 8 → M=256 rows through the 11B text stack
    assert pick_blocks(256, 4096, 4096) == (256, 512, 1024)       # q/o proj
    assert pick_blocks(256, 4096, 14336) == (128, 2048, 1024)     # gate-up
    assert pick_blocks(256, 14336, 4096) == (128, 2048, 1024)     # down
    # text_chunk 16 → M=512
    assert pick_blocks(512, 4096, 4096) == (128, 1024, 2048)      # q/o proj
    assert pick_blocks(512, 4096, 14336) == (512, 512, 1024)      # gate-up
    assert pick_blocks(512, 14336, 4096) == (512, 512, 1024)      # down
    # pre-existing classes are untouched
    assert pick_blocks(32, 4096, 14336) == (128, 512, 4096)       # skinny text
    assert pick_blocks(3328, 5120, 1280) == (128, 1280, 1024)     # vision down
