"""Exactness tests for the fused LayerNorm→matmul Pallas kernel
(``kernels/ln_matmul.py``) against the unfused flax-equivalent sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_embeddings_tpu.kernels.ln_matmul import ln_matmul


def _reference(x, gamma, beta, w, eps=1e-6):
    """flax.linen.LayerNorm semantics at bf16 compute dtype: f32 stats,
    scale/shift in f32, cast to x.dtype, then the projection matmul with
    f32 accumulation."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    return jnp.dot(
        xn.astype(x.dtype), w, preferred_element_type=jnp.float32
    ).astype(x.dtype)


@pytest.mark.parametrize(
    "m,k,n,dtype",
    [
        (64, 128, 256, jnp.float32),
        (200, 256, 512, jnp.bfloat16),  # M not a block multiple → padding
        (256, 384, 1152, jnp.bfloat16),  # ViT-ish K=3·128, N=QKV
    ],
)
def test_matches_unfused(m, k, n, dtype):
    key = jax.random.key(0)
    kx, kw, kg, kb = jax.random.split(key, 4)
    x = jax.random.normal(kx, (m, k), dtype)
    w = (jax.random.normal(kw, (k, n), jnp.float32) * 0.05).astype(dtype)
    gamma = jax.random.normal(kg, (k,), jnp.float32) * 0.1 + 1.0
    beta = jax.random.normal(kb, (k,), jnp.float32) * 0.1

    want = _reference(x, gamma, beta, w)
    got = ln_matmul(x, gamma, beta, w, block_m=128, block_n=256, interpret=True)
    assert got.shape == (m, n)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
        atol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
    )


def test_matches_flax_layernorm_dense():
    """Against the literal flax modules the models use (EncoderBlock's
    ln → projection path, models/transformer.py:355)."""
    from flax import linen as nn

    class Seq(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(dtype=jnp.bfloat16, name="ln")(x)
            return nn.Dense(
                256, use_bias=False, dtype=jnp.bfloat16, name="proj"
            )(h)

    x = jax.random.normal(jax.random.key(1), (96, 128), jnp.bfloat16)
    mod = Seq()
    vars_ = mod.init(jax.random.key(2), x)
    want = mod.apply(vars_, x)
    p = vars_["params"]
    got = ln_matmul(
        x,
        p["ln"]["scale"].astype(jnp.float32),
        p["ln"]["bias"].astype(jnp.float32),
        p["proj"]["kernel"].astype(jnp.bfloat16),
        block_m=128,
        block_n=128,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_bias_variant():
    """Projection-bias fusion (the fc1 site) matches flax nn.Dense."""
    from flax import linen as nn

    class Seq(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(dtype=jnp.bfloat16, name="ln")(x)
            return nn.Dense(256, dtype=jnp.bfloat16, name="fc1")(h)

    x = jax.random.normal(jax.random.key(3), (80, 128), jnp.bfloat16)
    mod = Seq()
    vars_ = mod.init(jax.random.key(4), x)
    # give the zero-init bias real values
    import jax.tree_util as jtu

    vars_ = jtu.tree_map(
        lambda a: a
        if a.ndim != 1 or a.shape[0] != 256
        else jax.random.normal(jax.random.key(5), a.shape, a.dtype) * 0.1,
        vars_,
    )
    want = mod.apply(vars_, x)
    p = vars_["params"]
    got = ln_matmul(
        x,
        p["ln"]["scale"].astype(jnp.float32),
        p["ln"]["bias"].astype(jnp.float32),
        p["fc1"]["kernel"].astype(jnp.bfloat16),
        bias=p["fc1"]["bias"].astype(jnp.bfloat16),
        block_m=128,
        block_n=128,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_encoder_block_fused_matches_unfused(monkeypatch):
    """EncoderBlock(fuse_ln=True) under the interpret override: identical
    param tree to the unfused block, and outputs equal within bf16
    tolerance (locks the fused serving path's numerics end-to-end)."""
    from multimodal_embeddings_tpu.models.transformer import EncoderBlock

    x = jax.random.normal(jax.random.key(6), (2, 16, 128), jnp.bfloat16)
    plain = EncoderBlock(num_heads=2, dtype=jnp.bfloat16, fuse_ln=False)
    fused = EncoderBlock(num_heads=2, dtype=jnp.bfloat16, fuse_ln=True)
    vars_plain = plain.init(jax.random.key(7), x)
    monkeypatch.setenv("MMTPU_LN_FUSE_INTERPRET", "1")
    vars_fused = fused.init(jax.random.key(7), x)
    # same tree: checkpoints/hf_port maps are oblivious to the fusion
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda v: v.shape, vars_plain)
    ) == jax.tree_util.tree_structure(
        jax.tree.map(lambda v: v.shape, vars_fused)
    )
    assert jax.tree.map(lambda v: v.shape, vars_plain) == jax.tree.map(
        lambda v: v.shape, vars_fused
    )
    want = plain.apply(vars_plain, x)
    got = fused.apply(vars_plain, x)
    monkeypatch.delenv("MMTPU_LN_FUSE_INTERPRET")
    # without the override (CPU backend) the fused flag falls back to the
    # unfused path and must also agree
    fallback = fused.apply(vars_plain, x)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )
    np.testing.assert_array_equal(
        np.asarray(fallback, np.float32), np.asarray(want, np.float32)
    )
