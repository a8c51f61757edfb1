"""LayerNorm-stats Pallas kernel + FastLayerNorm drop-in compatibility."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_embeddings_tpu.kernels.ln_stats import ln_stats
from multimodal_embeddings_tpu.models.transformer import FastLayerNorm


class TestLnStatsKernel:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("method", ["reduce", "chunk", "dot"])
    def test_matches_f32_reference(self, dtype, method):
        rng = np.random.default_rng(0)
        # D=256 so the "chunk" path (requires D % 128 == 0, D > 128)
        # actually takes its unrolled-slices branch
        x = jnp.asarray(
            rng.normal(loc=0.7, scale=2.0, size=(4, 32, 256)).astype(np.float32),
            dtype,
        )
        mean, rstd = ln_stats(x, eps=1e-6, interpret=True, method=method)
        xf = np.asarray(x, np.float32)
        want_mean = xf.mean(-1, keepdims=True)
        want_var = np.maximum((xf * xf).mean(-1, keepdims=True) - want_mean**2, 0)
        np.testing.assert_allclose(np.asarray(mean), want_mean, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rstd), 1.0 / np.sqrt(want_var + 1e-6), rtol=1e-5
        )

    def test_serving_shape_smoke(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.normal(size=(2, 784, 768)).astype(np.float32), jnp.bfloat16
        )
        mean, rstd = ln_stats(x, interpret=True)
        assert mean.shape == (2, 784, 1) and rstd.shape == (2, 784, 1)
        assert mean.dtype == jnp.float32

    def test_row_chunked_mme5_shape(self):
        """The Mllama (1608, 1280) rows exceed the per-program VMEM
        budget whole; the grid must row-chunk and stay exact."""
        from multimodal_embeddings_tpu.kernels.ln_stats import pick_row_block

        rb = pick_row_block(1608, 1280, 2)
        assert rb == 536, rb  # 3 chunks, 6.9MB tiles
        rng = np.random.default_rng(4)
        x = jnp.asarray(
            rng.normal(scale=1.3, size=(2, 1608, 1280)).astype(np.float32),
            jnp.bfloat16,
        )
        mean, rstd = ln_stats(x, interpret=True)
        xf = np.asarray(x, np.float32)
        want_mean = xf.mean(-1, keepdims=True)
        want_var = np.maximum((xf * xf).mean(-1, keepdims=True) - want_mean**2, 0)
        np.testing.assert_allclose(np.asarray(mean), want_mean, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rstd), 1.0 / np.sqrt(want_var + 1e-6), rtol=1e-5
        )

    def test_pick_row_block(self):
        from multimodal_embeddings_tpu.kernels.ln_stats import pick_row_block

        assert pick_row_block(784, 768, 2) == 784  # fits whole
        assert pick_row_block(1608, 1280, 2) == 536
        # nothing fits: a single 8-row block over a huge D
        assert pick_row_block(8, 1024 * 1024 * 2, 2) == 0
        # L not factorable into a fitting multiple of 8 beyond 8 itself
        assert pick_row_block(16, 1280, 2) == 16


class TestFastLayerNorm:
    """FastLayerNorm must be indistinguishable from nn.LayerNorm off-TPU:
    same param tree, same outputs (every encoder LN in the model zoo was
    swapped to it — hf_port maps and checkpoints depend on this)."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matches_flax_layernorm(self, dtype):
        rng = np.random.default_rng(2)
        x = jnp.asarray(
            rng.normal(loc=0.3, scale=1.5, size=(3, 16, 64)).astype(np.float32),
            dtype,
        )
        ref = nn.LayerNorm(dtype=dtype)
        fast = FastLayerNorm(dtype=dtype)
        vref = ref.init(jax.random.PRNGKey(0), x)
        # perturb params so the affine part is exercised
        vref = jax.tree.map(
            lambda a: a + jnp.asarray(
                np.random.default_rng(3).normal(size=a.shape), a.dtype
            ) * 0.1,
            vref,
        )
        out_ref = ref.apply(vref, x)
        out_fast = fast.apply(vref, x)  # identical tree: {scale, bias}
        assert out_fast.dtype == out_ref.dtype
        np.testing.assert_allclose(
            np.asarray(out_fast, np.float32),
            np.asarray(out_ref, np.float32),
            atol=2e-6 if dtype == jnp.float32 else 1e-2,
        )

    def test_param_tree_identical(self):
        x = jnp.zeros((1, 8, 32))
        vref = nn.LayerNorm().init(jax.random.PRNGKey(0), x)
        vfast = FastLayerNorm().init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(vref) == jax.tree.structure(vfast)
        for a, b in zip(jax.tree.leaves(vref), jax.tree.leaves(vfast)):
            assert a.shape == b.shape and a.dtype == b.dtype
