"""Pipeline parallelism: GPipe schedule over a stage mesh axis.

The pipelined forward must be numerically identical to running the same
layer stack sequentially — microbatching is exact for batch-independent
layers (SURVEY §2.4: PP is the Qwen-32B stretch scale-out path; the
reference has none, ``deprecated_package/embedder.py:190-224`` is pure
replication).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_embeddings_tpu.models.transformer import LlamaBlock
from multimodal_embeddings_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_apply,
    stack_layer_params,
)
from multimodal_embeddings_tpu.parallel.sharding import unbox


def _make_stack(n_layers: int, width: int = 64, seed: int = 0):
    block = LlamaBlock(
        num_heads=4,
        num_kv_heads=2,
        head_dim=width // 4,
        mlp_hidden=2 * width,
        max_len=32,
        dtype=jnp.float32,
    )
    x0 = jnp.zeros((1, 8, width), jnp.float32)
    keys = jax.random.split(jax.random.key(seed), n_layers)
    params = [unbox(block.init(k, x0))["params"] for k in keys]
    return block, params


def _sequential(block, params, x):
    h = x
    for p in params:
        h = block.apply({"params": p}, h)
    return h


@pytest.mark.parametrize("n_stages,microbatches", [(4, 4), (2, 8), (4, 2)])
def test_pipeline_matches_sequential(devices8, n_stages, microbatches):
    block, params = _make_stack(8)
    mesh = make_pp_mesh(n_stages, devices8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 8, 64)).astype(np.float32))

    ref = _sequential(block, params, x)

    stacked = stack_layer_params(params, n_stages)
    layer_fn = lambda lp, h: block.apply({"params": lp}, h)  # noqa: E731
    out = pipeline_apply(
        layer_fn, stacked, x, mesh=mesh, num_microbatches=microbatches
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipeline_single_stage_degenerate(devices8):
    block, params = _make_stack(4)
    mesh = make_pp_mesh(1, devices8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 8, 64)).astype(np.float32))
    ref = _sequential(block, params, x)
    stacked = stack_layer_params(params, 1)
    out = pipeline_apply(
        lambda lp, h: block.apply({"params": lp}, h),
        stacked,
        x,
        mesh=mesh,
        num_microbatches=2,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pipeline_under_jit(devices8):
    """The whole pipeline must trace into one XLA program (serving path)."""
    block, params = _make_stack(4)
    mesh = make_pp_mesh(4, devices8)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 8, 64)).astype(np.float32))
    stacked = stack_layer_params(params, 4)

    @jax.jit
    def fwd(xx):
        return pipeline_apply(
            lambda lp, h: block.apply({"params": lp}, h),
            stacked,
            xx,
            mesh=mesh,
            num_microbatches=4,
        )

    out = fwd(x)
    ref = _sequential(block, params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_stack_layer_params_validation():
    _, params = _make_stack(4)
    with pytest.raises(ValueError):
        stack_layer_params(params, 3)


def test_batch_divisibility_validation(devices8):
    block, params = _make_stack(2)
    mesh = make_pp_mesh(2, devices8)
    stacked = stack_layer_params(params, 2)
    with pytest.raises(ValueError):
        pipeline_apply(
            lambda lp, h: block.apply({"params": lp}, h),
            stacked,
            jnp.zeros((5, 8, 64), jnp.float32),
            mesh=mesh,
            num_microbatches=3,
        )


def test_qwen_pp_prefill_matches_sequential(devices8):
    """Qwen2.5-VL stretch (SURVEY §2.4): the 32B text decoder's prefill
    pipelined over 4 stages must equal the sequential stack. RoPE tables
    are per-position closures (identical across batch rows), so
    microbatching stays exact."""
    from multimodal_embeddings_tpu.models.qwen_vl import QwenBlock, QwenVLConfig

    cfg = QwenVLConfig.tiny().text
    block = QwenBlock(cfg, dtype=jnp.float32)
    L, width = 8, cfg.hidden
    # plain 1-D RoPE tables broadcast over the batch (text-only prefill)
    inv = 1.0 / (
        cfg.rope_theta
        ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim)
    )
    freqs = jnp.outer(jnp.arange(L, dtype=jnp.float32), inv)[None]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)

    x0 = jnp.zeros((1, L, width), jnp.float32)
    keys = jax.random.split(jax.random.key(7), 8)
    params = [
        unbox(block.init(k, x0, cos, sin))["params"] for k in keys
    ]

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8, L, width)).astype(np.float32))
    ref = x
    for p in params:
        ref, _ = block.apply({"params": p}, ref, cos, sin)

    mesh = make_pp_mesh(4, devices8)
    stacked = stack_layer_params(params, 4)
    out = pipeline_apply(
        lambda lp, h: block.apply({"params": lp}, h, cos, sin)[0],
        stacked,
        x,
        mesh=mesh,
        num_microbatches=4,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
