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


def test_pipeline_decode_step_with_kv_caches(devices8):
    """Cached autoregressive decode through the stage ring: 4 QwenBlocks
    over 2 stages, per-stage KV caches. Three decode steps must match the
    sequential stack exactly (hidden states AND cache contents)."""
    from multimodal_embeddings_tpu.models.qwen_vl import QwenBlock, QwenVLConfig
    from multimodal_embeddings_tpu.parallel.pipeline import (
        pipeline_decode_step,
    )

    cfg = QwenVLConfig.tiny().text
    block = QwenBlock(cfg, dtype=jnp.float32)
    n_layers, n_stages, B, maxlen = 4, 2, 2, 8
    width = cfg.hidden

    inv = 1.0 / (
        cfg.rope_theta
        ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim)
    )

    def tables(pos):
        f = (jnp.full((B, 1), float(pos)) * inv[None]).reshape(B, 1, -1)
        return jnp.cos(f), jnp.sin(f)

    cos0, sin0 = tables(0)
    x0 = jnp.zeros((B, 1, width), jnp.float32)
    zero_cache = (
        jnp.zeros((B, maxlen, cfg.kv_heads, cfg.head_dim), jnp.float32),
        jnp.zeros((B, maxlen, cfg.kv_heads, cfg.head_dim), jnp.float32),
    )
    keys = jax.random.split(jax.random.key(11), n_layers)
    params = [
        unbox(block.init(k, x0, cos0, sin0, cache=zero_cache, position=0))[
            "params"
        ]
        for k in keys
    ]

    rng = np.random.default_rng(9)
    mesh = make_pp_mesh(n_stages, devices8)
    stacked = stack_layer_params(params, n_stages)

    # sequential reference state: list of per-layer caches
    seq_caches = [zero_cache for _ in range(n_layers)]
    # pipelined state: same caches stacked to (S, L/S, ...)
    pp_state = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape(
            n_stages, n_layers // n_stages, *xs[0].shape
        ),
        *seq_caches,
    )

    for pos in range(3):
        cos, sin = tables(pos)
        h = jnp.asarray(rng.normal(size=(B, 1, width)).astype(np.float32))

        ref = h
        new_seq = []
        for p, cache in zip(params, seq_caches):
            ref, c2 = block.apply(
                {"params": p}, ref, cos, sin, cache=cache, position=pos
            )
            new_seq.append(c2)
        seq_caches = new_seq

        def layer_fn(lp, cache, hh, cos=cos, sin=sin, pos=pos):
            return block.apply(
                {"params": lp}, hh, cos, sin, cache=cache, position=pos
            )

        out, pp_state = pipeline_decode_step(
            layer_fn, stacked, pp_state, h, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5,
            err_msg=f"step {pos}",
        )

    # cache contents identical after 3 steps
    ref_stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape(
            n_stages, n_layers // n_stages, *xs[0].shape
        ),
        *seq_caches,
    )
    for a, b in zip(jax.tree.leaves(pp_state), jax.tree.leaves(ref_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pp_greedy_generate_matches_single_device(devices8):
    """Full 32B-serving assembly on the tiny config: prefill + cached
    greedy decode through the 2-stage ring must reproduce the
    single-device greedy_generate token-for-token."""
    from multimodal_embeddings_tpu.models.qwen_pp import pp_greedy_generate
    from multimodal_embeddings_tpu.models.qwen_vl import (
        QwenVLConfig,
        QwenVLModel,
        greedy_generate,
    )

    config = QwenVLConfig.tiny()
    model = QwenVLModel(config, dtype=jnp.float32)
    rng = np.random.default_rng(21)
    # avoid the image-pad id (5) — text-only prompts
    prompt = rng.integers(10, config.text.vocab_size, (2, 6)).astype(np.int32)

    variables = unbox(model.init(jax.random.key(3), jnp.asarray(prompt)))
    ref = greedy_generate(
        model, variables, prompt, images=None, max_new_tokens=4
    )

    mesh = make_pp_mesh(2, devices8)
    got = pp_greedy_generate(
        config,
        variables,
        prompt,
        mesh=mesh,
        n_stages=2,
        max_new_tokens=4,
    )
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_pp_greedy_generate_multimodal(devices8):
    """Multimodal prompts through the ring (the notebook's actual 32B
    workload: page image + chat prompt): the vision tower runs before
    stage 0 and its tokens are spliced into the image-pad slots, M-RoPE
    streams use the merged grid — token output must equal the
    single-device multimodal greedy_generate."""
    from multimodal_embeddings_tpu.models.qwen_pp import pp_greedy_generate
    from multimodal_embeddings_tpu.models.qwen_vl import (
        QwenVLConfig,
        QwenVLModel,
        greedy_generate,
    )

    config = QwenVLConfig.tiny()
    model = QwenVLModel(config, dtype=jnp.float32)
    unit = config.vision.patch_size * config.vision.merge_size
    size = unit * 2  # merged grid 2x2 → 4 vision tokens
    rng = np.random.default_rng(31)
    images = rng.random((1, size, size, 3)).astype(np.float32)
    prompt = np.concatenate(
        [
            rng.integers(10, config.text.vocab_size, (1, 3)),
            np.full((1, 4), config.image_pad_id),
            rng.integers(10, config.text.vocab_size, (1, 3)),
        ],
        axis=1,
    ).astype(np.int32)

    variables = unbox(
        model.init(jax.random.key(3), jnp.asarray(prompt), jnp.asarray(images))
    )
    ref = greedy_generate(
        model, variables, prompt, images=images, max_new_tokens=4
    )

    mesh = make_pp_mesh(2, devices8)
    got = pp_greedy_generate(
        config,
        variables,
        prompt,
        mesh=mesh,
        n_stages=2,
        max_new_tokens=4,
        images=images,
    )
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_pp_greedy_generate_quantized(devices8):
    """The 32B serving plan: int8 weights through the PP ring. The pipelined
    int8 decode must reproduce the single-device int8 greedy_generate
    token-for-token (same kernels, same rounding)."""
    import dataclasses

    from multimodal_embeddings_tpu.models.qwen_pp import pp_greedy_generate
    from multimodal_embeddings_tpu.models.quantized import quantize_dense_tree
    from multimodal_embeddings_tpu.models.qwen_vl import (
        QwenVLConfig,
        QwenVLModel,
        greedy_generate,
    )

    config = QwenVLConfig.tiny()
    qconfig = dataclasses.replace(config, quantize=True)
    model = QwenVLModel(config, dtype=jnp.float32)
    qmodel = QwenVLModel(qconfig, dtype=jnp.float32)
    rng = np.random.default_rng(23)
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

    ref = greedy_generate(qmodel, qvars, prompt, images=None, max_new_tokens=4)
    mesh = make_pp_mesh(2, devices8)
    got = pp_greedy_generate(
        qconfig, qvars, prompt, mesh=mesh, n_stages=2, max_new_tokens=4
    )
    np.testing.assert_array_equal(got, np.asarray(ref))
