"""Pipeline parallelism over a ``stage`` mesh axis (GPipe schedule).

SURVEY §2.4: the reference has no pipeline parallelism (single forward
models); PP is the scale-out path for the Qwen2.5-VL-32B stretch config,
whose decoder stack does not fit one chip even in bf16. The TPU-native
design is the standard shard_map + ``ppermute`` microbatch pipeline (the
"How to Scale Your Model" recipe): the layer stack is split into S
contiguous stages, stage s lives on mesh slice s, and activations hop
stage→stage over ICI with a collective permute once per tick. With M
microbatches the bubble fraction is (S−1)/(M+S−1).

Everything is static-shape and trace-once: the tick loop is a
``lax.scan`` over M+S−1 ticks; every stage computes every tick (on
padding during fill/drain — branchless, XLA-friendly) and the last
stage's outputs are collected in a local buffer, no gather collective
needed (the stage-sharded output of shard_map carries it home).

No counterpart in the reference (its multi-GPU story is replication:
``deprecated_package/embedder.py:190-224``); built to SURVEY §2.4's
"optional for Qwen-32B stretch" row.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

STAGE_AXIS = "stage"


def make_pp_mesh(n_stages: int, devices: Sequence | None = None) -> Mesh:
    """1-D (stage,) mesh over ``n_stages`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), (STAGE_AXIS,))


def stack_layer_params(layer_params: Sequence, n_stages: int):
    """Stack per-layer parameter pytrees into the (S, L/S, ...) layout that
    :func:`pipeline_apply` shards over the stage axis.

    ``layer_params`` is one pytree per layer (identical treedef); layers are
    assigned to stages contiguously (first L/S layers → stage 0, ...).
    """
    n_layers = len(layer_params)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    per = n_layers // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)
    return jax.tree.map(
        lambda a: a.reshape(n_stages, per, *a.shape[1:]), stacked
    )


def pipeline_apply(
    layer_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    num_microbatches: int,
    stage_axis: str = STAGE_AXIS,
):
    """Run a layer stack as an S-stage GPipe pipeline over ``mesh``.

    Args:
        layer_fn: ``layer_fn(one_layer_params, h) -> h`` — a single layer's
            forward on one microbatch (closure over any per-call constants:
            RoPE tables, masks, ...). Activations are a single array.
        stacked_params: pytree with leading dims ``(S, L/S, ...)`` (from
            :func:`stack_layer_params`), sharded over ``stage_axis``.
        x: global input batch ``(B, ...)``; ``B`` must be divisible by
            ``num_microbatches``.
        mesh: mesh containing ``stage_axis`` of size S.
        num_microbatches: M — pipeline depth utilization is M/(M+S−1).

    Returns:
        ``(B, ...)`` output batch, microbatch order preserved.
    """
    S = mesh.shape[stage_axis]
    M = num_microbatches
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    x_mb = x.reshape(M, B // M, *x.shape[1:])

    if S == 1:
        # degenerate pipeline: plain sequential scan over all layers
        flat = jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]), stacked_params)
        h, _ = jax.lax.scan(lambda hh, lp: (layer_fn(lp, hh), None), x, flat)
        return h

    def run_stage(params_local, h):
        # params_local: (1, L/S, ...) — this stage's contiguous layer slice
        p = jax.tree.map(lambda a: a[0], params_local)
        h, _ = jax.lax.scan(lambda hh, lp: (layer_fn(lp, hh), None), h, p)
        return h

    perm = [(i, i + 1) for i in range(S - 1)]

    def pipelined(params_local, x_all):
        stage_id = jax.lax.axis_index(stage_axis)
        mb_shape = x_all.shape[1:]
        # initial carries must already be device-varying over the stage
        # axis (shard_map VMA checking): their steady-state values differ
        # per stage
        recv0 = jax.lax.pcast(
            jnp.zeros(mb_shape, x_all.dtype), (stage_axis,), to="varying"
        )
        ybuf0 = jax.lax.pcast(
            jnp.zeros((M, *mb_shape), x_all.dtype), (stage_axis,), to="varying"
        )

        def tick(carry, t):
            recv, ybuf = carry
            # stage 0 pulls microbatch t from the input queue; later stages
            # consume what the previous stage handed over last tick
            x_t = jax.lax.dynamic_index_in_dim(
                x_all, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
            )
            inp = jnp.where(
                stage_id == 0,
                jax.lax.pcast(x_t, (stage_axis,), to="varying"),
                recv,
            )
            out = run_stage(params_local, inp)
            # last stage finished microbatch t-(S-1) this tick
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            write = (stage_id == S - 1) & (t >= S - 1)
            cur = jax.lax.dynamic_index_in_dim(ybuf, out_idx, 0, keepdims=False)
            ybuf = jax.lax.dynamic_update_index_in_dim(
                ybuf, jnp.where(write, out, cur), out_idx, 0
            )
            recv_next = jax.lax.ppermute(out, stage_axis, perm)
            return (recv_next, ybuf), None

        (_, ybuf), _ = jax.lax.scan(
            tick, (recv0, ybuf0), jnp.arange(M + S - 1)
        )
        # out_specs concatenates the per-stage buffers along axis 0; only
        # the last stage's block holds real outputs
        return ybuf

    out = jax.shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P(stage_axis), P()),
        out_specs=P(stage_axis),
    )(stacked_params, x_mb)
    # (S*M, mb, ...) → last stage's M microbatches
    y = out[(S - 1) * M :]
    return y.reshape(B, *x.shape[1:])


def pipeline_decode_step(
    layer_fn: Callable,
    stacked_params,
    state,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    stage_axis: str = STAGE_AXIS,
):
    """One autoregressive decode step through an S-stage pipeline.

    Decoding one token is inherently sequential across stages (token t+1
    cannot enter stage 0 before token t leaves the sampler), so PP decode
    buys FIT, not speed: each stage holds its layer slice and that
    slice's KV caches; the hidden state hops the stage ring once.

    Args:
        layer_fn: ``layer_fn(one_layer_params, one_layer_state, h) ->
            (h, new_layer_state)`` — e.g. a cached-attention decoder
            block (closure over RoPE tables / the cache position).
        stacked_params: pytree with leading dims ``(S, L/S, ...)``.
        state: pytree with leading dims ``(S, L/S, ...)`` — per-layer
            recurrent state (KV caches), stage-sharded like the params.
        x: ``(B, ...)`` decode-step activations for the whole batch.

    Returns:
        ``(y, new_state)`` — the last stage's output and the updated
        state (same structure/sharding as ``state``).
    """
    S = mesh.shape[stage_axis]

    if S == 1:
        flat_p = jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]), stacked_params)
        flat_s = jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]), state)
        y, new_s = jax.lax.scan(
            lambda h, ps: layer_fn(ps[0], ps[1], h), x, (flat_p, flat_s)
        )
        new_s = jax.tree.map(
            lambda a, ref: a.reshape(ref.shape), new_s, state
        )
        return y, new_s

    perm = [(i, i + 1) for i in range(S - 1)]

    def pipelined(params_local, state_local, x_all):
        stage_id = jax.lax.axis_index(stage_axis)
        p = jax.tree.map(lambda a: a[0], params_local)
        s0 = jax.tree.map(lambda a: a[0], state_local)

        def tick(carry, t):
            recv, st = carry
            inp = jnp.where(
                stage_id == 0,
                jax.lax.pcast(x_all, (stage_axis,), to="varying"),
                recv,
            )
            h, scanned = jax.lax.scan(
                lambda hh, ps: layer_fn(ps[0], ps[1], hh), inp, (p, st)
            )
            # commit state only on this stage's active tick (other ticks
            # ran on garbage activations)
            active = t == stage_id
            st = jax.tree.map(
                lambda n, o: jnp.where(active, n, o), scanned, st
            )
            recv_next = jax.lax.ppermute(h, stage_axis, perm)
            return (recv_next, st), h

        recv0 = jax.lax.pcast(
            jnp.zeros_like(x_all), (stage_axis,), to="varying"
        )
        (_, st), hs = jax.lax.scan(tick, (recv0, s0), jnp.arange(S))
        # hs[t] is this stage's output at tick t; the final answer is the
        # LAST stage's output at the LAST tick — stage-concatenated out
        # lets the caller read it without a collective
        new_state = jax.tree.map(lambda a: a[None], st)
        return hs[S - 1][None], new_state

    out, new_state = jax.shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P(stage_axis), P(stage_axis), P()),
        out_specs=(P(stage_axis), P(stage_axis)),
    )(stacked_params, state, x)
    return out[S - 1], new_state
