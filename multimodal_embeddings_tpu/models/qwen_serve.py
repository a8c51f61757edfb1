"""Continuous-batching greedy serving for the Qwen2.5-VL parse surface.

The reference notebook (``qwen_html_parse.ipynb`` cell ``d43bacc8``)
parses one page per ``model.generate`` call. Batched decode
(``qwen_vl.build_generate_fns``) already amortizes the weight stream
over B pages, but a batch exits at its SLOWEST row: the measured
ragged-EOS upside of the early-stop while_loop tracks max(row stops),
not the mean (r5-04: −12.4% wall at a 128..896 stop distribution where
per-row exit could reach ~−50%). Continuous batching closes that gap
the TPU-native way — with static shapes and three compiled programs:

- ``decode_chunk``: a fixed-shape B-row greedy decoder with PER-ROW
  cache depths (``QwenVLModel.decode_step`` with a (B,) position
  vector), run C steps per call as one ``lax.scan`` so the host syncs
  once per C tokens instead of once per token.
- ``prefill1``: single-page prefill producing a full-depth KV cache row.
- ``splice_row``: row-scatter of a freshly prefilled page into a retired
  row of the live batch state (KV caches, carry token, per-row clock).

Rows never wait for each other: when a row emits EOS (or hits
``max_new_tokens``) the host retires it at the next chunk boundary and
splices the next queued page into its slot. Shapes never change, so
each program compiles exactly once per (batch, prompt, chunk) bucket.

Stop injection (the ``stops`` argument) mirrors ``build_generate_fns``'s
``force_steps`` measurement knob: synthetic random weights never emit a
real EOS, so honest wall-clock comparisons inject a seeded per-page stop
distribution; token output is identical to the one-shot decoders under
the same injection (test-locked in ``tests/test_qwen_serve.py``).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_embeddings_tpu.models.qwen_vl import QwenVLModel

_SERVE_CACHE: dict = {}


def build_continuous_fns(
    model: QwenVLModel,
    batch: int,
    prompt_len: int,
    max_new_tokens: int,
    chunk: int,
):
    """Jitted (prefill1, splice_row, decode_chunk, init_state) for
    continuous batching.

    All three hot functions take the parameter tree as their first
    argument (closed-over multi-GB trees inline into the HLO as
    constants and kill the remote compiler — CLAUDE.md). State is a
    dict pytree:

    - ``token`` (B,) int32 — the carry token, output position ``t``
    - ``t`` (B,) int32 — per-row output clock (position of ``token``)
    - ``done`` (B,) bool — row has emitted EOS
    - ``stops`` (B,) int32 — per-row injected stop (``max_new+1`` = off)
    - ``delta`` (B,) int32 — per-row M-RoPE delta
    - ``caches`` — per-layer (K, V) static caches, (B, S, kvh, d)

    ``decode_chunk`` emits (C, B) tokens at per-row output positions
    ``t+1 .. t+C`` (position 0 — the prefill argmax — is returned by
    ``splice_row`` instead). Done rows idle in place emitting EOS; their
    cache writes land on the clamped last slot and stay invisible (the
    per-row mask shows slots ``<= pos`` only, and a respliced row's
    depth restarts at ``prompt_len``).
    """
    cfg = model.config.text
    eos = model.config.eos_id
    cache_len = min(
        cfg.max_len, -(-(prompt_len + max_new_tokens) // 128) * 128
    )

    @jax.jit
    def prefill1(variables, tokens, imgs):
        logits, caches, delta = model.apply(
            variables, tokens, imgs, cache_len=cache_len, last_only=True
        )
        return logits[:, -1], caches, delta

    @jax.jit
    def splice_row(state, row, last_logits, new_caches, new_delta, stop):
        first = jnp.argmax(last_logits[0], axis=-1).astype(jnp.int32)
        first = jnp.where(stop <= 0, eos, first)
        caches = [
            (
                jax.lax.dynamic_update_slice(
                    k, nk.astype(k.dtype), (row, 0, 0, 0)
                ),
                jax.lax.dynamic_update_slice(
                    v, nv.astype(v.dtype), (row, 0, 0, 0)
                ),
            )
            for (k, v), (nk, nv) in zip(state["caches"], new_caches)
        ]
        new_state = {
            "token": state["token"].at[row].set(first),
            "t": state["t"].at[row].set(0),
            "done": state["done"].at[row].set(first == eos),
            "stops": state["stops"].at[row].set(stop),
            "delta": state["delta"].at[row].set(new_delta[0]),
            "caches": caches,
        }
        return new_state, first

    def _step(variables, token, t, done, stops, delta, caches):
        pos = prompt_len + jnp.minimum(t, max_new_tokens - 1)
        logits, caches = model.apply(
            variables,
            token[:, None],
            caches,
            pos,
            delta,
            method=model.decode_step,
        )
        next_token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        next_token = jnp.where(t + 1 >= stops, eos, next_token)
        next_token = jnp.where(done, eos, next_token)
        done = done | (next_token == eos)
        return next_token, t + 1, done, caches

    @jax.jit
    def decode_chunk(variables, state):
        def step(carry, _):
            token, t, done, stops, delta, caches = carry
            next_token, t, done, caches = _step(
                variables, token, t, done, stops, delta, caches
            )
            return (
                next_token, t, done, stops, delta, caches
            ), next_token

        carry = (
            state["token"], state["t"], state["done"], state["stops"],
            state["delta"], state["caches"],
        )
        carry, emitted = jax.lax.scan(step, carry, None, length=chunk)
        token, t, done, stops, delta, caches = carry
        return {
            "token": token, "t": t, "done": done, "stops": stops,
            "delta": delta, "caches": caches,
        }, emitted, jnp.int32(chunk)

    @jax.jit
    def decode_chunk_exit(variables, state, want_exit):
        """Like ``decode_chunk`` but exits as soon as any row that was
        ACTIVE at entry finishes (``lax.while_loop``; rows already done
        at entry — retired rows idling on an empty queue — don't
        trigger). ``want_exit=False`` disables the early exit without a
        recompile (the host passes it when the page queue is empty and a
        refill couldn't happen anyway). Returns the number of steps
        actually run; emitted slots beyond it are unwritten filler the
        host must discard."""
        done0 = state["done"]
        out0 = jnp.full((chunk, done0.shape[0]), eos, jnp.int32)

        def cond(carry):
            i, _, _, done, _, _ = carry
            no_new = ~jnp.any(done & ~done0)
            # all-done rows can only emit EOS padding — stop regardless
            # of want_exit (saves the drain-phase tail after the last
            # active row finishes)
            return (i < chunk) & ~jnp.all(done) & (no_new | ~want_exit)

        def body(carry):
            i, token, t, done, caches, out = carry
            next_token, t, done, caches = _step(
                variables, token, t, done, state["stops"],
                state["delta"], caches,
            )
            out = jax.lax.dynamic_update_slice_in_dim(
                out, next_token[None], i, axis=0
            )
            return i + 1, next_token, t, done, caches, out

        init = (
            jnp.int32(0), state["token"], state["t"], state["done"],
            state["caches"], out0,
        )
        i, token, t, done, caches, out = jax.lax.while_loop(
            cond, body, init
        )
        return {
            "token": token, "t": t, "done": done,
            "stops": state["stops"], "delta": state["delta"],
            "caches": caches,
        }, out, i

    def init_state():
        kvd = jnp.dtype(cfg.kv_dtype)
        caches = [
            (
                jnp.zeros(
                    (batch, cache_len, cfg.kv_heads, cfg.head_dim), kvd
                ),
                jnp.zeros(
                    (batch, cache_len, cfg.kv_heads, cfg.head_dim), kvd
                ),
            )
            for _ in range(cfg.layers)
        ]
        return {
            "token": jnp.full((batch,), eos, jnp.int32),
            "t": jnp.zeros((batch,), jnp.int32),
            "done": jnp.ones((batch,), bool),
            "stops": jnp.full((batch,), max_new_tokens + 1, jnp.int32),
            "delta": jnp.zeros((batch,), jnp.int32),
            "caches": caches,
        }

    return (
        prefill1, splice_row, decode_chunk, decode_chunk_exit, init_state
    )


def continuous_generate(
    model: QwenVLModel,
    variables,
    pages: Sequence[Tuple[np.ndarray, Optional[np.ndarray]]],
    batch: int,
    max_new_tokens: int,
    chunk: int = 64,
    stops: Optional[Sequence[int]] = None,
    stats: Optional[Dict[str, Any]] = None,
    early_exit: bool = True,
) -> List[np.ndarray]:
    """Parse ``pages`` through a continuously refilled B-row decoder.

    ``pages`` is a list of ``(token_ids, images)`` with IDENTICAL shapes
    (bucket by smart-resize grid first, as ``DocumentParser.parse_batch``
    does); ``stops`` optionally injects a per-page EOS position (the
    measurement knob — omit for real decoding). Returns one
    ``(max_new_tokens,)`` EOS-padded int32 array per page, in page
    order — token-identical to the one-shot ``build_generate_fns``
    decoders under the same injection. ``stats`` (optional dict) gets
    ``decode_steps`` / ``chunks`` / ``wall_s`` / ``splice_s`` filled in.

    ``early_exit=True`` (default) runs chunks as a ``lax.while_loop``
    that returns to the host as soon as a row finishes, so the refill
    happens immediately instead of after up to ``chunk-1`` wasted idle
    steps (measured r5-08: chunk-tail waste was 640 of 2688 steps at
    chunk 64). ``early_exit=False`` is the fixed ``lax.scan`` chunk —
    fewer host syncs, more tail waste. Tokens are identical either way.
    """
    if not pages:
        return []
    eos = model.config.eos_id
    tok0 = np.asarray(pages[0][0])
    prompt_len = tok0.shape[-1]
    img0 = pages[0][1]
    img_shape = None if img0 is None else tuple(np.shape(img0))[-3:]
    key = (
        id(model), batch, prompt_len, max_new_tokens, chunk, img_shape,
    )
    fns = _SERVE_CACHE.get(key)
    if fns is None:
        fns = build_continuous_fns(
            model, batch, prompt_len, max_new_tokens, chunk
        )
        _SERVE_CACHE[key] = fns
    prefill1, splice_row, decode_chunk, decode_chunk_exit, init_state = fns

    state = init_state()
    outputs: List[Optional[np.ndarray]] = [None] * len(pages)
    collected: Dict[int, List[Any]] = {}
    active: Dict[int, int] = {}  # row -> page index
    free = list(range(batch))
    next_page = 0
    n_steps = 0
    n_chunks = 0
    splice_s = 0.0
    t0 = time.perf_counter()

    def finalize(row: int) -> None:
        pid = active.pop(row)
        # element 0 is the splice's device scalar (never fetched eagerly
        # — one fewer tunnel round trip per page); the rest are host ints
        toks = [int(x) for x in collected.pop(row)[:max_new_tokens]]
        out = np.full((max_new_tokens,), eos, np.int32)
        out[: len(toks)] = toks
        outputs[pid] = out
        free.append(row)

    def refill() -> None:
        nonlocal state, next_page, splice_s
        while free and next_page < len(pages):
            ts = time.perf_counter()
            row = free.pop()
            pid = next_page
            next_page += 1
            toks, imgs = pages[pid]
            toks = np.asarray(toks).reshape(1, prompt_len)
            imgs_j = None if imgs is None else jnp.asarray(
                np.asarray(imgs).reshape((1,) + img_shape)
            )
            last, caches_new, delta_new = prefill1(
                variables, jnp.asarray(toks), imgs_j
            )
            stop = (
                max_new_tokens + 1 if stops is None else int(stops[pid])
            )
            state, first = splice_row(
                state, row, last, caches_new, delta_new, stop
            )
            # keep ``first`` as a device scalar; an instant-EOS row
            # resolves at the next chunk sync via its done flag
            collected[row] = [first]
            active[row] = pid
            splice_s += time.perf_counter() - ts

    refill()
    while active:
        if early_exit:
            want = jnp.bool_(next_page < len(pages))
            state, emitted, steps = decode_chunk_exit(
                variables, state, want
            )
        else:
            state, emitted, steps = decode_chunk(variables, state)
        n_chunks += 1
        # ONE host sync per chunk: emitted tokens, per-row clocks, done
        # flags and the executed-step count travel in a single fetch
        em, t_np, done_np, steps_run = jax.device_get(
            (emitted, state["t"], state["done"], steps)
        )
        steps_run = int(steps_run)
        n_steps += steps_run
        for row in list(active):
            collected[row].extend(int(x) for x in em[:steps_run, row])
            if done_np[row] or t_np[row] >= max_new_tokens - 1:
                finalize(row)
        refill()

    if stats is not None:
        stats["decode_steps"] = n_steps
        stats["chunks"] = n_chunks
        stats["wall_s"] = time.perf_counter() - t0
        stats["splice_s"] = splice_s
        stats["batch"] = batch
        stats["chunk"] = chunk
        stats["early_exit"] = early_exit
    return outputs  # type: ignore[return-value]
