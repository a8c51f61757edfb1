"""TPU microbench: LayerNorm-stats strategies at the serving shapes.

The chain-15 in-model A/B measured the row-chunked Pallas ln_stats kernel
a 2% LOSS at mme5 (0.7686 vs 0.7842) even though the trace attributes
~35% of mme5 device time to XLA's standalone LN-stats reduces running at
~18GB/s. Hypothesis: cross-LANE reductions are equally slow inside
Mosaic — both paths are VPU-shuffle-bound, not HBM-bound. This bench
measures the three in-kernel lane-sum strategies (kernels/ln_stats.py
_row_sum: reduce / chunk / dot) against the XLA reduce, standalone, at
the exact serving shapes.

Each timed program applies the stats op to K=8 pre-materialized copies of
the input and sums the outputs, so per-dispatch tunnel overhead amortizes
over 8 kernel invocations (the known small-program timing caveat);
timing uses a value fetch, not block_until_ready (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import sys as _sys

sys_path_root = __file__.rsplit("/", 2)[0]
if sys_path_root not in _sys.path:
    _sys.path.insert(0, sys_path_root)


def _setup():
    import jax

    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _time_fn(fn, *args, iters=20):
    out = fn(*args)
    _ = np.asarray(out.ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(out.ravel()[:2])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    _setup()
    import functools

    import jax
    import jax.numpy as jnp

    from multimodal_embeddings_tpu.kernels.ln_stats import ln_stats

    K = 8
    results = {}
    for label, (b, l, d) in {
        "mme5_8x1608x1280": (8, 1608, 1280),
        "vitb_48x784x768": (48, 784, 768),
    }.items():
        rng = np.random.default_rng(0)
        xs = jnp.asarray(
            rng.normal(size=(K, b, l, d)).astype(np.float32), jnp.bfloat16
        )

        def xla_stats(x):
            xf = x.astype(jnp.float32)
            m = jnp.mean(xf, axis=-1, keepdims=True)
            m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
            var = jnp.maximum(m2 - m * m, 0.0)
            return m, jax.lax.rsqrt(var + 1e-6)

        def build(stats_fn):
            @jax.jit
            def run(xs):
                acc = jnp.zeros((), jnp.float32)
                for i in range(K):
                    m, r = stats_fn(xs[i])
                    acc = acc + m.sum() + r.sum()
                return acc

            return run

        variants = {"xla_reduce": build(xla_stats)}
        for method in ("reduce", "chunk", "dot"):
            variants[f"pallas_{method}"] = build(
                functools.partial(ln_stats, method=method)
            )

        shape_res = {}
        gb = K * b * l * d * 2 / 1e9  # bf16 input read per program
        for name, fn in variants.items():
            try:
                t = _time_fn(fn, xs)
            except Exception as e:  # lowering failures are data too
                shape_res[name] = {"error": repr(e)[:200]}
                continue
            shape_res[name] = {
                "ms": round(t * 1e3, 3),
                "GB/s": round(gb / t, 1),
            }
            print(label, name, shape_res[name], flush=True)
        results[label] = shape_res

    out_path = os.path.join(os.path.dirname(__file__), "ln_stats_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
