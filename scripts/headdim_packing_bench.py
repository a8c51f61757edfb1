"""Head-dim packing microbench (ROADMAP measured-candidate list).

The ViT-B attention runs 12 heads of head_dim=64; a (L,64)@(64,L) QK^T
contraction feeds only half the MXU's 128-deep systolic array. The
candidate "pack 2x64-wide heads per 128-lane register" cannot be a plain
reshape (concatenating two heads on the contraction dim sums their
scores); the only exact packing is BLOCK-DIAGONAL:

    Q_pair (L, 128) = [Q1 | Q2]
    K_blk  (128, 2L) = [[K1^T, 0], [0, K2^T]]
    S_pair (L, 2L)  = [S1 | S2]

which doubles the issued FLOPs (half multiply into zeros) in exchange for
full contraction depth — at best a wash by construction (2x work at 2x
utilization), plus the cost of materializing the zero-padded K. This
script measures, on chip:

  a. baseline batched QK^T at D=64 (the model's shape),
  b. the same total work at D=128 (utilization ceiling reference),
  c. the block-diagonal pairing,

so the candidate is closed with numbers rather than argument. Timing
follows CLAUDE.md: value-fetch barrier, not block_until_ready.

Reference shapes: ViT-B/16 @448 -> L=784+1 tokens, B=48 crops, H=12
(models/vision_encoder.py); reference hot path embedder.py:104-137.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _setup():
    import jax

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms:
        jax.config.update("jax_platforms", platforms + ",cpu")
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _time(fn, *args, iters=20) -> float:
    import jax

    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:2]  # warm + barrier
    start = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:2]
    return (time.perf_counter() - start) / iters * 1e3


def main() -> None:
    _setup()
    import jax
    import jax.numpy as jnp

    B, H, L, D = 48, 12, 785, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B * H, L, D)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B * H, L, D)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def qk_base(q, k):
        return jnp.einsum("bld,bmd->blm", q, k)

    # utilization ceiling: same batch/rows, contraction 128
    q128 = jnp.concatenate([q, q], axis=-1)
    k128 = jnp.concatenate([k, k], axis=-1)

    @jax.jit
    def qk_d128(q, k):
        return jnp.einsum("bld,bmd->blm", q, k)

    # block-diagonal head pairing: (B*H/2, L, 128) @ (B*H/2, 128, 2L)
    @jax.jit
    def qk_blockdiag(q, k):
        bh = q.shape[0]
        qp = q.reshape(bh // 2, 2, L, D)
        qp = jnp.concatenate([qp[:, 0], qp[:, 1]], axis=-1)  # (bh/2, L, 128)
        kp = k.reshape(bh // 2, 2, L, D)
        z = jnp.zeros_like(kp[:, 0])
        k_blk = jnp.concatenate(
            [
                jnp.concatenate([kp[:, 0], z], axis=-1),  # (bh/2, L, 128)
                jnp.concatenate([z, kp[:, 1]], axis=-1),
            ],
            axis=1,
        )  # (bh/2, 2L, 128)
        s = jnp.einsum("bld,bmd->blm", qp, k_blk)  # (bh/2, L, 2L)
        return s

    # exactness: block-diag must reproduce the baseline scores
    s_base = np.asarray(qk_base(q, k), np.float32)
    s_blk = np.asarray(qk_blockdiag(q, k), np.float32)
    s_blk = s_blk.reshape(B * H // 2, L, 2, L).transpose(0, 2, 1, 3).reshape(
        B * H, L, L
    )
    err = float(np.max(np.abs(s_base - s_blk)))
    assert err < 1e-2, err

    t_base = _time(qk_base, q, k)
    t_d128 = _time(qk_d128, q128, k128)
    t_blk = _time(qk_blockdiag, q, k)

    out = {
        "shape": f"B*H={B*H} L={L} D={D} bf16",
        "qk_d64_ms": round(t_base, 3),
        "qk_d128_same_rows_ms": round(t_d128, 3),
        "qk_blockdiag_pack_ms": round(t_blk, 3),
        "exactness_max_err": err,
        "note": "d128 does 2x the useful FLOPs of d64; if t_d128 ~= t_base "
        "the MXU is NOT contraction-depth-bound at D=64 and packing has no "
        "headroom; blockdiag is the only exact 128-deep packing and issues "
        "2x FLOPs by construction",
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "scripts", "headdim_packing_results.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
