"""Integrated Pallas-conv measurement on the detect path (round-3 item 1).

The full fused detect+embed program with the Pallas convs took the remote
compiler >40 min (tunnel died); this measures the SAME integration in two
much smaller programs instead:

  stage  — the G2L_CRM stage alone at the hot shapes (c2f_2: 30x256^2x96
           with 48-ch inner convs; c2f_3: 30x128^2x192 with 96-ch inner),
           XLA vs Pallas path, params passed as jit arguments;
  detect — the whole detector forward + decode over the 30-view batch
           (detect-only: the embedder half of the fused program is
           unchanged by the conv strategy).

Prints one JSON line per measurement. Run variants via --mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup():
    import jax

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and "cpu" not in platforms:
        jax.config.update("jax_platforms", platforms + ",cpu")
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fetch_tiny(out):
    """Completion barrier via a SMALL value fetch: block_until_ready is not
    a barrier over the axon tunnel (CLAUDE.md), and np.asarray of the full
    output would download hundreds of MB — slice two elements ON DEVICE and
    download only those."""
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[:2])


def _time_fn(fn, *args, iters=10):
    out = fn(*args)
    _fetch_tiny(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch_tiny(out)
    return (time.perf_counter() - t0) / iters


import jax  # noqa: E402  (after _setup-able import guard)


def bench_stage(pallas: bool, batch=30, size=256, ch=96, n=2):
    import jax.numpy as jnp
    import numpy as np
    from flax.linen import unbox

    from multimodal_embeddings_tpu.models.layers import G2L_CRM

    mod = G2L_CRM(
        ch, n=n, dilation=2, shortcut=True,
        pallas_max_channels=ch if pallas else 0, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(batch, size, size, ch)).astype(np.float32),
        jnp.bfloat16,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        variables = unbox(
            mod.init(jax.random.PRNGKey(0), np.zeros_like(np.asarray(x[:1])))
        )
    variables = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), variables)

    @jax.jit
    def fwd(v, x):
        return mod.apply(v, x, train=False)

    dt = _time_fn(fwd, variables, x)
    return {"mode": "stage", "pallas": pallas, "batch": batch, "size": size,
            "ch": ch, "ms": round(dt * 1e3, 3)}


def bench_detect(pallas_convs: int, views=30, size=1024, pallas_mode="stage",
                 closure=False):
    import jax.numpy as jnp
    import numpy as np

    from multimodal_embeddings_tpu.config import DetectorConfig
    from multimodal_embeddings_tpu.models.detector import LayoutDetector
    from multimodal_embeddings_tpu.models.yolo_decode import decode_predictions

    cfg = DetectorConfig(
        image_size=size,
        variant="m",
        pallas_convs=pallas_convs,
        pallas_mode=pallas_mode,
    )
    det = LayoutDetector(cfg, dtype=jnp.bfloat16)
    variables = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a)), det.variables
    )
    model = det.model

    def _fwd(v, x):
        outputs = model.apply(v, x, train=False)
        d = decode_predictions(outputs, max_det=cfg.max_detections,
                               conf_threshold=cfg.conf_threshold,
                               iou_threshold=cfg.iou_threshold, with_nms=True)
        return d.boxes, d.scores

    if closure:
        # The headline program inlines the detector tree as closure
        # constants so XLA folds BN scales into the conv weights — the
        # args-mode XLA control may therefore be a WEAKER baseline than
        # the headline's real detect portion. This mode reproduces the
        # headline's weight treatment for a like-for-like conv A/B.
        fwd = jax.jit(lambda x: _fwd(variables, x))
        args = ()
    else:
        fwd = jax.jit(_fwd)
        args = (variables,)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(0, 1, (views, size, size, 3)).astype(np.float32)
    )
    dt = _time_fn(fwd, *args, x, iters=5)
    return {"mode": "detect", "pallas_convs": pallas_convs, "views": views,
            "ms": round(dt * 1e3, 2), "closure_weights": bool(closure),
            "pages_per_sec_detect_only": round(1.0 / dt, 3)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--mode", required=True,
        choices=["stage48", "stage48-xla", "stage96", "stage96-xla",
                 "detect0", "detect48", "detect96",
                 "detect48-block", "detect96-block",
                 "detect0-closure", "detect48-closure", "detect96-closure"],
    )
    args = parser.parse_args()
    _setup()
    if args.mode.startswith("stage48"):
        out = bench_stage("xla" not in args.mode, batch=30, size=256, ch=96, n=2)
    elif args.mode.startswith("stage96"):
        out = bench_stage("xla" not in args.mode, batch=30, size=128, ch=192, n=4)
    else:
        spec = args.mode.replace("detect", "")
        closure = spec.endswith("-closure")
        spec = spec.replace("-closure", "")
        pallas_mode = "block" if spec.endswith("-block") else "stage"
        out = bench_detect(
            int(spec.replace("-block", "")), pallas_mode=pallas_mode,
            closure=closure,
        )
        out["pallas_mode"] = pallas_mode
    print(json.dumps(out))


if __name__ == "__main__":
    main()
