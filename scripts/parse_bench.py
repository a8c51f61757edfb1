"""Parse-surface TPU benchmark: Qwen2.5-VL page→HTML generation rates.

The reference notebook's user-visible capability is
``model.generate(max_new_tokens=1024)`` producing QwenVL HTML (cell
``d43bacc8`` of ``/root/reference/QWEN2_5_document_parsing.ipynb``) — the
one SURVEY capability with no TPU perf evidence through round 3. This
measures it: prefill latency, decode tokens/sec, and pages/hour for the
notebook's 1024-token generation, at the sizes that fit one chip
(3B bf16, 7B-int8).

The whole greedy loop is ONE on-device ``lax.scan`` program
(``models/qwen_vl.py::build_generate_fns``) and weights travel as jit
ARGUMENTS — a per-token host loop through the axon tunnel would pay the
~4ms dispatch floor 1024×, and closed-over multi-GB trees kill the
remote compiler (CLAUDE.md).

Decode-rate note: the ``done`` flag only pins output tokens to EOS; the
scan always executes ``max_new_tokens`` steps, so the measured decode
time is independent of what the (synthetic-weight) model emits —
capacity/latency-faithful like every synthetic init here.

Run:  python scripts/parse_bench.py --size 3b [--native] [--record]
      python scripts/parse_bench.py --size 7b-int8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_PAGES = "/root/reference/newspaper_images"


def _setup(force_cpu: bool = False):
    import jax

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if force_cpu:
        # JAX_PLATFORMS is force-preset to axon pre-import (CLAUDE.md) and
        # merely loading the plugin holds the TPU lock — smoke runs must
        # drop it via config, not env
        jax.config.update("jax_platforms", "cpu")
    elif platforms and "cpu" not in platforms:
        # keep the host CPU backend available for parameter init
        jax.config.update("jax_platforms", platforms + ",cpu")
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _pick_page(explicit: str | None) -> str | None:
    if explicit:
        return explicit
    if os.path.isdir(REFERENCE_PAGES):
        from multimodal_embeddings_tpu.io.images import get_image_paths

        paths = get_image_paths(REFERENCE_PAGES)
        if paths:
            return paths[0]
    return None


def build_model_and_variables(size: str):
    """Model + synthetic weights WITHOUT touching the TPU for init:
    quantized trees come straight from eval_shape (numpy), bf16 trees from
    a host-CPU init cast down (the 3B f32 twin is ~15GB host RAM,
    fine; it must never be the jit-closure route)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax.linen as fnn

    from multimodal_embeddings_tpu.models.qwen_vl import (
        QwenVLConfig,
        QwenVLModel,
    )

    import dataclasses as _dc

    config = {
        "tiny": QwenVLConfig.tiny,
        "tiny-int8": lambda: _dc.replace(QwenVLConfig.tiny(), quantize=True),
        "3b": QwenVLConfig.qwen25_vl_3b,
        "3b-int8": QwenVLConfig.qwen25_vl_3b_int8,
        "3b-int4": QwenVLConfig.qwen25_vl_3b_int4,
        "7b": QwenVLConfig.qwen25_vl_7b,
        "7b-int8": QwenVLConfig.qwen25_vl_7b_int8,
        "32b-int4": QwenVLConfig.qwen25_vl_32b_int4,
    }[size]()
    model = QwenVLModel(config)

    unit = config.vision.patch_size * config.vision.merge_size
    ids = np.ones((1, 8), np.int32)
    imgs = np.zeros((1, unit * 2, unit * 2, 3), np.float32)

    if config.quantize:
        from multimodal_embeddings_tpu.models.quantized import (
            synthetic_int8_init,
        )

        variables = fnn.unbox(synthetic_int8_init(model, (ids, imgs)))
    else:
        from multimodal_embeddings_tpu.models.weights import init_on_host

        variables = fnn.unbox(
            init_on_host(
                lambda: model.init(jax.random.PRNGKey(0), ids, imgs)
            )
        )
        # store bf16: the model computes in bf16 anyway and a 3B f32
        # argument tree wastes HBM + transfer
        variables = jax.tree.map(
            lambda x: np.asarray(x).astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == np.float32
            else x,
            variables,
        )
    return model, variables


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--size", default="3b",
        choices=["tiny", "tiny-int8", "3b", "3b-int8", "3b-int4", "7b",
                 "7b-int8", "32b-int4"],
    )
    parser.add_argument(
        "--batch", type=int, default=1,
        help="pages per generate program: decode is weight-streaming bound "
        "at batch 1 (9.0 ms/token = the 3B tree's HBM read), so B pages in "
        "one scan amortize the stream ~B× (DocumentParser.parse_batch is "
        "the user surface)",
    )
    parser.add_argument("--image_size", type=int, default=448)
    parser.add_argument(
        "--native", action="store_true",
        help="notebook-fidelity native resolution: smart_resize the page "
        "into the HF default 1280*28*28 pixel budget instead of a fixed "
        "square",
    )
    parser.add_argument(
        "--prefill_chunk", type=int, default=0,
        help="prefill C pages at a time (token-identical) so the decode "
        "batch can exceed what one whole-batch prefill's attention-logits "
        "transient fits (0 = whole-batch prefill)",
    )
    parser.add_argument(
        "--early_stop", action="store_true",
        help="time the lax.while_loop early-stop decode (the CLI default "
        "path) instead of the fixed scan: with synthetic weights EOS "
        "never fires, so this measures the while_loop's WORST-CASE "
        "overhead vs scan; the ragged-page upside is then "
        "(max_new - longest_row) x the measured per-step cost",
    )
    parser.add_argument(
        "--eos_ragged", default=None, metavar="SPEC",
        help="inject a synthetic ragged EOS distribution (random weights "
        "never emit a real EOS): per-row forced stop positions, either an "
        "explicit comma list ('128,256,512,1024') or 'linspace:LO:HI' "
        "spread across the batch. Run with AND without --early_stop at "
        "the same SPEC to measure the while_loop's real exit upside "
        "(token output is identical; the while_loop exits at "
        "max(force_steps), the scan always runs max_new_tokens steps)",
    )
    parser.add_argument(
        "--continuous", type=int, default=0, metavar="PAGES",
        help="serve PAGES pages through the continuous-batching loop "
        "(models/qwen_serve.py): a fixed --batch-row decoder with per-row "
        "cache depths, refilled at --chunk-step boundaries as rows emit "
        "EOS. Combine with --eos_ragged (stops tile cyclically across "
        "pages) to measure the per-row-exit upside over the batch "
        "early-stop decode, whose wall tracks max(row stops)",
    )
    parser.add_argument(
        "--chunk", type=int, default=64,
        help="decode steps per host sync in --continuous mode",
    )
    parser.add_argument(
        "--cont_scan", action="store_true",
        help="use the fixed lax.scan chunk in --continuous mode instead "
        "of the early-exit while_loop (A/B: tail-waste vs per-step exit "
        "check; tokens identical)",
    )
    parser.add_argument("--max_new_tokens", type=int, default=1024)
    parser.add_argument("--page", default=None)
    parser.add_argument("--iters", type=int, default=2)
    parser.add_argument(
        "--record", action="store_true",
        help="merge this result into BENCH_PARSE.json keyed by config",
    )
    parser.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of one timed prefill+decode "
        "iteration into DIR (feed to utils/trace_analysis.py)",
    )
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the host CPU backend (smoke runs must not hold the "
        "TPU tunnel lock)",
    )
    args = parser.parse_args()
    _setup(force_cpu=args.cpu)

    import numpy as np
    from PIL import Image

    from multimodal_embeddings_tpu.analysis.doc_parser import (
        DocumentParser,
        preprocess_page,
        smart_resize,
        round_to_patch_grid,
    )
    from multimodal_embeddings_tpu.models.qwen_vl import build_generate_fns
    from multimodal_embeddings_tpu.models.tokenizer import ByteTokenizer

    t0 = time.perf_counter()
    model, variables = build_model_and_variables(args.size)
    init_s = time.perf_counter() - t0

    # Upload the weight tree to the device ONCE before timing. Without
    # this the tree is host numpy and EVERY prefill/decode call re-streams
    # the full multi-GB tree through the axon tunnel (~35MB/s): the first
    # recorded 3b run measured 173.9s "prefill" and 157.9 ms/token
    # "decode" — both ≈ the 6GB tree's tunnel-transfer time, not device
    # speed. numpy → jnp.asarray (never cross-backend device_put, which
    # hangs over the tunnel — CLAUDE.md).
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    variables = jax.tree.map(
        lambda x: x if isinstance(x, jax.Array)
        else jnp.asarray(np.asarray(x)),
        variables,
    )
    upload_s = time.perf_counter() - t0  # approximate: transfers may
    # still be in flight; the compile/warm call below consumes them
    # before the timed loop starts

    cfg = model.config
    unit = cfg.vision.patch_size * cfg.vision.merge_size
    max_new = args.max_new_tokens
    if args.size.startswith("tiny"):
        args.image_size = unit * 2
        max_new = min(max_new, 16)

    page = _pick_page(args.page)
    if page:
        image = Image.open(page).convert("RGB")
    else:  # synthetic fallback (no reference mount)
        image = Image.new("RGB", (1700, 2200), "white")

    if args.native:
        input_h, input_w = smart_resize(
            image.height, image.width, factor=unit,
            min_pixels=unit * unit, max_pixels=1280 * 28 * 28,
        )
    else:
        input_w, input_h = round_to_patch_grid(
            args.image_size, args.image_size,
            cfg.vision.patch_size, cfg.vision.merge_size,
        )
    arr = preprocess_page(image, input_w, input_h)
    batch = max(1, args.batch)
    if batch > 1:
        # same page replicated: timing is content-independent (the scan
        # always runs max_new_tokens steps; decode-rate note above)
        arr = np.tile(arr, (batch, 1, 1, 1))
    n_tokens = (input_h // unit) * (input_w // unit)
    prompt_budget = cfg.text.max_len - max_new
    doc = DocumentParser(model, variables, ByteTokenizer())
    ids = doc.build_prompt_ids(n_tokens, prompt_budget)
    prompt_len = ids.shape[1]
    if batch > 1:
        ids = np.tile(ids, (batch, 1))

    # early_stop=False: the fixed-length scan, so the measured decode cost
    # is the honest full-1024-token figure independent of what the
    # synthetic weights happen to emit
    prefill, decode = build_generate_fns(
        model, prompt_len, max_new, early_stop=args.early_stop,
        prefill_chunk=args.prefill_chunk,
    )

    force_steps = None
    if args.eos_ragged:
        if args.eos_ragged.startswith("linspace:"):
            _, lo, hi = args.eos_ragged.split(":")
            fs = np.linspace(int(lo), int(hi), batch).round().astype(np.int32)
        else:
            fs = np.asarray(
                [int(x) for x in args.eos_ragged.split(",")], np.int32
            )
            if fs.shape[0] != batch:
                raise SystemExit(
                    f"--eos_ragged gave {fs.shape[0]} stops for batch {batch}"
                )
        force_steps = jnp.asarray(np.clip(fs, 1, max_new))

    if args.continuous:
        from multimodal_embeddings_tpu.models.qwen_serve import (
            continuous_generate,
        )

        n_pages = args.continuous
        page_ids = np.asarray(ids[0])
        page_img = np.asarray(arr[0])
        pages = [(page_ids, page_img)] * n_pages
        stops = None
        if force_steps is not None:
            fs_np = np.asarray(force_steps)
            stops = [int(fs_np[i % len(fs_np)]) for i in range(n_pages)]
        # compile + warm pass (prefill1 / splice / chunk programs)
        warm_stats: dict = {}
        t0 = time.perf_counter()
        continuous_generate(
            model, variables, pages, batch=batch, max_new_tokens=max_new,
            chunk=args.chunk, stops=stops, stats=warm_stats,
            early_exit=not args.cont_scan,
        )
        warm_s = time.perf_counter() - t0
        stats: dict = {}
        outs = continuous_generate(
            model, variables, pages, batch=batch, max_new_tokens=max_new,
            chunk=args.chunk, stops=stops, stats=stats,
            early_exit=not args.cont_scan,
        )
        assert len(outs) == n_pages
        wall = stats["wall_s"]
        useful = (
            sum(min(s, max_new) for s in stops)
            if stops is not None else n_pages * max_new
        )
        ideal_steps = (
            sum(min(max(s, 1), max_new) for s in stops)
            if stops is not None else n_pages * max_new
        )
        result = {
            "metric": (
                f"Qwen2.5-VL-{args.size} CONTINUOUS batch parse "
                f"({n_pages} pages through {batch} rows, chunk "
                f"{args.chunk}, prompt {prompt_len} tokens incl. "
                f"{n_tokens} image tokens @ {input_w}x{input_h}, "
                f"max {max_new} new tokens, per-row exit + refill)"
                + (f" [ragged EOS {args.eos_ragged}]"
                   if args.eos_ragged else "")
            ),
            "size": args.size,
            "mode": "continuous",
            "pages": n_pages,
            "batch": batch,
            "chunk": args.chunk,
            "early_exit": not args.cont_scan,
            "input_wh": [input_w, input_h],
            "prompt_len": int(prompt_len),
            "max_new_tokens": int(max_new),
            "wall_s": round(wall, 2),
            "pages_per_hour": round(n_pages * 3600.0 / wall, 1),
            "useful_tokens_per_sec": round(useful / wall, 1),
            "decode_steps_executed": stats["decode_steps"],
            "ideal_row_steps": int(-(-ideal_steps // batch)),
            "splice_s": round(stats["splice_s"], 2),
            "chunks": stats["chunks"],
            "warm_pass_s": round(warm_s, 1),
            "init_s": round(init_s, 1),
            "weights_upload_s": round(upload_s, 1),
        }
        if stops is not None:
            result["eos_ragged"] = {
                "spec": args.eos_ragged,
                "stops_cycle": np.asarray(force_steps).tolist(),
            }
        print(json.dumps(result))
        if args.record:
            path = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_PARSE.json")
            key = (
                f"{args.size}{'_native' if args.native else ''}"
                f"_cont{n_pages}_b{batch}_c{args.chunk}"
                f"{'_scan' if args.cont_scan else ''}"
                f"{'_ragged' if args.eos_ragged else ''}"
            )
            try:
                with open(path) as f:
                    record = json.load(f)
            except (OSError, json.JSONDecodeError):
                record = {}
            import datetime

            result["date"] = datetime.date.today().isoformat()
            record[key] = result
            with open(path, "w") as f:
                json.dump(record, f, indent=2)
                f.write("\n")
        return 0

    def run_decode(last_logits, caches, delta):
        if force_steps is None:
            return decode(variables, last_logits, caches, delta)
        return decode(variables, last_logits, caches, delta, force_steps)

    # --- compile + warm ---
    t0 = time.perf_counter()
    last_logits, caches, delta = prefill(variables, ids, arr)
    np.asarray(last_logits[0, :2])  # value fetch = real barrier (CLAUDE.md)
    prefill_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    tokens = run_decode(last_logits, caches, delta)
    np.asarray(tokens[0, :2])
    decode_compile_s = time.perf_counter() - t0

    # --- timed ---
    import contextlib

    ctx = (
        jax.profiler.trace(args.profile)
        if args.profile
        else contextlib.nullcontext()
    )
    pre_ts, dec_ts = [], []
    with ctx:
        for _ in range(max(1, args.iters)):
            t0 = time.perf_counter()
            last_logits, caches, delta = prefill(variables, ids, arr)
            np.asarray(last_logits[0, :2])
            pre_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            tokens = run_decode(last_logits, caches, delta)
            np.asarray(tokens[0, :2])
            dec_ts.append(time.perf_counter() - t0)

    prefill_s = min(pre_ts)
    decode_s = min(dec_ts)
    if force_steps is not None:
        # ragged: rows stop at force_steps; only tokens before the stop
        # are useful output, and the while_loop's wall reflects max(stop)
        useful = int(np.sum(np.asarray(force_steps)))
        tok_per_s = useful / decode_s
    else:
        useful = batch * max_new
        tok_per_s = batch * max_new / decode_s  # aggregate across the batch
    page_s = prefill_s + decode_s  # wall time for the whole batch
    result = {
        "metric": (
            f"Qwen2.5-VL-{args.size} page parse (batch {batch}, prompt "
            f"{prompt_len} tokens incl. {n_tokens} image tokens @ "
            f"{input_w}x{input_h}, {max_new} new tokens, greedy "
            + ("lax.while_loop early-stop decode)" if args.early_stop
               and args.eos_ragged else
               "lax.while_loop early-stop decode, no-exit worst case)"
               if args.early_stop else "lax.scan decode)")
        ),
        "size": args.size,
        "batch": batch,
        "input_wh": [input_w, input_h],
        "prompt_len": int(prompt_len),
        "max_new_tokens": int(max_new),
        "prefill_ms": round(prefill_s * 1e3, 1),
        "decode_tokens_per_sec": round(tok_per_s, 2),
        "ms_per_token": round(decode_s * 1e3 / (batch * max_new), 3),
        "ms_per_step": round(decode_s * 1e3 / max_new, 3),
        "page_seconds": round(page_s / batch, 3),
        "pages_per_hour": round(batch * 3600.0 / page_s, 1),
        "init_s": round(init_s, 1),
        "weights_upload_s": round(upload_s, 1),
        "compile_s": [round(prefill_compile_s, 1), round(decode_compile_s, 1)],
    }
    if force_steps is not None:
        fs_np = np.asarray(force_steps)
        result["eos_ragged"] = {
            "spec": args.eos_ragged,
            "force_steps": fs_np.tolist(),
            "useful_tokens": int(useful),
            "max_stop": int(fs_np.max()),
            "decode_wall_ms": round(decode_s * 1e3, 1),
        }
        result["metric"] += f" [ragged EOS {args.eos_ragged}]"
    print(json.dumps(result))

    if args.record:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_PARSE.json")
        key = (
            f"{args.size}{'_native' if args.native else ''}"
            f"{f'_b{batch}' if batch > 1 else ''}"
            f"{f'_pc{args.prefill_chunk}' if args.prefill_chunk else ''}"
            f"{'_es' if args.early_stop else ''}"
            f"{'_ragged' if args.eos_ragged else ''}"
        )
        try:
            with open(path) as f:
                record = json.load(f)
        except (OSError, json.JSONDecodeError):
            record = {}
        import datetime

        result["date"] = datetime.date.today().isoformat()
        record[key] = result
        with open(path, "w") as f:
            json.dump(record, f, indent=2)
            f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
