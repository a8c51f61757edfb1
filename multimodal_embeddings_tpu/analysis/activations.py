"""Golden-activation traces for first-contact checkpoint validation.

The BASELINE.json acceptance gates (bbox IoU >= 0.99 vs the reference
DocLayout-YOLO outputs, embedding cosine >= 0.999 vs
``intfloat/mmE5-mllama-11b-instruct`` — reference contracts at
``1_doclayout_bboxes.py:120-124`` and
``deprecated_package/embedder.py:73-83``) can only be measured once real
checkpoints are available, which this zero-egress environment blocks.
This module is the mitigation: a DETERMINISTIC probe input plus a
per-layer activation statistics dump, so the first run against a real
checkpoint is one command on each side —

* ours:  ``python -m multimodal_embeddings_tpu.cli.parity acts-dump
  --family mme5 --checkpoint <ported.npz> --out ours.json``
* HF reference side: ``python scripts/hf_activation_dump.py --model
  intfloat/mmE5-mllama-11b-instruct --out theirs.json`` (forward hooks,
  same probe recipe, same JSON schema)
* verdict: ``... parity acts-compare theirs.json ours.json`` reports the
  FIRST diverging layer in execution order instead of a bare end-to-end
  cosine, pinpointing a port-map error to the module that introduced it.

Probe recipe (shared with the torch-side script, so both dumps see
bit-identical inputs): ``numpy.random.default_rng(seed)`` — ``random()``
for images in [0, 1), ``integers()`` for token ids. No jax.random, so
the recipe reproduces anywhere.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional

import numpy as np

__all__ = [
    "tensor_stats",
    "trace_flax_module",
    "detector_probe",
    "mme5_probe",
    "qwen_probe",
    "detector_trace",
    "mme5_trace",
    "qwen_trace",
    "compare_traces",
]

_HEAD_N = 8


def tensor_stats(x) -> Dict[str, Any]:
    """Summary statistics for one activation tensor.

    Cross-framework comparison cannot be bit-exact (different op
    ordering, bf16 vs fp16 accumulation), so the dump records shape plus
    moments and the first ``_HEAD_N`` flattened values; ``compare_traces``
    applies a relative tolerance.
    """
    arr = np.asarray(x, dtype=np.float64)
    flat = arr.reshape(-1)
    return {
        "shape": list(arr.shape),
        "mean": float(flat.mean()) if flat.size else 0.0,
        "std": float(flat.std()) if flat.size else 0.0,
        "min": float(flat.min()) if flat.size else 0.0,
        "max": float(flat.max()) if flat.size else 0.0,
        "absmean": float(np.abs(flat).mean()) if flat.size else 0.0,
        "head": [float(v) for v in flat[:_HEAD_N]],
    }


def _flatten_intermediates(tree, prefix=()) -> Dict[str, List[Any]]:
    """Flatten flax's captured-intermediates tree to path -> [outputs].

    Each ``__call__`` leaf is a tuple of every sown invocation of that
    module (flax appends on repeated calls, e.g. a scanned block).
    """
    out: Dict[str, List[Any]] = {}
    if isinstance(tree, dict):
        for key, sub in tree.items():
            if key == "__call__":
                out["/".join(prefix)] = list(sub)
            else:
                out.update(_flatten_intermediates(sub, prefix + (key,)))
    return out


def trace_flax_module(
    module,
    variables,
    args,
    kwargs: Optional[dict] = None,
    taps: Optional[str] = None,
) -> Dict[str, Any]:
    """Run ``module.apply`` capturing every submodule output -> stats dict.

    ``taps`` optionally restricts the dump to paths matching the regex
    (applied to the slash-joined module path).
    """
    import jax

    out, state = module.apply(
        variables,
        *args,
        capture_intermediates=True,
        mutable=["intermediates"],
        **(kwargs or {}),
    )
    flat = _flatten_intermediates(state["intermediates"])
    pattern = re.compile(taps) if taps else None
    layers: Dict[str, Any] = {}
    for path, values in sorted(flat.items()):
        if not path:
            continue  # the root module's own output duplicates "output"
        if pattern and not pattern.search(path):
            continue
        for idx, value in enumerate(values):
            key = path if len(values) == 1 else f"{path}#{idx}"
            for leaf_i, leaf in enumerate(
                [x for x in jax.tree.leaves(value) if hasattr(x, "shape")]
            ):
                leaf_key = key if leaf_i == 0 else f"{key}@{leaf_i}"
                layers[leaf_key] = tensor_stats(leaf)
    result: Dict[str, Any] = {"layers": layers}
    out_leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")]
    if out_leaves:
        result["output"] = tensor_stats(out_leaves[0])
    return result


# -- probes ------------------------------------------------------------------


def detector_probe(image_size: int, seed: int = 0) -> np.ndarray:
    """(1, S, S, 3) float32 in [0, 1) — feed the model forward directly
    (the detector's serving path divides uint8 pages by 255 first; the
    probe is already normalized, matching the torch side's input)."""
    rng = np.random.default_rng(seed)
    return rng.random((1, image_size, image_size, 3), dtype=np.float32)


def mme5_probe(
    image_size: int,
    text_len: int,
    vocab: int,
    tiles: int = 1,
    seed: int = 0,
):
    """(token_ids, attention_mask, images, aspect_ratio_ids, tile_mask).

    Token ids are drawn below ``min(vocab, 32000)`` so the same probe is
    valid for reduced test vocabularies and the real 128k one.
    """
    rng = np.random.default_rng(seed)
    tokens = rng.integers(
        1, min(vocab, 32000), size=(1, text_len), dtype=np.int32
    )
    mask = np.ones((1, text_len), np.int32)
    images = rng.random(
        (1, tiles, image_size, image_size, 3), dtype=np.float32
    )
    aspect = np.ones((1,), np.int32)
    tile_mask = np.ones((1, tiles), np.int32)
    return tokens, mask, images, aspect, tile_mask


def qwen_probe(
    image_size: int,
    text_len: int,
    vocab: int,
    image_pad_id: int,
    merged_unit: int = 28,
    seed: int = 0,
):
    """(token_ids, images) for a QwenVL prefill forward.

    Token ids are drawn below ``min(vocab, 32000)`` (excluding the pad id)
    with one contiguous image-pad span spliced at position 4 — the shape
    ``embed_multimodal`` + ``get_rope_index`` handle (qwen_vl.py). Images
    are CLIP-normalized from a [0,1) draw, matching the parse path
    (``doc_parser.preprocess_page``) and the torch-side dump
    (``scripts/hf_activation_dump.py --loader qwen``)."""
    rng = np.random.default_rng(seed)
    n_img = (image_size // merged_unit) ** 2
    assert text_len >= n_img + 8, (text_len, n_img)
    tokens = rng.integers(
        1, min(vocab, 32000), size=(1, text_len), dtype=np.int32
    )
    tokens[tokens == image_pad_id] += 1
    tokens[0, 4 : 4 + n_img] = image_pad_id
    raw = rng.random((1, image_size, image_size, 3), dtype=np.float32)
    from multimodal_embeddings_tpu.analysis.doc_parser import (
        IMAGE_MEAN,
        IMAGE_STD,
    )

    images = (raw - np.asarray(IMAGE_MEAN, np.float32)) / np.asarray(
        IMAGE_STD, np.float32
    )
    return tokens, images


def detector_trace(detector, seed: int = 0, taps: Optional[str] = None):
    """Golden-activation dump for a ``LayoutDetector``."""
    probe = detector_probe(detector.config.image_size, seed=seed)
    trace = trace_flax_module(
        detector.model,
        detector.variables,
        (probe,),
        kwargs={"train": False},
        taps=taps,
    )
    trace["probe"] = {
        "recipe": f"default_rng({seed}).random((1,{detector.config.image_size},"
        f"{detector.config.image_size},3), float32)",
        "family": "detector",
        "variant": detector.config.variant,
    }
    return trace


def mme5_trace(embedder, seed: int = 0, taps: Optional[str] = None):
    """Golden-activation dump for a mmE5 ``MultimodalEmbedder``."""
    cfg = embedder.model_config
    args = mme5_probe(
        cfg.vision.image_size,
        embedder.text_len,
        cfg.text.vocab_size,
        seed=seed,
    )
    trace = trace_flax_module(embedder.model, embedder.variables, args, taps=taps)
    trace["probe"] = {
        "recipe": f"default_rng({seed}): integers(1, min(vocab,32000), "
        f"(1,{embedder.text_len})) tokens; random((1,1,"
        f"{cfg.vision.image_size},{cfg.vision.image_size},3)) tiles",
        "family": "mme5",
    }
    return trace


def qwen_trace(
    model,
    variables,
    image_size: int = 56,
    text_len: Optional[int] = None,
    seed: int = 0,
    taps: Optional[str] = None,
):
    """Golden-activation dump for a ``QwenVLModel`` prefill forward (the
    parse surface — first-contact validation of the qwen25_vl port map,
    ``models/hf_port.py::qwen25_vl_key_map``)."""
    cfg = model.config
    unit = cfg.vision.patch_size * cfg.vision.merge_size
    image_size = max(unit, (image_size // unit) * unit)
    n_img = (image_size // unit) ** 2
    if text_len is None:
        text_len = min(cfg.text.max_len, n_img + 16)
    tokens, images = qwen_probe(
        image_size,
        text_len,
        cfg.text.vocab_size,
        cfg.image_pad_id,
        merged_unit=unit,
        seed=seed,
    )
    trace = trace_flax_module(model, variables, (tokens, images), taps=taps)
    trace["probe"] = {
        "recipe": f"default_rng({seed}): integers(1, min(vocab,32000), "
        f"(1,{text_len})) tokens with {n_img} image pads at 4; "
        f"random((1,{image_size},{image_size},3)) CLIP-normalized",
        "family": "qwen",
    }
    return trace


# -- comparison ---------------------------------------------------------------


def _close(a: float, b: float, rtol: float, atol: float) -> bool:
    return abs(a - b) <= atol + rtol * max(abs(a), abs(b))


def compare_traces(
    reference: Dict[str, Any],
    candidate: Dict[str, Any],
    rtol: float = 1e-2,
    atol: float = 1e-4,
    name_map: Optional[Dict[str, str]] = None,
) -> Dict[str, Any]:
    """Layer-by-layer comparison of two activation dumps.

    ``name_map`` maps reference layer names to candidate layer names
    (needed when the reference dump comes from the torch side, whose
    module paths differ); unmapped reference layers that have no
    same-name candidate are reported as ``unmatched`` rather than failed.
    Returns per-layer verdicts plus ``first_divergent`` — the earliest
    (dump-order) matched layer whose statistics disagree, which for a
    topologically-ordered dump pinpoints the module that introduced the
    divergence.
    """
    ref_layers = reference.get("layers", {})
    cand_layers = candidate.get("layers", {})
    results: List[Dict[str, Any]] = []
    unmatched: List[str] = []
    first_divergent = None
    for name, ref_stats in ref_layers.items():
        cand_name = (name_map or {}).get(name, name)
        cand_stats = cand_layers.get(cand_name)
        if cand_stats is None:
            unmatched.append(name)
            continue
        fields = ("mean", "std", "min", "max", "absmean")
        bad = [
            f
            for f in fields
            if not _close(ref_stats[f], cand_stats[f], rtol, atol)
        ]
        head_ok = all(
            _close(a, b, rtol, atol)
            for a, b in zip(ref_stats.get("head", []), cand_stats.get("head", []))
        )
        shape_ok = list(ref_stats["shape"]) == list(cand_stats["shape"])
        ok = shape_ok and not bad and head_ok
        entry = {
            "layer": name,
            "candidate_layer": cand_name,
            "ok": ok,
            "shape_ok": shape_ok,
            "bad_fields": bad,
            "head_ok": head_ok,
        }
        results.append(entry)
        if not ok and first_divergent is None:
            first_divergent = name
    matched = [r for r in results if r["ok"]]
    summary = {
        "layers_compared": len(results),
        "layers_ok": len(matched),
        "unmatched_reference_layers": unmatched,
        "first_divergent": first_divergent,
        "ok": first_divergent is None and bool(results),
        "results": results,
    }
    out_ref, out_cand = reference.get("output"), candidate.get("output")
    if out_ref and out_cand:
        summary["output_ok"] = (
            list(out_ref["shape"]) == list(out_cand["shape"])
            and all(
                _close(out_ref[f], out_cand[f], rtol, atol)
                for f in ("mean", "std", "min", "max", "absmean")
            )
        )
    return summary


def save_trace(trace: Dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        json.dump(trace, f, indent=2)
        f.write("\n")


def load_trace(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)
