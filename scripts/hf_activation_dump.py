#!/usr/bin/env python
"""Torch-side golden-activation dump (companion to ``cli.parity acts-dump``).

Runs the SAME deterministic probe recipe as
``multimodal_embeddings_tpu.analysis.activations`` through a HuggingFace /
torch reference model with forward hooks, writing the same JSON schema, so
first contact with a real checkpoint is:

    python scripts/hf_activation_dump.py \
        --loader mllama --model intfloat/mmE5-mllama-11b-instruct \
        --text-len 512 --out theirs.json
    python -m multimodal_embeddings_tpu.cli.parity acts-dump \
        --family mme5 --size 11b --checkpoint ported.npz --out ours.json
    python -m multimodal_embeddings_tpu.cli.parity acts-compare \
        theirs.json ours.json --map mllama_name_map.json

This environment has no checkpoints and zero egress, so the script is
validated only for import/probe parity (tests/test_activations.py checks
the probe recipe reproduces across processes); the model-loading paths run
on first contact with weights.

Reference model contracts: ``/root/reference/deprecated_package/embedder.py:36-83``
(mmE5-Mllama) and ``/root/reference/1_doclayout_bboxes.py:100-124``
(DocLayout-YOLO).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

_HEAD_N = 8  # keep in sync with analysis/activations.py


def tensor_stats(t) -> dict:
    arr = t.detach().to("cpu").to(dtype=__import__("torch").float64).numpy()
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


def hook_all_modules(model, layers: dict):
    import torch

    handles = []

    def make_hook(name):
        def hook(_module, _inputs, output):
            tensors = [
                o
                for o in (
                    output if isinstance(output, (tuple, list)) else [output]
                )
                if isinstance(o, torch.Tensor)
            ]
            for i, t in enumerate(tensors):
                base = name if name not in layers else f"{name}#dup"
                layers[base if i == 0 else f"{base}@{i}"] = tensor_stats(t)

        return hook

    for name, module in model.named_modules():
        if name:  # skip the root
            handles.append(module.register_forward_hook(make_hook(name)))
    return handles


def dump_mllama(args) -> dict:
    import torch
    from transformers import MllamaForConditionalGeneration

    model = MllamaForConditionalGeneration.from_pretrained(
        args.model, torch_dtype=torch.bfloat16, device_map="cpu"
    )
    model.eval()
    vocab = model.config.text_config.vocab_size
    size = model.config.vision_config.image_size
    # probe recipe — MUST match analysis/activations.py::mme5_probe
    rng = np.random.default_rng(args.seed)
    tokens = rng.integers(1, min(vocab, 32000), size=(1, args.text_len))
    mask = np.ones((1, args.text_len), np.int64)
    images = rng.random((1, 1, size, size, 3), dtype=np.float32)
    layers: dict = {}
    handles = hook_all_modules(model, layers)
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(tokens),
            attention_mask=torch.from_numpy(mask),
            # ours: (B, T, S, S, 3) channels-last; HF: (B, n_img, T, 3, S, S)
            pixel_values=torch.from_numpy(
                images.transpose(0, 1, 4, 2, 3)[:, None]
            ),
            aspect_ratio_ids=torch.ones((1, 1), dtype=torch.long),
            aspect_ratio_mask=torch.ones((1, 1, 1), dtype=torch.long),
        )
    for h in handles:
        h.remove()
    hidden = out.logits if hasattr(out, "logits") else out[0]
    return {
        "layers": layers,
        "output": tensor_stats(hidden),
        "probe": {"family": "mme5", "recipe": f"default_rng({args.seed})"},
    }


def dump_doclayout(args) -> dict:
    import torch

    try:
        from doclayout_yolo import YOLOv10

        model = YOLOv10(args.model).model
    except ImportError:  # raw torch checkpoint fallback
        ckpt = torch.load(args.model, map_location="cpu", weights_only=False)
        model = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    model = model.float().eval()
    rng = np.random.default_rng(args.seed)
    probe = rng.random((1, args.imgsz, args.imgsz, 3), dtype=np.float32)
    layers: dict = {}
    handles = hook_all_modules(model, layers)
    with torch.no_grad():
        out = model(torch.from_numpy(probe.transpose(0, 3, 1, 2)))
    for h in handles:
        h.remove()
    first = out
    while isinstance(first, (tuple, list)):
        first = first[0]
    return {
        "layers": layers,
        "output": tensor_stats(first),
        "probe": {"family": "detector", "recipe": f"default_rng({args.seed})"},
    }


def dump_qwen(args) -> dict:
    """Qwen2.5-VL prefill dump — companion to ``parity acts-dump --family
    qwen`` (probe recipe in ``analysis/activations.py::qwen_probe``).

    HF feeds the vision tower FLATTENED patches (Qwen2VLImageProcessor:
    resize→rescale→normalize→duplicate the frame to temporal_patch_size→
    merge-aware patch flatten) plus ``image_grid_thw``; this rebuilds that
    layout from the same CLIP-normalized probe pixels our side feeds as a
    plain (1, S, S, 3) image, so the first diverging layer isolates a port
    error rather than a preprocessing difference."""
    import torch
    from transformers import Qwen2_5_VLForConditionalGeneration

    model = Qwen2_5_VLForConditionalGeneration.from_pretrained(
        args.model, torch_dtype=torch.bfloat16, device_map="cpu"
    )
    model.eval()
    cfg = model.config
    vocab = cfg.vocab_size
    pad_id = cfg.image_token_id
    vis = cfg.vision_config
    ps = vis.patch_size
    merge = vis.spatial_merge_size
    tps = getattr(vis, "temporal_patch_size", 2)
    unit = ps * merge
    # probe dims — run with --imgsz 56 to match the jax side's default
    # (qwen_trace: image_size=unit*2, text_len=n_img+16)
    size = max(unit, (args.imgsz // unit) * unit)
    n_img = (size // unit) ** 2
    text_len = n_img + 16
    # probe recipe — MUST match analysis/activations.py::qwen_probe
    rng = np.random.default_rng(args.seed)
    tokens = rng.integers(1, min(vocab, 32000), size=(1, text_len))
    tokens[tokens == pad_id] += 1
    tokens[0, 4 : 4 + n_img] = pad_id
    raw = rng.random((1, size, size, 3), dtype=np.float32)
    mean = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
    std = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)
    norm = (raw - mean) / std  # (1, S, S, 3)

    # Qwen2VLImageProcessor patch flatten (merge-aware row order)
    img = norm[0].transpose(2, 0, 1)  # (C, H, W)
    img = np.broadcast_to(img[None], (tps, *img.shape))  # duplicated frame
    gh, gw = size // ps, size // ps
    patches = img.reshape(
        1, tps, 3, gh // merge, merge, ps, gw // merge, merge, ps
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = np.ascontiguousarray(patches).reshape(gh * gw, 3 * tps * ps * ps)

    layers: dict = {}
    handles = hook_all_modules(model, layers)
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(tokens),
            attention_mask=torch.ones((1, text_len), dtype=torch.long),
            pixel_values=torch.from_numpy(flat).to(torch.bfloat16),
            image_grid_thw=torch.tensor([[1, gh, gw]], dtype=torch.long),
        )
    for h in handles:
        h.remove()
    return {
        "layers": layers,
        "output": tensor_stats(out.logits),
        "probe": {"family": "qwen", "recipe": f"default_rng({args.seed})"},
    }


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument(
        "--loader", choices=("mllama", "doclayout", "qwen"), required=True
    )
    parser.add_argument("--model", required=True, help="HF id or local path")
    parser.add_argument("--out", required=True)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--text-len", type=int, default=512)
    parser.add_argument("--imgsz", type=int, default=1024)
    args = parser.parse_args()
    trace = {
        "mllama": dump_mllama,
        "doclayout": dump_doclayout,
        "qwen": dump_qwen,
    }[args.loader](args)
    with open(args.out, "w") as f:
        json.dump(trace, f, indent=2)
        f.write("\n")
    print(json.dumps({"layers": len(trace["layers"]), "out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
