"""Fused page pipeline: page in → boxes + region embeddings out, ONE XLA
program.

This is the TPU-first replacement for the reference's hot path, which per
page runs ~30 sequential YOLO predicts (``1_doclayout_bboxes.py:749-768``)
then one 11B forward *per region crop* (``embedder.py:104-137``), crossing
the host/device boundary hundreds of times. Here a single jitted function:

1. extracts all grid views of the page with the gather-based
   ``crop_and_resize`` kernel (on device),
2. runs the detector forward + DFL decode + batched NMS over all views as
   one batch,
3. translates per-view detections into page coordinates and selects the
   top-K regions by score across views (static K),
4. crops those K regions from the full-resolution page (on device) and
5. embeds them with the vision tower in one batch,

with exactly two host↔device transfers per page (page upload, results
download). All shapes are static per (page-shape bucket, grid set, K).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_embeddings_tpu.models.detector import LayoutDetector
from multimodal_embeddings_tpu.models.embedder import MultimodalEmbedder
from multimodal_embeddings_tpu.models.yolo_decode import decode_predictions
from multimodal_embeddings_tpu.ops.grid import grid_cells
from multimodal_embeddings_tpu.ops.nms import nms_padded
from multimodal_embeddings_tpu.ops.image import (
    crop_and_resize_mxu,
    extract_views_matmul,
)


def _device_vars(tree):
    """Upload a (possibly host-numpy) variable tree once, through numpy —
    cross-backend device_put over the tunnel hangs (CLAUDE.md)."""
    def put(x):
        if isinstance(x, jax.Array):
            return x
        return jnp.asarray(np.asarray(x))

    return jax.tree.map(put, tree)


class PageResult(NamedTuple):
    boxes: jnp.ndarray  # (K, 4) page-coordinate xyxy
    scores: jnp.ndarray  # (K,)
    classes: jnp.ndarray  # (K,) int32
    valid: jnp.ndarray  # (K,) bool
    embeddings: jnp.ndarray  # (K, D) L2-normalized region embeddings


def view_boxes_for_page(
    width: int, height: int, grids: Sequence[Tuple[int, int]], overlap: float
) -> np.ndarray:
    """Static (V, 4) xyxy view rectangles: full page + every grid cell."""
    boxes = [[0.0, 0.0, float(width), float(height)]]
    for rows, cols in grids:
        for cell in grid_cells(width, height, rows, cols, overlap):
            boxes.append([cell.x_start, cell.y_start, cell.x_end, cell.y_end])
    return np.asarray(boxes, np.float32)


def view_slice_bounds_for_page(
    width: int, height: int, grids: Sequence[Tuple[int, int]], overlap: float
) -> list:
    """Integer pixel slice bounds per view (full page + grid cells), for the
    static-slice + matmul-resize extraction path."""
    bounds = [(0, 0, width, height)]
    for rows, cols in grids:
        for cell in grid_cells(width, height, rows, cols, overlap):
            bounds.append(cell.slice_bounds)
    return bounds


def _make_detect_crop(
    detector: LayoutDetector, page_hw, num_regions, emb_size,
    letterbox: bool = False,
    edge_filter: bool = True,
    candidate_cap: int = 4,
    resize_dtype=jnp.bfloat16,
    combine_iou: float = 0.5,
    return_candidates: bool = False,
):
    """Shared traced section: page → views → batched detect → page-coord
    NMS → top-K boxes → on-device region crops. Returned fn is meant to be
    closed over by a jitted caller.

    ``letterbox=True`` swaps the serving path's aspect-squeeze view resize
    for the exact CLI path's aspect-preserving letterbox (measured choice —
    ``scripts/serve_parity.py`` quantifies both against the stage-1..3
    pipeline). ``edge_filter=True`` (default) applies the stage-2
    internal-edge predicate per view before the cross-view NMS — the exact
    chain drops grid-cell boxes within 10 px of an internal cell edge
    (``2_edge_box_filter.py:44-90``) and skipping it was a measured
    contributor to serve-vs-exact disagreement; the full-page view has no
    internal edges, so the predicate no-ops there."""
    height, width = page_hw
    view_bounds = view_slice_bounds_for_page(
        width, height, detector.config.grid_configs, detector.config.overlap_percentage
    )
    det_size = detector.config.image_size
    det_model = detector.model
    conf = detector.config.conf_threshold
    iou = detector.config.iou_threshold
    max_det = detector.config.max_detections

    # per-view affine from detector-input pixels back to page pixels:
    # squeeze → scale (w/S, h/S), offset (x0, y0); letterbox → scale 1/s,
    # offset (x0 − left/s, y0 − top/s) with the host-static (s, top, left)
    # placement of _letterbox_host
    vb = np.asarray(view_bounds, np.float32)
    if letterbox:
        sx_l, sy_l, ox_l, oy_l = [], [], [], []
        for x0, y0, x1, y1 in view_bounds:
            gh, gw = y1 - y0, x1 - x0
            s = min(det_size / gh, det_size / gw)
            new_h, new_w = int(round(gh * s)), int(round(gw * s))
            top, left = (det_size - new_h) // 2, (det_size - new_w) // 2
            sx_l.append(1.0 / s)
            sy_l.append(1.0 / s)
            ox_l.append(x0 - left / s)
            oy_l.append(y0 - top / s)
        sx = jnp.asarray(np.asarray(sx_l, np.float32))
        sy = jnp.asarray(np.asarray(sy_l, np.float32))
        ox = jnp.asarray(np.asarray(ox_l, np.float32))
        oy = jnp.asarray(np.asarray(oy_l, np.float32))
    else:
        sx = jnp.asarray((vb[:, 2] - vb[:, 0]) / det_size)
        sy = jnp.asarray((vb[:, 3] - vb[:, 1]) / det_size)
        ox = jnp.asarray(vb[:, 0])
        oy = jnp.asarray(vb[:, 1])

    def detect_and_crop(det_vars, page: jnp.ndarray):
        # Parameters come in as ARGUMENTS, not closure constants: closed-over
        # trees are inlined into the HLO program text, which stalls
        # serialization and can kill the remote compiler at scale (CLAUDE.md;
        # advisor r2 finding).
        # bf16 payloads through the resampling stages: halves the HBM
        # traffic of the page-sized gathers/matmuls; weight rounding stays
        # below one uint8 LSB (models compute in bf16 anyway).
        # resize_dtype=f32 is the parity-diagnostic variant: it isolates
        # how much of the serve-vs-exact box disagreement is resize
        # precision vs selection semantics (scripts/serve_parity.py)
        pagef = page.astype(resize_dtype)
        # 1. all views via static slices + matmul resize — MXU work instead
        # of per-pixel gathers (aspect-squeeze resize; the standalone CLI
        # path letterboxes instead — detection-equivalent at these aspect
        # ratios and strictly cheaper on HBM)
        if letterbox:
            from multimodal_embeddings_tpu.ops.image import (
                letterbox_views_matmul,
            )

            view_imgs = (
                letterbox_views_matmul(pagef, view_bounds, det_size)[0]
                .astype(jnp.bfloat16)
                / 255.0
            )  # detector computes in bf16 regardless of resize precision
        else:
            view_imgs = (
                extract_views_matmul(
                    pagef, view_bounds, det_size, dtype=jnp.bfloat16
                )
                / 255.0
            )
        # 2. detect all views as one batch
        outputs = det_model.apply(det_vars, view_imgs, train=False)
        det = decode_predictions(
            outputs,
            max_det=max_det,
            conf_threshold=conf,
            iou_threshold=iou,
            with_nms=True,
        )
        # 3. to page coordinates
        boxes = det.boxes  # (V, max_det, 4) in det-input pixels
        px1 = boxes[..., 0] * sx[:, None] + ox[:, None]
        py1 = boxes[..., 1] * sy[:, None] + oy[:, None]
        px2 = boxes[..., 2] * sx[:, None] + ox[:, None]
        py2 = boxes[..., 3] * sy[:, None] + oy[:, None]
        view_page_boxes = jnp.stack([px1, py1, px2, py2], axis=-1)  # (V, M, 4)
        valid = det.valid
        if edge_filter:
            # stage-2 internal-edge filter, one predicate per (view, box):
            # drop boxes within threshold px of a cell edge that is not the
            # page edge (2_edge_box_filter.py:44-90; exact semantics in
            # ops/edge_filter.py, here over the static view rectangles)
            from multimodal_embeddings_tpu.ops.edge_filter import (
                internal_edge_mask,
            )

            touching = internal_edge_mask(
                view_page_boxes,
                jnp.asarray(vb),
                jnp.asarray([float(width), float(height)], jnp.float32),
                threshold=10.0,
            )
            valid = valid & ~touching
        page_boxes = view_page_boxes.reshape(-1, 4)
        flat_scores = jnp.where(valid, det.scores, -1.0).reshape(-1)
        flat_classes = det.classes.reshape(-1)

        # cross-view dedup: the same physical region is detected in several
        # overlapping views — apply the stage-3 class-aware greedy NMS
        # (IoU 0.5, 3_combine_grids.py:80-138 semantics) over the strongest
        # candidates before selecting the final top-K. candidate_cap bounds
        # the padded-NMS problem size at cap*num_regions (<=0 = ALL view
        # boxes, the exact chain's combine semantics; serve_parity.py A/Bs
        # the accuracy/throughput frontier of the cap)
        n_cand = (
            flat_scores.shape[0]
            if candidate_cap <= 0
            else min(candidate_cap * num_regions, flat_scores.shape[0])
        )
        cand_scores, cand_idx = jax.lax.top_k(flat_scores, n_cand)
        cand_boxes = page_boxes[cand_idx]
        cand_classes = flat_classes[cand_idx]
        if return_candidates:
            # knife-edge diagnostic tap (scripts/knife_edge_probe.py): the
            # pre-combine candidate set, so the f64 host NMS can re-merge
            # the SAME population the device NMS sees
            return cand_boxes, cand_scores, cand_classes
        keep, order = nms_padded(
            cand_boxes,
            cand_scores,
            cand_classes,
            cand_scores > 0,
            iou_threshold=combine_iou,
            class_aware=True,
        )
        kept_scores = jnp.where(keep, cand_scores[order], -1.0)
        top_scores, sel = jax.lax.top_k(kept_scores, num_regions)
        sel_orig = order[sel]
        top_boxes = cand_boxes[sel_orig]
        top_classes = cand_classes[sel_orig]
        top_valid = top_scores > 0

        # 4. crop regions from the full-res page (row-gather + MXU
        # interpolation matmul — per-pixel gathers profiled 340ms/page)
        crops = (
            crop_and_resize_mxu(
                pagef,
                top_boxes,
                out_size=emb_size,
                compute_dtype=jnp.bfloat16,
            )
            / 255.0
        )
        return top_boxes, top_scores, top_classes, top_valid, crops

    return detect_and_crop


def build_fused_detect_fn(
    detector: LayoutDetector,
    page_hw: Tuple[int, int],
    num_regions: int = 48,
    emb_size: int = 448,
    letterbox: bool = False,
    edge_filter: bool = True,
    closure_weights: bool = False,
    candidate_cap: int = 4,
    resize_dtype=jnp.bfloat16,
    combine_iou: float = 0.5,
    return_candidates: bool = False,
):
    """Jitted page → (boxes, scores, classes, valid, crops) WITHOUT the
    embedding forward: the two-program serving split for embedders whose
    combined program exceeds the remote compiler (e.g. the 1601-token
    Mllama vision tower at 48 crops — CLAUDE.md's documented limit).

    ``closure_weights=True`` inlines the (small) detector tree into the
    program as constants instead of passing it as a jit argument — XLA can
    then fold BatchNorm scales into conv weights and pre-lay-out
    constants. Safe only for small trees (large ones stall the remote
    compiler's HLO serialization — advisor r2 / CLAUDE.md)."""
    detect_and_crop = _make_detect_crop(
        detector, page_hw, num_regions, emb_size, letterbox=letterbox,
        edge_filter=edge_filter, candidate_cap=candidate_cap,
        resize_dtype=resize_dtype, combine_iou=combine_iou,
        return_candidates=return_candidates,
    )
    det_vars = _device_vars(detector.variables)
    if closure_weights:
        jitted1 = jax.jit(lambda page: detect_and_crop(det_vars, page))

        def fn(page):
            return jitted1(page)

        return fn
    jitted = jax.jit(detect_and_crop)

    def fn(page):
        return jitted(det_vars, page)

    return fn


def tile_crops_2x2(crops: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(K, 2·tile, 2·tile, C) → (K, 4, tile, tile, C) in the Mllama
    processor's row-major tile order (``mllama_processor.preprocess_image``:
    canvas.reshape(th, tile, tw, tile, 3).transpose(0, 2, 1, 3, 4))."""
    k, h, w, c = crops.shape
    assert h == 2 * tile and w == 2 * tile, (h, w, tile)
    t = crops.reshape(k, 2, tile, 2, tile, c)
    return t.transpose(0, 1, 3, 2, 4, 5).reshape(k, 4, tile, tile, c)


def build_fused_page_fn(
    detector: LayoutDetector,
    embedder: MultimodalEmbedder,
    page_hw: Tuple[int, int],
    num_regions: int = 48,
    embed_chunk: int = 0,
    letterbox: bool = False,
    edge_filter: bool = True,
    embed_tiles: int = 1,
    closure_weights: bool = False,
    auto_layouts: bool = False,
):
    """Compile the fused page function for a fixed page-shape bucket.

    Returns ``fn(page_uint8) -> PageResult`` (jitted, reusable for every
    page of that shape).

    ``embed_tiles=4`` (mme5 family only) crops each region at 2× the tile
    size and feeds the Mllama tower the 2×2 tiled canvas — the on-device
    counterpart of the host processor's multi-tile path for large regions
    (``/root/reference/deprecated_package/embedder.py:110-121``). Static
    shapes: every region uses the (2,2) arrangement (the optimal canvas for
    any region larger than one tile in both axes); single-tile stays the
    default for small-region workloads.
    """
    emb_size = embedder.image_size
    emb_image_fn_model = embedder.model
    emb_vars = embedder.variables
    family = embedder.config.family
    assert embed_tiles in (1, 4), embed_tiles
    if embed_tiles == 4 and family != "mme5":
        raise ValueError("embed_tiles=4 requires the tiled mme5 family")
    crop_size = emb_size * (2 if embed_tiles == 4 else 1)
    detect_and_crop = _make_detect_crop(
        detector, page_hw, num_regions, crop_size, letterbox=letterbox,
        edge_filter=edge_filter,
    )

    if family == "mme5":
        from multimodal_embeddings_tpu.models.mllama_processor import (
            aspect_ratio_to_id,
        )

        prompt_ids, prompt_mask = embedder.tokenizer.encode_batch(
            [embedder.config.prompt], embedder.text_len
        )
        prompt_ids = jnp.asarray(prompt_ids)
        prompt_mask = jnp.asarray(prompt_mask)
        # only the multi-tile path needs the (2,2) canvas id — single-tile
        # configs (e.g. mme5_2b, max_tiles=1) don't define it
        ar_id_2x2 = (
            aspect_ratio_to_id((2, 2), embedder.max_tiles)
            if embed_tiles == 4
            else None
        )

    def fused(det_vars, emb_vars, page: jnp.ndarray) -> PageResult:
        top_boxes, top_scores, top_classes, top_valid, crops = detect_and_crop(
            det_vars, page
        )
        if family == "mme5":
            # the Mllama processor feeds CLIP-normalized pixels
            from multimodal_embeddings_tpu.models.mllama_processor import (
                IMAGE_MEAN,
                IMAGE_STD,
            )

            crops = (crops - jnp.asarray(IMAGE_MEAN, crops.dtype)) / jnp.asarray(
                IMAGE_STD, crops.dtype
            )
            if embed_tiles == 4:
                crops = tile_crops_2x2(crops, emb_size)

            def embed_batch(batch_crops):
                n = batch_crops.shape[0]
                ids = jnp.broadcast_to(prompt_ids, (n, prompt_ids.shape[1]))
                mask = jnp.broadcast_to(prompt_mask, (n, prompt_mask.shape[1]))
                if embed_tiles == 4:
                    return emb_image_fn_model.apply(
                        emb_vars, ids, mask, batch_crops,
                        jnp.full((n,), ar_id_2x2, jnp.int32),
                        jnp.ones((n, 4), jnp.int32),
                    )
                return emb_image_fn_model.apply(emb_vars, ids, mask, batch_crops)

            if embed_chunk and embed_chunk < num_regions:
                # large parity embedders (Mllama vision = 1601 tokens/crop)
                # run the region batch in chunks under lax.map: the (N, H,
                # Lv, Lv) attention transient and the compiled program stay
                # single-chunk sized (48-at-once overflowed the remote
                # compiler)
                assert num_regions % embed_chunk == 0, (num_regions, embed_chunk)
                chunks = crops.reshape(
                    -1, embed_chunk, *crops.shape[1:]
                )
                emb = jax.lax.map(embed_batch, chunks)
                emb = emb.reshape(num_regions, -1)
            else:
                emb = embed_batch(crops)
        else:
            emb = emb_image_fn_model.apply(
                emb_vars, crops, method=emb_image_fn_model.encode_image
            )
        return PageResult(top_boxes, top_scores, top_classes, top_valid, emb)

    det_vars_dev = _device_vars(detector.variables)
    emb_vars_dev = _device_vars(emb_vars)
    # closure_weights: which trees to inline as program constants — XLA
    # folds BN into conv weights and pre-lays-out inlined parameters
    # (measured A/B — ROADMAP "weights as arguments"). True/"both" inlines
    # everything (ViT-B + detector ≈ 200MB of HLO constants — the tunnel's
    # remote compiler rejects the body with HTTP 413, kept for local
    # runtimes); "detector" inlines only the ~33MB conv tree, where the
    # constant folding actually pays (convs are 81% of page device time),
    # and keeps the embedder as an argument.
    mode = (
        "both" if closure_weights is True else (closure_weights or "none")
    )
    if mode == "both":
        jitted1 = jax.jit(
            lambda page: fused(det_vars_dev, emb_vars_dev, page)
        )

        def fn(page):
            return jitted1(page)
    elif mode == "detector":
        if auto_layouts:
            # Let XLA pick the ARGUMENT layouts for the embedder tree
            # instead of imposing the default major-to-minor ones: in args
            # mode layout assignment must honor the given input layouts and
            # pays activation relayout copies between fusions (measured
            # 39 ms/page — ROADMAP "args-mode regression"); AUTO recovers
            # the constant-layout freedom of closure mode without inlining
            # the tree into the HLO (tunnel HTTP 413 limit).
            from jax.experimental.layout import Format, Layout

            fmt_tree = jax.tree.map(
                lambda _: Format(Layout.AUTO), emb_vars_dev
            )
            jitted_a = jax.jit(
                lambda ev, page: fused(det_vars_dev, ev, page),
                in_shardings=(fmt_tree, None),
            )
            page_spec = jax.ShapeDtypeStruct(
                (*page_hw, 3), jnp.uint8
            )
            compiled = jitted_a.lower(emb_vars_dev, page_spec).compile()
            ev_fmts = compiled.input_formats[0][0]
            emb_vars_fmt = jax.tree.map(
                jax.device_put, emb_vars_dev, ev_fmts
            )

            def fn(page):
                return compiled(emb_vars_fmt, page)
        else:
            jitted_d = jax.jit(
                lambda ev, page: fused(det_vars_dev, ev, page)
            )

            def fn(page):
                return jitted_d(emb_vars_dev, page)
    elif mode == "embedder":
        jitted_e = jax.jit(
            lambda dv, page: fused(dv, emb_vars_dev, page)
        )

        def fn(page):
            return jitted_e(det_vars_dev, page)
    else:
        jitted = jax.jit(fused)

        def fn(page):
            return jitted(det_vars_dev, emb_vars_dev, page)

    # exposed for build_fused_batch_fn's vmap composition
    fn._fused3 = fused
    fn._vars = (det_vars_dev, emb_vars_dev)
    return fn


def build_split_page_fn(
    detector: LayoutDetector,
    embedder: MultimodalEmbedder,
    page_hw: Tuple[int, int],
    num_regions: int = 48,
    embed_chunk: int = 8,
    letterbox: bool = False,
    edge_filter: bool = True,
    embed_tiles: int = 1,
    closure_weights: bool = True,
    embed_closure: bool = False,
    text_chunk: int = 0,
):
    """Two-program serving split: ONE fused detect+crop program plus
    ``num_regions/embed_chunk`` executions of one compiled embed program,
    driven from the host loop.

    This is the required shape for large parity embedders: the combined
    detect+mme5-embed program exceeds the tunnel's remote compiler even
    with the embed batch chunked under ``lax.map`` (CLAUDE.md), and at 11B
    the vision attention transient bounds the chunk to 2. Same PageResult
    contract as ``build_fused_page_fn``.

    ``embed_closure=True`` (siglip family only) inlines the embedder tree
    into the embed program as constants — the split-program route to the
    constant folding that the single-program "both" mode gets, without one
    ~200MB HLO body (the tunnel rejects that with HTTP 413; each split
    program's body stays under the limit on its own). The mme5 trees
    (4-11GB) must always ride as arguments (CLAUDE.md).

    ``text_chunk=N`` (mme5 family only) DECOUPLES the vision and text
    microbatches: the vision tower runs at ``embed_chunk`` crops per
    program (its (N, H, Lv, Lv) attention transient is what bounds the
    chunk at 11B), the resulting ``vision_states`` are buffered on device,
    and the TEXT stack — weight-streaming-bound at M≈32 text tokens —
    runs at ``text_chunk`` crops per program, amortizing each ~5GB int8
    weight read over N crops instead of ``embed_chunk``. The reference
    runs one combined 11B forward per crop (``embedder.py:104-137``);
    the coupled path here dragged the text stack down to the vision
    chunk. Results equal the coupled path (same ops, split programs).
    """
    family = embedder.config.family
    if family not in ("mme5", "siglip"):
        raise ValueError(f"unsupported split-path family: {family}")
    if embed_closure and family != "siglip":
        raise ValueError(
            "embed_closure inlines the embedder tree into the HLO — only "
            "the small siglip tree fits (mme5 trees kill the remote "
            "compiler; CLAUDE.md)"
        )
    assert embed_tiles in (1, 4), embed_tiles
    assert num_regions % embed_chunk == 0, (num_regions, embed_chunk)
    if text_chunk and family != "mme5":
        raise ValueError(
            "text_chunk decouples the Mllama vision/text stacks — mme5 only"
        )
    emb_size = embedder.image_size
    crop_size = emb_size * (2 if embed_tiles == 4 else 1)
    # detector-closure by default: inlining the ~33MB conv tree as program
    # constants lets XLA lay out the conv stack freely — measured +20% on
    # the detect program vs weights-as-arguments (ROADMAP "args-mode
    # regression"); the big embedder tree always rides as an argument
    detect_fn = build_fused_detect_fn(
        detector, page_hw, num_regions, crop_size, letterbox=letterbox,
        edge_filter=edge_filter, closure_weights=closure_weights,
    )

    emb_model = embedder.model
    emb_vars_dev = _device_vars(embedder.variables)

    if family == "siglip":
        if embed_tiles != 1:
            raise ValueError("embed_tiles=4 requires the tiled mme5 family")

        @jax.jit
        def embed_fn(variables, crops):
            return emb_model.apply(
                variables, crops, method=emb_model.encode_image
            )

        if embed_closure:
            embed_jit = jax.jit(
                lambda crops: emb_model.apply(
                    emb_vars_dev, crops, method=emb_model.encode_image
                )
            )

            def embed_call(crops):
                return embed_jit(crops)
        else:

            def embed_call(crops):
                return embed_fn(emb_vars_dev, crops)
    else:
        from multimodal_embeddings_tpu.models.mllama_processor import (
            IMAGE_MEAN,
            IMAGE_STD,
            aspect_ratio_to_id,
        )

        prompt_ids, prompt_mask = embedder.tokenizer.encode_batch(
            [embedder.config.prompt], embedder.text_len
        )
        prompt_ids = jnp.asarray(prompt_ids)
        prompt_mask = jnp.asarray(prompt_mask)
        ar_id_2x2 = (
            aspect_ratio_to_id((2, 2), embedder.max_tiles)
            if embed_tiles == 4
            else None
        )

        @jax.jit
        def embed_fn(variables, crops):
            c = (crops - jnp.asarray(IMAGE_MEAN, crops.dtype)) / jnp.asarray(
                IMAGE_STD, crops.dtype
            )
            n = c.shape[0]
            ids = jnp.broadcast_to(prompt_ids, (n, prompt_ids.shape[1]))
            mask = jnp.broadcast_to(prompt_mask, (n, prompt_mask.shape[1]))
            if embed_tiles == 4:
                c = tile_crops_2x2(c, emb_size)
                return emb_model.apply(
                    variables, ids, mask, c,
                    jnp.full((n,), ar_id_2x2, jnp.int32),
                    jnp.ones((n, 4), jnp.int32),
                )
            return emb_model.apply(variables, ids, mask, c)

        def embed_call(crops):
            return embed_fn(emb_vars_dev, crops)

        if text_chunk:
            # decoupled microbatches (see docstring): vision program at
            # embed_chunk crops, text program at text_chunk crops over the
            # buffered vision_states
            assert num_regions % text_chunk == 0, (num_regions, text_chunk)

            @jax.jit
            def vision_fn(variables, crops):
                c = (
                    crops - jnp.asarray(IMAGE_MEAN, crops.dtype)
                ) / jnp.asarray(IMAGE_STD, crops.dtype)
                n = c.shape[0]
                if embed_tiles == 4:
                    c = tile_crops_2x2(c, emb_size)
                    states, _ = emb_model.apply(
                        variables, c,
                        jnp.full((n,), ar_id_2x2, jnp.int32),
                        jnp.ones((n, 4), jnp.int32),
                        method=emb_model.encode_vision,
                    )
                else:
                    states, _ = emb_model.apply(
                        variables, c, method=emb_model.encode_vision
                    )
                return states

            @jax.jit
            def text_fn(variables, states):
                n = states.shape[0]
                ids = jnp.broadcast_to(prompt_ids, (n, prompt_ids.shape[1]))
                mask = jnp.broadcast_to(
                    prompt_mask, (n, prompt_mask.shape[1])
                )
                # vision_mask=None: the serving path's tiles are all real,
                # so the cross-attention key mask is all-true == no mask
                return emb_model.apply(
                    variables, ids, mask, states,
                    method=emb_model.embed_from_vision,
                )

    flops_info: dict = {}

    def fn(page) -> PageResult:
        boxes, scores, classes, valid, crops = detect_fn(page)
        if not flops_info and family == "mme5" and not text_chunk:
            # XLA's FLOP estimate of the compiled embed program (for the
            # MFU line of the parity-architecture benchmark — mme5 only;
            # lowering the args-mode embed_fn in the siglip embed_closure
            # path would compile a second, unused program)
            try:
                cost = embed_fn.lower(
                    emb_vars_dev, crops[:embed_chunk]
                ).compile().cost_analysis()
                flops_info["embed_flops_per_chunk"] = float(
                    cost.get("flops", 0.0)
                )
            except Exception:  # pragma: no cover — analysis is best-effort
                flops_info["embed_flops_per_chunk"] = None
        if text_chunk:
            states = jnp.concatenate(
                [
                    vision_fn(emb_vars_dev, crops[i : i + embed_chunk])
                    for i in range(0, num_regions, embed_chunk)
                ]
            )
            embs = [
                text_fn(emb_vars_dev, states[i : i + text_chunk])
                for i in range(0, num_regions, text_chunk)
            ]
        else:
            embs = [
                embed_call(crops[i : i + embed_chunk])
                for i in range(0, num_regions, embed_chunk)
            ]
        return PageResult(boxes, scores, classes, valid, jnp.concatenate(embs))

    fn._flops_info = flops_info
    fn._chunk = embed_chunk
    fn._text_chunk = text_chunk or None
    return fn


def build_fused_batch_fn(
    detector: LayoutDetector,
    embedder: MultimodalEmbedder,
    page_hw: Tuple[int, int],
    num_regions: int = 48,
    mesh=None,
    letterbox: bool = False,
    edge_filter: bool = True,
):
    """Multi-page variant: vmap the fused page function over a page batch,
    optionally sharding the batch over the mesh's data axis (the multi-chip
    serving path — each chip processes its shard of pages, XLA handles the
    layout; replicated weights ride ICI only once).

    Returns ``fn(pages_uint8 (B, H, W, C)) -> PageResult`` with leading
    batch dims on every field.
    """
    import functools as _functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_embeddings_tpu.core.mesh import DATA_AXIS

    page_fn = build_fused_page_fn(
        detector, embedder, page_hw, num_regions, letterbox=letterbox,
        edge_filter=edge_filter,
    )
    # vmap the 3-arg fused body over the page axis only — variables stay
    # broadcast jit ARGUMENTS (uploaded once, never inlined into the HLO)
    det_vars_dev, emb_vars_dev = page_fn._vars
    batched3 = jax.jit(jax.vmap(page_fn._fused3, in_axes=(None, None, 0)))

    def batched(pages):
        return batched3(det_vars_dev, emb_vars_dev, pages)

    if mesh is None:
        return batched

    sharding = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    # weights ride as replicated arguments; leave anything already
    # mesh-sharded (e.g. a TP embedder) untouched
    rep = NamedSharding(mesh, P())

    def _replicate(tree):
        return jax.tree.map(
            lambda x: x
            if isinstance(x, jax.Array) and len(x.sharding.device_set) > 1
            else jax.device_put(x, rep),
            tree,
        )

    det_rep = _replicate(det_vars_dev)
    emb_rep = _replicate(emb_vars_dev)

    def sharded(pages):
        pages = jax.device_put(pages, sharding)
        return batched3(det_rep, emb_rep, pages)

    return sharded


def build_split_batch_fn(
    detector: LayoutDetector,
    embedder: MultimodalEmbedder,
    page_hw: Tuple[int, int],
    num_regions: int = 48,
    embed_chunk: int = 8,
    letterbox: bool = False,
    edge_filter: bool = True,
    mesh=None,
):
    """Data-parallel variant of the two-program split: a page BATCH runs
    the detect+crop program vmapped over the data axis, then each region
    chunk runs the embed program vmapped over the same axis — every chip
    serves its own page with replicated weights (the reference's per-GPU
    round-robin, ``deprecated_package/embedder.py:190-224``, as sharded
    XLA programs). This is the multi-chip serving shape for the PARITY
    embedder: an 11B int8 tree fills most of one chip, so scaling is one
    page per chip over the data axis rather than intra-page parallelism.

    Returns ``fn(pages_uint8 (B, H, W, C)) -> PageResult`` with leading
    batch dims. Per-page results equal ``build_split_page_fn`` (the
    single-page split) within vmap-reassociation tolerance.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_embeddings_tpu.core.mesh import DATA_AXIS

    family = embedder.config.family
    if family not in ("mme5", "siglip"):
        raise ValueError(f"unsupported split-batch family: {family}")
    assert num_regions % embed_chunk == 0, (num_regions, embed_chunk)
    emb_size = embedder.image_size

    detect2 = _make_detect_crop(
        detector, page_hw, num_regions, emb_size, letterbox=letterbox,
        edge_filter=edge_filter,
    )
    det_vars_dev = _device_vars(detector.variables)
    emb_model = embedder.model
    emb_vars_dev = _device_vars(embedder.variables)

    batched_detect = jax.jit(jax.vmap(detect2, in_axes=(None, 0)))

    if family == "siglip":

        def embed_one(variables, crops):  # crops: (chunk, S, S, C)
            return emb_model.apply(
                variables, crops, method=emb_model.encode_image
            )

    else:
        from multimodal_embeddings_tpu.models.mllama_processor import (
            IMAGE_MEAN,
            IMAGE_STD,
        )

        prompt_ids, prompt_mask = embedder.tokenizer.encode_batch(
            [embedder.config.prompt], embedder.text_len
        )
        prompt_ids = jnp.asarray(prompt_ids)
        prompt_mask = jnp.asarray(prompt_mask)

        def embed_one(variables, crops):
            c = (crops - jnp.asarray(IMAGE_MEAN, crops.dtype)) / jnp.asarray(
                IMAGE_STD, crops.dtype
            )
            n = c.shape[0]
            ids = jnp.broadcast_to(prompt_ids, (n, prompt_ids.shape[1]))
            mask = jnp.broadcast_to(prompt_mask, (n, prompt_mask.shape[1]))
            return emb_model.apply(variables, ids, mask, c)

    # (B, chunk, S, S, C) → (B, chunk, D); page axis stays outermost so a
    # data-axis sharding keeps each page's embed forward on its own chip
    batched_embed = jax.jit(jax.vmap(embed_one, in_axes=(None, 0)))

    if mesh is not None:
        page_sharding = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
        rep = NamedSharding(mesh, P())

        def _replicate(tree):
            return jax.tree.map(
                lambda x: x
                if isinstance(x, jax.Array) and len(x.sharding.device_set) > 1
                else jax.device_put(x, rep),
                tree,
            )

        det_vars_dev = _replicate(det_vars_dev)
        emb_vars_dev = _replicate(emb_vars_dev)

    def fn(pages) -> PageResult:
        if mesh is not None:
            pages = jax.device_put(pages, page_sharding)
        boxes, scores, classes, valid, crops = batched_detect(
            det_vars_dev, pages
        )
        embs = [
            batched_embed(emb_vars_dev, crops[:, i : i + embed_chunk])
            for i in range(0, num_regions, embed_chunk)
        ]
        return PageResult(
            boxes, scores, classes, valid, jnp.concatenate(embs, axis=1)
        )

    fn._chunk = embed_chunk
    return fn
