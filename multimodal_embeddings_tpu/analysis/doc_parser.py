"""Document-to-HTML parsing workflow (Qwen2.5-VL stretch path).

Equivalent of the reference notebook's ``inference`` / ``draw_bbox`` /
``clean_and_format_html`` cells (``QWEN2_5_document_parsing.ipynb``):
build a chat prompt asking for "QwenVL HTML", generate, recover the
effective input resolution from the patch grid, parse ``data-bbox``
attributes, draw scaled boxes, and strip parser attributes to ordinary
HTML. HTML handling uses the stdlib ``html.parser`` (no bs4 dependency).
"""

from __future__ import annotations

import dataclasses
import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, ImageDraw

from multimodal_embeddings_tpu.io.logging_setup import get_logger

logger = get_logger("doc_parser")

# CLIP normalization constants — the HF Qwen2VLImageProcessor defaults the
# reference notebook's AutoProcessor applies (OPENAI_CLIP_MEAN/STD; cell
# ``39512aca`` builds the processor, ``d43bacc8`` feeds it pages). The same
# constants the Mllama tile processor uses (models/mllama_processor.py:38).
# Feeding raw [0,1] pixels to a real checkpoint would silently skew every
# vision activation; synthetic-weight behavior is unaffected either way.
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_page(image: Image.Image, input_w: int, input_h: int) -> np.ndarray:
    """Page → (1, H, W, 3) float32 model input: bilinear resize, 1/255
    rescale, CLIP mean/std normalization (the notebook processor's
    pipeline; smart_resize/fixed-grid sizing happens in the caller)."""
    arr = (
        np.asarray(image.resize((input_w, input_h), Image.BILINEAR), np.float32)
        / 255.0
    )
    arr = (arr - np.asarray(IMAGE_MEAN, np.float32)) / np.asarray(
        IMAGE_STD, np.float32
    )
    return arr[None]


SYSTEM_PROMPT = (
    "You are an AI specialized in recognizing and extracting text from "
    "images. Your mission is to analyze the image document and generate the "
    "result in QwenVL Document Parser HTML format using specified tags "
    "while maintaining user privacy and data integrity."
)
USER_PROMPT = "QwenVL HTML "


@dataclasses.dataclass
class BBoxElement:
    tag: str
    bbox: Tuple[int, int, int, int]
    text: str


class _BBoxExtractor(HTMLParser):
    """Collect elements carrying a data-bbox attribute with their text,
    reproducing the notebook's filtering (skip <ol> containers, keep <li>
    children and everything else)."""

    def __init__(self):
        super().__init__()
        self._stack: List[Tuple[str, Optional[str]]] = []
        self._open: List[Tuple[str, Tuple[int, int, int, int], List[str]]] = []
        self.elements: List[BBoxElement] = []

    def handle_starttag(self, tag, attrs):
        attrs = dict(attrs)
        parent = self._stack[-1][0] if self._stack else None
        self._stack.append((tag, parent))
        bbox_str = attrs.get("data-bbox")
        if not bbox_str:
            return
        if tag == "ol":
            return  # containers are skipped
        try:
            coords = tuple(int(v) for v in bbox_str.split())
            if len(coords) != 4:
                return
        except ValueError:
            return
        self._open.append((tag, coords, []))

    def handle_data(self, data):
        for entry in self._open:
            entry[2].append(data)

    def handle_endtag(self, tag):
        if self._stack and self._stack[-1][0] == tag:
            self._stack.pop()
        if self._open and self._open[-1][0] == tag:
            name, coords, chunks = self._open.pop()
            self.elements.append(
                BBoxElement(name, coords, "".join(chunks).strip())
            )


def extract_bbox_elements(html: str) -> List[BBoxElement]:
    parser = _BBoxExtractor()
    parser.feed(html)
    # close any unterminated elements
    while parser._open:
        name, coords, chunks = parser._open.pop()
        parser.elements.append(BBoxElement(name, coords, "".join(chunks).strip()))
    return parser.elements


def draw_bbox(
    image_path: str,
    resized_width: int,
    resized_height: int,
    html: str,
    output_path: Optional[str] = None,
) -> Image.Image:
    """Draw the parsed boxes back onto the original image, undoing the
    model-input rescale (notebook ``draw_bbox`` semantics: model bbox
    coords are in resized space; divide by resized/original scale)."""
    image = Image.open(image_path).convert("RGB")
    scale_x = resized_width / image.width
    scale_y = resized_height / image.height
    draw = ImageDraw.Draw(image)
    for el in extract_bbox_elements(html):
        x1, y1, x2, y2 = el.bbox
        x1, x2 = sorted((int(x1 / scale_x), int(x2 / scale_x)))
        y1, y2 = sorted((int(y1 / scale_y), int(y2 / scale_y)))
        draw.rectangle([x1, y1, x2, y2], outline="red", width=2)
        if el.text:
            draw.text((x1, y2), el.text[:80], fill="black")
    if output_path:
        image.save(output_path)
    return image


_COLOR_STYLE = re.compile(r"\bcolor:[^;\"']+;?")
_DATA_ATTR = re.compile(r"\s+data-(?:bbox|polygon)=(\"[^\"]*\"|'[^']*')")
_STYLE_ATTR = re.compile(r"(\sstyle=)(\"[^\"]*\"|'[^']*')")


def clean_and_format_html(html: str) -> str:
    """Strip data-bbox/data-polygon attributes and color styles, producing
    ordinary HTML (notebook ``clean_and_format_html`` semantics)."""

    def clean_style(match):
        quote = match.group(2)[0]
        inner = match.group(2)[1:-1]
        cleaned = _COLOR_STYLE.sub("", inner).strip().rstrip(";")
        if not cleaned:
            return ""
        return f"{match.group(1)}{quote}{cleaned}{quote}"

    html = _STYLE_ATTR.sub(clean_style, html)
    return _DATA_ATTR.sub("", html)


def round_to_patch_grid(width: int, height: int, patch: int = 14, merge: int = 2) -> Tuple[int, int]:
    """Effective model-input resolution: dims rounded to the merged patch
    grid (the notebook reads ``image_grid_thw * 14``)."""
    unit = patch * merge
    return (max(unit, round(width / unit) * unit), max(unit, round(height / unit) * unit))


def smart_resize(
    height: int,
    width: int,
    factor: int = 28,
    min_pixels: int = 56 * 56,
    max_pixels: int = 1280 * 28 * 28,
) -> Tuple[int, int]:
    """Qwen2.5-VL native-resolution sizing (``qwen_vl_utils.smart_resize``):
    round each side to the merged-patch factor preserving aspect ratio,
    then scale into the [min_pixels, max_pixels] budget. Returns
    (height, width)."""
    import math

    if max(height, width) / min(height, width) > 200:
        raise ValueError("absurd aspect ratio")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


class DocumentParser:
    """End-to-end page→HTML parser driving a QwenVL-family model."""

    def __init__(
        self,
        model,
        variables,
        tokenizer,
        image_size: int = 448,
        dynamic_resolution: bool = False,
        max_pixels: Optional[int] = None,
        pp_mesh=None,
        pp_stages: Optional[int] = None,
        dp_mesh=None,
        prefill_chunk: int = 0,
    ):
        """``dynamic_resolution=True`` runs the Qwen2.5-VL native-aspect
        path: the page is smart-resized onto its own merged-patch grid
        (aspect preserved, pixel budget ``max_pixels``, default
        image_size²) instead of a fixed square — each distinct grid shape
        compiles once (static shapes).

        ``pp_stages``/``pp_mesh`` pipeline the decoder stack over a
        ``stage`` mesh axis (``models/qwen_pp.py``) — the serving shape
        for the notebook's 32B flagship, whose decoder does not fit one
        chip (fit math: ``models/qwen_vl.py::qwen25_vl_32b``). Token
        output equals the single-device decode (test-locked).

        ``dp_mesh`` data-parallels ``parse_batch`` over the mesh's
        ``data`` axis: pages shard on the batch dim, weights replicate,
        and the SAME jitted generate program runs SPMD — the multi-chip
        throughput shape for bulk parsing (batched decode amortizes the
        weight stream per chip; dp multiplies chips). Artifacts equal the
        single-device parse (test-locked). Mutually exclusive with the
        PP ring.

        ``prefill_chunk=C`` prefills ``parse_batch`` C pages at a time
        (token-identical; ``models/qwen_vl.py::build_generate_fns``) so
        the decode batch — whose per-step cost amortizes the weight
        stream near-flat — can exceed what one whole-batch prefill's
        attention-logits transient fits. Ignored under ``dp_mesh`` (the
        sharded batch must stay one SPMD program)."""
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.dynamic_resolution = dynamic_resolution
        self.max_pixels = max_pixels or image_size * image_size
        if (pp_mesh is None) != (pp_stages is None):
            raise ValueError("pp_mesh and pp_stages must be set together")
        if dp_mesh is not None and pp_mesh is not None:
            raise ValueError("dp_mesh and pp_mesh are mutually exclusive")
        self.pp_mesh = pp_mesh
        self.pp_stages = pp_stages
        self.dp_mesh = dp_mesh
        self.prefill_chunk = prefill_chunk
        self._dp_variables = None

    def build_prompt_ids(self, n_image_tokens: int, max_len: int) -> np.ndarray:
        """Chat-template prompt with image-pad placeholders spliced in."""
        cfg = self.model.config
        prefix, _ = self.tokenizer.encode(
            f"system: {SYSTEM_PROMPT}\nuser: {USER_PROMPT}", max_len
        )
        prefix = prefix[np.nonzero(prefix)[0]]  # strip padding
        pads = np.full(n_image_tokens, cfg.image_pad_id, np.int32)
        suffix, _ = self.tokenizer.encode("\nassistant:", 16)
        suffix = suffix[np.nonzero(suffix)[0]]
        ids = np.concatenate([prefix, pads, suffix])[:max_len]
        return ids[None].astype(np.int32)

    def _input_size(self, image: Image.Image) -> Tuple[int, int]:
        """Model-input (width, height) for a page: its own smart-resized
        merged-patch grid under dynamic resolution, else the fixed square."""
        unit = self.model.config.vision.patch_size * self.model.config.vision.merge_size
        if self.dynamic_resolution:
            # Qwen2.5-VL native resolution: the page keeps its aspect
            # ratio on its own merged-patch grid; data-bbox coordinates
            # live in this resolution (image_grid_thw * patch)
            input_h, input_w = smart_resize(
                image.height,
                image.width,
                factor=unit,
                min_pixels=unit * unit,
                max_pixels=self.max_pixels,
            )
        else:
            # fixed square input (one compile for every page shape)
            input_w, input_h = round_to_patch_grid(
                self.image_size, self.image_size,
                self.model.config.vision.patch_size,
                self.model.config.vision.merge_size,
            )
        return input_w, input_h

    def _prompt_ids(self, input_w: int, input_h: int, max_new_tokens: int) -> np.ndarray:
        unit = self.model.config.vision.patch_size * self.model.config.vision.merge_size
        n_tokens = (input_h // unit) * (input_w // unit)
        # leave generation headroom inside the static KV cache
        prompt_budget = self.model.config.text.max_len - max_new_tokens
        if prompt_budget < n_tokens + 4:
            raise ValueError(
                f"max_new_tokens={max_new_tokens} leaves no prompt room within "
                f"max_len={self.model.config.text.max_len}"
            )
        return self.build_prompt_ids(n_tokens, prompt_budget)

    def parse_batch(
        self, image_paths: List[str], max_new_tokens: int = 256
    ) -> List[Tuple[str, int, int]]:
        """Batched page parsing: pages whose model-input grids match run as
        ONE stacked prefill+decode program (results in input order,
        identical tokens to per-page ``parse`` — the whole generate path is
        batch-row-independent).

        Why this exists: single-page greedy decode is WEIGHT-STREAMING
        bound — 9.0 ms/token at 3B bf16 ≈ the 6GB tree's HBM read per step,
        prompt-length-insensitive (BENCH_PARSE.json) — so a batch of B
        pages amortizes the same weight stream over B tokens/step. The
        reference notebook parses strictly one page per ``generate`` call
        (``QWEN2_5_document_parsing.ipynb`` cell ``d43bacc8``); this is the
        TPU-native throughput shape for bulk page parsing. Fixed-resolution
        mode puts every page in one bucket; dynamic resolution buckets by
        smart-resize grid."""
        if self.pp_stages:
            # the PP ring's microbatching is its own schedule; keep per-page
            return [self.parse(p, max_new_tokens) for p in image_paths]
        from multimodal_embeddings_tpu.models.qwen_vl import greedy_generate

        buckets: dict = {}
        for i, path in enumerate(image_paths):
            image = Image.open(path).convert("RGB")
            size = self._input_size(image)
            buckets.setdefault(size, []).append((i, image))
        results: List[Optional[Tuple[str, int, int]]] = [None] * len(image_paths)
        for (input_w, input_h), items in buckets.items():
            ids1 = self._prompt_ids(input_w, input_h, max_new_tokens)
            arr = np.concatenate(
                [preprocess_page(img, input_w, input_h) for _, img in items]
            )
            ids = np.tile(ids1, (len(items), 1))
            variables = self.variables
            if self.dp_mesh is not None:
                from multimodal_embeddings_tpu.core.mesh import (
                    pad_to_multiple,
                    replicated,
                    shard_batch,
                )

                dp = self.dp_mesh.shape["data"]
                padded = pad_to_multiple(len(items), dp)
                if padded != len(items):
                    # repeat the last page so the batch divides the data
                    # axis; surplus rows are dropped below
                    reps = padded - len(items)
                    ids = np.concatenate([ids, np.tile(ids[-1:], (reps, 1))])
                    arr = np.concatenate(
                        [arr, np.tile(arr[-1:], (reps, 1, 1, 1))]
                    )
                ids = shard_batch(self.dp_mesh, ids)
                arr = shard_batch(self.dp_mesh, arr)
                if self._dp_variables is None:
                    import jax

                    self._dp_variables = jax.device_put(
                        self.variables, replicated(self.dp_mesh)
                    )
                variables = self._dp_variables
            out_tokens = greedy_generate(
                self.model, variables, ids, arr,
                max_new_tokens=max_new_tokens,
                prefill_chunk=(
                    0 if self.dp_mesh is not None else self.prefill_chunk
                ),
            )
            for row, (i, _) in zip(out_tokens, items):
                results[i] = (self.decode_tokens(row), input_h, input_w)
        return results  # type: ignore[return-value]

    def parse_continuous(
        self,
        image_paths: List[str],
        max_new_tokens: int = 256,
        batch: int = 8,
        chunk: int = 64,
    ) -> List[Tuple[str, int, int]]:
        """Continuous-batching bulk parse (``models/qwen_serve.py``): a
        fixed ``batch``-row decoder with per-row cache depths serves the
        page queue, retiring each row at its own EOS and splicing the
        next page in at ``chunk``-step boundaries.

        ``parse_batch`` exits each wave at its SLOWEST page (wall tracks
        max(row stops) — measured r5-04); per-row exit tracks the MEAN
        page length instead, which is where real checkpoints spend most
        pages (HTML output is much shorter than max_new_tokens on sparse
        pages). Tokens are identical to per-page ``parse`` (test-locked).
        Pages bucket by model-input grid exactly like ``parse_batch``."""
        from multimodal_embeddings_tpu.models.qwen_serve import (
            continuous_generate,
        )

        buckets: dict = {}
        for i, path in enumerate(image_paths):
            image = Image.open(path).convert("RGB")
            size = self._input_size(image)
            buckets.setdefault(size, []).append((i, image))
        results: List[Optional[Tuple[str, int, int]]] = (
            [None] * len(image_paths)
        )
        for (input_w, input_h), items in buckets.items():
            ids1 = self._prompt_ids(input_w, input_h, max_new_tokens)
            pages = [
                (ids1[0], preprocess_page(img, input_w, input_h)[0])
                for _, img in items
            ]
            outs = continuous_generate(
                self.model, self.variables, pages,
                batch=min(batch, len(pages)),
                max_new_tokens=max_new_tokens, chunk=chunk,
            )
            for row, (i, _) in zip(outs, items):
                results[i] = (self.decode_tokens(row), input_h, input_w)
        return results  # type: ignore[return-value]

    def parse(
        self, image_path: str, max_new_tokens: int = 256
    ) -> Tuple[str, int, int]:
        """Returns (html, input_height, input_width) like the notebook's
        ``inference``."""
        from multimodal_embeddings_tpu.models.qwen_vl import greedy_generate

        image = Image.open(image_path).convert("RGB")
        input_w, input_h = self._input_size(image)
        arr = preprocess_page(image, input_w, input_h)
        ids = self._prompt_ids(input_w, input_h, max_new_tokens)
        if self.pp_stages:
            from multimodal_embeddings_tpu.models.qwen_pp import (
                pp_greedy_generate,
            )

            out_tokens = pp_greedy_generate(
                self.model.config,
                self.variables,
                ids,
                mesh=self.pp_mesh,
                n_stages=self.pp_stages,
                max_new_tokens=max_new_tokens,
                images=arr,
            )
        else:
            out_tokens = greedy_generate(
                self.model, self.variables, ids, arr,
                max_new_tokens=max_new_tokens,
            )
        text = self.decode_tokens(out_tokens[0])
        return text, input_h, input_w

    def decode_tokens(self, tokens: np.ndarray) -> str:
        """Byte-tokenizer decode (HF tokenizers provide their own)."""
        from multimodal_embeddings_tpu.models.tokenizer import (
            BYTE_OFFSET,
            EOS_ID,
        )

        chars = []
        for t in tokens:
            if t == EOS_ID:
                break
            byte = int(t) - BYTE_OFFSET
            if 0 <= byte < 256:  # skip specials and (random-weight) overflow ids
                chars.append(byte)
        return bytes(chars).decode("utf-8", errors="replace")
