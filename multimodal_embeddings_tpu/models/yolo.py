"""DocLayout-YOLO detector: a YOLOv10-family network in Flax.

The reference runs ``YOLOv10.predict(image, imgsz=1024, conf=0.1)`` from the
external ``doclayout_yolo`` package on the DocStructBench checkpoint
(``1_doclayout_bboxes.py:120-130,205-215``; 10-class taxonomy at ``:67-78``).
This module re-derives the network: CSP backbone (C2f / C2fCIB, SCDown,
SPPF, PSA), PAN neck, and the NMS-free v10 detection head (one-to-one
branch with distribution-focal-loss box regression). Scales n/s/m/b/l/x are
parameterized by (depth, width, max-channel) multiples; the DocStructBench
model is the "m" scale at imgsz 1024.

TPU-first choices: NHWC everywhere, bf16 compute / f32 params policy,
single jitted forward over an arbitrary batch (all 30 grid views of a page
run as ONE batch instead of 30 sequential predicts), static top-k selection
in the head (max_det boxes), no data-dependent shapes anywhere.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_embeddings_tpu.models.layers import (
    C2f,
    ConvBnAct,
    G2L_CRM,
    PSA,
    SCDown,
    SPPF,
    upsample2x,
)


@dataclasses.dataclass(frozen=True)
class YoloScale:
    depth: float
    width: float
    max_channels: int


SCALES: Dict[str, YoloScale] = {
    "n": YoloScale(0.33, 0.25, 1024),
    "s": YoloScale(0.33, 0.50, 1024),
    "m": YoloScale(0.67, 0.75, 768),
    "b": YoloScale(0.67, 1.00, 512),
    "l": YoloScale(1.00, 1.00, 512),
    "x": YoloScale(1.00, 1.25, 512),
}

REG_MAX = 16  # DFL bins per box side
STRIDES = (8, 16, 32)


def _ch(base: int, scale: YoloScale) -> int:
    """Scaled channel count, rounded to a multiple of 8 (ultralytics
    make_divisible convention)."""
    c = min(base, scale.max_channels) * scale.width
    return max(8, int(math.ceil(c / 8) * 8))


def _depth(n: int, scale: YoloScale) -> int:
    return max(1, round(n * scale.depth))


class Backbone(nn.Module):
    """CSP backbone. ``glcrm=True`` swaps the P2/P3/P4 CSP stages for
    DocLayout-YOLO's G2L_CRM blocks (the DocStructBench architecture;
    dilation grows with stage depth) — same cv1/cv2/m{i} naming so the
    ultralytics checkpoint index map is shared with base v10."""

    scale: YoloScale
    s2d_stem: bool = False
    glcrm: bool = False
    pallas_convs: int = 0  # max CRM inner channels routed to the Pallas conv
    pallas_mode: str = "stage"  # "stage" | "block" layout boundary placement
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s, dt = self.scale, self.dtype

        def csp(ch, n, dilation, name):
            if self.glcrm:
                return G2L_CRM(
                    ch, n, dilation=dilation, shortcut=True,
                    pallas_max_channels=self.pallas_convs,
                    pallas_mode=self.pallas_mode, dtype=dt, name=name
                )
            return C2f(ch, n, shortcut=True, dtype=dt, name=name)

        # s2d_stem: exact space-to-depth evaluation of the stem conv (same
        # parameters) — raises MXU utilization of the bandwidth-bound
        # full-resolution first layer
        x = ConvBnAct(
            _ch(64, s), 3, 2, s2d=self.s2d_stem, dtype=dt, name="stem"
        )(x, train)  # P1/2
        x = ConvBnAct(_ch(128, s), 3, 2, dtype=dt, name="down2")(x, train)  # P2/4
        x = csp(_ch(128, s), _depth(3, s), 2, "c2f_2")(x, train)
        x = ConvBnAct(_ch(256, s), 3, 2, dtype=dt, name="down3")(x, train)  # P3/8
        p3 = csp(_ch(256, s), _depth(6, s), 2, "c2f_3")(x, train)
        x = SCDown(_ch(512, s), 3, 2, dtype=dt, name="down4")(p3, train)  # P4/16
        p4 = csp(_ch(512, s), _depth(6, s), 4, "c2f_4")(x, train)
        x = SCDown(_ch(1024, s), 3, 2, dtype=dt, name="down5")(p4, train)  # P5/32
        x = C2f(
            _ch(1024, s),
            _depth(3, s),
            shortcut=True,
            use_cib=True,
            dtype=dt,
            name="c2fcib_5",
        )(x, train)
        x = SPPF(_ch(1024, s), dtype=dt, name="sppf")(x, train)
        p5 = PSA(_ch(1024, s), dtype=dt, name="psa")(x, train)
        return p3, p4, p5


class PANNeck(nn.Module):
    scale: YoloScale
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p3, p4, p5, train: bool = False):
        s, dt = self.scale, self.dtype
        # top-down
        x = jnp.concatenate([upsample2x(p5), p4], axis=-1)
        n4 = C2f(_ch(512, s), _depth(3, s), dtype=dt, name="td_c2f_4")(x, train)
        x = jnp.concatenate([upsample2x(n4), p3], axis=-1)
        n3 = C2f(_ch(256, s), _depth(3, s), dtype=dt, name="td_c2f_3")(x, train)
        # bottom-up
        x = ConvBnAct(_ch(256, s), 3, 2, dtype=dt, name="bu_down_3")(n3, train)
        x = jnp.concatenate([x, n4], axis=-1)
        m4 = C2f(
            _ch(512, s), _depth(3, s), shortcut=True, use_cib=True, dtype=dt,
            name="bu_c2fcib_4",
        )(x, train)
        x = SCDown(_ch(512, s), 3, 2, dtype=dt, name="bu_down_4")(m4, train)
        x = jnp.concatenate([x, p5], axis=-1)
        m5 = C2f(
            _ch(1024, s), _depth(3, s), shortcut=True, use_cib=True, dtype=dt,
            name="bu_c2fcib_5",
        )(x, train)
        return n3, m4, m5


class DetectHead(nn.Module):
    """v10 one-to-one detection head: per-level regression (4·REG_MAX DFL
    logits) and depthwise-separable classification branches."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...], train: bool = False):
        outputs = []
        c2 = max(16, feats[0].shape[-1] // 4, REG_MAX * 4)
        c3 = max(feats[0].shape[-1], min(self.num_classes, 100))
        for i, f in enumerate(feats):
            ch = f.shape[-1]
            reg = ConvBnAct(c2, 3, dtype=self.dtype, name=f"reg{i}_cv1")(f, train)
            reg = ConvBnAct(c2, 3, dtype=self.dtype, name=f"reg{i}_cv2")(reg, train)
            reg = nn.Conv(
                4 * REG_MAX, (1, 1), dtype=self.dtype, name=f"reg{i}_out"
            )(reg)
            cls = ConvBnAct(ch, 3, groups=ch, dtype=self.dtype, name=f"cls{i}_dw1")(
                f, train
            )
            cls = ConvBnAct(c3, 1, dtype=self.dtype, name=f"cls{i}_pw1")(cls, train)
            cls = ConvBnAct(c3, 3, groups=c3, dtype=self.dtype, name=f"cls{i}_dw2")(
                cls, train
            )
            cls = ConvBnAct(c3, 1, dtype=self.dtype, name=f"cls{i}_pw2")(cls, train)
            cls = nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype, name=f"cls{i}_out"
            )(cls)
            outputs.append((reg, cls))
        return outputs


class DocLayoutYOLO(nn.Module):
    """Full detector. ``__call__`` returns raw per-level (reg, cls) maps;
    use ``yolo_decode.decode_predictions`` for boxes."""

    num_classes: int = 10
    variant: str = "m"
    s2d_stem: bool = False
    glcrm: bool = False
    pallas_convs: int = 0
    pallas_mode: str = "stage"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images: (B, H, W, 3) float32 in [0, 1]."""
        scale = SCALES[self.variant]
        x = images.astype(self.dtype)
        p3, p4, p5 = Backbone(
            scale,
            s2d_stem=self.s2d_stem,
            glcrm=self.glcrm,
            pallas_convs=self.pallas_convs,
            pallas_mode=self.pallas_mode,
            dtype=self.dtype,
            name="backbone",
        )(x, train)
        n3, n4, n5 = PANNeck(scale, dtype=self.dtype, name="neck")(p3, p4, p5, train)
        return DetectHead(self.num_classes, dtype=self.dtype, name="head")(
            (n3, n4, n5), train
        )
