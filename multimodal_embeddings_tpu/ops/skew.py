"""Skew-angle estimation on TPU (stage 0).

The reference estimates page skew with Tesseract OSD (subprocess) and an
OpenCV chain — blur → adaptive threshold → Canny → HoughLinesP → median line
angle with a std<10° reliability gate (``0_orientation.py:98-201``), taking
the OpenCV estimate when available.

Probabilistic Hough is a serial, randomized native algorithm; the TPU-native
equivalent used here is the classic *projection-profile* skew estimator: for
each candidate angle, project the edge map onto the axis perpendicular to
the text lines and score the profile's sharpness (energy of its first
difference). The true skew maximizes sharpness because text lines collapse
into narrow peaks. The scan vectorizes as a dense scatter-add per angle
(``lax.map`` over a static angle grid), runs coarse→fine
(1° over ±45°, then 0.05° around the winner), and everything is
static-shape jitted.

Returned confidence = peak sharpness over the median of the coarse scan; the
caller applies a reliability gate analogous to the reference's angle-std
check.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_embeddings_tpu.ops.image import (
    adaptive_threshold_gaussian,
    edge_map,
    gaussian_blur,
    resize_bilinear,
    rgb_to_gray,
)

WORK_SIZE = 768  # static working resolution for the estimator
COARSE_RANGE = 45.0
COARSE_STEP = 1.0
FINE_STEP = 0.05
FINE_HALF_WIDTH = 1.0


class SkewEstimate(NamedTuple):
    angle: jnp.ndarray  # degrees; positive = text lines rotated CCW
    confidence: jnp.ndarray  # peak/median sharpness ratio of the coarse scan


def _profile_sharpness(edges: jnp.ndarray, angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Sharpness score per candidate angle.

    For angle θ each edge pixel votes (bilinearly) into the bin of its
    rotated row coordinate ``r = y·cosθ − x·sinθ``; the score is the mean
    squared first-difference of the resulting profile.
    """
    h, w = edges.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - (h - 1) / 2
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - (w - 1) / 2
    n_bins = int(np.ceil(np.hypot(h, w))) + 2
    offset = (n_bins - 1) / 2.0
    flat_edges = edges.reshape(-1)
    ys_f = ys.reshape(-1)
    xs_f = xs.reshape(-1)

    def score_one(theta_deg):
        theta = theta_deg * (jnp.pi / 180.0)
        r = ys_f * jnp.cos(theta) - xs_f * jnp.sin(theta) + offset
        r0 = jnp.floor(r)
        frac = r - r0
        r0i = jnp.clip(r0.astype(jnp.int32), 0, n_bins - 1)
        r1i = jnp.clip(r0i + 1, 0, n_bins - 1)
        profile = jnp.zeros((n_bins,), jnp.float32)
        profile = profile.at[r0i].add(flat_edges * (1 - frac))
        profile = profile.at[r1i].add(flat_edges * frac)
        diff = profile[1:] - profile[:-1]
        return jnp.mean(diff * diff)

    return jax.lax.map(score_one, angles_deg)


@jax.jit
def _estimate_skew_worked(gray_work: jnp.ndarray, mask: jnp.ndarray) -> SkewEstimate:
    """Core estimator on a fixed WORK_SIZE×WORK_SIZE grayscale canvas.

    ``mask`` zeroes edge votes outside the (aspect-preserved, centered)
    content region so the canvas border contributes no artificial
    axis-aligned lines.
    """
    blurred = gaussian_blur(gray_work, ksize=5, sigma=0.0)
    binary = adaptive_threshold_gaussian(blurred, block_size=11, c=2.0)
    edges = edge_map(binary, low=50.0, high=150.0) * mask

    coarse_angles = jnp.arange(
        -COARSE_RANGE, COARSE_RANGE + COARSE_STEP, COARSE_STEP, dtype=jnp.float32
    )
    coarse = _profile_sharpness(edges, coarse_angles)
    best_idx = jnp.argmax(coarse)
    best_coarse = coarse_angles[best_idx]
    confidence = coarse[best_idx] / (jnp.median(coarse) + 1e-12)

    fine_angles = best_coarse + jnp.arange(
        -FINE_HALF_WIDTH, FINE_HALF_WIDTH + FINE_STEP, FINE_STEP, dtype=jnp.float32
    )
    fine = _profile_sharpness(edges, fine_angles)
    best_fine = fine_angles[jnp.argmax(fine)]
    return SkewEstimate(angle=best_fine, confidence=confidence)


def detect_skew(
    image: np.ndarray,
    min_confidence: float = 1.6,
    max_abs_angle: float = 45.0,
) -> Optional[float]:
    """Estimate page skew in degrees; None when the estimate is unreliable
    (flat sharpness landscape — the analogue of the reference's std>10° and
    no-lines rejections, ``0_orientation.py:175-195``).

    Positive return value means the content is rotated counter-clockwise and
    the page should be rotated clockwise by the same amount to correct —
    the same sign convention as the reference's detector/corrector pair.
    """
    arr = np.asarray(image, dtype=np.float32)
    if arr.ndim == 3:
        gray = np.asarray(rgb_to_gray(arr))
    else:
        gray = arr

    # Aspect-preserving placement onto the static canvas (a square resize
    # would distort the angle being measured).
    h, w = gray.shape
    scale = WORK_SIZE / max(h, w)
    new_h = max(1, int(round(h * scale)))
    new_w = max(1, int(round(w * scale)))
    resized = np.asarray(resize_bilinear(jnp.asarray(gray), new_h, new_w))
    canvas = np.zeros((WORK_SIZE, WORK_SIZE), np.float32)
    top = (WORK_SIZE - new_h) // 2
    left = (WORK_SIZE - new_w) // 2
    canvas[top : top + new_h, left : left + new_w] = resized
    mask = np.zeros((WORK_SIZE, WORK_SIZE), np.float32)
    inset = 4  # keep canvas-border transition edges out of the vote
    mask[top + inset : top + new_h - inset, left + inset : left + new_w - inset] = 1.0

    est = _estimate_skew_worked(jnp.asarray(canvas), jnp.asarray(mask))
    angle = float(est.angle)
    confidence = float(est.confidence)
    if confidence < min_confidence:
        return None
    if abs(angle) >= max_abs_angle:
        return None
    return angle
