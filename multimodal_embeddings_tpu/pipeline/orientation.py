"""Stage 0 — orientation / deskew correction.

Behavioral contract (``0_orientation.py:203-324``): per image, estimate skew;
if no reliable estimate or |angle| below the sensitivity threshold, copy the
file unchanged; otherwise rotate with an expanding (no-crop) bound and save.
Failures fall back to copying the original. An optional in-place mode
overwrites the source (``orientation_corrector.py:257-262``).

The estimator is the TPU projection-profile scan (``ops/skew.py``); Tesseract
OSD is kept as an optional host fallback, used only when pytesseract is
importable (it is not load-bearing — the reference also prefers the OpenCV
estimate whenever present, ``0_orientation.py:229-232``).
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import time
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from multimodal_embeddings_tpu.io.images import (
    get_image_paths,
    load_image_bgr,
    save_image_bgr,
    validate_image,
)
from multimodal_embeddings_tpu.io.logging_setup import get_logger
from multimodal_embeddings_tpu.io.progress import ProgressTracker
from multimodal_embeddings_tpu.ops.image import rotate_bound
from multimodal_embeddings_tpu.ops.skew import detect_skew

logger = get_logger("orientation")


def detect_skew_tesseract(image_path: str) -> Optional[float]:
    """Optional Tesseract OSD fallback (``0_orientation.py:98-129``).
    Returns None when pytesseract/tesseract are unavailable."""
    try:
        import pytesseract
        from pytesseract import Output
        from PIL import Image

        results = pytesseract.image_to_osd(
            np.asarray(Image.open(image_path).convert("RGB")), output_type=Output.DICT
        )
        return float(results["rotate"])
    except Exception:
        return None


@dataclasses.dataclass
class OrientationResult:
    image_path: str
    output_path: str
    angle: Optional[float]
    rotated: bool


class OrientationCorrector:
    """Per-image deskew with the reference's decision ladder."""

    def __init__(
        self,
        output_folder: Optional[str] = None,
        sensitivity_threshold: float = 0.5,
        advanced_detection: bool = True,
        use_tesseract_fallback: bool = True,
    ):
        self.output_folder = output_folder
        self.sensitivity_threshold = sensitivity_threshold
        self.advanced_detection = advanced_detection
        self.use_tesseract_fallback = use_tesseract_fallback
        if output_folder:
            os.makedirs(output_folder, exist_ok=True)

    def detect(self, image_path: str) -> Optional[float]:
        angle = None
        if self.advanced_detection:
            image = load_image_bgr(image_path)
            if image is not None:
                angle = detect_skew(image[:, :, ::-1])
        if angle is None and self.use_tesseract_fallback:
            angle = detect_skew_tesseract(image_path)
        return angle

    def correct_orientation(self, image_path: str) -> OrientationResult:
        output_path = image_path
        if self.output_folder:
            output_path = os.path.join(
                self.output_folder, os.path.basename(image_path)
            )

        if not validate_image(image_path):
            logger.error("invalid image: %s", image_path)
            return OrientationResult(image_path, image_path, None, False)

        angle = self.detect(image_path)

        def copy_through():
            if self.output_folder and output_path != image_path:
                shutil.copy2(image_path, output_path)

        if angle is None:
            logger.info("no significant skew: %s", os.path.basename(image_path))
            copy_through()
            return OrientationResult(image_path, output_path, None, False)

        if abs(angle) < self.sensitivity_threshold:
            logger.info(
                "skew %.3f° below threshold %.3f°: %s",
                angle,
                self.sensitivity_threshold,
                os.path.basename(image_path),
            )
            copy_through()
            return OrientationResult(image_path, output_path, angle, False)

        try:
            image = load_image_bgr(image_path)
            rotated = np.asarray(rotate_bound(jnp.asarray(image), angle))
            rotated = np.clip(rotated, 0, 255).astype(np.uint8)
            save_image_bgr(output_path, rotated)
            logger.info(
                "corrected %s by %.3f°", os.path.basename(image_path), angle
            )
            return OrientationResult(image_path, output_path, angle, True)
        except Exception as exc:  # noqa: BLE001 — copy-through fallback contract
            logger.error("rotation failed for %s: %s", image_path, exc)
            copy_through()
            return OrientationResult(image_path, output_path, angle, False)


def batch_correct_orientation(
    image_paths: List[str],
    output_folder: Optional[str],
    sensitivity_threshold: float = 0.5,
    advanced_detection: bool = True,
    progress: Optional[ProgressTracker] = None,
) -> List[OrientationResult]:
    """Batch driver with resume support (``0_orientation.py:283-324``,
    progress integration as in ``orientation_corrector.py:203-212``)."""
    corrector = OrientationCorrector(
        output_folder=output_folder,
        sensitivity_threshold=sensitivity_threshold,
        advanced_detection=advanced_detection,
    )
    results = []
    start = time.time()
    for i, path in enumerate(image_paths):
        if progress is not None and progress.is_completed(path):
            logger.info("skipping completed: %s", os.path.basename(path))
            continue
        results.append(corrector.correct_orientation(path))
        if progress is not None:
            progress.mark_completed(path)
        if (i + 1) % 10 == 0 or i + 1 == len(image_paths):
            logger.info("orientation progress: %d/%d", i + 1, len(image_paths))
    elapsed = time.time() - start
    logger.info(
        "orientation batch done: %d images in %.1fs (%.2f img/s)",
        len(results),
        elapsed,
        len(results) / elapsed if elapsed > 0 else 0.0,
    )
    return results
