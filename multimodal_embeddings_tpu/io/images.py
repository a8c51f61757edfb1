"""Image IO helpers.

Decode/encode stay host-side (cv2/PIL); everything downstream of decode is
arrays. Mirrors the reference's discovery and validation helpers
(``image_utils.py:13-53``, ``0_orientation.py:44-66``).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from multimodal_embeddings_tpu.config import IMAGE_EXTENSIONS

try:  # cv2 is present in the image; gate anyway so the package imports without it
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from PIL import Image


def get_image_paths(input_folder: str) -> List[str]:
    """Recursive, extension-filtered, sorted discovery
    (``1_doclayout_bboxes.py:345-364``)."""
    image_paths = []
    for root, _, files in os.walk(input_folder):
        for file in files:
            ext = os.path.splitext(file)[1].lower()
            if ext in IMAGE_EXTENSIONS:
                image_paths.append(os.path.join(root, file))
    return sorted(image_paths)


def validate_image(image_path: str) -> bool:
    """PIL verify (``image_utils.py:26-35``)."""
    try:
        with Image.open(image_path) as img:
            img.verify()
        return True
    except Exception:
        return False


def load_image_bgr(path: str) -> Optional[np.ndarray]:
    """uint8 HxWx3 BGR (cv2 convention used by the reference viz/rotation)."""
    if cv2 is not None:
        return cv2.imread(path)
    img = np.asarray(Image.open(path).convert("RGB"))
    return img[:, :, ::-1].copy()


def load_image_rgb(path: str) -> np.ndarray:
    """uint8 HxWx3 RGB (model input convention)."""
    return np.asarray(Image.open(path).convert("RGB"))


def load_image_gray(path: str) -> Optional[np.ndarray]:
    if cv2 is not None:
        return cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    return np.asarray(Image.open(path).convert("L"))


def save_image_bgr(path: str, image: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if cv2 is not None:
        cv2.imwrite(path, image)
    else:  # pragma: no cover
        Image.fromarray(image[:, :, ::-1]).save(path)


def image_size(path: str) -> Tuple[int, int]:
    """(width, height) without full decode."""
    with Image.open(path) as img:
        return img.size


def resize_image_if_needed(img: Image.Image, max_dim: int = 8000) -> Image.Image:
    """LANCZOS downscale when either side exceeds ``max_dim``
    (``image_utils.py:37-53``, ``embedder.py:110-114``)."""
    width, height = img.size
    if width <= max_dim and height <= max_dim:
        return img
    scale = min(max_dim / width, max_dim / height)
    new_size = (int(width * scale), int(height * scale))
    return img.resize(new_size, Image.LANCZOS)
