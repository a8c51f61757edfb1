"""IO: JSON schemas + writers, image IO, progress/resume, logging."""

from multimodal_embeddings_tpu.io.json_io import (
    NumpyJSONEncoder,
    load_json,
    save_json,
    regions_dict,
)
from multimodal_embeddings_tpu.io.images import (
    get_image_paths,
    validate_image,
    load_image_bgr,
    load_image_gray,
    load_image_rgb,
    save_image_bgr,
    resize_image_if_needed,
    image_size,
)
from multimodal_embeddings_tpu.io.progress import ProgressTracker
from multimodal_embeddings_tpu.io.logging_setup import get_logger
