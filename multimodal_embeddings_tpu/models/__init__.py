"""Models: detector, embedders, document parser, weights."""

from multimodal_embeddings_tpu.models.detector import LayoutDetector
from multimodal_embeddings_tpu.models.embedder import MultimodalEmbedder
from multimodal_embeddings_tpu.models.vision_encoder import (
    DualEncoder,
    DualEncoderConfig,
)
from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
from multimodal_embeddings_tpu.models.qwen_serve import continuous_generate
from multimodal_embeddings_tpu.models.qwen_vl import QwenVLConfig, QwenVLModel
from multimodal_embeddings_tpu.models.yolo import DocLayoutYOLO
