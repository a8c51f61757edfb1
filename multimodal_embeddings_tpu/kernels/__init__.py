"""Pallas TPU kernels."""

from multimodal_embeddings_tpu.kernels.flash_attention import flash_attention
