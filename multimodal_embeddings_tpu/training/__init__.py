"""Training: contrastive fine-tuning over the mesh."""

from multimodal_embeddings_tpu.training.contrastive import (
    ContrastiveTrainer,
    TrainerConfig,
    clip_loss,
)
