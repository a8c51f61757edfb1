"""Contrastive trainer tests: loss behavior, step, checkpointing."""

import numpy as np
import pytest

from multimodal_embeddings_tpu.models.tokenizer import ByteTokenizer
from multimodal_embeddings_tpu.models.vision_encoder import DualEncoderConfig
from multimodal_embeddings_tpu.training.contrastive import (
    ContrastiveTrainer,
    TrainerConfig,
    clip_loss,
    restore_trainer_checkpoint,
    save_trainer_checkpoint,
)

import jax.numpy as jnp


def make_batch(rng, n, size, max_len):
    images = rng.uniform(0, 1, (n, size, size, 3)).astype(np.float32)
    tok = ByteTokenizer()
    ids, mask = tok.encode_batch([f"text {i}" for i in range(n)], max_len)
    return images, ids, mask


class TestClipLoss:
    def test_perfect_alignment_low_loss(self):
        emb = np.eye(8, 16, dtype=np.float32)
        loss_hi, _ = clip_loss(jnp.asarray(emb), jnp.asarray(emb), jnp.asarray([100.0]))
        rng = np.random.default_rng(0)
        other = rng.normal(size=(8, 16)).astype(np.float32)
        other /= np.linalg.norm(other, axis=1, keepdims=True)
        loss_rand, _ = clip_loss(jnp.asarray(emb), jnp.asarray(other), jnp.asarray([100.0]))
        assert float(loss_hi) < 1e-3 < float(loss_rand)


class TestTrainer:
    @pytest.fixture(scope="class")
    def trainer(self):
        return ContrastiveTrainer(
            model_config=DualEncoderConfig.tiny(),
            trainer_config=TrainerConfig(warmup_steps=1, total_steps=50, learning_rate=1e-3),
        )

    def test_loss_decreases_on_repeated_batch(self, trainer):
        rng = np.random.default_rng(0)
        size = trainer.model_config.vision.image_size
        images, ids, mask = make_batch(rng, 8, size, trainer.model_config.text.max_len)
        first = trainer.train_step(images, ids, mask)["loss"]
        for _ in range(8):
            metrics = trainer.train_step(images, ids, mask)
        assert metrics["loss"] < first
        assert np.isfinite(metrics["loss"])

    def test_checkpoint_roundtrip(self, trainer, tmp_path):
        path = str(tmp_path / "trainer.npz")
        save_trainer_checkpoint(trainer, path)
        step_before = trainer.step

        fresh = ContrastiveTrainer(
            model_config=DualEncoderConfig.tiny(),
            trainer_config=TrainerConfig(warmup_steps=1, total_steps=50),
            seed=123,
        )
        restore_trainer_checkpoint(fresh, path)
        assert fresh.step == step_before
        import jax

        for a, b in zip(jax.tree.leaves(trainer.params), jax.tree.leaves(fresh.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # one more step runs fine after restore
        rng = np.random.default_rng(1)
        size = fresh.model_config.vision.image_size
        images, ids, mask = make_batch(rng, 4, size, fresh.model_config.text.max_len)
        metrics = fresh.train_step(images, ids, mask)
        assert np.isfinite(metrics["loss"])


def test_hybrid_mesh_host_major_train_step(devices8):
    """Multi-host layout simulated as 2 hosts × 4 devices: the data axis
    must be host-major (outer dim crosses "DCN"), tensor parallelism must
    stay within a host, and the dp+tp train step must run (core/mesh.py::
    make_hybrid_mesh)."""
    import numpy as np

    from multimodal_embeddings_tpu.config import MeshConfig
    from multimodal_embeddings_tpu.core.mesh import make_hybrid_mesh
    from multimodal_embeddings_tpu.models.tokenizer import ByteTokenizer
    from multimodal_embeddings_tpu.models.vision_encoder import DualEncoderConfig
    from multimodal_embeddings_tpu.training.contrastive import (
        ContrastiveTrainer,
        TrainerConfig,
    )

    host_groups = [list(devices8[:4]), list(devices8[4:])]
    mesh = make_hybrid_mesh(MeshConfig(shape=(-1, 2)), host_groups=host_groups)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    # model (tp) pairs must come from one "host"; data rows host-major
    dev = mesh.devices
    for row in dev:
        in_first = [d in host_groups[0] for d in row]
        assert all(in_first) or not any(in_first), "tp pair crosses hosts"
    assert all(d in host_groups[0] for d in dev[:2].ravel())
    assert all(d in host_groups[1] for d in dev[2:].ravel())

    trainer = ContrastiveTrainer(
        model_config=DualEncoderConfig.tiny(),
        trainer_config=TrainerConfig(warmup_steps=1, total_steps=4),
        mesh=mesh,
    )
    rng = np.random.default_rng(0)
    size = trainer.model_config.vision.image_size
    images = rng.uniform(0, 1, (8, size, size, 3)).astype(np.float32)
    tok = ByteTokenizer()
    ids, mask = tok.encode_batch(
        [f"t{i}" for i in range(8)], trainer.model_config.text.max_len
    )
    metrics = trainer.train_step(images, ids, mask)
    assert np.isfinite(metrics["loss"])


def test_hybrid_mesh_rejects_cross_host_tp(devices8):
    from multimodal_embeddings_tpu.config import MeshConfig
    from multimodal_embeddings_tpu.core.mesh import make_hybrid_mesh

    with pytest.raises(ValueError):
        make_hybrid_mesh(
            MeshConfig(shape=(-1, 3)),
            host_groups=[list(devices8[:4]), list(devices8[4:])],
        )
