"""Embedder tests: pooling contract, both model families, mesh sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_embeddings_tpu.config import EmbedderConfig, MeshConfig
from multimodal_embeddings_tpu.core.mesh import make_mesh
from multimodal_embeddings_tpu.models.embedder import MultimodalEmbedder
from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
from multimodal_embeddings_tpu.models.transformer import last_token_pool
from multimodal_embeddings_tpu.models.vision_encoder import DualEncoderConfig
from multimodal_embeddings_tpu.models.tokenizer import ByteTokenizer


class TestLastTokenPool:
    def test_matches_reference_contract(self):
        """Pooling = hidden state at index sum(mask)-1, L2-normalized
        (embedder.py:17-34)."""
        rng = np.random.default_rng(0)
        hidden = rng.normal(size=(3, 8, 16)).astype(np.float32)
        mask = np.zeros((3, 8), np.int32)
        mask[0, :8] = 1
        mask[1, :3] = 1
        mask[2, :1] = 1
        pooled = np.asarray(last_token_pool(jnp.asarray(hidden), jnp.asarray(mask)))
        for b, last in enumerate([7, 2, 0]):
            want = hidden[b, last]
            want = want / np.linalg.norm(want)
            np.testing.assert_allclose(pooled[b], want, rtol=1e-5)

    def test_unit_norm(self):
        rng = np.random.default_rng(1)
        hidden = rng.normal(size=(4, 5, 32)).astype(np.float32)
        mask = np.ones((4, 5), np.int32)
        pooled = np.asarray(last_token_pool(jnp.asarray(hidden), jnp.asarray(mask)))
        np.testing.assert_allclose(np.linalg.norm(pooled, axis=-1), 1.0, rtol=1e-5)


class TestByteTokenizer:
    def test_roundtrip_determinism(self):
        tok = ByteTokenizer()
        a, ma = tok.encode("Hoosier. Hockey.", 32)
        b, mb = tok.encode("Hoosier. Hockey.", 32)
        np.testing.assert_array_equal(a, b)
        assert ma.sum() == len("Hoosier. Hockey.".encode()) + 2  # bos + eos

    def test_truncation_and_padding(self):
        tok = ByteTokenizer()
        ids, mask = tok.encode("x" * 100, 16)
        assert ids.shape == (16,) and mask.sum() == 16
        ids, mask = tok.encode("ab", 16)
        assert mask.sum() == 4 and (ids[mask == 0] == 0).all()


def tiny_siglip_config():
    return EmbedderConfig(family="siglip", batch_size=4, dtype="float32")


class TestDualEncoderEmbedder:
    @pytest.fixture(scope="class")
    def embedder(self):
        return MultimodalEmbedder(
            tiny_siglip_config(), model_config=DualEncoderConfig.tiny()
        )

    def test_image_embeddings_shape_and_norm(self, embedder):
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (80, 60, 3)).astype(np.uint8) for _ in range(3)]
        embs = embedder.get_image_embeddings(imgs, batch_size=4)
        assert len(embs) == 3
        for e in embs:
            assert e is not None and len(e) == 64
            np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-4)

    def test_failed_image_gives_none_slot(self, embedder, tmp_path):
        good = np.zeros((32, 32, 3), np.uint8)
        bad_path = str(tmp_path / "nonexistent.png")
        embs = embedder.get_image_embeddings([good, bad_path, good])
        assert embs[0] is not None and embs[2] is not None
        assert embs[1] is None

    def test_embeddings_deterministic(self, embedder):
        img = np.full((50, 50, 3), 100, np.uint8)
        a = embedder.get_image_embeddings([img])[0]
        b = embedder.get_image_embeddings([img])[0]
        np.testing.assert_array_equal(a, b)

    def test_text_embeddings(self, embedder):
        single = embedder.get_text_embeddings("Hoosier. Hockey.")
        assert len(single) == 64
        np.testing.assert_allclose(np.linalg.norm(single), 1.0, rtol=1e-4)
        batch = embedder.get_text_embeddings(["a", "b"])
        assert len(batch) == 2 and batch[0] != batch[1]


class TestMmE5Family:
    def test_tiny_mme5_forward(self):
        emb = MultimodalEmbedder(
            EmbedderConfig(family="mme5", dtype="float32"),
            model_config=MllamaConfig.tiny(),
        )
        img = np.full((40, 40, 3), 128, np.uint8)
        out = emb.get_image_embeddings([img], batch_size=2)
        assert out[0] is not None and len(out[0]) == 64  # text hidden size
        np.testing.assert_allclose(np.linalg.norm(out[0]), 1.0, rtol=1e-4)
        txt = emb.get_text_embeddings("Represent the given text.")
        assert len(txt) == 64

    def test_image_changes_embedding(self):
        """Cross-attention must actually inject vision information: zero-init
        gates are tanh-gated, so check gradients flow by perturbing gates."""
        config = MllamaConfig.tiny()
        model = MmE5Embedder(config)
        ids = jnp.ones((1, 8), jnp.int32)
        mask = jnp.ones((1, 8), jnp.int32)
        img_a = jnp.zeros((1, 28, 28, 3))
        img_b = jnp.ones((1, 28, 28, 3))
        variables = model.init(jax.random.PRNGKey(0), ids, mask, img_a)
        # open the gates so the vision pathway is active
        import flax

        unboxed = flax.core.unfreeze(flax.linen.unbox(variables))

        def open_gates(tree):
            for k, v in tree.items():
                if isinstance(v, dict):
                    open_gates(v)
                elif k in ("attn_gate", "mlp_gate"):
                    tree[k] = jnp.ones_like(v)

        open_gates(unboxed)
        out_a = model.apply(unboxed, ids, mask, img_a)
        out_b = model.apply(unboxed, ids, mask, img_b)
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


class TestMeshSharding:
    def test_embedder_on_8dev_mesh(self, devices8):
        mesh = make_mesh(MeshConfig(shape=(4, 2)))
        emb = MultimodalEmbedder(
            tiny_siglip_config(),
            mesh=mesh,
            model_config=DualEncoderConfig.tiny(),
        )
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (64, 64, 3)).astype(np.uint8) for _ in range(8)]
        embs = emb.get_image_embeddings(imgs, batch_size=8)
        assert all(e is not None for e in embs)
        # same results as unsharded
        emb_single = MultimodalEmbedder(
            tiny_siglip_config(), model_config=DualEncoderConfig.tiny()
        )
        embs_single = emb_single.get_image_embeddings(imgs, batch_size=8)
        np.testing.assert_allclose(
            np.asarray(embs), np.asarray(embs_single), atol=1e-5
        )

    def test_mme5_tensor_parallel(self, devices8):
        """mmE5 tiny model with params tensor-sharded over model axis: output
        must match the single-device run."""
        mesh = make_mesh(MeshConfig(shape=(4, 2)))
        cfg = EmbedderConfig(family="mme5", dtype="float32")
        sharded = MultimodalEmbedder(cfg, mesh=mesh, model_config=MllamaConfig.tiny())
        plain = MultimodalEmbedder(cfg, model_config=MllamaConfig.tiny())
        img = np.full((40, 40, 3), 77, np.uint8)
        a = sharded.get_image_embeddings([img] * 4, batch_size=4)
        b = plain.get_image_embeddings([img] * 4, batch_size=4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


class TestFullSizeConfigs:
    def test_mme5_11b_parameter_count(self):
        """The full-size config must actually be an ~11B-parameter model
        (abstract eval, no allocation)."""
        import jax

        config = MllamaConfig.mme5_11b()
        model = MmE5Embedder(config)
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.ones((1, 16), jnp.int32),
                jnp.ones((1, 16), jnp.int32),
                jnp.zeros((1, config.vision.image_size, config.vision.image_size, 3)),
            )
        )
        total = sum(
            int(np.prod(leaf.shape)) for leaf in jax.tree.leaves(shapes)
        )
        assert 9e9 < total < 13e9, f"{total:,}"

    def test_qwen7b_parameter_count(self):
        import jax

        from multimodal_embeddings_tpu.models.qwen_vl import (
            QwenVLConfig,
            QwenVLModel,
        )

        config = QwenVLConfig.qwen25_vl_7b()
        model = QwenVLModel(config)
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.ones((1, 8), jnp.int32),
                jnp.zeros((1, 56, 56, 3)),
            )
        )
        total = sum(int(np.prod(leaf.shape)) for leaf in jax.tree.leaves(shapes))
        # 7B text + ~0.7B vision (+ lm_head; cache-free)
        assert 6e9 < total < 11e9, f"{total:,}"
