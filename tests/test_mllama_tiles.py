"""Mllama multi-tile vision path: processor invariants + model masking
semantics (reference contract: deprecated_package/embedder.py:73-83,110-121
tiles pages through the HF Mllama processor)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_embeddings_tpu.models.mllama_processor import (
    IMAGE_MEAN,
    IMAGE_STD,
    aspect_ratio_to_id,
    get_all_supported_aspect_ratios,
    get_optimal_tiled_canvas,
    num_aspect_ratio_ids,
    preprocess_image,
)
from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder


class TestProcessor:
    def test_supported_aspect_ratios(self):
        got = get_all_supported_aspect_ratios(4)
        assert got == [
            (1, 1), (1, 2), (1, 3), (1, 4), (2, 1), (2, 2), (3, 1), (4, 1),
        ]
        assert num_aspect_ratio_ids(4) == 9
        assert aspect_ratio_to_id((1, 1)) == 1
        assert aspect_ratio_to_id((4, 1)) == 8

    def test_canvas_selection(self):
        # small image: every canvas upscales; the smallest-area canvas wins
        assert get_optimal_tiled_canvas(100, 100, 4, 560) == (1, 1)
        # 600x600: only the 2x2 canvas can hold it without downscaling
        assert get_optimal_tiled_canvas(600, 600, 4, 560) == (2, 2)
        # very wide image: 4x1 (w-major) canvas needs the least downscaling
        assert get_optimal_tiled_canvas(500, 5000, 4, 560) == (4, 1)
        # very tall image: 1x4
        assert get_optimal_tiled_canvas(5000, 500, 4, 560) == (1, 4)

    def test_tiling_reconstructs_canvas(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (700, 900, 3)).astype(np.uint8)
        out = preprocess_image(img, max_tiles=4, tile_size=560)
        tw, th = out.aspect_ratio
        assert out.num_tiles == tw * th
        assert out.tiles.shape == (4, 560, 560, 3)
        # padding tiles are zero
        assert np.all(out.tiles[out.num_tiles :] == 0)
        # reassemble tiles row-major and check statistics look normalized
        assert abs(float(out.tiles[: out.num_tiles].mean())) < 3.0
        mask = out.tile_mask
        assert mask.sum() == out.num_tiles

    def test_single_tile_small_image_matches_direct_path(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (560, 560, 3)).astype(np.uint8)
        out = preprocess_image(img, max_tiles=4, tile_size=560)
        assert out.aspect_ratio == (1, 1)
        assert out.num_tiles == 1
        want = (img.astype(np.float32) / 255.0 - np.asarray(IMAGE_MEAN)) / np.asarray(
            IMAGE_STD
        )
        np.testing.assert_allclose(out.tiles[0], want, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_mme5():
    config = MllamaConfig.tiny()
    model = MmE5Embedder(config)
    rng = np.random.default_rng(0)
    t = config.vision.max_tiles
    s = config.vision.image_size
    images = rng.normal(size=(2, t, s, s, 3)).astype(np.float32)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0),
        ids,
        mask,
        jnp.asarray(images),
        jnp.full((2,), 6, jnp.int32),
        jnp.ones((2, t), jnp.int32),
    )
    import flax.linen as fnn

    variables = fnn.unbox(variables)
    # Mllama's tanh gates init to zero, which makes vision contribute
    # nothing at init (the real checkpoint has trained gates) — open the
    # cross-attention and global-transformer gates so content flows
    variables = jax.tree.map(lambda x: x, variables)  # shallow copy ok
    params = variables["params"]["text_model"]
    for name, block in params.items():
        if name.startswith("cross"):
            block["attn_gate"] = jnp.ones_like(block["attn_gate"]) * 0.5
            block["mlp_gate"] = jnp.ones_like(block["mlp_gate"]) * 0.5
    vparams = variables["params"]["vision_model"]
    for name in ("pre_tile_pos_embed", "post_tile_pos_embed", "gated_pos_embed"):
        vparams[name]["gate"] = jnp.ones_like(vparams[name]["gate"]) * 0.5
    return model, variables, images, ids, mask


class TestTiledModel:
    def test_masked_tiles_do_not_affect_output(self, tiny_mme5):
        model, variables, images, ids, mask = tiny_mme5
        ar = jnp.full((2,), 2, jnp.int32)  # (1,2) arrangement: 2 tiles
        tmask = jnp.asarray([[1, 1, 0, 0]] * 2, jnp.int32)
        base = model.apply(variables, ids, mask, jnp.asarray(images), ar, tmask)
        # scribble over the MASKED tiles: output must be bit-identical
        scribbled = images.copy()
        scribbled[:, 2:] = 123.0
        got = model.apply(variables, ids, mask, jnp.asarray(scribbled), ar, tmask)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(got))
        # scribble a VALID tile: output must change
        scribbled2 = images.copy()
        scribbled2[:, 1] += 1.0
        changed = model.apply(variables, ids, mask, jnp.asarray(scribbled2), ar, tmask)
        assert not np.allclose(np.asarray(base), np.asarray(changed))

    def test_aspect_ratio_id_changes_output(self, tiny_mme5):
        model, variables, images, ids, mask = tiny_mme5
        tmask = jnp.ones((2, 4), jnp.int32)
        a = model.apply(
            variables, ids, mask, jnp.asarray(images), jnp.full((2,), 6, jnp.int32), tmask
        )
        b = model.apply(
            variables, ids, mask, jnp.asarray(images), jnp.full((2,), 4, jnp.int32), tmask
        )
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_single_tile_auto_expansion(self, tiny_mme5):
        model, variables, images, ids, mask = tiny_mme5
        single = images[:, 0]  # (B, S, S, 3)
        got = model.apply(variables, ids, mask, jnp.asarray(single))
        want = model.apply(
            variables,
            ids,
            mask,
            jnp.asarray(single[:, None]),
            jnp.ones((2,), jnp.int32),
            jnp.ones((2, 1), jnp.int32),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
        assert np.allclose(np.linalg.norm(np.asarray(got), axis=-1), 1.0, atol=1e-5)

    def test_embeddings_unit_norm(self, tiny_mme5):
        model, variables, images, ids, mask = tiny_mme5
        out = model.apply(
            variables,
            ids,
            mask,
            jnp.asarray(images),
            jnp.full((2,), 6, jnp.int32),
            jnp.ones((2, 4), jnp.int32),
        )
        assert np.allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)
