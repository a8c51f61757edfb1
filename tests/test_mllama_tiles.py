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


class TestFusedMultiTile:
    """On-device 2x2 tiling in the fused serving path (pipeline/fused.py
    embed_tiles=4) vs the host processor's multi-tile facade path
    (reference contract: deprecated_package/embedder.py:110-121)."""

    def test_tile_crops_2x2_matches_processor_order(self):
        from multimodal_embeddings_tpu.pipeline.fused import tile_crops_2x2

        tile = 8
        rng = np.random.default_rng(0)
        canvas = rng.uniform(0, 1, (1, 2 * tile, 2 * tile, 3)).astype(np.float32)
        got = np.asarray(tile_crops_2x2(jnp.asarray(canvas), tile))[0]
        # processor order: reshape(th, tile, tw, tile, 3).transpose(0,2,1,3,4)
        want = (
            canvas[0]
            .reshape(2, tile, 2, tile, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(4, tile, tile, 3)
        )
        np.testing.assert_array_equal(got, want)

    def test_fused_tiled_embedding_matches_facade_on_large_square(self):
        """A large square region: the facade's optimal canvas IS (2,2), so
        the on-device tiled path must reproduce its embedding (up to the
        bilinear-resize implementation difference)."""
        from multimodal_embeddings_tpu.config import EmbedderConfig
        from multimodal_embeddings_tpu.models.embedder import MultimodalEmbedder
        from multimodal_embeddings_tpu.models.mllama_processor import (
            IMAGE_MEAN,
            IMAGE_STD,
            aspect_ratio_to_id,
        )
        from multimodal_embeddings_tpu.models.mme5 import MllamaConfig
        from multimodal_embeddings_tpu.ops.image import crop_and_resize_mxu
        from multimodal_embeddings_tpu.pipeline.fused import tile_crops_2x2

        emb = MultimodalEmbedder(
            EmbedderConfig(family="mme5", dtype="float32"),
            model_config=MllamaConfig.tiny(),
        )
        # Mllama's tanh gates are zero at init, so a random-init model
        # ignores its vision input entirely — open every gate so the
        # comparison actually exercises the tiled vision path
        import jax.tree_util as jtu

        def open_gates(path, leaf):
            name = jtu.keystr((path[-1],)).strip("'[]")
            if "gate" in name and leaf.ndim == 1 and leaf.shape[0] == 1:
                return np.ones_like(leaf)
            return leaf

        emb.variables = jtu.tree_map_with_path(open_gates, emb.variables)
        s = emb.image_size  # 28
        rng = np.random.default_rng(1)
        # region 4x the tile size in both axes, square → canvas (2,2)
        region = rng.integers(0, 255, (4 * s, 4 * s, 3)).astype(np.uint8)

        facade = np.asarray(emb.get_image_embeddings([region])[0])

        # fused-style: on-device resize to (2s, 2s), normalize, 2x2 tile
        box = jnp.asarray([[0.0, 0.0, 4.0 * s, 4.0 * s]])
        crop = crop_and_resize_mxu(
            jnp.asarray(region, jnp.float32), box, out_size=2 * s
        ) / 255.0
        crop = (crop - jnp.asarray(IMAGE_MEAN)) / jnp.asarray(IMAGE_STD)
        tiles = tile_crops_2x2(crop, s)
        ids, mask = emb.tokenizer.encode_batch(
            [emb.config.prompt], emb.text_len, add_image_token=False
        )
        fused_emb = emb.model.apply(
            emb.variables,
            jnp.asarray(ids),
            jnp.asarray(mask),
            tiles,
            jnp.asarray([aspect_ratio_to_id((2, 2), emb.max_tiles)], jnp.int32),
            jnp.ones((1, 4), jnp.int32),
        )
        fused_vec = np.asarray(fused_emb)[0]
        cos4 = float(facade @ fused_vec)
        assert cos4 > 0.98, cos4

        # single-tile fused path on the same large region: measurably
        # farther from the facade (the divergence embed_tiles=4 closes)
        crop1 = crop_and_resize_mxu(
            jnp.asarray(region, jnp.float32), box, out_size=s
        ) / 255.0
        crop1 = (crop1 - jnp.asarray(IMAGE_MEAN)) / jnp.asarray(IMAGE_STD)
        single = emb.model.apply(
            emb.variables, jnp.asarray(ids), jnp.asarray(mask), crop1
        )
        cos1 = float(facade @ np.asarray(single)[0])
        assert cos4 > cos1, (cos4, cos1)

    def test_fused_page_fn_embed_tiles(self):
        """build_fused_page_fn(embed_tiles=4) runs end-to-end and yields
        normalized embeddings."""
        import jax.numpy as jnp

        from bench import make_page
        from multimodal_embeddings_tpu.config import (
            DetectorConfig,
            EmbedderConfig,
        )
        from multimodal_embeddings_tpu.models.detector import LayoutDetector
        from multimodal_embeddings_tpu.models.embedder import MultimodalEmbedder
        from multimodal_embeddings_tpu.models.mme5 import MllamaConfig
        from multimodal_embeddings_tpu.pipeline.fused import build_fused_page_fn

        detector = LayoutDetector(
            DetectorConfig(
                image_size=128, variant="n", grid_configs=(), max_detections=16
            ),
            dtype=jnp.float32,
        )
        emb = MultimodalEmbedder(
            EmbedderConfig(family="mme5", dtype="float32"),
            model_config=MllamaConfig.tiny(),
        )
        fn = build_fused_page_fn(
            detector, emb, (256, 200), num_regions=4, embed_tiles=4
        )
        out = fn(jnp.asarray(make_page(256, 200, seed=3)))
        assert out.embeddings.shape[0] == 4
        norms = np.linalg.norm(np.asarray(out.embeddings), axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-3)


def test_short_stack_matches_padded_stack():
    """A single-tile input run as a t=1 stack must embed identically to
    the same tile zero-padded to the full max_tiles stack with padding
    tiles masked (the HF layout). This is the 4x-token-count serving
    optimization for single-tile region crops — padding tiles were
    hard-masked attention keys, so valid-token outputs are equal."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_embeddings_tpu.models.embedder import (
        deterministic_init_multi,
    )
    from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
    from multimodal_embeddings_tpu.parallel import sharding as psharding

    cfg = MllamaConfig.tiny()  # max_tiles=4
    model = MmE5Embedder(cfg, dtype=jnp.float32)
    size = cfg.vision.image_size
    b = 2
    ids = jnp.ones((b, 8), jnp.int32)
    mask = jnp.ones((b, 8), jnp.int32)
    tile = jax.random.normal(jax.random.key(0), (b, 1, size, size, 3))
    variables = psharding.unbox(
        deterministic_init_multi(
            model, (ids, mask, tile), seed=0
        )
    )

    short = model.apply(variables, ids, mask, tile)  # t=1 stack
    padded_imgs = jnp.pad(tile, ((0, 0), (0, 3), (0, 0), (0, 0), (0, 0)))
    tmask = jnp.asarray([[1, 0, 0, 0]] * b, jnp.int32)
    ar = jnp.ones((b,), jnp.int32)
    padded = model.apply(variables, ids, mask, padded_imgs, ar, tmask)
    np.testing.assert_allclose(
        np.asarray(short), np.asarray(padded), atol=2e-5
    )


def test_static_prefix_attention_matches_masked_path():
    """A 4-D image call (no tile_mask → all tiles real, t=1) routes the
    vision attention through sdpa(key_valid_len=seq) — on CPU that lowers
    to the same boolean prefix mask, so the output must match the
    explicit all-ones tile_mask call (which keeps the traced key mask)
    exactly (models/mme5.py single-tile serving dispatch)."""
    config = MllamaConfig.tiny()
    model = MmE5Embedder(config)
    rng = np.random.default_rng(5)
    s = config.vision.image_size
    single = rng.normal(size=(2, s, s, 3)).astype(np.float32)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(1), ids, mask, jnp.asarray(single)
    )
    import flax.linen as fnn

    variables = fnn.unbox(variables)
    # static-prefix path (tile_mask=None)
    got = model.apply(variables, ids, mask, jnp.asarray(single))
    # traced-mask path (explicit all-ones tile_mask over the 1-tile stack)
    want = model.apply(
        variables, ids, mask, jnp.asarray(single[:, None]),
        jnp.ones((2,), jnp.int32), jnp.ones((2, 1), jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-6
    )
