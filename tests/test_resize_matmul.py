"""Matmul-based resize vs the gather-based bilinear path."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_embeddings_tpu.ops.grid import grid_cells
from multimodal_embeddings_tpu.ops.image import (
    crop_and_resize,
    extract_views_matmul,
    resize_bilinear,
    resize_matmul,
)


class TestResizeMatmul:
    @pytest.mark.parametrize("shape,out", [((64, 80), (32, 48)), ((100, 60), (128, 128))])
    def test_matches_gather_resize(self, shape, out):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, shape + (3,)).astype(np.float32)
        got = np.asarray(resize_matmul(jnp.asarray(img)[None], *out))[0]
        want = np.asarray(resize_bilinear(jnp.asarray(img), *out))
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_batched(self):
        rng = np.random.default_rng(1)
        imgs = rng.uniform(0, 255, (4, 50, 70, 3)).astype(np.float32)
        got = np.asarray(resize_matmul(jnp.asarray(imgs), 64, 64))
        for b in range(4):
            want = np.asarray(resize_bilinear(jnp.asarray(imgs[b]), 64, 64))
            np.testing.assert_allclose(got[b], want, atol=5e-3)


class TestExtractViews:
    def test_matches_crop_and_resize_per_view(self):
        rng = np.random.default_rng(2)
        page = rng.uniform(0, 255, (220, 170, 3)).astype(np.float32)
        bounds = [(0, 0, 170, 220)]
        for cell in grid_cells(170, 220, 2, 2, 20.0):
            bounds.append(cell.slice_bounds)
        got = np.asarray(extract_views_matmul(jnp.asarray(page), bounds, 64))
        assert got.shape == (5, 64, 64, 3)
        # compare each against a direct slice+resize
        for i, (x0, y0, x1, y1) in enumerate(bounds):
            want = np.asarray(
                resize_bilinear(jnp.asarray(page[y0:y1, x0:x1]), 64, 64)
            )
            np.testing.assert_allclose(got[i], want, atol=5e-3, err_msg=str(i))

    def test_view_order_preserved_across_groups(self):
        # distinct sizes force multiple groups; order must match input
        page = np.arange(100 * 100 * 1, dtype=np.float32).reshape(100, 100, 1)
        bounds = [(0, 0, 100, 100), (0, 0, 50, 50), (50, 50, 100, 100), (0, 0, 100, 50)]
        got = np.asarray(extract_views_matmul(jnp.asarray(page), bounds, 32))
        for i, (x0, y0, x1, y1) in enumerate(bounds):
            want = np.asarray(
                resize_bilinear(jnp.asarray(page[y0:y1, x0:x1]), 32, 32)
            )
            np.testing.assert_allclose(got[i], want, atol=5e-3, err_msg=str(i))


class TestCropMXU:
    def test_matches_gather_crop(self):
        from multimodal_embeddings_tpu.ops.image import crop_and_resize_mxu

        rng = np.random.default_rng(3)
        page = rng.uniform(0, 255, (300, 250, 3)).astype(np.float32)
        boxes = []
        for _ in range(10):
            x1 = rng.uniform(0, 150)
            y1 = rng.uniform(0, 180)
            boxes.append([x1, y1, x1 + rng.uniform(20, 90), y1 + rng.uniform(20, 90)])
        boxes = jnp.asarray(boxes, jnp.float32)
        got = np.asarray(crop_and_resize_mxu(jnp.asarray(page), boxes, out_size=64, chunk=4))
        want = np.asarray(crop_and_resize(jnp.asarray(page), boxes, out_size=64))
        # crop_and_resize zero-pads out-of-range; these boxes are in-bounds
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_chunk_padding(self):
        from multimodal_embeddings_tpu.ops.image import crop_and_resize_mxu

        page = jnp.ones((100, 100, 3))
        boxes = jnp.asarray([[10, 10, 50, 50]] * 5, jnp.float32)  # 5 % 8 != 0
        out = crop_and_resize_mxu(page, boxes, out_size=32, chunk=8)
        assert out.shape == (5, 32, 32, 3)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)
