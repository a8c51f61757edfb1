"""Pallas direct 3×3 conv kernel (spatial-on-lanes) vs the lax.conv oracle.

Targets the DocLayout-YOLO backbone's hot low-channel convs
(``kernels/conv.py``); interpret mode on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_embeddings_tpu.kernels.conv import (
    conv3x3_nchw,
    conv3x3_reference,
)


@pytest.mark.parametrize(
    "n,c,co,h,w",
    [(2, 16, 8, 24, 128), (1, 8, 16, 16, 256), (3, 4, 4, 9, 128)],
)
def test_conv3x3_matches_lax(n, c, co, h, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, c, h, w)).astype(np.float32))
    kw = jnp.asarray(rng.normal(size=(co, c, 3, 3)).astype(np.float32) * 0.1)
    got = conv3x3_nchw(x, kw, interpret=True)
    want = conv3x3_reference(x, kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv3x3_bias_silu_epilogue():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 128)).astype(np.float32))
    kw = jnp.asarray(rng.normal(size=(8, 8, 3, 3)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    got = conv3x3_nchw(x, kw, b, act="silu", interpret=True)
    want = conv3x3_reference(x, kw, b, act="silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv3x3_edge_zero_padding():
    """An input with mass only at the borders checks the halo masking:
    wrap-around from the lane roll or row clamping would corrupt edges."""
    c, co, h, w = 4, 4, 10, 128
    x = np.zeros((1, c, h, w), np.float32)
    x[:, :, 0, :] = 1.0
    x[:, :, -1, :] = 2.0
    x[:, :, :, 0] = 3.0
    x[:, :, :, -1] = 4.0
    kw = np.full((co, c, 3, 3), 0.5, np.float32)
    got = conv3x3_nchw(jnp.asarray(x), jnp.asarray(kw), interpret=True)
    want = conv3x3_reference(jnp.asarray(x), jnp.asarray(kw))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv3x3_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 128)), jnp.bfloat16)
    kw = jnp.asarray(rng.normal(size=(8, 8, 3, 3)) * 0.1, jnp.bfloat16)
    got = conv3x3_nchw(x, kw, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = conv3x3_reference(x, kw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2,
    )


@pytest.mark.parametrize("dilation", [2, 4])
@pytest.mark.parametrize("n,c,co,h,w", [(2, 8, 8, 24, 128), (1, 4, 8, 16, 256)])
def test_conv3x3_dilated_matches_lax(dilation, n, c, co, h, w):
    """Dilated taps (GL-CRM's cv1 'global perception' conv is a d=2 3x3,
    layers.py::CRMBottleneck; c2f_4 uses d=4)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(n, c, h, w)).astype(np.float32))
    kw = jnp.asarray(rng.normal(size=(co, c, 3, 3)).astype(np.float32) * 0.1)
    got = conv3x3_nchw(x, kw, interpret=True, dilation=dilation)
    want = conv3x3_reference(x, kw, dilation=dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_conv3x3_dilated_edge_zero_padding():
    """Border mass with d=2 checks the two-column roll-leak masking and the
    dilated row halo."""
    c, co, h, w = 4, 4, 16, 128
    x = np.zeros((1, c, h, w), np.float32)
    x[:, :, :2, :] = 1.0
    x[:, :, -2:, :] = 2.0
    x[:, :, :, :2] = 3.0
    x[:, :, :, -2:] = 4.0
    kw = np.full((co, c, 3, 3), 0.5, np.float32)
    got = conv3x3_nchw(
        jnp.asarray(x), jnp.asarray(kw), interpret=True, dilation=2
    )
    want = conv3x3_reference(jnp.asarray(x), jnp.asarray(kw), dilation=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("rows", [8, 16])
def test_conv3x3_rows_parameter(rows):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 32, 128)).astype(np.float32))
    kw = jnp.asarray(rng.normal(size=(8, 8, 3, 3)).astype(np.float32) * 0.1)
    got = conv3x3_nchw(x, kw, interpret=True, rows=rows)
    want = conv3x3_reference(x, kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


class TestStride2:
    @pytest.mark.parametrize(
        "n,c,co,h,w", [(2, 8, 16, 32, 256), (1, 16, 8, 48, 128)]
    )
    def test_conv3x3_s2_matches_lax(self, n, c, co, h, w):
        from multimodal_embeddings_tpu.kernels.conv import (
            conv3x3_s2_nchw,
            conv3x3_s2_reference,
        )

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(n, c, h, w)).astype(np.float32))
        kw = jnp.asarray(rng.normal(size=(co, c, 3, 3)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
        got = conv3x3_s2_nchw(x, kw, b, act="silu", interpret=True)
        want = conv3x3_s2_reference(x, kw, b, act="silu")
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_conv3x3_s2_edges(self):
        """Border mass checks the bottom/right SAME padding and the
        odd-plane roll masking."""
        from multimodal_embeddings_tpu.kernels.conv import (
            conv3x3_s2_nchw,
            conv3x3_s2_reference,
        )

        c, co, h, w = 4, 4, 16, 128
        x = np.zeros((1, c, h, w), np.float32)
        x[:, :, 0, :] = 1.0
        x[:, :, -1, :] = 2.0
        x[:, :, :, 0] = 3.0
        x[:, :, :, -1] = 4.0
        kw = np.full((co, c, 3, 3), 0.5, np.float32)
        got = conv3x3_s2_nchw(jnp.asarray(x), jnp.asarray(kw), interpret=True)
        want = conv3x3_s2_reference(jnp.asarray(x), jnp.asarray(kw))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
