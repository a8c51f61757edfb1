"""Flash-attention kernel vs the XLA sdpa reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_embeddings_tpu.kernels.flash_attention import flash_attention
from multimodal_embeddings_tpu.models.transformer import sdpa


def rand_qkv(rng, b, l, h, d, kvh=None):
    kvh = kvh or h
    q = rng.normal(size=(b, l, h, d)).astype(np.float32)
    k = rng.normal(size=(b, l, kvh, d)).astype(np.float32)
    v = rng.normal(size=(b, l, kvh, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestFlashAttention:
    @pytest.mark.parametrize("l", [128, 256, 384])
    def test_matches_sdpa(self, l):
        rng = np.random.default_rng(0)
        q, k, v = rand_qkv(rng, 2, l, 4, 64)
        got = flash_attention(q, k, v, interpret=True)
        want = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_causal(self):
        rng = np.random.default_rng(1)
        q, k, v = rand_qkv(rng, 1, 256, 2, 64)
        got = flash_attention(q, k, v, causal=True, interpret=True)
        want = sdpa(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_padding_lengths(self):
        rng = np.random.default_rng(2)
        q, k, v = rand_qkv(rng, 2, 256, 2, 64)
        lengths = jnp.asarray([256, 100], jnp.int32)
        got = flash_attention(q, k, v, lengths=lengths, interpret=True)
        mask = (jnp.arange(256) < 100)[None, None, None, :]
        want_full = sdpa(q[:1], k[:1], v[:1])
        want_masked = sdpa(q[1:], k[1:], v[1:], mask=mask.astype(bool))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want_full[0]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want_masked[0]), atol=2e-5)

    def test_gqa(self):
        rng = np.random.default_rng(3)
        q, k, v = rand_qkv(rng, 1, 128, 8, 32, kvh=2)
        got = flash_attention(q, k, v, interpret=True)
        want = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_gqa_decode_fold_matches_repeat(self):
        """The lq==1 GQA fold (query heads onto the length axis, K/V
        streamed once — the batched-decode fix) must equal the
        materializing repeat path exactly."""
        rng = np.random.default_rng(9)
        b, lk, h, kvh, d = 3, 64, 8, 2, 16
        q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, lk, kvh, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, lk, kvh, d)), jnp.float32)
        mask = (jnp.arange(lk) < 40)[None, None, None, :]
        got = sdpa(q, k, v, mask=mask)  # takes the fold branch
        krep = jnp.repeat(k, h // kvh, axis=2)
        vrep = jnp.repeat(v, h // kvh, axis=2)
        want = sdpa(q, krep, vrep, mask=mask)  # kvh == h: plain path
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6
        )
        # unmasked variant
        got2 = sdpa(q, k, v)
        want2 = sdpa(q, krep, vrep)
        np.testing.assert_allclose(
            np.asarray(got2), np.asarray(want2), atol=2e-6
        )

    def test_non_multiple_length(self):
        rng = np.random.default_rng(4)
        q, k, v = rand_qkv(rng, 1, 200, 2, 64)
        got = flash_attention(q, k, v, interpret=True)
        want = sdpa(q, k, v)
        assert got.shape == (1, 200, 2, 64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_bf16_io(self):
        rng = np.random.default_rng(5)
        q, k, v = rand_qkv(rng, 1, 128, 2, 64)
        got = flash_attention(
            q.astype(jnp.bfloat16),
            k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16),
            interpret=True,
        )
        assert got.dtype == jnp.bfloat16
        want = sdpa(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=3e-2
        )


class TestFlashV2:
    @pytest.mark.parametrize("l,causal", [(256, False), (384, True), (200, False)])
    def test_matches_sdpa(self, l, causal):
        from multimodal_embeddings_tpu.kernels.flash_attention import (
            flash_attention_v2,
        )

        rng = np.random.default_rng(10)
        q, k, v = rand_qkv(rng, 2, l, 4, 64)
        got = flash_attention_v2(q, k, v, causal=causal, interpret=True)
        want = sdpa(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_lengths_and_dkdv(self):
        from multimodal_embeddings_tpu.kernels.flash_attention import (
            flash_attention_v2,
        )

        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.normal(size=(2, 256, 3, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 256, 3, 32)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 256, 3, 64)).astype(np.float32))
        lengths = jnp.asarray([256, 130], jnp.int32)
        got = flash_attention_v2(q, k, v, lengths=lengths, interpret=True)
        mask = (jnp.arange(256) < 130)[None, None, None, :]
        want0 = sdpa(q[:1], k[:1], v[:1])
        want1 = sdpa(q[1:], k[1:], v[1:], mask=mask.astype(bool))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want0[0]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want1[0]), atol=2e-5)


class TestBf16LogitsPath:
    def test_bf16_unnormalized_exp_matches_f32_softmax(self):
        """The bf16 fast path (unnormalized bf16 exp, post-matmul
        normalization) must track the f32-softmax reference closely."""
        import os

        import numpy as np

        from multimodal_embeddings_tpu.models.transformer import sdpa

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 96, 4, 32)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(2, 96, 4, 32)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(2, 96, 4, 32)), jnp.bfloat16)
        fast = np.asarray(sdpa(q, k, v), np.float32)
        os.environ["MMTPU_F32_LOGITS"] = "1"
        try:
            ref = np.asarray(sdpa(q, k, v), np.float32)
        finally:
            del os.environ["MMTPU_F32_LOGITS"]
        # cosine per vector
        num = (fast * ref).sum(-1)
        den = np.linalg.norm(fast, axis=-1) * np.linalg.norm(ref, axis=-1)
        assert (num / den.clip(1e-9)).min() > 0.995
        np.testing.assert_allclose(fast, ref, atol=0.08)

    def test_bf16_path_respects_mask_and_causal(self):
        import numpy as np

        from multimodal_embeddings_tpu.models.transformer import sdpa

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 16, 2, 16)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, 16, 2, 16)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, 16, 2, 16)), jnp.bfloat16)
        # masking out the second half of keys == attending to the first half
        mask = jnp.arange(16)[None, None, None, :] < 8
        got = np.asarray(sdpa(q, k, v, mask=mask), np.float32)
        want = np.asarray(sdpa(q[:, :], k[:, :8], v[:, :8]), np.float32)
        np.testing.assert_allclose(got, want, atol=0.02)
        causal = np.asarray(sdpa(q, k, v, causal=True), np.float32)
        # first query position attends only to itself
        first = np.asarray(sdpa(q[:, :1], k[:, :1], v[:, :1]), np.float32)
        np.testing.assert_allclose(causal[:, 0], first[:, 0], atol=0.02)


class TestKvLengths:
    def test_sdpa_kv_lengths_equals_bool_mask(self):
        """kv_lengths is the per-batch valid-prefix mask contract: off-TPU
        it must produce exactly the boolean-mask path's output (on TPU it
        dispatches to the flash kernel's native length masking)."""
        from multimodal_embeddings_tpu.models.transformer import sdpa

        rng = np.random.default_rng(0)
        b, l, h, d = 3, 64, 4, 16
        q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
        lengths = jnp.asarray([64, 50, 0], jnp.int32)
        mask = (jnp.arange(l)[None, :] < lengths[:, None])[:, None, None, :]

        got = sdpa(q, k, v, kv_lengths=lengths)
        want = sdpa(q, k, v, mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_encoder_block_kv_lengths_matches_mask(self):
        import jax

        from multimodal_embeddings_tpu.models.transformer import EncoderBlock

        rng = np.random.default_rng(1)
        block = EncoderBlock(num_heads=4, dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(2, 24, 32)).astype(np.float32))
        lengths = jnp.asarray([24, 17], jnp.int32)
        mask = (jnp.arange(24)[None, :] < lengths[:, None])[:, None, None, :]
        params = block.init(jax.random.key(0), x)
        got = block.apply(params, x, kv_lengths=lengths)
        want = block.apply(params, x, mask=mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
