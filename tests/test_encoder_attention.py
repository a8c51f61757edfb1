"""Whole-row single-pass encoder attention kernel: exactness vs the XLA
reference path (kernels/encoder_attention.py; CPU interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_embeddings_tpu.kernels.encoder_attention import (
    encoder_attention,
)


def ref_attention(q, k, v, valid_len=None):
    """Plain f32 softmax attention, (B, L, H, D) layout."""
    d = q.shape[-1]
    logits = jnp.einsum(
        "blhd,bmhd->bhlm",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
    ) / np.sqrt(d)
    if valid_len is not None:
        mask = jnp.arange(q.shape[1]) < valid_len
        logits = jnp.where(mask[None, None, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", w, v.astype(jnp.float32))


class TestEncoderAttention:
    def _qkv(self, b=2, l=64, h=4, d=32, dtype=jnp.float32, seed=0):
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, l, h, d)).astype(np.float32), dtype
        )
        return mk(), mk(), mk()

    def test_matches_reference_f32(self):
        q, k, v = self._qkv()
        got = encoder_attention(q, k, v, interpret=True)
        want = ref_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

    def test_matches_reference_bf16(self):
        q, k, v = self._qkv(dtype=jnp.bfloat16)
        got = encoder_attention(q, k, v, interpret=True)
        want = ref_attention(q, k, v)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=4e-2
        )

    @pytest.mark.parametrize("hpb", [None, 1, 2])
    def test_blhd_matches_base_kernel(self, hpb):
        """The transpose-free BLHD variant is numerically identical to
        the BHLD kernel (same per-head math, different slab layout)."""
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_blhd,
        )

        q, k, v = self._qkv(dtype=jnp.bfloat16, seed=4)
        base = encoder_attention(q, k, v, interpret=True)
        got = encoder_attention_blhd(
            q, k, v, heads_per_block=hpb, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(base, np.float32),
            atol=1e-6,
        )

    def test_blhd_dv_wider_than_dk(self):
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_blhd,
        )

        rng = np.random.default_rng(7)
        b, l, h, d, dv = 2, 32, 2, 16, 32
        q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, l, h, dv)).astype(np.float32))
        base = encoder_attention(q, k, v, interpret=True)
        got = encoder_attention_blhd(q, k, v, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base), atol=1e-6
        )

    def test_valid_len_masks_trailing_keys(self):
        """Static prefix masking (the Mllama 1601-of-1608 pattern)."""
        q, k, v = self._qkv(l=48)
        got = encoder_attention(q, k, v, valid_len=33, interpret=True)
        want = ref_attention(q, k, v, valid_len=33)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )
        # masked keys must not influence the output at all
        k2 = k.at[:, 33:].set(999.0)
        v2 = v.at[:, 33:].set(-999.0)
        got2 = encoder_attention(q, k2, v2, valid_len=33, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got2), np.asarray(got), atol=1e-6
        )

    @pytest.mark.parametrize("hpb", [1, 2, 4])
    def test_heads_per_block_invariant(self, hpb):
        q, k, v = self._qkv()
        base = encoder_attention(q, k, v, interpret=True)
        got = encoder_attention(
            q, k, v, heads_per_block=hpb, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base), atol=1e-6
        )

    def test_dv_wider_than_dk(self):
        """Dv ≠ Dk — the detector's PSA attention runs q/k at half the
        value width (models/layers.py:394, v10 attn_ratio 0.5)."""
        rng = np.random.default_rng(7)
        b, l, h, dk, dv = 2, 64, 4, 32, 64
        q = jnp.asarray(rng.normal(size=(b, l, h, dk)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, l, h, dk)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, l, h, dv)).astype(np.float32))
        got = encoder_attention(q, k, v, interpret=True)
        assert got.shape == (b, l, h, dv)
        want = ref_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

    def test_vit_b_shape_smoke(self):
        """The headline serving shape (scaled down in batch)."""
        q, k, v = self._qkv(b=1, l=784, h=12, d=64, dtype=jnp.bfloat16)
        got = encoder_attention(q, k, v, interpret=True)
        want = ref_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=4e-2
        )


class TestPaddedDispatch:
    """encoder_attention_padded: sublane-unaligned L with a static valid
    prefix (the Mllama 1601-of-1608 single-tile shape, scaled down)."""

    def test_matches_masked_reference(self):
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_padded,
        )

        rng = np.random.default_rng(11)
        b, l, h, d, valid = 2, 40, 4, 32, 33  # l % 16 != 0
        mk = lambda: jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
        q, k, v = mk(), mk(), mk()
        got = encoder_attention_padded(q, k, v, valid_len=valid, interpret=True)
        assert got.shape == (b, l, h, d)
        want = ref_attention(q, k, v, valid_len=valid)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

    def test_sdpa_key_valid_len_fallback_equals_mask(self):
        """On non-TPU backends sdpa(key_valid_len=) lowers to the same
        boolean prefix mask — locked against the explicit-mask path."""
        from multimodal_embeddings_tpu.models.transformer import sdpa

        rng = np.random.default_rng(12)
        b, l, h, d, valid = 2, 24, 2, 16, 17
        mk = lambda: jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
        q, k, v = mk(), mk(), mk()
        got = sdpa(q, k, v, key_valid_len=valid)
        mask = (jnp.arange(l) < valid)[None, None, None, :]
        want = sdpa(q, k, v, mask=mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )
        # valid == L → plain unmasked path
        got_full = sdpa(q, k, v, key_valid_len=l)
        want_full = sdpa(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got_full), np.asarray(want_full), atol=1e-6
        )


class TestRowBlocking:
    """Row-chunked score computation (VMEM fix for L≈1616 where whole-row
    (L,L) intermediates exceed the 16MB scoped budget). Per-row softmax
    makes chunking exact — locked against whole-row."""

    @pytest.mark.parametrize("rb", [16, 32, 48])
    def test_matches_whole_row(self, rb):
        rng = np.random.default_rng(21)
        b, l, h, d = 2, 96, 4, 32  # 96 % 32 != 0 exercises the shifted tail
        mk = lambda: jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
        q, k, v = mk(), mk(), mk()
        base = encoder_attention(q, k, v, interpret=True)
        got = encoder_attention(q, k, v, row_block=rb, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base), atol=1e-6
        )

    def test_with_valid_len(self):
        rng = np.random.default_rng(22)
        b, l, h, d = 1, 64, 2, 16
        mk = lambda: jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
        q, k, v = mk(), mk(), mk()
        base = encoder_attention(q, k, v, valid_len=50, interpret=True)
        got = encoder_attention(
            q, k, v, valid_len=50, row_block=32, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base), atol=1e-6
        )

    def test_auto_row_block_on_long_sequences(self):
        """The Mllama padded shape (1616) must auto-pick a 16-aligned
        row block that keeps intermediates + blocks inside scoped VMEM."""
        from multimodal_embeddings_tpu.kernels import encoder_attention as ea

        # replicate the heuristic at l=1616
        l = 1616
        rb = max(16, int(6e6 // (l * 6)) // 16 * 16)
        assert rb % 16 == 0 and rb < l
        inter = 6 * rb * l
        per_head = 2 * 2 * l * (80 + 80) * 2
        hpb = max(1, int((13e6 - inter) // per_head))
        assert inter + hpb * per_head <= 15e6  # inside the 16MB limit
        # and the whole-row 784 ViT shape stays un-chunked
        assert 784 * 784 * 6 <= 8e6


class TestBlfLaneFolded:
    """Lane-folded zero-transpose variant: q/k/v as (B, L, H·D) slabs with
    per-head static lane slices in-kernel (encoder_attention_blf). The 4-D
    true-BLHD forms are Mosaic-illegal at H=12 (sublane 8-divisibility);
    folding heads onto the lane axis is the legal formulation."""

    def _qkv(self, b=2, l=64, h=4, d=32, dv=None, dtype=jnp.float32, seed=3):
        dv = d if dv is None else dv
        rng = np.random.default_rng(seed)
        mk = lambda dd: jnp.asarray(
            rng.normal(size=(b, l, h, dd)).astype(np.float32), dtype
        )
        return mk(d), mk(d), mk(dv)

    @pytest.mark.parametrize("hpb", [None, 1, 2, 4])
    def test_matches_base_kernel(self, hpb):
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_blf,
        )

        q, k, v = self._qkv()
        b, l, h, d = q.shape
        base = encoder_attention(q, k, v, interpret=True)
        got = encoder_attention_blf(
            q.reshape(b, l, h * d),
            k.reshape(b, l, h * d),
            v.reshape(b, l, h * d),
            heads=h,
            heads_per_block=hpb,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base.reshape(b, l, h * d)), atol=1e-6
        )

    @pytest.mark.parametrize("hpb", [1, 2, 4])
    def test_scratch_kernel_matches_unrolled(self, hpb):
        """The shared-score-scratch form is numerically identical to the
        per-head-temps form (exp overwrites f32 scores in place; denom
        stays f32) — the VMEM fix that unlocks hpb>2 at the ViT shape."""
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_blf,
        )

        q, k, v = self._qkv(seed=8)
        b, l, h, d = q.shape
        qf = q.reshape(b, l, h * d)
        kf = k.reshape(b, l, h * d)
        vf = v.reshape(b, l, h * d)
        base = encoder_attention_blf(
            qf, kf, vf, heads=h, heads_per_block=hpb, interpret=True
        )
        got = encoder_attention_blf(
            qf, kf, vf, heads=h, heads_per_block=hpb, interpret=True,
            scratch=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))

    def test_dv_wider_than_dk(self):
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_blf,
        )

        q, k, v = self._qkv(d=16, dv=32, seed=5)
        b, l, h, d = q.shape
        dv = v.shape[3]
        base = encoder_attention(q, k, v, interpret=True)
        got = encoder_attention_blf(
            q.reshape(b, l, h * d),
            k.reshape(b, l, h * d),
            v.reshape(b, l, h * dv),
            heads=h,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base.reshape(b, l, h * dv)), atol=1e-6
        )

    def test_hpb_picker_vit_shape_legal(self):
        """At the ViT-B production shape (784, 12, 64, bf16) the picker
        must choose a lane-legal block: hpb·64 ≡ 0 (mod 128) or full H,
        inside the 14MB budget."""
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            _blf_pick_hpb,
            blf_supported,
        )

        hpb = _blf_pick_hpb(784, 12, 64, 64, jnp.bfloat16)
        assert hpb is not None and 12 % hpb == 0
        assert (hpb * 64) % 128 == 0 or hpb == 12
        # cap calibrated on chip (chain r5-03): hpb=4 (14.27M modeled)
        # compiled and ran 3.719 ms vs hpb=2's 3.77 — the picker takes it
        assert hpb == 4
        # measured VMEM model (chain r5-02): per-unrolled-head f32 score
        # buffers are NOT reused, so blocks + hpb·4L² + exp must fit
        scoped = (
            2 * 2 * 784 * hpb * 128 * 2 + hpb * 4 * 784 * 784 + 2 * 784 * 784
        )
        assert scoped <= 14.3e6
        # the hpb=6 config that OOM'd on chip (19.14M scoped) is refused
        assert (
            2 * 2 * 784 * 6 * 128 * 2 + 6 * 4 * 784 * 784 + 2 * 784 * 784
            > 14.3e6
        )
        assert blf_supported(784, 12, 64, 64, jnp.bfloat16)
        # the PSA shape that compiled at hpb=2 stays supported
        assert _blf_pick_hpb(1024, 4, 64, 128, jnp.bfloat16) == 2
        # whole-row only: a shape whose scores can't fit must be refused
        assert not blf_supported(2048, 12, 64, 64, jnp.bfloat16)

    def test_attention_module_blf_path_matches_default(self, monkeypatch):
        """Same params, same input: the BLF opt-in must reproduce the
        default DenseGeneral+sdpa path (param tree is shared)."""
        from flax.linen import unbox

        from multimodal_embeddings_tpu.models.transformer import Attention

        b, l, d_model, heads = 2, 256, 128, 4
        attn = Attention(
            num_heads=heads, head_dim=d_model // heads, dtype=jnp.float32
        )
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.normal(size=(b, l, d_model)), jnp.float32)
        variables = unbox(attn.init(jax.random.PRNGKey(0), x))
        monkeypatch.delenv("MMTPU_ENC_ATTN_BLF_INTERPRET", raising=False)
        base = attn.apply(variables, x)
        monkeypatch.setenv("MMTPU_ENC_ATTN_BLF_INTERPRET", "1")
        got = attn.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base), atol=2e-5
        )

    def test_blf_path_param_tree_identical(self, monkeypatch):
        from multimodal_embeddings_tpu.models.transformer import Attention

        b, l, d_model, heads = 1, 256, 128, 4
        attn = Attention(
            num_heads=heads, head_dim=d_model // heads, dtype=jnp.float32
        )
        x = jnp.zeros((b, l, d_model), jnp.float32)
        monkeypatch.delenv("MMTPU_ENC_ATTN_BLF_INTERPRET", raising=False)
        base = attn.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("MMTPU_ENC_ATTN_BLF_INTERPRET", "1")
        got = attn.init(jax.random.PRNGKey(0), x)
        bleaves = jax.tree_util.tree_flatten_with_path(base)[0]
        gleaves = jax.tree_util.tree_flatten_with_path(got)[0]
        assert [p for p, _ in bleaves] == [p for p, _ in gleaves]
        for (_, a), (_, c) in zip(bleaves, gleaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


class TestBlfPacked:
    """Packed per-head [q|k|v] slab kernel (the PSA layout) — equality vs
    the reference attention and the PSAAttention module dispatch."""

    def _packed(self, b=2, l=64, heads=4, kd=16, hd=32, seed=9):
        rng = np.random.default_rng(seed)
        stride = 2 * kd + hd
        qkv = jnp.asarray(
            rng.normal(size=(b, l, heads, stride)).astype(np.float32)
        )
        return qkv, qkv[..., :kd], qkv[..., kd : 2 * kd], qkv[..., 2 * kd :]

    @pytest.mark.parametrize("hpb", [None, 1, 2])
    def test_matches_reference(self, hpb):
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_blf_packed,
        )

        qkv, q, k, v = self._packed()
        b, l, heads, stride = qkv.shape
        kd, hd = 16, 32
        got = encoder_attention_blf_packed(
            qkv.reshape(b, l, heads * stride),
            heads=heads, key_dim=kd, head_dim=hd,
            heads_per_block=hpb, interpret=True,
        )
        want = ref_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(want).reshape(b, l, heads * hd),
            atol=1e-5,
        )

    def test_psa_module_blf_path_matches_default(self, monkeypatch):
        from flax.linen import unbox

        from multimodal_embeddings_tpu.models.layers import PSAAttention

        b, hh, ww, c = 2, 16, 16, 128  # l = 256 (>= min len irrelevant here)
        attn = PSAAttention(channels=c, num_heads=2, dtype=jnp.float32)
        rng = np.random.default_rng(17)
        x = jnp.asarray(rng.normal(size=(b, hh, ww, c)), jnp.float32)
        variables = unbox(attn.init(jax.random.PRNGKey(0), x))
        monkeypatch.delenv("MMTPU_PSA_BLF_INTERPRET", raising=False)
        base = attn.apply(variables, x)
        monkeypatch.setenv("MMTPU_PSA_BLF_INTERPRET", "1")
        got = attn.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base), atol=2e-5
        )

    def test_production_psa_shape_supported(self):
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            _blf_packed_pick_hpb,
            blf_packed_supported,
        )

        # detector PSA at the production config: 1024 tokens, 4 heads,
        # kd 64, hd 128 (stride 256 — every slice offset 64-aligned)
        assert blf_packed_supported(1024, 4, 64, 128, jnp.bfloat16)
        hpb = _blf_packed_pick_hpb(1024, 4, 64, 128, jnp.bfloat16)
        scoped = (
            2 * 1024 * hpb * (256 + 128) * 2
            + hpb * 4 * 1024 * 1024
            + 2 * 1024 * 1024
        )
        assert scoped <= 14e6


class TestProjBhld:
    """Proj-to-BHLD path: kernel bhld_inputs + the Attention module's
    MMTPU_ENC_ATTN_PROJ opt-in (chain r4-06 probe winner at ViT shape)."""

    def test_bhld_inputs_matches_base_kernel(self):
        rng = np.random.default_rng(7)
        b, l, h, d = 2, 64, 4, 32
        mk = lambda: jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
        q, k, v = mk(), mk(), mk()
        base = encoder_attention(q, k, v, interpret=True)
        got = encoder_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            bhld_inputs=True,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base.transpose(0, 2, 1, 3)),
            atol=1e-6,
        )

    def test_bhld_inputs_dv_wider_than_dk(self):
        rng = np.random.default_rng(8)
        b, l, h, d, dv = 1, 64, 2, 16, 32
        mk = lambda dd: jnp.asarray(
            rng.normal(size=(b, h, l, dd)), jnp.float32
        )
        q, k, v = mk(d), mk(d), mk(dv)
        base = encoder_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            interpret=True,
        )
        got = encoder_attention(q, k, v, bhld_inputs=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(base.transpose(0, 2, 1, 3)),
            atol=1e-6,
        )

    def test_attention_module_proj_path_matches_default(self, monkeypatch):
        """Same params, same input: the proj-BHLD opt-in must reproduce
        the default DenseGeneral+sdpa path (param tree is shared)."""
        from flax.linen import unbox

        from multimodal_embeddings_tpu.models.transformer import Attention

        b, l, d_model, heads = 2, 256, 128, 4  # l >= _ENC_ATTN_MIN_LEN
        attn = Attention(
            num_heads=heads, head_dim=d_model // heads, dtype=jnp.float32
        )
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(b, l, d_model)), jnp.float32)
        variables = unbox(attn.init(jax.random.PRNGKey(0), x))
        monkeypatch.delenv("MMTPU_ENC_ATTN_PROJ_INTERPRET", raising=False)
        base = attn.apply(variables, x)
        monkeypatch.setenv("MMTPU_ENC_ATTN_PROJ_INTERPRET", "1")
        got = attn.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base), atol=2e-5
        )

    def test_proj_path_param_tree_identical(self, monkeypatch):
        """Init under the proj path produces the same tree as default."""
        from multimodal_embeddings_tpu.models.transformer import Attention

        b, l, d_model, heads = 1, 256, 128, 4
        attn = Attention(
            num_heads=heads, head_dim=d_model // heads, dtype=jnp.float32
        )
        x = jnp.zeros((b, l, d_model), jnp.float32)
        monkeypatch.delenv("MMTPU_ENC_ATTN_PROJ_INTERPRET", raising=False)
        base = attn.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("MMTPU_ENC_ATTN_PROJ_INTERPRET", "1")
        got = attn.init(jax.random.PRNGKey(0), x)
        bleaves = jax.tree_util.tree_flatten_with_path(base)[0]
        gleaves = jax.tree_util.tree_flatten_with_path(got)[0]
        assert [p for p, _ in bleaves] == [p for p, _ in gleaves]
        for (_, a), (_, c) in zip(bleaves, gleaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
