"""Analytic FLOP counters (utils/flops.py) vs XLA's own cost analysis.

The analytic counts exist because XLA cost_analysis cannot see inside
Pallas custom calls (the MFU under-count of ROADMAP chain-13). On the
tiny CPU config nothing dispatches to Pallas, so XLA's estimate IS a
full count and the analytic number must land close to it (elementwise /
normalization work is deliberately omitted — sub-percent at serving
scale, a few percent at tiny scale).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
from multimodal_embeddings_tpu.utils.flops import (
    mllama_embed_flops,
    mllama_text_flops,
    mllama_vision_flops,
)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = MllamaConfig.tiny()
    model = MmE5Embedder(cfg)
    size = cfg.vision.image_size
    text_len = cfg.text.max_len
    ids = jnp.zeros((1, text_len), jnp.int32)
    mask = jnp.ones((1, text_len), jnp.int32)
    imgs = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ids, mask, imgs)
    return cfg, model, variables, ids, mask, imgs


def _xla_flops(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    return float(cost.get("flops", 0.0))


class TestAnalyticFlops:
    def test_embed_forward_matches_xla(self, tiny_model):
        cfg, model, variables, ids, mask, imgs = tiny_model
        measured = _xla_flops(
            lambda v, i, m, im: model.apply(v, i, m, im),
            variables, ids, mask, imgs,
        )
        analytic = mllama_embed_flops(cfg, cfg.text.max_len, tiles=1)
        total = analytic["total_flops_per_crop"]
        # analytic omits elementwise/norm work and the conv may be counted
        # differently; at tiny scale allow a generous band, but the count
        # must be the right magnitude and conservative (<= XLA + margin)
        assert total == analytic["vision_flops_per_crop"] + analytic[
            "text_flops_per_crop"
        ]
        assert 0.5 * measured <= total <= 1.3 * measured, (
            total, measured,
        )

    def test_split_stacks_match_split_programs(self, tiny_model):
        """vision/text split counts vs the decoupled programs' XLA cost."""
        cfg, model, variables, ids, mask, imgs = tiny_model
        v_measured = _xla_flops(
            lambda v, im: model.apply(v, im, method=model.encode_vision),
            variables, imgs,
        )
        states, vmask = model.apply(
            variables, imgs, method=model.encode_vision
        )
        t_measured = _xla_flops(
            lambda v, i, m, s: model.apply(
                v, i, m, s, method=model.embed_from_vision
            ),
            variables, ids, mask, states,
        )
        v_analytic = mllama_vision_flops(cfg, tiles=1)
        seq = (cfg.vision.image_size // cfg.vision.patch_size) ** 2 + 1
        t_analytic = mllama_text_flops(cfg, cfg.text.max_len, seq)
        assert 0.5 * v_measured <= v_analytic <= 1.3 * v_measured, (
            v_analytic, v_measured,
        )
        assert 0.5 * t_measured <= t_analytic <= 1.3 * t_measured, (
            t_analytic, t_measured,
        )

    def test_jaxpr_counter_matches_xla_on_tiny_embed(self, tiny_model):
        """The shape-walking counter (fn_matmul_conv_flops) must agree
        with XLA cost_analysis on a Pallas-free forward — the validation
        backing the headline MFU line (r4 verdict #5)."""
        from multimodal_embeddings_tpu.utils.flops import (
            fn_matmul_conv_flops,
        )

        cfg, model, variables, ids, mask, imgs = tiny_model
        measured = _xla_flops(
            lambda v, i, m, im: model.apply(v, i, m, im),
            variables, ids, mask, imgs,
        )
        sd = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables
        )
        counted = fn_matmul_conv_flops(
            lambda v, i, m, im: model.apply(v, i, m, im),
            sd,
            jax.ShapeDtypeStruct(ids.shape, ids.dtype),
            jax.ShapeDtypeStruct(mask.shape, mask.dtype),
            jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
        )
        # the counter sees exactly the dot/conv shapes XLA compiles;
        # XLA's figure adds elementwise work and may fold/fuse — a tight
        # band, not equality
        assert 0.8 * measured <= counted <= 1.1 * measured, (
            counted, measured,
        )

    def test_jaxpr_counter_exact_primitives(self):
        """Hand-checkable exactness: matmul, grouped conv, scan, cond."""
        from multimodal_embeddings_tpu.utils.flops import (
            fn_matmul_conv_flops,
        )

        f = fn_matmul_conv_flops(
            lambda a, b: a @ b,
            jax.ShapeDtypeStruct((4, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, 16), jnp.float32),
        )
        assert f == 2 * 4 * 8 * 16
        # depthwise conv: feature_group_count = C, per-group in-ch = 1
        w = jax.ShapeDtypeStruct((3, 3, 1, 6), jnp.float32)
        x = jax.ShapeDtypeStruct((1, 8, 8, 6), jnp.float32)
        f = fn_matmul_conv_flops(
            lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=6,
            ),
            x, w,
        )
        assert f == 2 * (1 * 8 * 8 * 6) * 1 * 9
        # scan multiplies by length; cond takes the max branch
        def scanned(xs):
            def body(c, x):
                return c, x @ jnp.ones((8, 8))
            return jax.lax.scan(body, 0.0, xs)[1]

        f = fn_matmul_conv_flops(
            scanned, jax.ShapeDtypeStruct((5, 4, 8), jnp.float32)
        )
        assert f == 5 * 2 * 4 * 8 * 8

        def branchy(x):
            return jax.lax.cond(
                x.sum() > 0,
                lambda x: x @ jnp.ones((8, 8)),
                lambda x: x,
                x,
            )

        f = fn_matmul_conv_flops(
            branchy, jax.ShapeDtypeStruct((4, 8), jnp.float32)
        )
        assert f == 2 * 4 * 8 * 8

    def test_headline_counter_pallas_visibility(self):
        """The counter must see the SAME flops whether attention runs as
        plain dot_generals or inside the Pallas lane-folded kernel (grid
        recursion) — the exact blindness cost_analysis has."""
        from multimodal_embeddings_tpu.kernels.encoder_attention import (
            encoder_attention_blf,
        )
        from multimodal_embeddings_tpu.utils.flops import (
            fn_matmul_conv_flops,
        )

        b, l, h, d = 2, 64, 4, 32
        q = jax.ShapeDtypeStruct((b, l, h * d), jnp.float32)

        def pallas_fn(q, k, v):
            return encoder_attention_blf(
                q, k, v, heads=h, heads_per_block=1
            )

        counted = fn_matmul_conv_flops(pallas_fn, q, q, q)
        assert counted == 2 * 2 * b * h * l * l * d

    def test_serving_scale_sanity(self):
        """11B per-crop count lands at the known scale: ~2·N_text·M for
        the text stack (M=512 prompt tokens, ~9.8B text-stack params →
        ~1e13) plus the vision tower."""
        cfg = MllamaConfig.mme5_11b()
        counts = mllama_embed_flops(cfg, 512, tiles=1)
        assert 5e12 < counts["total_flops_per_crop"] < 5e13
        # text stack dominates at 11B
        assert (
            counts["text_flops_per_crop"] > counts["vision_flops_per_crop"]
        )
