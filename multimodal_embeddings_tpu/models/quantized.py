"""Weight-only int8/int4 serving modules + f32→quantized tree conversion.

The reference serves ``mmE5-mllama-11b-instruct`` in bf16 across GPUs
(``deprecated_package/embedder.py:73-83``); one 16GB v5e chip cannot hold
11B bf16 (~22GB). This module provides the single-chip story: Dense
layers whose parameters are stored as int8 with per-output-channel f32
scales (≈11GB for 11B) and dequantized inside the matmul
(``kernels/quantization.py`` Pallas kernel on TPU — the bf16 weight copy
never exists in HBM).

``quantize_dense_tree`` converts any trained/ported f32 tree into the
quantized model's structure, so checkpoint→int8 serving is one call.
Quantized modules are serving-only (no gradient path through the int8
storage); training happens in the f32/bf16 models.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_embeddings_tpu.kernels.quantization import (
    QTensor,
    int8_apply,
    quantize_tensor,
)
from multimodal_embeddings_tpu.kernels.quantization_int4 import (
    Q4Tensor,
    int4_apply,
    int4_group_size,
    quantize_tensor_int4,
)


def _as_tuple(v) -> Tuple[int, ...]:
    return (v,) if isinstance(v, int) else tuple(v)


def quant_dense_cls(quantize):
    """Map a ``quantize`` flag to the Dense drop-in module.

    ``True`` / ``"int8"`` → :class:`Int8DenseGeneral`; ``"int4"`` →
    :class:`Int4DenseGeneral` (the TPU-native counterpart of the
    reference notebook's 4-bit 32B load, cell ``39512aca``)."""
    if quantize == "int4":
        return Int4DenseGeneral
    return Int8DenseGeneral


class Int8DenseGeneral(nn.Module):
    """Drop-in for ``nn.DenseGeneral(use_bias=...)`` with int8 weight
    storage. The kernel is stored flattened to ``(in, out)`` int8 plus a
    ``(1, out)`` f32 scale; outputs are reshaped to ``features``.

    Contraction axes must be the trailing axes of ``x`` (matching every
    call site in ``transformer.py``)."""

    features: Union[int, Sequence[int]]
    axis: Union[int, Sequence[int]] = -1
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = _as_tuple(self.axis)
        n_axes = len(axes)
        assert axes == tuple(range(-n_axes, 0)), (
            f"contraction axes must be trailing, got {axes}"
        )
        feats = _as_tuple(self.features)
        in_f = int(np.prod(x.shape[x.ndim - n_axes :]))
        out_f = int(np.prod(feats))
        q = self.param(
            "kernel_q", lambda _k, s: jnp.zeros(s, jnp.int8), (in_f, out_f)
        )
        scale = self.param("kernel_scale", nn.initializers.ones, (1, out_f))
        lead = x.shape[: x.ndim - n_axes]
        y = int8_apply(
            x.astype(self.dtype).reshape(*lead, in_f),
            QTensor(q=q, scale=jnp.asarray(scale)),
        )
        y = y.reshape(*lead, *feats)
        if self.use_bias:
            # feats-shaped like nn.DenseGeneral's, so fp-tree biases carry
            # over unchanged through quantize_dense_tree
            bias = self.param("bias", nn.initializers.zeros, feats)
            y = y + jnp.asarray(bias, y.dtype)
        return y


class Int4DenseGeneral(nn.Module):
    """Drop-in for ``nn.DenseGeneral`` with packed int4 weight storage.

    The kernel is stored as ``(in/2, out)`` uint8 (two offset-binary
    nibbles per byte, ``kernels/quantization_int4.py`` layout) plus
    ``(n_groups, out)`` f32 group scales — half of int8's bytes, the
    storage class the reference's 32B flagship serves at (4-bit
    bitsandbytes, notebook cell ``39512aca``)."""

    features: Union[int, Sequence[int]]
    axis: Union[int, Sequence[int]] = -1
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    group_size: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = _as_tuple(self.axis)
        n_axes = len(axes)
        assert axes == tuple(range(-n_axes, 0)), (
            f"contraction axes must be trailing, got {axes}"
        )
        feats = _as_tuple(self.features)
        in_f = int(np.prod(x.shape[x.ndim - n_axes :]))
        out_f = int(np.prod(feats))
        g = int4_group_size(in_f, self.group_size)
        packed = self.param(
            "kernel_q4",
            lambda _k, s: jnp.full(s, 0x88, jnp.uint8),  # nibbles = 8 → q=0
            (in_f // 2, out_f),
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (in_f // g, out_f)
        )
        lead = x.shape[: x.ndim - n_axes]
        y = int4_apply(
            x.astype(self.dtype).reshape(*lead, in_f),
            Q4Tensor(packed=packed, scale=jnp.asarray(scale)),
        )
        y = y.reshape(*lead, *feats)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, feats)
            y = y + jnp.asarray(bias, y.dtype)
        return y


def quantize_dense_tree(src_params, target_struct):
    """Convert an f32/bf16 parameter tree into a quantized model's
    structure.

    ``target_struct`` is the quantized model's param tree (or eval_shape
    thereof): wherever it holds ``kernel_q``/``kernel_scale`` (int8) or
    ``kernel_q4``/``kernel_scale`` (packed int4) and the source holds
    ``kernel``, the source kernel is reshaped to the flat ``(in, out)``
    layout and symmetrically quantized (per output channel for int8;
    group-wise per the target's scale shape for int4); every other leaf
    is carried over from the source.
    """

    def convert(src: dict, tgt: dict) -> dict:
        out = {}
        if "kernel_q" in tgt and "kernel" in src:
            w = jnp.asarray(src["kernel"])
            q_shape = tuple(tgt["kernel_q"].shape)
            qt = quantize_tensor(w.reshape(q_shape), contract_axes=(0,))
            out["kernel_q"] = qt.q
            out["kernel_scale"] = qt.scale
            for name, leaf in src.items():
                if name != "kernel":
                    out[name] = leaf
            return out
        if "kernel_q4" in tgt and "kernel" in src:
            w = jnp.asarray(src["kernel"])
            in_f = 2 * tgt["kernel_q4"].shape[0]
            out_f = tgt["kernel_q4"].shape[1]
            group = in_f // tgt["kernel_scale"].shape[0]
            qt = quantize_tensor_int4(
                w.reshape(in_f, out_f), group_size=group
            )
            out["kernel_q4"] = qt.packed
            out["kernel_scale"] = qt.scale
            for name, leaf in src.items():
                if name != "kernel":
                    out[name] = leaf
            return out
        for name, tgt_leaf in tgt.items():
            src_leaf = src[name]
            if isinstance(tgt_leaf, dict):
                out[name] = convert(src_leaf, tgt_leaf)
            else:
                out[name] = src_leaf
        return out

    def plain(tree):
        if hasattr(tree, "items"):
            return {k: plain(v) for k, v in tree.items()}
        return tree

    return convert(plain(src_params), plain(target_struct))


def synthetic_int8_init(model, example_args: Sequence, seed: int = 0):
    """Deterministic synthetic variables for a quantized model WITHOUT
    materializing the full-precision twin.

    ``MultimodalEmbedder(quantize=True)`` without a checkpoint previously
    initialized the f32 twin (~44GB host tree for the 11B config) just to
    quantize it; this builds the int8 tree directly from ``eval_shape``
    (the same approach ``scripts/int8_11b_smoke.py`` validated on chip):
    int8 leaves get a deterministic uniform fill, float leaves a small
    random normal (bf16 for >1e6-element tables — HBM is the scarce
    resource), ints/bools zeros. Capacity/latency-faithful, accuracy
    gated on a real checkpoint like every other synthetic init here.
    """
    import ml_dtypes

    struct = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, *example_args)
    )
    rng = np.random.default_rng(seed)

    def fill(leaf):
        if leaf.dtype == jnp.int8:
            return rng.integers(-127, 128, leaf.shape, np.int8)
        if leaf.dtype == jnp.uint8:  # packed int4 nibbles
            return rng.integers(0, 256, leaf.shape).astype(np.uint8)
        if str(leaf.dtype).startswith(("float", "bfloat")):
            dt = (
                ml_dtypes.bfloat16
                if np.prod(leaf.shape, dtype=np.int64) > 1e6
                else np.float32
            )
            if leaf.shape and leaf.shape[-1:] == leaf.shape:  # 1-D: scales/LN
                return np.ones(leaf.shape, dt) * np.float32(0.02)
            return (rng.standard_normal(leaf.shape) * 0.02).astype(dt)
        return np.zeros(leaf.shape, jax.dtypes.canonicalize_dtype(leaf.dtype))

    return jax.tree.map(fill, struct)


def param_bytes(params) -> int:
    """Total parameter storage in bytes (int8 counts 1, bf16 2, f32 4)."""
    leaves = jax.tree.leaves(params)
    return sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves)
