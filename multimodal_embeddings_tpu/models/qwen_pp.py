"""Pipeline-parallel Qwen greedy generation (the 32B serving assembly).

SURVEY §2.4 stretch: Qwen2.5-VL-32B's decoder does not fit one chip even
in bf16. This module assembles the PP primitives from
``parallel/pipeline.py`` into a full greedy-decode loop over a text
prompt (reference behavior: notebook ``QWEN2_5_document_parsing.ipynb``
cell ``d43bacc8``'s ``inference()``):

* prefill — one :func:`pipeline_decode_step` pass whose layer_fn runs
  the full-sequence causal block and emits the tight-padded KV cache
  as the layer's new state (input state ignored);
* decode — one :func:`pipeline_decode_step` per token, updating each
  stage's resident caches in place;
* embedding / final norm / lm head run replicated outside the ring
  (negligible compute; the 32B bulk is the 64-layer block stack).

Numerics match ``qwen_vl.greedy_generate`` exactly on the same config
(test-locked). Per-token steps retrace per position in this reference
implementation; a production loop would close the position over a
traced scalar inside one jitted scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_embeddings_tpu.models.qwen_vl import (
    QwenBlock,
    QwenVLConfig,
    mrope_tables,
    qwen_mrope_position_ids,
)
from multimodal_embeddings_tpu.models.transformer import RMSNorm
from multimodal_embeddings_tpu.parallel.pipeline import (
    pipeline_decode_step,
    stack_layer_params,
)


def _split_layer_params(params: dict, n_layers: int):
    return [params[f"layer{i}"] for i in range(n_layers)]


def pp_greedy_generate(
    config: QwenVLConfig,
    variables,
    token_ids: np.ndarray,  # (B, L) prompt with image-pad placeholders
    *,
    mesh,
    n_stages: int,
    max_new_tokens: int = 16,
    images: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Greedy decode with the decoder stack pipelined over ``n_stages``.

    ``images`` (B, H, W, 3) runs the vision tower BEFORE the ring (it is
    stage-0-sized compute, not pipelined) and splices the vision tokens
    into the ``image_pad_id`` slots of the prompt embeddings — the same
    merged sequence ``QwenVLModel.embed_multimodal`` builds, so document
    parsing (the notebook's 32B flagship, cell ``39512aca``) can run its
    full multimodal prefill+decode through the stage ring. M-RoPE
    position streams use the merged vision grid, matching the
    single-device path. Returns (B, max_new_tokens) token ids,
    EOS-padded.
    """
    cfg = config.text
    params = variables["params"]
    block = QwenBlock(cfg, dtype=jnp.float32, quantize=config.quantize)
    layer_params = _split_layer_params(params, cfg.layers)
    stacked = stack_layer_params(layer_params, n_stages)

    prompt = jnp.asarray(token_ids)
    b, prompt_len = prompt.shape
    if prompt_len + max_new_tokens > cfg.max_len:
        raise ValueError("prompt + new tokens exceed max_len")

    embed_table = jnp.asarray(params["tok_embed"]["embedding"])
    norm = RMSNorm(dtype=jnp.float32)
    if config.quantize == "int4":
        from multimodal_embeddings_tpu.kernels.quantization_int4 import (
            Q4Tensor,
            int4_apply,
        )

        lm_q4 = Q4Tensor(
            packed=jnp.asarray(params["lm_head"]["kernel_q4"]),
            scale=jnp.asarray(params["lm_head"]["kernel_scale"]),
        )

        def head(x):
            x = norm.apply({"params": params["final_norm"]}, x)
            return int4_apply(x, lm_q4)

    elif config.quantize:
        from multimodal_embeddings_tpu.kernels.quantization import (
            QTensor,
            int8_apply,
        )

        lm_qt = QTensor(
            q=jnp.asarray(params["lm_head"]["kernel_q"]),
            scale=jnp.asarray(params["lm_head"]["kernel_scale"]),
        )

        def head(x):
            x = norm.apply({"params": params["final_norm"]}, x)
            return int8_apply(x, lm_qt)

    else:
        lm_kernel = jnp.asarray(params["lm_head"]["kernel"])

        def head(x):
            x = norm.apply({"params": params["final_norm"]}, x)
            return x @ lm_kernel

    # --- prefill: full causal pass, caches captured as pipeline state ---
    grid_hw = None
    if images is not None:
        vcfg = config.vision
        m = vcfg.patch_size * vcfg.merge_size
        grid_hw = (int(images.shape[1]) // m, int(images.shape[2]) // m)
    position_ids, delta = qwen_mrope_position_ids(
        prompt, config.image_pad_id, grid_hw
    )
    cos, sin = mrope_tables(
        position_ids, cfg.head_dim, cfg.rope_theta, cfg.mrope_section
    )

    # tight static cache (same rule as build_generate_fns): decode steps
    # read the whole padded cache under the position mask, so size it to
    # prompt + generation, not max_len
    cache_len = min(
        cfg.max_len, -(-(prompt_len + max_new_tokens) // 128) * 128
    )
    kv_shape = (b, cache_len, cfg.kv_heads, cfg.head_dim)
    per = cfg.layers // n_stages
    kvd = jnp.dtype(cfg.kv_dtype)  # bf16 cache, same as single-device
    zero_state = (
        jnp.zeros((n_stages, per, *kv_shape), kvd),
        jnp.zeros((n_stages, per, *kv_shape), kvd),
    )

    def prefill_fn(lp, state, h):
        h2, (k, v) = block.apply({"params": lp}, h, cos, sin)
        pad = cache_len - k.shape[1]
        return h2, (
            jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))),
            jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))),
        )

    if images is None:
        x = embed_table[prompt].astype(jnp.float32)
    else:
        from multimodal_embeddings_tpu.models.qwen_vl import QwenVLModel

        model = QwenVLModel(config, dtype=jnp.float32)
        x = model.apply(
            variables,
            prompt,
            jnp.asarray(images),
            method=model.embed_multimodal,
        ).astype(jnp.float32)
    hidden, state = pipeline_decode_step(
        prefill_fn, stacked, zero_state, x, mesh=mesh
    )
    logits = head(hidden[:, -1])
    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # --- decode: one ring pass per token ---
    eos = config.eos_id
    done = token == eos
    out = []
    for t in range(max_new_tokens):
        out.append(jnp.where(done, eos, token))
        pos = prompt_len + t
        pos_arr = jnp.full((b,), pos, jnp.int32) + delta
        pos3 = jnp.broadcast_to(pos_arr[None, :, None], (3, b, 1))
        cos_t, sin_t = mrope_tables(
            pos3, cfg.head_dim, cfg.rope_theta, cfg.mrope_section
        )

        def decode_fn(lp, cache, h, cos_t=cos_t, sin_t=sin_t, pos=pos):
            return block.apply(
                {"params": lp}, h, cos_t, sin_t, cache=cache, position=pos
            )

        h = embed_table[out[-1][:, None]].astype(jnp.float32)
        hidden, state = pipeline_decode_step(
            decode_fn, stacked, state, h, mesh=mesh
        )
        token = jnp.argmax(head(hidden[:, -1]), axis=-1).astype(jnp.int32)
        done = done | (token == eos)
    return np.asarray(jnp.stack(out, axis=1))
