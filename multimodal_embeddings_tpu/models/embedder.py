"""MultimodalEmbedder — the user-facing embedding engine.

API-compatible with the reference's ``MmE5MllamaEmbedder``
(``embedder.py:36-254``): ``get_image_embeddings(paths, is_query,
batch_size)`` returning per-input vectors (None on failure) and
``get_text_embeddings(text)``. The execution model is redesigned for TPU:

* the reference runs **one 11B forward per image** and distributes work by
  replicating the model per GPU with a thread pool
  (``embedder.py:104-137,190-224``); here images are decoded host-side,
  resampled to the encoder input with the batched ``crop_and_resize``
  kernel, and embedded in **fixed-size padded batches through one jitted
  forward**, with the batch dim sharded over the mesh's data axis and
  (for the mmE5 family) parameters tensor-sharded over the model axis;
* embeddings come back L2-normalized float32, matching the
  last-token-pool contract (``embedder.py:17-34``).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from multimodal_embeddings_tpu.config import EmbedderConfig
from multimodal_embeddings_tpu.core.mesh import DATA_AXIS
from multimodal_embeddings_tpu.io.images import resize_image_if_needed
from multimodal_embeddings_tpu.io.logging_setup import get_logger
from multimodal_embeddings_tpu.models.mme5 import MllamaConfig, MmE5Embedder
from multimodal_embeddings_tpu.models.tokenizer import ByteTokenizer, HFTokenizer
from multimodal_embeddings_tpu.models.vision_encoder import (
    DualEncoder,
    DualEncoderConfig,
)
from multimodal_embeddings_tpu.models.weights import (
    deterministic_init,
    load_checkpoint,
)
from multimodal_embeddings_tpu.parallel import sharding as psharding

logger = get_logger("embedder")

TEXT_MAX_LEN = 64


class MultimodalEmbedder:
    """Batched TPU embedder over either model family.

    ``family='siglip'`` → DualEncoder (fast path, default);
    ``family='mme5'``   → Mllama-style parity architecture.
    """

    def __init__(
        self,
        config: EmbedderConfig = EmbedderConfig(),
        mesh=None,
        model_config=None,
        tokenizer=None,
        seed: int = 0,
    ):
        self.config = config
        self.mesh = mesh
        self.tokenizer = tokenizer or ByteTokenizer()
        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32

        if config.family == "mme5":
            self.model_config = model_config or MllamaConfig.mme5_11b()
            if config.quantize and not self.model_config.quantize:
                import dataclasses as _dc

                self.model_config = _dc.replace(
                    self.model_config, quantize=config.quantize
                )
            if self.model_config.quantize and mesh is not None:
                raise ValueError(
                    "the int8/int4 serving path is single-chip (quantized "
                    "params carry no TP axis metadata); use bf16 + tensor "
                    "parallelism on meshes"
                )
            self.model = MmE5Embedder(self.model_config, dtype=dtype)
            self.image_size = self.model_config.vision.image_size
            self.max_tiles = self.model_config.vision.max_tiles
            self.text_len = min(TEXT_MAX_LEN, self.model_config.text.max_len)
            tokens = np.zeros((1, self.text_len), np.int32)
            mask = np.ones((1, self.text_len), np.int32)
            example = (
                jnp.asarray(tokens),
                jnp.asarray(mask),
                jnp.zeros(
                    (1, self.max_tiles, self.image_size, self.image_size, 3),
                    jnp.float32,
                ),
                jnp.ones((1,), jnp.int32),
                jnp.ones((1, self.max_tiles), jnp.int32),
            )
            self._init_args = example
        else:
            self.model_config = model_config or DualEncoderConfig.base()
            self.model = DualEncoder(self.model_config, dtype=dtype)
            self.image_size = self.model_config.vision.image_size
            self.text_len = self.model_config.text.max_len
            example = (
                jnp.zeros((1, self.image_size, self.image_size, 3), jnp.float32),
                jnp.zeros((1, self.model_config.text.max_len), jnp.int32),
                jnp.ones((1, self.model_config.text.max_len), jnp.int32),
            )
            self._init_args = example

        quantized = config.family == "mme5" and self.model_config.quantize
        if quantized and not config.weights_path:
            # build the int8 tree directly (synthetic_int8_init): the f32
            # twin of the 11B config is a ~44GB host tree and closing it
            # over a jitted program is the documented remote-compiler
            # killer — only a real checkpoint load needs the twin
            from multimodal_embeddings_tpu.models.quantized import (
                synthetic_int8_init,
            )

            variables = synthetic_int8_init(self.model, self._init_args, seed=seed)
            logger.warning(
                "embedder (%s, %s) running with synthetic quantized "
                "weights (no checkpoint configured)",
                config.family,
                self.model_config.quantize
                if isinstance(self.model_config.quantize, str)
                else "int8",
            )
            self.variables = psharding.unbox(variables)
            self._image_fn = None
            self._text_fn = None
            return
        if quantized:
            # load the f32 twin, then convert: Int8DenseGeneral params
            # initialize to zeros — real values only exist post-conversion
            import dataclasses as _dc

            from multimodal_embeddings_tpu.models.quantized import (
                quantize_dense_tree,
            )

            twin = MmE5Embedder(
                _dc.replace(self.model_config, quantize=False), dtype=dtype
            )
            variables = deterministic_init_multi(twin, self._init_args, seed=seed)
        else:
            variables = deterministic_init_multi(
                self.model, self._init_args, seed=seed
            )
        if config.weights_path:
            variables = load_checkpoint(config.weights_path, variables)
            logger.info("loaded embedder weights from %s", config.weights_path)
        else:
            logger.warning(
                "embedder (%s) running with deterministic random weights",
                config.family,
            )
        if quantized:
            rng = jax.random.key(0)
            target = jax.eval_shape(
                lambda: self.model.init({"params": rng}, *self._init_args)
            )
            variables = {
                "params": quantize_dense_tree(
                    psharding.unbox(variables)["params"], target["params"]
                )
            }
        if mesh is not None:
            self.variables = psharding.shard_variables(variables, mesh)
        else:
            self.variables = psharding.unbox(variables)
        self._image_fn = None
        self._text_fn = None

    # -- jitted paths -------------------------------------------------------

    def _build_image_fn(self):
        if self.config.family == "mme5":
            prompt_ids, prompt_mask = self.tokenizer.encode_batch(
                [self.config.prompt], self.text_len, add_image_token=False
            )
            prompt_ids = jnp.asarray(prompt_ids)
            prompt_mask = jnp.asarray(prompt_mask)
            model = self.model

            @jax.jit
            def image_fn(variables, images, aspect_ratio_ids, tile_mask):
                b = images.shape[0]
                ids = jnp.broadcast_to(prompt_ids, (b, prompt_ids.shape[1]))
                mask = jnp.broadcast_to(prompt_mask, (b, prompt_mask.shape[1]))
                return model.apply(
                    variables, ids, mask, images, aspect_ratio_ids, tile_mask
                )

        else:
            model = self.model

            @jax.jit
            def image_fn(variables, images):
                return model.apply(variables, images, method=model.encode_image)

        return image_fn

    def _build_text_fn(self):
        model = self.model
        if self.config.family == "mme5":

            @jax.jit
            def text_fn(variables, ids, mask):
                return model.apply(variables, ids, mask, None)

        else:

            @jax.jit
            def text_fn(variables, ids, mask):
                return model.apply(variables, ids, mask, method=model.encode_text)

        return text_fn

    # -- preprocessing ------------------------------------------------------

    def _decode(self, image: Union[str, np.ndarray]):
        if isinstance(image, str):
            img = Image.open(image).convert("RGB")
        else:
            img = Image.fromarray(np.asarray(image).astype(np.uint8))
        return resize_image_if_needed(img, self.config.max_image_dim)

    def _load_and_preprocess(self, image: Union[str, np.ndarray]) -> Optional[np.ndarray]:
        """Decode, cap at max dim (LANCZOS, ``embedder.py:110-114``), resize
        to the encoder input, scale to [0, 1]."""
        try:
            img = self._decode(image)
            img = img.resize((self.image_size, self.image_size), Image.BILINEAR)
            return np.asarray(img, np.float32) / 255.0
        except Exception as exc:  # noqa: BLE001 — per-image failure → None slot
            logger.error("failed to preprocess %s: %s", image, exc)
            return None

    def _load_and_tile(self, image: Union[str, np.ndarray]):
        """mme5 family: decode and run the Mllama tiling processor (pages
        larger than one 560px tile split onto the optimal tiled canvas,
        ``embedder.py:110-121`` + the HF Mllama image processor)."""
        from multimodal_embeddings_tpu.models.mllama_processor import (
            preprocess_image,
        )

        try:
            img = self._decode(image)
            return preprocess_image(
                np.asarray(img),
                max_tiles=self.max_tiles,
                tile_size=self.image_size,
            )
        except Exception as exc:  # noqa: BLE001 — per-image failure → None slot
            logger.error("failed to preprocess %s: %s", image, exc)
            return None

    def _shard_batch(self, array: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None:
            return array
        return jax.device_put(array, psharding.batch_spec(self.mesh, array.ndim))

    # -- public API (reference contract) ------------------------------------

    def get_image_embeddings(
        self,
        images: Sequence[Union[str, np.ndarray]],
        is_query: bool = False,
        batch_size: Optional[int] = None,
    ) -> List[Optional[List[float]]]:
        """Embed images (paths or arrays). Returns one L2-normalized vector
        per input, None where decoding failed (``embedder.py:141-226``)."""
        if self._image_fn is None:
            self._image_fn = self._build_image_fn()
        batch_size = batch_size or self.config.batch_size
        if self.mesh is not None:
            # padded batches must divide evenly over the data axis
            data_size = self.mesh.shape[DATA_AXIS]
            batch_size = ((batch_size + data_size - 1) // data_size) * data_size

        results: List[Optional[List[float]]] = [None] * len(images)
        if self.config.family == "mme5":
            pending_t: List[tuple[int, object]] = []
            for i, image in enumerate(images):
                tiled = self._load_and_tile(image)
                if tiled is not None:
                    pending_t.append((i, tiled))
            for start in range(0, len(pending_t), batch_size):
                chunk = pending_t[start : start + batch_size]
                batch = np.zeros(
                    (batch_size, self.max_tiles, self.image_size, self.image_size, 3),
                    np.float32,
                )
                ar_ids = np.ones((batch_size,), np.int32)
                tmask = np.zeros((batch_size, self.max_tiles), np.int32)
                for j, (_, tiled) in enumerate(chunk):
                    batch[j] = tiled.tiles
                    ar_ids[j] = tiled.aspect_ratio_id
                    tmask[j] = tiled.tile_mask
                emb = np.asarray(
                    self._image_fn(
                        self.variables,
                        self._shard_batch(jnp.asarray(batch)),
                        jnp.asarray(ar_ids),
                        jnp.asarray(tmask),
                    )
                )
                for j, (idx, _) in enumerate(chunk):
                    results[idx] = emb[j].astype(np.float64).tolist()
            return results

        pending: List[tuple[int, np.ndarray]] = []
        for i, image in enumerate(images):
            arr = self._load_and_preprocess(image)
            if arr is not None:
                pending.append((i, arr))

        for start in range(0, len(pending), batch_size):
            chunk = pending[start : start + batch_size]
            batch = np.zeros(
                (batch_size, self.image_size, self.image_size, 3), np.float32
            )
            for j, (_, arr) in enumerate(chunk):
                batch[j] = arr
            emb = np.asarray(
                self._image_fn(self.variables, self._shard_batch(jnp.asarray(batch)))
            )
            for j, (idx, _) in enumerate(chunk):
                results[idx] = emb[j].astype(np.float64).tolist()
        return results

    def get_text_embeddings(self, text: Union[str, Sequence[str]]) -> List:
        """Embed text (``embedder.py:228-254``). A single string returns one
        vector; a sequence returns one per entry."""
        if self._text_fn is None:
            self._text_fn = self._build_text_fn()
        single = isinstance(text, str)
        texts = [text] if single else list(text)
        ids, mask = self.tokenizer.encode_batch(texts, self.text_len)
        emb = np.asarray(
            self._text_fn(self.variables, jnp.asarray(ids), jnp.asarray(mask))
        )
        out = [e.astype(np.float64).tolist() for e in emb]
        return out[0] if single else out


def deterministic_init_multi(model, example_args, seed: int = 0):
    from multimodal_embeddings_tpu.models.weights import init_on_host

    rng = jax.random.PRNGKey(seed)
    return init_on_host(lambda: model.init({"params": rng}, *example_args))
