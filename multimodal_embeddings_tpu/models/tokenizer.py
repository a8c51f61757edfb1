"""Tokenization for the embedding models.

Two backends:

* ``ByteTokenizer`` — a deterministic, dependency-free byte-level tokenizer
  (UTF-8 bytes + special tokens). Default in this offline environment; fully
  reproducible and adequate for the dual encoder trained in-framework.
* ``HFTokenizer`` — wraps a local ``transformers`` tokenizer directory for
  checkpoint-parity runs (the mmE5 path needs the Llama-3 tokenizer to match
  ``AutoProcessor`` inputs, ``embedder.py:117-121``); used only when a local
  tokenizer path is supplied — nothing is downloaded.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

PAD_ID = 0
BOS_ID = 1
EOS_ID = 2
IMAGE_ID = 3
BYTE_OFFSET = 4
BYTE_VOCAB = 256 + BYTE_OFFSET


class ByteTokenizer:
    vocab_size = BYTE_VOCAB

    def encode(
        self, text: str, max_len: int, add_image_token: bool = False
    ) -> Tuple[np.ndarray, np.ndarray]:
        ids: List[int] = [BOS_ID]
        if add_image_token:
            ids.append(IMAGE_ID)
        ids.extend(BYTE_OFFSET + b for b in text.encode("utf-8"))
        ids.append(EOS_ID)
        ids = ids[:max_len]
        mask = np.zeros(max_len, np.int32)
        mask[: len(ids)] = 1
        out = np.full(max_len, PAD_ID, np.int32)
        out[: len(ids)] = ids
        return out, mask

    def encode_batch(
        self, texts: List[str], max_len: int, add_image_token: bool = False
    ) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.zeros((len(texts), max_len), np.int32)
        masks = np.zeros((len(texts), max_len), np.int32)
        for i, text in enumerate(texts):
            ids[i], masks[i] = self.encode(text, max_len, add_image_token)
        return ids, masks


class HFTokenizer:
    """Local-path transformers tokenizer adapter with the same interface."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.vocab_size = len(self.tok)

    def encode_batch(
        self, texts: List[str], max_len: int, add_image_token: bool = False
    ) -> Tuple[np.ndarray, np.ndarray]:
        if add_image_token:
            texts = ["<|image|>" + t for t in texts]
        enc = self.tok(
            texts,
            padding="max_length",
            truncation=True,
            max_length=max_len,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(np.int32)
