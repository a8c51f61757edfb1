"""Llama-3 byte-level BPE algorithm tests (synthetic vocab — the real
vocab file is environment-blocked, the algorithm is not).

Reference contract: the mmE5 embedder tokenizes via AutoProcessor with
the Llama-3 tokenizer (deprecated_package/embedder.py:117-121)."""

import base64

import numpy as np
import pytest

from multimodal_embeddings_tpu.models.bpe import (
    LLAMA3_PATTERN,
    LLAMA3_SPECIAL_TOKENS,
    ByteLevelBPE,
    byte_pair_merge,
    bytes_to_unicode,
    load_tiktoken_model,
    load_tokenizer_json,
    mllama_prompt_ids,
    synthetic_ranks,
    unicode_to_bytes,
)
from multimodal_embeddings_tpu.models.tokenizer import HFTokenizer


class TestMergeAlgorithm:
    def test_lowest_rank_merges_first(self):
        # ranks: "ab"=256 (best), "bc"=257, "abc"=258
        ranks = {bytes([b]): b for b in range(256)}
        ranks[b"ab"] = 256
        ranks[b"bc"] = 257
        ranks[b"abc"] = 258
        parts = byte_pair_merge(b"abc", ranks)
        # "ab" merges before "bc" (lower rank), then "ab"+"c" = "abc"
        assert parts == [b"abc"]

        # remove "abc": greedy stops at ["ab", "c"], NOT ["a", "bc"]
        del ranks[b"abc"]
        assert byte_pair_merge(b"abc", ranks) == [b"ab", b"c"]

        # flip rank order: "bc" lower than "ab" → ["a", "bc"]
        ranks[b"ab"], ranks[b"bc"] = 257, 256
        assert byte_pair_merge(b"abc", ranks) == [b"a", b"bc"]

    def test_merge_order_not_left_to_right(self):
        # "xy"=300, "yz"=256: despite "xy" being leftmost, "yz" merges first;
        # then "x"+"yz" has no rank → ["x", "yz"]
        ranks = {bytes([b]): b for b in range(256)}
        ranks[b"xy"] = 300
        ranks[b"yz"] = 256
        assert byte_pair_merge(b"xyz", ranks) == [b"x", b"yz"]
        # add "xyz": after "yz" merges, "x"+"yz"="xyz" completes
        ranks[b"xyz"] = 301
        assert byte_pair_merge(b"xyz", ranks) == [b"xyz"]


class TestPreTokenizer:
    @pytest.fixture(scope="class")
    def bpe(self):
        return ByteLevelBPE(synthetic_ranks(["the", "ing"]), LLAMA3_SPECIAL_TOKENS)

    def test_pattern_splits(self, bpe):
        import regex

        pat = regex.compile(LLAMA3_PATTERN)
        # contractions split off; ≤3-digit runs; space+punct; word boundaries
        assert [m.group() for m in pat.finditer("I'll go")] == ["I", "'ll", " go"]
        assert [m.group() for m in pat.finditer("12345")] == ["123", "45"]
        assert [m.group() for m in pat.finditer("hello, world!")] == [
            "hello", ",", " world", "!",
        ]
        assert [m.group() for m in pat.finditer("a  b")] == ["a", " ", " b"]

    def test_round_trip(self, bpe):
        for text in (
            "The quick brown fox! 123 jumping...",
            "  leading spaces\nand newlines\r\n",
            "unicode: café — naïve 中文",
            "I'll don't we've 'd",
        ):
            assert bpe.decode(bpe.encode(text)) == text

    def test_pretoken_boundaries_respected(self, bpe):
        # "the" merges inside one pre-token, but never across the space
        ids = bpe.encode_ordinary("the the")
        the_id = bpe.ranks[b"the"]
        assert ids[0] == the_id
        # second "the" is " the" — no " the" merge in this synthetic vocab,
        # so it stays as space + "the"-or-parts but never crosses tokens
        assert bpe.decode(ids) == "the the"


class TestSpecialTokens:
    @pytest.fixture(scope="class")
    def bpe(self):
        return ByteLevelBPE(synthetic_ranks(), LLAMA3_SPECIAL_TOKENS)

    def test_parse_special(self, bpe):
        ids = bpe.encode("<|begin_of_text|>hi<|end_of_text|>")
        assert ids[0] == 128000
        assert ids[-1] == 128001
        assert bpe.decode(ids) == "<|begin_of_text|>hi<|end_of_text|>"

    def test_parse_special_off(self, bpe):
        ids = bpe.encode("<|image|>", parse_special=False)
        assert 128256 not in ids

    def test_mllama_prompt(self, bpe):
        ids = mllama_prompt_ids(bpe)
        # "<|image|><|begin_of_text|> Represent the given image."
        assert ids[0] == 128256 and ids[1] == 128000
        assert bpe.decode(ids) == (
            "<|image|><|begin_of_text|> Represent the given image."
        )


class TestFileLoaders:
    def test_tiktoken_round_trip(self, tmp_path):
        ranks = synthetic_ranks(["hello"])
        path = tmp_path / "tokenizer.model"
        with open(path, "wb") as fh:
            for token, rank in ranks.items():
                fh.write(base64.b64encode(token) + b" " + str(rank).encode() + b"\n")
        assert load_tiktoken_model(str(path)) == ranks

    def test_tokenizer_json_round_trip(self, tmp_path):
        import json

        ranks = synthetic_ranks(["doc"])
        b2u = bytes_to_unicode()
        vocab = {"".join(b2u[b] for b in tok): rank for tok, rank in ranks.items()}
        data = {
            "model": {"vocab": vocab, "merges": []},
            "added_tokens": [{"content": "<|image|>", "id": 128256},
                             {"content": "<|begin_of_text|>", "id": 128000}],
        }
        path = tmp_path / "tokenizer.json"
        path.write_text(json.dumps(data))
        got_ranks, got_special = load_tokenizer_json(str(path))
        assert got_ranks == ranks
        assert got_special == {"<|image|>": 128256, "<|begin_of_text|>": 128000}

    def test_unicode_map_bijective(self):
        b2u = bytes_to_unicode()
        assert len(b2u) == 256
        assert len(set(b2u.values())) == 256
        assert unicode_to_bytes()[b2u[65]] == 65


class TestHFTokenizerBPE:
    def test_encode_batch_from_tiktoken_file(self, tmp_path):
        ranks = synthetic_ranks(["Represent"])
        path = tmp_path / "tokenizer.model"
        with open(path, "wb") as fh:
            for token, rank in ranks.items():
                fh.write(base64.b64encode(token) + b" " + str(rank).encode() + b"\n")
        tok = HFTokenizer(str(tmp_path))
        ids, mask = tok.encode_batch(["Represent the given image."], 32,
                                     add_image_token=True)
        assert ids.shape == (1, 32) and mask.shape == (1, 32)
        # AutoTokenizer behavior: BOS first, then the image token
        assert ids[0, 0] == 128000 and ids[0, 1] == 128256
        n = int(mask.sum())
        assert n > 4
        # padding uses the Llama-3 right-pad id
        assert np.all(ids[0, n:] == 128004)
        decoded = tok.bpe.decode([int(x) for x in ids[0, 2:n]])
        assert decoded == "Represent the given image."

    def test_vocab_missing_bytes_raises(self):
        with pytest.raises(ValueError):
            ByteLevelBPE({b"a": 0}, {})
