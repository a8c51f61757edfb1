"""Continuous-batching serve loop: token parity with the one-shot decoders.

The contract: ``continuous_generate`` over P pages (any batch/chunk
split, any refill pattern) produces, for EVERY page, exactly the tokens
the one-shot ``build_generate_fns`` pair produces for that page alone —
EOS-padded — under the same per-page stop injection (reference stopping
contract: HF ``generate``, notebook cell ``d43bacc8``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_embeddings_tpu.models.qwen_vl import (
    QwenVLConfig,
    QwenVLModel,
    build_generate_fns,
)
from multimodal_embeddings_tpu.models.qwen_serve import continuous_generate


@pytest.fixture(scope="module")
def tiny_qwen():
    import jax

    config = QwenVLConfig.tiny()
    model = QwenVLModel(config)
    ids = jnp.ones((1, 12), jnp.int32)
    imgs = jnp.zeros((1, 56, 56, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ids, imgs)
    import flax.linen as fnn

    return model, fnn.unbox(variables)


def _make_pages(model, n, rng):
    pages = []
    for _ in range(n):
        ids = np.ones((12,), np.int32)
        ids[3:7] = model.config.image_pad_id
        img = rng.random((56, 56, 3)).astype(np.float32)
        pages.append((ids, img))
    return pages


def _single_page_reference(model, variables, pages, max_new, stops):
    """Per-page b1 one-shot decode with the same stop injection."""
    prefill, decode = build_generate_fns(
        model, 12, max_new, early_stop=False
    )
    outs = []
    for (ids, img), stop in zip(pages, stops):
        last, caches, delta = prefill(
            variables, jnp.asarray(ids[None]), jnp.asarray(img[None])
        )
        force = None if stop is None else jnp.asarray(
            np.int32([stop])
        )
        outs.append(
            np.asarray(decode(variables, last, caches, delta, force))[0]
        )
    return outs


class TestContinuousParity:
    @pytest.mark.parametrize("early_exit", [True, False])
    def test_refill_token_equal(self, tiny_qwen, early_exit):
        """7 pages through 3 rows, chunk 4: several refill generations,
        stops spanning immediate-EOS (0), mid-chunk, chunk-boundary and
        never-stop (> max_new) — both the early-exit while_loop chunk
        and the fixed scan chunk."""
        model, variables = tiny_qwen
        rng = np.random.default_rng(11)
        pages = _make_pages(model, 7, rng)
        max_new = 8
        stops = [2, 5, 8, 1, 0, 3, 99]
        got = continuous_generate(
            model, variables, pages, batch=3, max_new_tokens=max_new,
            chunk=4, stops=stops, early_exit=early_exit,
        )
        want = _single_page_reference(
            model, variables, pages,
            max_new, [min(s, max_new) if s else s for s in stops],
        )
        for i, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_array_equal(g, w, err_msg=f"page {i}")

    def test_no_injection_runs_to_max(self, tiny_qwen):
        """Without stop injection rows run the full max_new clock and
        match the plain scan decode exactly."""
        model, variables = tiny_qwen
        rng = np.random.default_rng(5)
        pages = _make_pages(model, 4, rng)
        max_new = 6
        got = continuous_generate(
            model, variables, pages, batch=2, max_new_tokens=max_new,
            chunk=3,
        )
        want = _single_page_reference(
            model, variables, pages, max_new, [None] * 4
        )
        for i, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_array_equal(g, w, err_msg=f"page {i}")

    def test_stats_and_step_savings(self, tiny_qwen):
        """The whole point: short pages retire early, so executed decode
        steps track the (chunk-rounded) per-row work, not
        pages × max_new."""
        model, variables = tiny_qwen
        rng = np.random.default_rng(3)
        pages = _make_pages(model, 6, rng)
        max_new = 16
        stats: dict = {}
        continuous_generate(
            model, variables, pages, batch=2, max_new_tokens=max_new,
            chunk=4, stops=[2, 2, 2, 2, 2, 2], stats=stats,
            early_exit=False,
        )
        # batch mode would execute ceil(6/2) waves x 16 = 48 steps;
        # continuous retires every page within its first chunk: 3
        # generations x 4-step chunks = 12.
        assert stats["decode_steps"] <= 16
        assert stats["chunks"] == stats["decode_steps"] // 4
        assert stats["wall_s"] > 0
        # the early-exit while_loop chunk returns at the finish event,
        # so it executes no more (here: strictly fewer) steps
        stats_ee: dict = {}
        continuous_generate(
            model, variables, pages, batch=2, max_new_tokens=max_new,
            chunk=4, stops=[2, 2, 2, 2, 2, 2], stats=stats_ee,
            early_exit=True,
        )
        assert stats_ee["decode_steps"] <= stats["decode_steps"]

    def test_parse_cli_continuous_matches(self, tmp_path, monkeypatch):
        """cli/parse.py --continuous emits byte-identical artifacts to
        the sequential per-page parse (per-row exit + refill changes
        scheduling only, never tokens)."""
        import os

        from PIL import Image

        from multimodal_embeddings_tpu.cli.parse import main

        monkeypatch.chdir(tmp_path)
        os.makedirs("pages")
        for i, color in enumerate(["white", "gray", "black"]):
            Image.new("RGB", (120 + 8 * i, 90), color).save(
                f"pages/doc{i}.png"
            )
        base = [
            "--input_folder", "pages", "--size", "tiny",
            "--max_new_tokens", "8",
        ]
        assert main(base + ["--output_folder", "out_seq"]) == 0
        assert main(
            base + [
                "--output_folder", "out_cont", "--continuous",
                "--batch_size", "2", "--chunk", "4",
            ]
        ) == 0
        names = sorted(os.listdir("out_seq"))
        assert sorted(os.listdir("out_cont")) == names
        for name in names:
            with open(os.path.join("out_seq", name), "rb") as f:
                seq = f.read()
            with open(os.path.join("out_cont", name), "rb") as f:
                cont = f.read()
            assert seq == cont, name

    def test_parse_continuous_dynamic_resolution_buckets(
        self, tiny_qwen, tmp_path
    ):
        """parse_continuous under dynamic resolution: pages with
        different smart-resize grids land in different buckets (their
        prompt/image shapes differ) and each bucket runs its own
        continuous loop; results come back in input order and match
        parse_batch exactly."""
        import os

        from PIL import Image

        from multimodal_embeddings_tpu.analysis.doc_parser import (
            DocumentParser,
        )
        from multimodal_embeddings_tpu.models.tokenizer import ByteTokenizer

        model, variables = tiny_qwen
        paths = []
        # two distinct aspect ratios -> two grid buckets
        for i, (w, h) in enumerate([(112, 56), (56, 112), (112, 56)]):
            p = os.path.join(tmp_path, f"p{i}.png")
            Image.new("RGB", (w, h), ["white", "gray", "black"][i]).save(p)
            paths.append(p)
        parser = DocumentParser(
            model, variables, ByteTokenizer(), dynamic_resolution=True,
            max_pixels=112 * 112,
        )
        want = parser.parse_batch(paths, max_new_tokens=6)
        got = parser.parse_continuous(
            paths, max_new_tokens=6, batch=2, chunk=3
        )
        assert got == want

    def test_text_only_pages(self, tiny_qwen):
        model, variables = tiny_qwen
        pages = [(np.full((12,), 7, np.int32), None) for _ in range(3)]
        max_new = 5
        got = continuous_generate(
            model, variables, pages, batch=2, max_new_tokens=max_new,
            chunk=2, stops=[3, 99, 1],
        )
        prefill, decode = build_generate_fns(
            model, 12, max_new, early_stop=False
        )
        for i, stop in enumerate([3, 99, 1]):
            last, caches, delta = prefill(
                variables, jnp.asarray(pages[i][0][None]), None
            )
            want = np.asarray(
                decode(
                    variables, last, caches, delta,
                    jnp.asarray(np.int32([min(stop, max_new)])),
                )
            )[0]
            np.testing.assert_array_equal(got[i], want, err_msg=f"page {i}")
