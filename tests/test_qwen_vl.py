"""QwenVL document-parser tests: model forward, cached generation, HTML
utilities."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from multimodal_embeddings_tpu.analysis.doc_parser import (
    BBoxElement,
    DocumentParser,
    clean_and_format_html,
    draw_bbox,
    extract_bbox_elements,
    round_to_patch_grid,
)
from multimodal_embeddings_tpu.models.qwen_vl import (
    QwenVLConfig,
    QwenVLModel,
    greedy_generate,
)
from multimodal_embeddings_tpu.models.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def tiny_qwen():
    config = QwenVLConfig.tiny()
    model = QwenVLModel(config)
    ids = jnp.ones((1, 12), jnp.int32)
    imgs = jnp.zeros((1, 56, 56, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ids, imgs)
    import flax.linen as fnn

    return model, fnn.unbox(variables)


class TestModel:
    def test_prefill_shapes(self, tiny_qwen):
        model, variables = tiny_qwen
        ids = jnp.ones((2, 10), jnp.int32)
        imgs = jnp.zeros((2, 56, 56, 3), jnp.float32)
        logits, caches = model.apply(variables, ids, imgs)
        assert logits.shape == (2, 10, model.config.text.vocab_size)
        assert len(caches) == model.config.text.layers
        k, v = caches[0]
        assert k.shape == (2, model.config.text.max_len, 2, 16)

    def test_image_splicing_changes_logits(self, tiny_qwen):
        model, variables = tiny_qwen
        pad = model.config.image_pad_id
        ids = np.ones((1, 12), np.int32)
        ids[0, 3:7] = pad  # 4 pads = (56/28)^2 vision tokens
        img_a = jnp.zeros((1, 56, 56, 3), jnp.float32)
        img_b = jnp.ones((1, 56, 56, 3), jnp.float32)
        la, _ = model.apply(variables, jnp.asarray(ids), img_a)
        lb, _ = model.apply(variables, jnp.asarray(ids), img_b)
        assert not np.allclose(np.asarray(la), np.asarray(lb))
        # without pads the image has no entry point → logits equal
        ids_nopad = np.ones((1, 12), np.int32)
        la2, _ = model.apply(variables, jnp.asarray(ids_nopad), img_a)
        lb2, _ = model.apply(variables, jnp.asarray(ids_nopad), img_b)
        np.testing.assert_array_equal(np.asarray(la2), np.asarray(lb2))

    def test_cached_decode_matches_full_forward(self, tiny_qwen):
        """The incremental KV-cache path must produce the same logits as
        recomputing the full sequence."""
        model, variables = tiny_qwen
        rng = np.random.default_rng(0)
        prompt = rng.integers(6, 200, (1, 8)).astype(np.int32)
        next_tok = rng.integers(6, 200, (1, 1)).astype(np.int32)

        logits_p, caches = model.apply(variables, jnp.asarray(prompt), None)
        step_logits, _ = model.apply(
            variables,
            jnp.asarray(next_tok),
            caches,
            8,
            method=model.decode_step,
        )
        full = np.concatenate([prompt, next_tok], axis=1)
        logits_full, _ = model.apply(variables, jnp.asarray(full), None)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, -1]),
            np.asarray(logits_full[:, -1]),
            atol=2e-4,
        )

    def test_greedy_generate(self, tiny_qwen):
        model, variables = tiny_qwen
        prompt = np.array([[1, 10, 20, 30]], np.int32)
        out = greedy_generate(model, variables, prompt, max_new_tokens=6)
        assert out.shape == (1, 6)
        out2 = greedy_generate(model, variables, prompt, max_new_tokens=6)
        np.testing.assert_array_equal(out, out2)  # deterministic


class TestHTMLUtils:
    HTML = (
        "<html><body>"
        "<h2 data-bbox='10 20 200 60'>Headline</h2>"
        "<ol data-bbox='0 0 500 400'>"
        "<li data-bbox='10 80 490 120' style=\"color:red;font-size:12px\">item one</li>"
        "</ol>"
        "<p data-polygon='1 2 3 4 5 6 7 8' data-bbox='10 140 490 180'>Body text</p>"
        "</body></html>"
    )

    def test_extract_elements(self):
        els = extract_bbox_elements(self.HTML)
        tags = {e.tag for e in els}
        assert "ol" not in tags  # containers skipped
        assert {"h2", "li", "p"} == tags
        h2 = next(e for e in els if e.tag == "h2")
        assert h2.bbox == (10, 20, 200, 60) and h2.text == "Headline"

    def test_clean_html(self):
        cleaned = clean_and_format_html(self.HTML)
        assert "data-bbox" not in cleaned
        assert "data-polygon" not in cleaned
        assert "color:red" not in cleaned
        assert "font-size:12px" in cleaned  # non-color styles survive
        assert "Headline" in cleaned and "Body text" in cleaned

    def test_draw_bbox(self, tmp_path):
        img_path = str(tmp_path / "page.png")
        Image.new("RGB", (500, 400), "white").save(img_path)
        out_path = str(tmp_path / "boxed.png")
        img = draw_bbox(img_path, 500, 400, self.HTML, output_path=out_path)
        assert img.size == (500, 400)
        arr = np.asarray(Image.open(out_path))
        assert (arr[20, 10:200, 0] > 200).all() and (arr[20, 10:200, 1] < 100).all()

    def test_round_to_patch_grid(self):
        assert round_to_patch_grid(1000, 800) == (1008, 812)
        assert round_to_patch_grid(10, 10) == (28, 28)


class TestEndToEndParse:
    def test_document_parser(self, tiny_qwen, tmp_path):
        model, variables = tiny_qwen
        img_path = str(tmp_path / "doc.png")
        Image.new("RGB", (300, 200), "white").save(img_path)
        parser = DocumentParser(model, variables, ByteTokenizer(), image_size=56)
        html, in_h, in_w = parser.parse(img_path, max_new_tokens=8)
        assert isinstance(html, str)
        # data-bbox coordinates live in the model's actual input space
        # (fixed square resize), so the returned dims reflect image_size
        assert (in_w, in_h) == (56, 56)
