"""Golden-activation harness tests (analysis/activations.py + parity CLI).

The harness is the zero-egress mitigation for BASELINE.json's
real-checkpoint acceptance gates: deterministic probe -> per-layer
statistics, compared layer-by-layer so a port-map error is pinpointed to
the module that introduced it (VERDICT r3 "missing" item 1).
"""

import json

import jax
import numpy as np
import pytest

from multimodal_embeddings_tpu.analysis import activations as acts
from multimodal_embeddings_tpu.config import DetectorConfig, EmbedderConfig
from multimodal_embeddings_tpu.models.detector import LayoutDetector
from multimodal_embeddings_tpu.models.embedder import MultimodalEmbedder
from multimodal_embeddings_tpu.models.mme5 import MllamaConfig


@pytest.fixture(scope="module")
def tiny_detector():
    return LayoutDetector(
        DetectorConfig(variant="n", image_size=64, grid_configs=())
    )


@pytest.fixture(scope="module")
def tiny_mme5():
    return MultimodalEmbedder(
        EmbedderConfig(family="mme5", dtype="float32"),
        model_config=MllamaConfig.tiny(),
    )


def test_probe_determinism():
    a = acts.detector_probe(32, seed=3)
    b = acts.detector_probe(32, seed=3)
    np.testing.assert_array_equal(a, b)
    t1 = acts.mme5_probe(28, 16, 256, seed=1)
    t2 = acts.mme5_probe(28, 16, 256, seed=1)
    for x, y in zip(t1, t2):
        np.testing.assert_array_equal(x, y)
    # tokens must stay valid for both reduced and real vocabularies
    assert t1[0].max() < 256 and t1[0].min() >= 1


def test_detector_trace_self_compare(tiny_detector):
    trace = acts.detector_trace(tiny_detector, seed=0)
    assert len(trace["layers"]) > 10
    assert trace["output"]["shape"][0] == 1
    report = acts.compare_traces(trace, trace)
    assert report["ok"] and report["first_divergent"] is None
    assert report.get("output_ok") is True


def test_detector_trace_flags_perturbed_layer(tiny_detector):
    golden = acts.detector_trace(tiny_detector, seed=0)
    # corrupt ONE backbone kernel: compare must fail and name a layer
    # (a backbone perturbation propagates; a head 1x1 barely moves means)
    flat = jax.tree_util.tree_flatten_with_path(tiny_detector.variables)[0]
    kernels = [
        p
        for p, v in flat
        if v.ndim == 4 and "backbone" in jax.tree_util.keystr(p)
    ]
    target = kernels[len(kernels) // 2]

    def bump(path, leaf):
        return leaf + 0.5 if path == target else leaf

    perturbed = jax.tree_util.tree_map_with_path(bump, tiny_detector.variables)
    original = tiny_detector.variables
    tiny_detector.variables = perturbed
    try:
        candidate = acts.detector_trace(tiny_detector, seed=0)
    finally:
        tiny_detector.variables = original
    report = acts.compare_traces(golden, candidate)
    assert not report["ok"]
    assert report["first_divergent"] is not None
    # layers BEFORE the perturbed kernel still agree
    assert report["layers_ok"] > 0


def test_mme5_trace_self_compare(tiny_mme5):
    trace = acts.mme5_trace(tiny_mme5, seed=0)
    assert len(trace["layers"]) > 10
    names = " ".join(trace["layers"])
    assert "vision_model" in names and "text_model" in names
    report = acts.compare_traces(trace, trace)
    assert report["ok"]


def test_qwen_trace_self_compare_and_perturbation():
    """The parse-surface family: a tiny QwenVL prefill trace is
    self-consistent, and a corrupted vision kernel is pinpointed."""
    import flax.linen as fnn
    import jax.numpy as jnp

    from multimodal_embeddings_tpu.models.qwen_vl import (
        QwenVLConfig,
        QwenVLModel,
    )

    model = QwenVLModel(QwenVLConfig.tiny())
    ids = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, 56, 56, 3), jnp.float32)
    variables = fnn.unbox(model.init(jax.random.PRNGKey(0), ids, imgs))
    trace = acts.qwen_trace(model, variables, image_size=56, seed=0)
    assert len(trace["layers"]) > 10
    names = " ".join(trace["layers"])
    assert "vision" in names and "layer0" in names
    report = acts.compare_traces(trace, trace)
    assert report["ok"] and report.get("output_ok") is True

    def bump(path, leaf):
        key = jax.tree_util.keystr(path)
        return leaf + 0.5 if "vision" in key and "qkv_0" in key else leaf

    perturbed = jax.tree_util.tree_map_with_path(bump, variables)
    candidate = acts.qwen_trace(model, perturbed, image_size=56, seed=0)
    report = acts.compare_traces(trace, candidate)
    assert not report["ok"]
    assert report["first_divergent"]
    # the corrupted vision block is among the flagged layers (everything
    # downstream of it diverges too — the dump is sorted by path, so
    # first_divergent narrows to execution order only within a subtree)
    divergent = [r["layer"] for r in report["results"] if not r["ok"]]
    assert any("vision" in name for name in divergent)


def test_parity_cli_qwen_dump(tmp_path):
    from multimodal_embeddings_tpu.cli import parity as parity_cli

    out = tmp_path / "qwen.json"
    rc = parity_cli.main(
        ["acts-dump", "--family", "qwen", "--size", "tiny", "--out", str(out)]
    )
    assert rc == 0
    data = json.loads(out.read_text())
    assert len(data["layers"]) > 10
    assert parity_cli.main(["acts-compare", str(out), str(out)]) == 0


def test_name_map_and_unmatched():
    ref = {
        "layers": {
            "torch.block0": {
                "shape": [1, 4],
                "mean": 0.0,
                "std": 1.0,
                "min": -1.0,
                "max": 1.0,
                "absmean": 0.8,
                "head": [0.1],
            },
            "torch.block_unmatched": {
                "shape": [1],
                "mean": 0.0,
                "std": 0.0,
                "min": 0.0,
                "max": 0.0,
                "absmean": 0.0,
                "head": [0.0],
            },
        }
    }
    cand = {"layers": {"jax/block0": ref["layers"]["torch.block0"]}}
    report = acts.compare_traces(
        ref, cand, name_map={"torch.block0": "jax/block0"}
    )
    assert report["layers_ok"] == 1
    assert report["unmatched_reference_layers"] == ["torch.block_unmatched"]


def test_parity_cli_roundtrip(tmp_path, monkeypatch):
    from multimodal_embeddings_tpu.cli import parity as parity_cli

    out = tmp_path / "dump.json"
    rc = parity_cli.main(
        [
            "acts-dump",
            "--family",
            "detector",
            "--variant",
            "n",
            "--imgsz",
            "64",
            "--out",
            str(out),
        ]
    )
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["layers"]
    rc = parity_cli.main(["acts-compare", str(out), str(out)])
    assert rc == 0
    # a bad candidate exits nonzero
    bad = tmp_path / "bad.json"
    mutated = json.loads(out.read_text())
    first = next(iter(mutated["layers"]))
    mutated["layers"][first]["mean"] += 100.0
    bad.write_text(json.dumps(mutated))
    assert parity_cli.main(["acts-compare", str(bad), str(out)]) == 1
