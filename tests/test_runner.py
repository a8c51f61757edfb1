"""Content-hash pipeline runner tests."""

import os
import time

from multimodal_embeddings_tpu.pipeline.runner import (
    PipelineRunner,
    Stage,
    fingerprint,
    folder_fingerprint,
)


def make_stage(name, workdir, calls, inputs, config=None):
    out_dir = os.path.join(workdir, f"out_{name}")

    def run():
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "result.txt"), "w") as f:
            f.write(f"{name} ran {len(calls)}")
        calls.append(name)

    return Stage(
        name, run, inputs=inputs, outputs=[out_dir], config=config or {}
    )


class TestFingerprint:
    def test_folder_fingerprint_changes_on_content(self, tmp_path):
        d = tmp_path / "data"
        d.mkdir()
        (d / "a.txt").write_text("one")
        fp1 = folder_fingerprint(str(d))
        time.sleep(0.01)
        (d / "a.txt").write_text("two!")
        fp2 = folder_fingerprint(str(d))
        assert fp1 != fp2

    def test_config_changes_fingerprint(self, tmp_path):
        d = str(tmp_path)
        assert fingerprint([d], {"x": 1}) != fingerprint([d], {"x": 2})
        assert fingerprint([d], {"x": 1}) == fingerprint([d], {"x": 1})


class TestRunner:
    def test_skip_on_second_run(self, tmp_path):
        workdir = str(tmp_path)
        in_dir = os.path.join(workdir, "inputs")
        os.makedirs(in_dir)
        with open(os.path.join(in_dir, "page.txt"), "w") as f:
            f.write("data")

        calls = []
        cache = os.path.join(workdir, "cache.json")
        stages = [make_stage("s1", workdir, calls, [in_dir])]
        runner = PipelineRunner(cache_path=cache)
        assert runner.run(stages) == {"s1": "ran"}
        runner2 = PipelineRunner(cache_path=cache)
        assert runner2.run(stages) == {"s1": "skipped"}
        assert calls == ["s1"]

    def test_rerun_on_input_change(self, tmp_path):
        workdir = str(tmp_path)
        in_dir = os.path.join(workdir, "inputs")
        os.makedirs(in_dir)
        with open(os.path.join(in_dir, "page.txt"), "w") as f:
            f.write("data")
        calls = []
        cache = os.path.join(workdir, "cache.json")
        stages = [make_stage("s1", workdir, calls, [in_dir])]
        PipelineRunner(cache_path=cache).run(stages)
        time.sleep(0.01)
        with open(os.path.join(in_dir, "page.txt"), "w") as f:
            f.write("changed")
        assert PipelineRunner(cache_path=cache).run(stages) == {"s1": "ran"}
        assert calls == ["s1", "s1"]

    def test_rerun_on_config_change(self, tmp_path):
        workdir = str(tmp_path)
        in_dir = os.path.join(workdir, "inputs")
        os.makedirs(in_dir)
        calls = []
        cache = os.path.join(workdir, "cache.json")
        PipelineRunner(cache_path=cache).run(
            [make_stage("s1", workdir, calls, [in_dir], {"thr": 10})]
        )
        result = PipelineRunner(cache_path=cache).run(
            [make_stage("s1", workdir, calls, [in_dir], {"thr": 11})]
        )
        assert result == {"s1": "ran"} and len(calls) == 2

    def test_rerun_when_outputs_deleted(self, tmp_path):
        workdir = str(tmp_path)
        in_dir = os.path.join(workdir, "inputs")
        os.makedirs(in_dir)
        calls = []
        cache = os.path.join(workdir, "cache.json")
        stage = make_stage("s1", workdir, calls, [in_dir])
        PipelineRunner(cache_path=cache).run([stage])
        import shutil

        shutil.rmtree(stage.outputs[0])
        assert PipelineRunner(cache_path=cache).run([stage]) == {"s1": "ran"}

    def test_chained_stages_cascade(self, tmp_path):
        """A changed early stage re-runs, refreshing its outputs, which
        changes the downstream stage's input fingerprint → cascade."""
        workdir = str(tmp_path)
        in_dir = os.path.join(workdir, "inputs")
        os.makedirs(in_dir)
        with open(os.path.join(in_dir, "x.txt"), "w") as f:
            f.write("v1")
        calls = []
        cache = os.path.join(workdir, "cache.json")

        def stages():
            s1 = make_stage("s1", workdir, calls, [in_dir])
            s2 = make_stage("s2", workdir, calls, [s1.outputs[0]])
            return [s1, s2]

        PipelineRunner(cache_path=cache).run(stages())
        assert calls == ["s1", "s2"]
        # no change → both skip
        PipelineRunner(cache_path=cache).run(stages())
        assert calls == ["s1", "s2"]
        # change input → both run (s1 rewrites output → s2 input changed)
        time.sleep(0.01)
        with open(os.path.join(in_dir, "x.txt"), "w") as f:
            f.write("v2")
        PipelineRunner(cache_path=cache).run(stages())
        assert calls == ["s1", "s2", "s1", "s2"]
