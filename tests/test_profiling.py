"""StageTimer / tracing utility tests."""

import time

from multimodal_embeddings_tpu.utils.profiling import StageTimer, trace


class TestStageTimer:
    def test_accumulates_and_summarizes(self):
        timer = StageTimer()
        with timer.stage("detect", items=3):
            time.sleep(0.01)
        with timer.stage("embed", items=6):
            time.sleep(0.02)
        with timer.stage("detect", items=2):
            time.sleep(0.01)
        assert timer.counts["detect"] == 5
        assert timer.counts["embed"] == 6
        assert timer.totals["detect"] >= 0.02
        summary = timer.summary()
        assert "detect" in summary and "embed" in summary and "TOTAL" in summary

    def test_exception_still_recorded(self):
        timer = StageTimer()
        try:
            with timer.stage("boom"):
                raise ValueError("x")
        except ValueError:
            pass
        assert timer.counts["boom"] == 1

    def test_trace_noop(self):
        with trace(None):
            pass  # must not require jax
