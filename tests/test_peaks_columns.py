"""Peak finding and column-center tests, with scipy as the bit-level oracle."""

import numpy as np
import pytest

from multimodal_embeddings_tpu.ops.peaks import (
    find_peaks_np,
    gaussian_window,
    peak_prominences,
    smooth_density,
)
from multimodal_embeddings_tpu.ops.columns import (
    build_density_map,
    find_column_centers,
)

scipy_signal = pytest.importorskip("scipy.signal")


def random_signal(seed, n=1200):
    rng = np.random.default_rng(seed)
    x = np.zeros(n)
    for _ in range(8):
        c = rng.uniform(0, n)
        w = rng.uniform(10, 80)
        a = rng.uniform(0.5, 3.0)
        x += a * np.exp(-0.5 * ((np.arange(n) - c) / w) ** 2)
    x += rng.normal(0, 0.02, n)
    return x


class TestGaussianWindow:
    @pytest.mark.parametrize("m,std", [(5, 0.8333), (21, 3.5), (51, 8.5)])
    def test_matches_scipy(self, m, std):
        try:
            from scipy.signal.windows import gaussian
        except ImportError:
            from scipy.signal import gaussian
        np.testing.assert_array_equal(gaussian_window(m, std), gaussian(m, std))


class TestFindPeaks:
    @pytest.mark.parametrize("seed", range(6))
    def test_matches_scipy_full_conditions(self, seed):
        x = random_signal(seed)
        height = x.max() * 0.2
        prominence = x.max() * 0.05
        distance = 37
        got, gprops = find_peaks_np(
            x, height=height, distance=distance, prominence=prominence
        )
        want, wprops = scipy_signal.find_peaks(
            x, height=height, distance=distance, prominence=prominence
        )
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(gprops["prominences"], wprops["prominences"])

    def test_plateaus(self):
        x = np.array([0, 1, 2, 2, 2, 1, 0, 3, 0, 1, 1, 0], dtype=float)
        got, _ = find_peaks_np(x)
        want, _ = scipy_signal.find_peaks(x)
        np.testing.assert_array_equal(got, want)

    def test_prominences_match_scipy(self):
        x = random_signal(42)
        peaks, _ = scipy_signal.find_peaks(x)
        got = peak_prominences(x, peaks)
        want = scipy_signal.peak_prominences(x, peaks)[0]
        np.testing.assert_array_equal(got, want)

    def test_endpoints_never_peaks(self):
        x = np.array([5.0, 1.0, 4.0])
        got, _ = find_peaks_np(x)
        assert got.size == 0


class TestColumns:
    def _ref_density(self, boxes, page_width, median_width):
        """Scalar-loop density map (5_detect_column_centers.py:118-144)."""
        resolution = max(1, int(page_width / 1000))
        num_bins = page_width // resolution + 1
        density = np.zeros(num_bins)
        for box in boxes:
            x1, y1, x2, y2 = map(int, box)
            width = x2 - x1
            if 0.33 * median_width <= width <= 2.0 * median_width:
                left_bin = max(0, x1 // resolution)
                right_bin = min(num_bins - 1, x2 // resolution)
                center_bin = (x1 + x2) // (2 * resolution)
                for bin_idx in range(left_bin, right_bin + 1):
                    dist = abs(bin_idx - center_bin) / ((right_bin - left_bin) / 2 + 1e-6)
                    weight = 1.0 - 0.5 * min(1.0, dist)
                    density[bin_idx] += weight
        return density

    def test_density_map_bitwise(self):
        rng = np.random.default_rng(5)
        page_width, median = 7934, 480.0
        n = 300
        x1 = rng.uniform(0, page_width - 600, n)
        w = rng.uniform(100, 1100, n)
        boxes = np.stack([x1, np.zeros(n), x1 + w, np.full(n, 50.0)], axis=1)
        got, res = build_density_map(boxes, page_width, median)
        want = self._ref_density(boxes, page_width, median)
        np.testing.assert_array_equal(got, want)
        assert res == 7

    def test_smooth_matches_reference_chain(self):
        x = random_signal(1, 1134)
        median, resolution = 480.0, 7
        window = max(5, int(median / (4 * resolution)))
        if window % 2 == 0:
            window += 1
        sigma = window / 6.0
        got = smooth_density(x, window, sigma)
        try:
            from scipy.signal.windows import gaussian
        except ImportError:
            from scipy.signal import gaussian
        win = gaussian(window, sigma)
        win = win / win.sum()
        want = np.convolve(x, win, mode="same")
        np.testing.assert_array_equal(got, want)

    def test_end_to_end_columns_plausible(self):
        # Synthetic 4-column page: boxes clustered at 4 x-centers.
        rng = np.random.default_rng(2)
        page_w, page_h, col_w = 4000, 3000, 800
        centers = [500, 1500, 2500, 3500]
        boxes, names, scores = [], [], []
        for c in centers:
            for _ in range(30):
                w = col_w + rng.uniform(-60, 60)
                y = rng.uniform(0, page_h - 60)
                boxes.append([c - w / 2, y, c + w / 2, y + 50])
                names.append("plain_text")
                scores.append(0.9)
        got_centers, got_widths = find_column_centers(
            boxes, names, scores, page_w, page_h, median_width=col_w
        )
        assert len(got_centers) == 4
        for got, want in zip(sorted(got_centers), centers):
            assert abs(got - want) < 60
        for w in got_widths:
            assert 0.5 * col_w <= w <= 2.5 * col_w

    def test_no_confident_boxes(self):
        centers, widths = find_column_centers(
            [[0, 0, 100, 10]], ["plain_text"], [0.1], 1000, 800, 100.0
        )
        assert centers == [] and widths == []
