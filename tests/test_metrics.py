"""Tests for the eval metrics: DTW, MCD, cosine mel distance, SSIM, plots."""

import numpy as np
import pytest

from waveglow_tpu.eval.metrics import (align_mels_with_dtw, cosine_dist_mels,
                                       dtw, get_metrics_mels, make_same_dim,
                                       mel_to_mfccs, structural_similarity,
                                       calculate_structural_similarity_np)


class TestDTW:

  def test_identical_sequences_zero_cost_diagonal(self):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((20, 4))
    cost, path = dtw(a, a)
    assert cost == pytest.approx(0.0, abs=1e-6)
    assert path == [(i, i) for i in range(20)]

  def test_shifted_sequence_alignment(self):
    """A time-warped copy aligns with near-zero cost."""
    t = np.linspace(0, 4 * np.pi, 50)
    a = np.stack([np.sin(t), np.cos(t)], axis=1)
    # b doubles every frame (2x slower)
    b = np.repeat(a, 2, axis=0)
    cost, path = dtw(a, b)
    assert cost == pytest.approx(0.0, abs=1e-6)
    assert len(path) >= 100 - 1

  def test_align_mels_shapes(self):
    rng = np.random.default_rng(1)
    m1 = rng.standard_normal((8, 30))
    m2 = rng.standard_normal((8, 40))
    a1, a2, dist, p1, p2 = align_mels_with_dtw(m1, m2)
    assert a1.shape == a2.shape
    assert a1.shape[0] == 8
    assert a1.shape[1] == len(p1) == len(p2)
    assert dist > 0


class TestMCD:

  def test_identical_mels_zero_mcd(self):
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((80, 50))
    mcd, penalty, frames = get_metrics_mels(mel, mel, use_dtw=True)
    assert mcd == pytest.approx(0.0, abs=1e-6)
    assert penalty == pytest.approx(0.0)
    assert frames == 50

  def test_mfcc_extraction_excludes_c0(self):
    mel = np.ones((80, 10))  # constant -> all energy in c0
    mfccs = mel_to_mfccs(mel)
    assert mfccs.shape == (16, 10)
    np.testing.assert_allclose(mfccs, 0.0, atol=1e-9)

  def test_mcd_positive_and_scale(self):
    rng = np.random.default_rng(3)
    m1 = rng.standard_normal((80, 30))
    m2 = m1 + 0.1 * rng.standard_normal((80, 30))
    mcd, _, _ = get_metrics_mels(m1, m2, use_dtw=False)
    assert mcd > 0
    # doubling the perturbation roughly doubles MCD
    m3 = m1 + 2 * (m2 - m1)
    mcd2, _, _ = get_metrics_mels(m1, m3, use_dtw=False)
    assert mcd2 == pytest.approx(2 * mcd, rel=1e-6)

  def test_nodtw_pads_shorter(self):
    rng = np.random.default_rng(4)
    m1 = rng.standard_normal((80, 20))
    m2 = rng.standard_normal((80, 25))
    _, penalty, frames = get_metrics_mels(m1, m2, use_dtw=False)
    assert frames == 25
    assert penalty == pytest.approx(1 - 45 / 50)


class TestCosine:

  def test_identical_is_one(self):
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((80, 40))
    assert cosine_dist_mels(mel, mel) == pytest.approx(1.0, abs=1e-9)

  def test_orthogonal_is_zero(self):
    a = np.zeros((2, 4))
    b = np.zeros((2, 4))
    a[:, 0] = 1.0
    b[:, 1] = 1.0
    assert cosine_dist_mels(a, b) == pytest.approx(0.0, abs=1e-9)

  def test_make_same_dim_pads(self):
    a, b = make_same_dim(np.ones((3, 5)), np.ones((3, 8)))
    assert a.shape == b.shape == (3, 8)
    assert np.all(a[:, 5:] == 0)


class TestSSIM:

  def test_identical_images(self):
    rng = np.random.default_rng(6)
    img = (rng.uniform(0, 255, (40, 60))).astype(np.float64)
    assert structural_similarity(img, img) == pytest.approx(1.0, abs=1e-9)

  def test_noise_reduces_ssim(self):
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (40, 60))
    noisy = np.clip(img + rng.normal(0, 50, img.shape), 0, 255)
    s = structural_similarity(img, noisy)
    assert 0 < s < 0.9

  def test_rgb_wrapper(self):
    rng = np.random.default_rng(8)
    img = (rng.uniform(0, 255, (30, 30, 3))).astype(np.uint8)
    score, diff = calculate_structural_similarity_np(img, img)
    assert score == pytest.approx(1.0, abs=1e-9)
    assert diff.shape == img.shape
    assert np.all(diff == 0)


class TestPlots:

  def test_plot_melspec_renders(self):
    from waveglow_tpu.eval.plots import plot_melspec_np, stack_images_vertically
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((80, 100))
    core, labeled = plot_melspec_np(mel)
    assert core.ndim == 3 and core.shape[2] == 3
    assert labeled.shape[1] >= core.shape[1]
    stacked = stack_images_vertically([core, labeled])
    assert stacked.shape[0] == core.shape[0] + labeled.shape[0]


class TestIndependentCrossChecks:
  """The reference delegates MCD/DTW to the mel_cepstral_distance and
  fastdtw packages (reference validation.py:211-232), which are not
  installable in this zero-egress environment (docs/PARITY.md records the
  attempt). These tests cross-validate the from-definition implementation
  against INDEPENDENT computations instead of recorded package outputs."""

  def test_mfcc_dct_convention_vs_direct_cosine_sum(self):
    """mel_to_mfccs must equal the literature's DCT-II written out by hand:
    scipy dct(type=2, norm=None) -> y[k] = 2 * sum_n x[n] cos(pi k (2n+1) / (2N)).
    A silent normalization change (e.g. norm='ortho') would rescale every
    MCD this framework reports."""
    from waveglow_tpu.eval.metrics import mel_to_mfccs
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((80, 7))
    n = mel.shape[0]
    k = np.arange(n)[:, None]          # output index
    nn = np.arange(n)[None, :]         # input index
    basis = 2.0 * np.cos(np.pi * k * (2 * nn + 1) / (2 * n))
    direct = basis @ mel
    mine = mel_to_mfccs(mel, n_coeffs=16)
    np.testing.assert_allclose(mine, direct[1:17], rtol=1e-10)

  def test_mcd_formula_hand_computed(self):
    """MCD == 10*sqrt(2)/ln(10) * mean_t ||mfcc1_t - mfcc2_t||_2, computed
    end-to-end by hand for a no-DTW equal-length pair."""
    from waveglow_tpu.eval.metrics import get_metrics_mels, mel_to_mfccs
    rng = np.random.default_rng(1)
    mel_1 = rng.standard_normal((80, 5))
    mel_2 = rng.standard_normal((80, 5))
    mcd, penalty, frames = get_metrics_mels(mel_1, mel_2, use_dtw=False)
    m1, m2 = mel_to_mfccs(mel_1), mel_to_mfccs(mel_2)
    expected = (10.0 * np.sqrt(2.0) / np.log(10.0)) * np.mean(
        np.sqrt(((m1 - m2) ** 2).sum(axis=0)))
    assert mcd == pytest.approx(expected, rel=1e-12)
    assert penalty == 0.0 and frames == 5

  def test_exact_dtw_is_optimal_lower_bound(self):
    """Exact DP DTW must never exceed the cost of ANY valid warping path —
    including greedy/approximate ones like fastdtw's (which upper-bound the
    optimum). Checked against 200 random monotone paths per case."""
    from waveglow_tpu.eval.metrics import dtw
    rng = np.random.default_rng(2)
    for _ in range(3):
      a = rng.standard_normal((12, 4))
      b = rng.standard_normal((15, 4))
      cost, path = dtw(a, b)
      # path validity: monotone, connected, endpoints
      assert path[0] == (0, 0) and path[-1] == (11, 14)
      for (i0, j0), (i1, j1) in zip(path, path[1:]):
        assert (i1 - i0, j1 - j0) in ((0, 1), (1, 0), (1, 1))
      # path cost consistency
      path_cost = sum(float(np.linalg.norm(a[i] - b[j])) for i, j in path)
      assert cost == pytest.approx(path_cost, rel=1e-9)
      # optimality vs random valid paths
      for _ in range(200):
        i, j, rand_cost = 0, 0, float(np.linalg.norm(a[0] - b[0]))
        while (i, j) != (11, 14):
          moves = [(di, dj) for di, dj in ((0, 1), (1, 0), (1, 1))
                   if i + di <= 11 and j + dj <= 14]
          di, dj = moves[rng.integers(len(moves))]
          i, j = i + di, j + dj
          rand_cost += float(np.linalg.norm(a[i] - b[j]))
        assert cost <= rand_cost + 1e-9

  def test_ssim_matches_wang_definition_on_constant_shift(self):
    """Closed-form check: for images x and x+d (constant offset, zero
    variance everywhere), SSIM = (2*mu1*mu2+c1)/(mu1^2+mu2^2+c1)."""
    from waveglow_tpu.eval.metrics import structural_similarity
    x = np.full((32, 32), 100.0)
    y = np.full((32, 32), 120.0)
    c1 = (0.01 * 255.0) ** 2
    expected = (2 * 100.0 * 120.0 + c1) / (100.0 ** 2 + 120.0 ** 2 + c1)
    got = structural_similarity(x, y)
    assert got == pytest.approx(expected, rel=1e-9)


class TestFileBasedSSIM:

  def test_calculate_structural_similarity_on_png_files(self, tmp_path):
    """The path-based variant (mirror of reference image_utils.py:10-17,
    which reads image FILES via imageio): same score as the array variant
    on the same images, self-similarity == 1."""
    import numpy as np

    from waveglow_tpu.eval.metrics import (
        calculate_structural_similarity, calculate_structural_similarity_np)
    from waveglow_tpu.eval.plots import plot_melspec_np, save_image

    rng = np.random.default_rng(0)
    _, img_a = plot_melspec_np(rng.standard_normal((80, 20)))
    _, img_b = plot_melspec_np(rng.standard_normal((80, 20)))
    pa, pb = tmp_path / "a.png", tmp_path / "b.png"
    save_image(pa, img_a)
    save_image(pb, img_b)

    score_self, _ = calculate_structural_similarity(pa, pa)
    assert score_self == pytest.approx(1.0, abs=1e-6)
    score_files, diff = calculate_structural_similarity(pa, pb)
    assert 0.0 < score_files < 1.0
    assert diff.shape[:2] == img_a.shape[:2]
