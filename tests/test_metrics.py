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
