"""Tests for profiling utilities and warm-start merging."""

import numpy as np
import pytest

from waveglow_tpu.profiling import StepTimer, trace
from waveglow_tpu.training.loop import warm_start_params


class TestStepTimer:

  def test_throughput_math(self):
    timer = StepTimer(warmup_steps=1)
    import time
    for _ in range(4):
      with timer.step():
        time.sleep(0.01)
    assert timer.mean_duration_s >= 0.009
    report = timer.report(units_per_step=22.0, unit="audio-sec/s")
    assert report["steps_measured"] == 3
    assert report["throughput"] == pytest.approx(
        22.0 / timer.mean_duration_s, rel=1e-6)

  def test_trace_noop_without_logdir(self):
    with trace(None):
      pass  # must not require jax profiler setup

  def test_trace_writes_profile(self, tmp_path):
    import jax.numpy as jnp
    with trace(tmp_path / "prof"):
      float(jnp.ones((8, 8)).sum())
    assert any((tmp_path / "prof").rglob("*"))


class TestWarmStart:

  def test_full_match_copies_everything(self):
    target = {"a": [{"w": np.zeros(3)}], "b": np.zeros((2, 2))}
    source = {"a": [{"w": np.ones(3)}], "b": np.full((2, 2), 5.0)}
    merged = warm_start_params(target, source)
    np.testing.assert_array_equal(merged["a"][0]["w"], np.ones(3))
    np.testing.assert_array_equal(merged["b"], np.full((2, 2), 5.0))

  def test_mismatched_shapes_keep_target(self):
    target = {"w": np.zeros(3), "v": np.zeros(2)}
    source = {"w": np.ones(4), "v": np.ones(2)}
    merged = warm_start_params(target, source)
    np.testing.assert_array_equal(merged["w"], np.zeros(3))  # kept fresh
    np.testing.assert_array_equal(merged["v"], np.ones(2))

  def test_missing_subtrees_keep_target(self):
    target = {"flows": [{"w": np.zeros(2)}, {"w": np.zeros(2)}]}
    source = {"flows": [{"w": np.ones(2)}]}  # fewer flows in source
    merged = warm_start_params(target, source)
    np.testing.assert_array_equal(merged["flows"][0]["w"], np.ones(2))
    np.testing.assert_array_equal(merged["flows"][1]["w"], np.zeros(2))

  def test_warm_start_between_model_sizes(self):
    """Pretrained 2-flow model warm-starts a 3-flow model: shared flows
    copied, the extra flow keeps fresh init."""
    from waveglow_tpu.hparams import HParams
    from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params

    small = init_params(WaveGlowConfig(n_flows=2, n_channels=32, n_layers=2),
                        seed=0)
    big_cfg = WaveGlowConfig(n_flows=3, n_channels=32, n_layers=2)
    big = init_params(big_cfg, seed=1)
    merged = warm_start_params(big, small)
    np.testing.assert_array_equal(
        merged["flows"][0]["wn"]["start"]["v"],
        small["flows"][0]["wn"]["start"]["v"])
    np.testing.assert_array_equal(
        merged["flows"][2]["wn"]["start"]["v"],
        big["flows"][2]["wn"]["start"]["v"])
