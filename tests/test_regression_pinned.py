"""Self-golden regression pin: the framework's OWN output on a fixed tiny
config, seed, and injected noise.

The reference's golden oracle (test_Synthesizer.py) needs the 644 MB
pretrained checkpoint, unreachable here (docs/PARITY.md). This pin catches
the same class of regression — silent numeric drift anywhere in
init / weight-fusing / upsample / flows / coupling — without it: the values
below were produced by this framework at a known-good commit (validated
against the reference implementation by tests/test_reference_parity.py) and
must keep reproducing within float tolerance across refactors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveglow_tpu.models.waveglow import (WaveGlowConfig, block_noise,
                                          fuse_for_inference, infer,
                                          init_params)

# produced 2026-08-18 on the CPU backend, config/seed below
PINNED_WAV_FIRST10 = np.array([
    -0.274058, 1.3034878, 0.6907548, 0.02393803, -0.7580289,
    -0.4596556, -0.28959376, -0.40903306, 0.41055104, 0.7808531,
], dtype=np.float32)
PINNED_SUM = 41.58750534057617
PINNED_ABSMAX = 2.957620143890381


def test_pinned_tiny_synthesis():
  cfg = WaveGlowConfig(n_flows=4, n_channels=64, n_layers=3)
  params = fuse_for_inference(init_params(cfg, seed=7))
  rng = np.random.default_rng(7)
  mel = jnp.asarray(rng.standard_normal((1, 80, 8)).astype(np.float32))
  n_groups = ((8 - 1) * 256 + 256) // 8
  noise = block_noise(jax.random.PRNGKey(7), cfg, 1, 0, n_groups // 32)
  wav = np.asarray(infer(params, cfg, mel, sigma=0.8, noise=noise))

  assert wav.shape == (1, n_groups * 8)
  np.testing.assert_allclose(wav[0, :10], PINNED_WAV_FIRST10, atol=1e-4)
  assert float(wav.sum()) == pytest.approx(PINNED_SUM, abs=2e-3)
  assert float(np.abs(wav).max()) == pytest.approx(PINNED_ABSMAX, abs=1e-4)


def test_bf16_quality_artifact_bounds():
  """Pin the committed full-scale bf16-vs-f32 quality artifact
  (benchmarks/bf16_quality_tpu.json, scripts/bench_bf16_quality.py on the
  TPU with trained 12x256 weights): the bf16 production mode must stay
  within these bounds of float32 on the SAME injected noise, and must not
  degrade the task-level copy-synthesis metrics. If a re-measurement
  regresses past these, the bf16 headline loses its quality claim."""
  import json
  from pathlib import Path

  path = (Path(__file__).resolve().parent.parent / "benchmarks"
          / "bf16_quality_tpu.json")
  art = json.loads(path.read_text())

  assert art["config"] == "12x256"  # full scale, not a toy config
  assert art["frames"] >= 800      # the whole 9.6 s fixture

  delta = art["waveform_delta"]
  assert delta["max_abs"] < 0.01            # measured 0.0021
  assert delta["rms_delta_over_rms_f32"] < 0.01   # measured 0.003
  assert 0.99 < delta["rms_ratio_bf16_over_f32"] < 1.01

  mode = art["bf16_vs_f32"]
  assert mode["cosine"] > 0.999             # measured 1.0
  assert mode["ssim"] > 0.995               # measured 0.9997
  assert mode["mcd_dtw"] < 5.0              # measured 0.97 (source scale ~773)

  # task-level metrics must agree between modes (bf16 costs ~nothing where
  # quality is actually read)
  f32, bf16 = art["f32_vs_source"], art["bf16_vs_source"]
  assert abs(f32["cosine"] - bf16["cosine"]) < 0.001
  assert abs(f32["mcd_dtw"] - bf16["mcd_dtw"]) < 2.0
  assert abs(f32["ssim"] - bf16["ssim"]) < 0.005
