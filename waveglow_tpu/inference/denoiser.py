"""Bias removal by spectral subtraction (the reference's Denoiser).

Behavioral contract (reference denoiser.py:14-57): at construction, run the
model on an 88-frame zero (or random-normal) mel with sigma=0 and keep the
first STFT frame of the result as ``bias_spec``; at call time, subtract
``strength * bias_spec`` from the audio's magnitude spectrogram, clamp at 0,
and invert with the original phases.

With sigma=0 every injected-noise term vanishes, so bias capture is fully
deterministic — no RNG parity issue (the "normal" mode draws its mel input
from jax.random instead of torch's global RNG).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from waveglow_tpu.dsp.stft import STFT
from waveglow_tpu.hparams import TSTFTHParams
from waveglow_tpu.models.waveglow import WaveGlowConfig, infer

BIAS_MEL_LENGTH = 88


@functools.lru_cache(maxsize=8)
def _bias_capture_fn(config: WaveGlowConfig, dtype_key: Optional[str],
                     filter_length: int, hop_length: int, win_length: int,
                     window: str):
  """One jitted bias-capture program per (model config, stft config).

  Unjitted, the capture dispatched the whole 12-flow infer op-by-op and
  compiled a second full program per Synthesizer — minutes on a tunneled
  platform. The lru cache also lets every same-config Synthesizer reuse the
  compiled program.
  """
  cdt = None if dtype_key is None else jnp.dtype(dtype_key)
  stft = STFT(filter_length, hop_length, win_length, window)

  @jax.jit
  def capture(params, mel_input):
    bias_audio = infer(params, config, mel_input, sigma=0.0,
                       rng=jax.random.PRNGKey(0), compute_dtype=cdt)
    bias_spec, _ = stft.transform(bias_audio)
    return bias_spec[:, :, 0:1]  # first frame only

  return capture


class Denoiser:
  """Removes model bias from audio produced with WaveGlow."""

  def __init__(self, params: Dict, config: WaveGlowConfig,
               hparams: TSTFTHParams, mode: str = "zeros",
               rng: Optional[jax.Array] = None, compute_dtype=None):
    self.stft = STFT(hparams.filter_length, hparams.hop_length,
                     hparams.win_length, hparams.window)

    if mode == "zeros":
      mel_input = jnp.zeros((1, hparams.n_mel_channels, BIAS_MEL_LENGTH),
                            dtype=jnp.float32)
    elif mode == "normal":
      rng = rng if rng is not None else jax.random.PRNGKey(0)
      mel_input = jax.random.normal(
          rng, (1, hparams.n_mel_channels, BIAS_MEL_LENGTH),
          dtype=jnp.float32)
    else:
      raise ValueError(f"Mode {mode!r} is not supported")

    dtype_key = (None if compute_dtype is None
                 else jnp.dtype(compute_dtype).name)
    capture = _bias_capture_fn(config, dtype_key, hparams.filter_length,
                               hparams.hop_length, hparams.win_length,
                               hparams.window)
    # [1, cutoff, 1]
    self.bias_spec = np.asarray(capture(params, mel_input))

  def __call__(self, audio: jnp.ndarray, strength: float,
               bias_spec: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[B, T] -> denoised [B, T'] (iSTFT trims to frame-aligned length).

    ``bias_spec`` overrides the captured bias — callers that jit this
    (Synthesizer's fused serving programs) pass it as a traced ARGUMENT so
    a checkpoint hot-swap (Synthesizer.update_params) replaces the bias
    without invalidating any compiled program; omitted, the instance's own
    capture is inlined as a constant (the reference's one-model semantics).
    """
    audio_spec, audio_angles = self.stft.transform(audio)
    bias = jnp.asarray(self.bias_spec if bias_spec is None else bias_spec)
    denoised_spec = jnp.clip(audio_spec - bias * strength, min=0.0)
    return self.stft.inverse(denoised_spec, audio_angles)
