"""Waveform -> log-mel-spectrogram pipeline (TacotronSTFT equivalent).

Behavioral contract follows reference src/waveglow/taco_stft.py:53-126:
``mel = log(clamp(mel_basis @ |STFT|, min=1e-5))`` with an 80-bin slaney
filterbank over 0-8000 Hz, plus overamplification assertions and file loaders
with a sampling-rate check.

TPU-first: the mel projection is fused with the DFT matmul in channels-last
layout, and the whole pipeline is a pure jittable function so training can
compute mels on-device inside the train step (the reference computes them
per-item on the host data-loader thread, dataloader.py:45-54).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from waveglow_tpu.dsp import audio_io
from waveglow_tpu.dsp.mel_filters import mel_filterbank
from waveglow_tpu.dsp.stft import STFT
from waveglow_tpu.hparams import TSTFTHParams

CLIP_VAL = 1e-5


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0,
                              clip_val: float = CLIP_VAL) -> jnp.ndarray:
  return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0) -> jnp.ndarray:
  return jnp.exp(x) / C


class MelSTFT:
  """Stateless wav->mel operator (reference calls this TacotronSTFT)."""

  def __init__(self, hparams: TSTFTHParams = None):
    hparams = hparams or TSTFTHParams()
    self.hparams = hparams
    self.n_mel_channels = hparams.n_mel_channels
    self.sampling_rate = hparams.sampling_rate
    self.stft = STFT(hparams.filter_length, hparams.hop_length,
                     hparams.win_length, hparams.window)
    # [n_mels, cutoff] -> transposed for channels-last matmul
    basis = mel_filterbank(hparams.sampling_rate, hparams.filter_length,
                           hparams.n_mel_channels, hparams.mel_fmin,
                           hparams.mel_fmax)
    self._mel_basis_t = basis.T.copy()         # [cutoff, n_mels]

  def mel_spectrogram(self, audio: jnp.ndarray,
                      check_amplitude: bool = False) -> jnp.ndarray:
    """[B, T] in [-1, 1] -> log-mel [B, n_mels, n_frames].

    ``check_amplitude`` mirrors the reference's overamplification assert
    (taco_stft.py:94-96); it is a no-op under jit, so callers that need the
    check should validate on the host first.
    """
    if check_amplitude and not isinstance(audio, jax.core.Tracer):
      arr = np.asarray(audio)
      assert arr.min() >= -1.0 and arr.max() <= 1.0, "input overamplified"
    mag2 = self.stft.transform_mag2(audio)      # [B, N, cutoff]
    magnitude = jnp.sqrt(jnp.maximum(mag2, 0.0))
    mel = jnp.dot(magnitude, jnp.asarray(self._mel_basis_t),
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)  # [B, N, n_mels]
    mel = dynamic_range_compression(mel)
    return mel.transpose(0, 2, 1)

  def get_mel(self, audio: Union[np.ndarray, jnp.ndarray]) -> jnp.ndarray:
    """[T] -> [n_mels, n_frames] (single-utterance convenience wrapper)."""
    audio = jnp.asarray(audio)[None, :]
    return self.mel_spectrogram(audio)[0]

  def get_wav_from_file(self, wav_path: Union[str, Path]) -> np.ndarray:
    wav, sr = audio_io.wav_to_float32(wav_path)
    if sr != self.sampling_rate:
      raise ValueError(
          f"{wav_path}: sampling rate {sr} Hz does not match target "
          f"{self.sampling_rate} Hz")
    # the reference asserts the amplitude contract on every mel
    # computation (taco_stft.py:94-96); our in-step mel is jitted so the
    # check lives on the HOST file-loading path — int16/int32 wavs cannot
    # exceed it, but a float32-format wav can carry out-of-range samples
    # that would silently corrupt training/eval data
    if audio_io.is_overamp(wav):
      raise ValueError(
          f"{wav_path}: samples outside [-1, 1] (overamplified input; "
          "normalize the file first)")
    return wav

  def get_mel_from_file(self, wav_path: Union[str, Path]) -> jnp.ndarray:
    return self.get_mel(self.get_wav_from_file(wav_path))
