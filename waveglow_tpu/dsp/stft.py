"""Conv-basis STFT / iSTFT as MXU-friendly framed matmuls.

Numerically equivalent to the reference's conv1d-against-Fourier-basis STFT
(reference: src/waveglow/stft.py:98-203, itself adapted from Prem Seetharaman's
pytorch-stft, BSD-3): the forward transform correlates reflect-padded audio
with ``fft(eye(n_fft))`` rows windowed by a periodic Hann window, and the
inverse overlap-adds frames projected through the windowed pseudo-inverse
basis, divides out the squared-window envelope (``window_sumsquare``,
reference stft.py:45-95), rescales by ``filter_length / hop_length`` and trims
``filter_length/2`` from both ends (reference stft.py:165-198).

TPU-first design decisions (not a port):
  * Audio is framed by a static reshape/stack (hop divides the frame length),
    and the DFT is one ``[n_frames, n_fft] @ [n_fft, n_fft + 2]`` matmul that
    runs on the MXU — no strided convolution, no FFT op.
  * Overlap-add is expressed as ``n_fft/hop`` shifted pad-and-add passes —
    fully static shapes, fuses in XLA, and shards cleanly along time.
  * All bases and the sum-square envelope are host-side numpy constants baked
    into the jitted computation at trace time.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import get_window


def window_sumsquare_np(window: str, n_frames: int, hop_length: int,
                        win_length: int, n_fft: int,
                        dtype=np.float32) -> np.ndarray:
  """Sum-square envelope of the analysis window at a given hop (numpy).

  Same quantity as reference stft.py:45-95 (itself from librosa 0.6).
  """
  n = n_fft + hop_length * (n_frames - 1)
  x = np.zeros(n, dtype=dtype)

  win_sq = get_window(window, win_length, fftbins=True).astype(np.float64) ** 2
  # center-pad to n_fft (no-op when win_length == n_fft)
  pad = n_fft - win_length
  win_sq = np.pad(win_sq, (pad // 2, pad - pad // 2))

  for i in range(n_frames):
    sample = i * hop_length
    x[sample:min(n, sample + n_fft)] += win_sq[:max(0, min(n_fft, n - sample))]
  return x


@functools.lru_cache(maxsize=None)
def _bases(filter_length: int, hop_length: int, win_length: int,
           window: Optional[str]) -> Tuple[np.ndarray, np.ndarray]:
  """(forward_basis [n_fft, cutoff*2], inverse_basis [cutoff*2, n_fft]).

  forward rows/cols follow the reference's stacking: first ``cutoff`` output
  channels are Re(DFT), the rest Im(DFT) (reference stft.py:110-119).
  """
  scale = filter_length / hop_length
  fourier = np.fft.fft(np.eye(filter_length))
  cutoff = filter_length // 2 + 1
  fourier = np.vstack([np.real(fourier[:cutoff]), np.imag(fourier[:cutoff])])

  forward = fourier.copy()
  inverse = np.linalg.pinv(scale * fourier).T  # [cutoff*2, n_fft]

  if window is not None:
    assert filter_length >= win_length
    win = get_window(window, win_length, fftbins=True)
    pad = filter_length - win_length
    win = np.pad(win, (pad // 2, pad - pad // 2))
    forward = forward * win[None, :]
    inverse = inverse * win[None, :]

  # forward as [n_fft, out] so frames @ forward gives the transform.
  return forward.T.astype(np.float32), inverse.astype(np.float32)


def frame_signal(x: jnp.ndarray, frame_length: int,
                 hop_length: int) -> jnp.ndarray:
  """Frame [B, T] into [B, n_frames, frame_length] with static reshapes.

  Requires ``hop_length`` to divide ``frame_length`` (true for the 1024/256
  defaults). Equivalent to a stride-``hop`` unfold.
  """
  assert frame_length % hop_length == 0
  ratio = frame_length // hop_length
  batch, total = x.shape
  n_frames = (total - frame_length) // hop_length + 1
  n_chunks = n_frames + ratio - 1
  chunks = x[:, :n_chunks * hop_length].reshape(batch, n_chunks, hop_length)
  parts = [chunks[:, j:j + n_frames, :] for j in range(ratio)]
  return jnp.concatenate(parts, axis=-1)


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
  """Overlap-add [B, n_frames, L] at stride ``hop`` -> [B, (n-1)*hop + L]."""
  batch, n_frames, length = frames.shape
  assert length % hop_length == 0
  ratio = length // hop_length
  out_len = (n_frames + ratio - 1) * hop_length
  chunks = frames.reshape(batch, n_frames, ratio, hop_length)
  out = jnp.zeros((batch, out_len), dtype=frames.dtype)
  body_len = n_frames * hop_length
  for j in range(ratio):
    seg = chunks[:, :, j, :].reshape(batch, body_len)
    out = out + jnp.pad(seg, ((0, 0), (j * hop_length,
                                       out_len - j * hop_length - body_len)))
  return out


class STFT:
  """Stateless STFT operator; all methods are jit-safe pure functions."""

  def __init__(self, filter_length: int = 1024, hop_length: int = 256,
               win_length: int = 1024, window: Optional[str] = "hann"):
    self.filter_length = filter_length
    self.hop_length = hop_length
    self.win_length = win_length
    self.window = window
    fwd, inv = _bases(filter_length, hop_length, win_length, window)
    self.forward_basis = fwd      # [n_fft, 2*cutoff]
    self.inverse_basis = inv      # [2*cutoff, n_fft]
    self.cutoff = filter_length // 2 + 1

  def transform(self, audio: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T] -> (magnitude, phase), each [B, cutoff, n_frames].

    Matches reference stft.py:135-163 (reflect pad + strided correlation).
    """
    half = self.filter_length // 2
    padded = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")
    frames = frame_signal(padded, self.filter_length, self.hop_length)
    spec = jnp.dot(frames, jnp.asarray(self.forward_basis),
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)  # [B, N, 2*cutoff]
    real = spec[..., :self.cutoff]
    imag = spec[..., self.cutoff:]
    magnitude = jnp.sqrt(real * real + imag * imag)
    phase = jnp.arctan2(imag, real)
    # Reference layout is [B, freq, frames]
    return magnitude.transpose(0, 2, 1), phase.transpose(0, 2, 1)

  def transform_mag2(self, audio: jnp.ndarray) -> jnp.ndarray:
    """[B, T] -> squared magnitude [B, n_frames, cutoff] (channels-last).

    Fast path for the mel pipeline: skips the sqrt/atan2 and keeps the
    MXU-friendly channels-last layout.
    """
    half = self.filter_length // 2
    padded = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")
    frames = frame_signal(padded, self.filter_length, self.hop_length)
    spec = jnp.dot(frames, jnp.asarray(self.forward_basis),
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    real = spec[..., :self.cutoff]
    imag = spec[..., self.cutoff:]
    return real * real + imag * imag

  def inverse(self, magnitude: jnp.ndarray,
              phase: jnp.ndarray) -> jnp.ndarray:
    """(mag, phase) [B, cutoff, n_frames] -> audio [B, T].

    Matches reference stft.py:165-198: transposed-conv overlap-add through the
    pseudo-inverse basis, window-sum-square normalization (only where the
    envelope exceeds float32 tiny), hop-ratio rescale, half-window trim.
    """
    n_frames = magnitude.shape[-1]
    recombined = jnp.concatenate(
        [magnitude * jnp.cos(phase), magnitude * jnp.sin(phase)],
        axis=1).transpose(0, 2, 1)  # [B, N, 2*cutoff]
    frames = jnp.dot(recombined, jnp.asarray(self.inverse_basis),
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)  # [B, N, n_fft]
    signal = overlap_add(frames, self.hop_length)

    if self.window is not None:
      wss = window_sumsquare_np(self.window, n_frames, self.hop_length,
                                self.win_length, self.filter_length)
      tiny = np.finfo(np.float32).tiny
      inv_env = np.where(wss > tiny, 1.0 / np.maximum(wss, tiny), 1.0)
      signal = signal * jnp.asarray(inv_env, dtype=signal.dtype)[None, :]
      signal = signal * (float(self.filter_length) / self.hop_length)

    half = self.filter_length // 2
    return signal[:, half:-half]
