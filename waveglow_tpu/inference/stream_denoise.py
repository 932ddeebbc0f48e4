"""Streaming bias removal: windowed spectral subtraction for chunked audio.

The reference denoises every synthesis result as one whole-utterance STFT
roundtrip (reference denoiser.py:51-57, applied per synthesis in
synthesizer.py:63-66). A streamed utterance never exists in one piece, but
every stage of that roundtrip is time-local:

  * an STFT frame reads ``filter_length`` samples;
  * the iSTFT overlap-add writes each output sample from the <= ``ratio``
    (= filter_length/hop) frames covering it;
  * the ``window_sumsquare`` normalisation envelope is a per-position
    constant: periodic (period ``hop``) in the interior, with fixed
    boundary patterns over the first/last ``filter_length - hop`` padded
    positions that do not depend on the utterance length.

:class:`StreamingDenoiser` therefore slides a FIXED-SIZE window over the
(reflect-padded) waveform: each window is framed, transformed, bias-
subtracted and inverted exactly as the full-utterance
:class:`waveglow_tpu.inference.denoiser.Denoiser` would, and only the
samples whose covering frames all lie inside the window are emitted. The
window size is constant (edge windows shift instead of shrink), so the
whole stream reuses ONE jitted XLA program; the normalisation envelope is
built host-side per window from the absolute sample positions and passed
in as an argument, so boundary windows share that same program.

Exactness: emitted samples are computed from the same frame values, the
same overlap-add order and the same envelope bits as the one-call
denoiser; concatenating the emitted blocks reproduces ``Denoiser(wav,
strength)`` up to compilation-dependent float rounding of the framed
matmuls (tests pin atol 2e-6 on the reassembled stream, and the
end-to-end streamed-synthesis+denoise path vs ``InferenceResult.
wav_denoised`` at the chunked-synthesis bound).

Latency: a block of ``block_samples`` output becomes available once
``block_end + (filter_length - hop)`` raw samples exist, i.e. the denoised
stream lags the raw stream by under ``filter_length`` samples (~35 ms at
22 kHz for the 1024/256 defaults) plus one small window program.
"""

from __future__ import annotations

import functools
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveglow_tpu.dsp.stft import (STFT, frame_signal, overlap_add,
                                   window_sumsquare_np)
from waveglow_tpu.inference.denoiser import Denoiser
from waveglow_tpu.inference.streaming import pcm16_on_device

__all__ = ["StreamingDenoiser"]

@functools.lru_cache(maxsize=16)
def _env_patterns(window: Optional[str], filter_length: int, hop_length: int,
                  win_length: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
  """(left[edge], interior[hop], right[edge]) window-sumsquare patterns.

  ``edge = filter_length - hop``: the only padded positions whose envelope
  differs from the periodic interior (covered by fewer than ``ratio``
  frames at the signal boundary). Bit-identical to the corresponding
  slices of the full-signal ``window_sumsquare`` (reference stft.py:45-95)
  because the per-position accumulation order (increasing frame index) is
  the same. The reference signal must span both boundary zones plus one
  clean interior period: n_fft + hop*(n-1) >= 2*(n_fft - hop) + hop, i.e.
  n >= n_fft/hop frames — computed from the actual ratio (a fixed count
  would silently sample boundary-contaminated "interior" values for
  ratios above it).
  """
  ref_frames = max(16, -(-filter_length // hop_length) + 2)
  wss = window_sumsquare_np(window, ref_frames, hop_length, win_length,
                            filter_length)
  edge = filter_length - hop_length
  return (wss[:edge].copy(), wss[edge:edge + hop_length].copy(),
          wss[-edge:].copy())


@functools.lru_cache(maxsize=16)
def _denoise_window_fn(filter_length: int, hop_length: int, win_length: int,
                       window: Optional[str], pcm16: bool):
  """One jitted fixed-window denoise program (shared across all blocks,
  both boundary and interior, and across strengths — the envelope, bias
  and strength are arguments, not trace-time constants).

  Same math as Denoiser.__call__ -> STFT.transform/inverse, minus the
  reflect pad (the caller supplies pre-padded context) and with the
  envelope supplied per absolute position.
  """
  stft = STFT(filter_length, hop_length, win_length, window)
  cutoff = stft.cutoff
  # windowless iSTFT applies neither envelope nor rescale (stft.py:180-186);
  # the caller passes an all-ones inv_env in that case
  scale = float(filter_length) / hop_length if window is not None else 1.0

  @jax.jit
  def run(window_audio, inv_env, bias, strength):
    # [B, W] -> frames [B, n_w, n_fft] -> spectrum (channels-last; the
    # full path's [B, cutoff, N] transposes are exact permutations)
    frames = frame_signal(window_audio, filter_length, hop_length)
    spec = jnp.dot(frames, jnp.asarray(stft.forward_basis),
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    real = spec[..., :cutoff]
    imag = spec[..., cutoff:]
    magnitude = jnp.sqrt(real * real + imag * imag)
    phase = jnp.arctan2(imag, real)
    # spectral subtraction (reference denoiser.py:51-55); bias is the
    # Denoiser's captured first-frame spectrum as [1, 1, cutoff]
    magnitude = jnp.clip(magnitude - bias * strength, min=0.0)
    recombined = jnp.concatenate(
        [magnitude * jnp.cos(phase), magnitude * jnp.sin(phase)], axis=-1)
    out_frames = jnp.dot(recombined, jnp.asarray(stft.inverse_basis),
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
    signal = overlap_add(out_frames, hop_length)  # [B, W]
    signal = signal * inv_env[None, :]
    signal = signal * scale
    return pcm16_on_device(signal) if pcm16 else signal

  return run


class StreamingDenoiser:
  """Incremental ``Denoiser(wav, strength)`` over waveform pieces.

  Usage::

      sd = StreamingDenoiser(denoiser, strength)
      for start, piece in raw_stream:
        for out_start, out in sd.push(piece):
          play(out_start, out)
      for out_start, out in sd.flush():
        play(out_start, out)

  Emitted blocks concatenate to the one-call denoised waveform (length
  ``floor(T / hop) * hop`` — the same frame-aligned truncation the full
  iSTFT applies). ``pcm16=True`` converts emitted blocks to int16 PCM
  inside the window program (half the device->host bytes).
  """

  def __init__(self, denoiser: Denoiser, strength: float, *,
               block_samples: int = 16384, pcm16: bool = False):
    stft = denoiser.stft
    self.n_fft = stft.filter_length
    self.hop = stft.hop_length
    self.half = self.n_fft // 2
    self.edge = self.n_fft - self.hop  # boundary-envelope width per side
    if self.half % self.hop:
      # window starts sit at half + k*block - edge; they align with the
      # full signal's frame grid (multiples of hop) only when hop divides
      # n_fft/2. An odd ratio (e.g. 768/256) misaligns every window's
      # frames with the one-call denoiser's and the stream SILENTLY
      # diverges — fail loudly at construction instead (use the
      # non-streaming Denoiser for such STFT geometries).
      raise ValueError(
          f"streaming denoiser requires hop ({self.hop}) to divide "
          f"filter_length/2 ({self.half}); this STFT geometry would "
          "misalign the window frame grid — denoise non-streamed instead")
    if block_samples < self.hop or block_samples % self.hop:
      raise ValueError(
          f"block_samples must be a positive multiple of hop={self.hop}, "
          f"got {block_samples}")
    self.block = block_samples
    # window = emit block + one exactness halo per side (all frames
    # covering an emitted sample must lie inside the window)
    self.window = self.block + 2 * self.edge
    self.pcm16 = pcm16
    self._patterns = (None if stft.window is None else
                      _env_patterns(stft.window, self.n_fft, self.hop,
                                    stft.win_length))
    # Denoiser.bias_spec is [1, cutoff, 1]; the window program is
    # channels-last -> [1, 1, cutoff]
    self._bias = jnp.asarray(
        np.asarray(denoiser.bias_spec).transpose(0, 2, 1))
    self._strength = jnp.float32(strength)
    self._strength_f = float(strength)
    self._denoiser = denoiser  # short-utterance one-shot fallback
    self._fn = _denoise_window_fn(self.n_fft, self.hop, stft.win_length,
                                  stft.window, pcm16)
    self._buf = np.zeros((0,), np.float32)
    self._buf_start = 0   # absolute raw index of _buf[0]
    self._received = 0    # total raw samples pushed
    self._emitted = 0     # next output sample index to emit
    self._finished = False

  # -- public API -------------------------------------------------------------

  def push(self, piece: np.ndarray) -> List[Tuple[int, np.ndarray]]:
    """Feed the next raw piece; return every (start_sample, block) that is
    now fully determined (possibly none)."""
    if self._finished:
      raise RuntimeError("push() after flush()")
    piece = np.asarray(piece, dtype=np.float32).reshape(-1)
    if piece.size:
      self._buf = np.concatenate([self._buf, piece])
      self._received += piece.size
    out: List[Tuple[int, np.ndarray]] = []
    while True:
      k = self._emitted // self.block
      a = max(0, self.half + k * self.block - self.edge)
      # the window needs raw samples up to padded position a + window
      if self._received < a + self.window - self.half:
        break
      out.append(self._run_block(k, a, total=None))
    return out

  def flush(self) -> List[Tuple[int, np.ndarray]]:
    """End of stream: emit every remaining block with the true right-
    boundary reflection and envelope."""
    if self._finished:
      return []
    self._finished = True
    total = self._received
    # frame-aligned output length, as the full iSTFT trim produces
    total_out = (total // self.hop) * self.hop
    if total_out == 0:
      # nothing frame-aligned to emit: an aborted-before-audio stream (or
      # a sub-hop utterance) ends gracefully instead of pushing an empty
      # waveform through the full denoiser's reflect pad (a crash)
      return []
    padded_len = total_out + self.n_fft
    out: List[Tuple[int, np.ndarray]] = []
    if padded_len < self.window:
      # too short for even one window: one-shot full denoise (identical to
      # the reference path by construction). Only reachable when nothing
      # was emitted yet — the first block already required
      # received >= window - half > padded_len - half.
      assert self._emitted == 0
      wav = np.asarray(self._denoiser(jnp.asarray(self._buf[None, :total]),
                                      self._strength_f))[0]
      if self.pcm16:
        wav = np.asarray(
            np.round(np.clip(wav, -1.0, 1.0) * 32767.0), np.int16)
      return [(0, wav)]
    while self._emitted < total_out:
      k = self._emitted // self.block
      a = max(0, min(self.half + k * self.block - self.edge,
                     padded_len - self.window))
      out.append(self._run_block(k, a, total=total))
    return out

  # -- internals --------------------------------------------------------------

  def _run_block(self, k: int, a: int, total: Optional[int]
                 ) -> Tuple[int, np.ndarray]:
    """Denoise window [a, a+W) of the padded signal; emit block k."""
    emit_start = k * self.block
    if total is None:
      emit_end = emit_start + self.block
      env_total = None
    else:
      total_out = (total // self.hop) * self.hop
      emit_end = min(emit_start + self.block, total_out)
      env_total = total_out + self.n_fft
    window_audio = self._window_values(a, total)
    inv_env = self._inv_env(a, env_total)
    block = self._fn(window_audio[None, :], jnp.asarray(inv_env),
                     self._bias, self._strength)
    lo = emit_start + self.half - a
    piece = np.asarray(block)[0, lo:lo + (emit_end - emit_start)]
    self._emitted = emit_end
    # drop raw samples no future window can touch. A PUSH window reaches
    # back to emitted - edge (plus n_fft of reflect context), but the
    # FLUSH-time FINAL window is left-clamped to padded_len - window and
    # can reach back up to block + 2*edge + half - n_fft - hop before the
    # emit point (smallest tail = one hop) — retaining only the push
    # bound underflowed the buffer and crashed flush() for every stream
    # whose tail was under block - hop - half samples.
    reach = max(self.edge + self.n_fft,
                self.block + 2 * self.edge + self.half - self.n_fft)
    keep_from = max(0, self._emitted - reach)
    if keep_from > self._buf_start:
      self._buf = self._buf[keep_from - self._buf_start:]
      self._buf_start = keep_from
    return emit_start, piece

  def _window_values(self, a: int, total: Optional[int]) -> np.ndarray:
    """Padded-signal values for positions [a, a+W): raw samples shifted by
    ``half``, with the true reflect padding at whichever boundary the
    window touches (np.pad 'reflect' == the full pipeline's jnp reflect
    pad when the segment is anchored at the signal edge)."""
    lo_raw = a - self.half
    hi_raw = a + self.window - self.half
    seg_lo = max(0, lo_raw)
    seg_hi = min(self._received, hi_raw)
    # a retention bug would make this slice wrap on a negative index and
    # produce a silently-wrong window — fail loudly instead
    assert seg_lo >= self._buf_start, (seg_lo, self._buf_start)
    seg = self._buf[seg_lo - self._buf_start:seg_hi - self._buf_start]
    front = seg_lo - lo_raw
    back = hi_raw - seg_hi
    if back > 0 and total is None:
      raise AssertionError("window past received data before flush")
    if front or back:
      seg = np.pad(seg, (front, back), mode="reflect")
    return seg

  def _inv_env(self, a: int, padded_len: Optional[int]) -> np.ndarray:
    """Inverse window-sumsquare envelope for padded positions [a, a+W).

    Same where/maximum expression as STFT.inverse (reference
    stft.py:180-190); positions in the right-boundary zone only exist
    after flush (padded_len known). Windowless STFTs normalise nothing.
    """
    if self._patterns is None:
      return np.ones((self.window,), np.float32)
    left, interior, right = self._patterns
    p = np.arange(a, a + self.window)
    wss = interior[p % self.hop]
    in_left = p < self.edge
    if in_left.any():
      wss = np.where(in_left, left[np.minimum(p, self.edge - 1)], wss)
    if padded_len is not None:
      in_right = p >= padded_len - self.edge
      if in_right.any():
        idx = np.clip(p - (padded_len - self.edge), 0, self.edge - 1)
        wss = np.where(in_right, right[idx], wss)
    tiny = np.finfo(np.float32).tiny
    inv = np.where(wss > tiny, 1.0 / np.maximum(wss, tiny), 1.0)
    return inv.astype(np.float32)
