"""Chunked (constant-memory) synthesis for unbounded-length utterances.

The reference synthesizes an utterance in one device call, so activation
memory grows linearly with length (reference model.py:223-274 — the time
axis flows through every conv unchunked, SURVEY §5.7). Every WaveGlow op is
local in time, so a chunk of output depends only on a bounded mel/noise
neighborhood:

  * the ConvTranspose upsampler reads ``kernel/stride`` = 4 mel frames per
    sample (reference model.py:145-150);
  * each flow's WN reaches ±(kernel_size-1)/2 * (2^n_layers - 1) audio
    groups (the dilation sum, reference model.py:98-104), and the 12 flows
    compose, so a synthesized group sees at most ``n_flows`` times that.

:func:`infer_chunked` therefore slides a FIXED-SIZE mel window (chunk +
receptive-field halo on both sides) over the utterance, runs the ordinary
jitted :func:`waveglow_tpu.models.waveglow.infer` on each window, and keeps
only the interior samples. TPU-native details:

  * the window size is constant (edge windows shift instead of shrink), so
    every chunk reuses ONE compiled program;
  * z-noise is generated per mel frame with a position-keyed PRNG
    (``fold_in(key, (tensor, absolute_frame))``), so overlapping windows
    draw bit-identical NOISE in their shared halo region — chunked output
    matches single-call synthesis for the same key exactly up to
    compilation-dependent float rounding (the windowed program compiles
    with different shapes/fusions than the full-length program; tests pin
    agreement at atol 1e-5);
  * the window is carved out with an eager on-device ``lax.dynamic_slice``
    OUTSIDE jit, so the compiled program's input shapes depend only on the
    window size — utterances of any length share one compilation (the mel
    is placed on the device once per call).

Memory: activations are bounded by the window (~2 MB of cond activations
per window frame at 12x256), instead of the full utterance.
"""

from __future__ import annotations

import functools
import math
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp

from waveglow_tpu.models.waveglow import (UPSAMPLE_KERNEL, UPSAMPLE_STRIDE,
                                          WaveGlowConfig, block_noise, infer)

__all__ = ["block_noise", "infer_chunked", "pcm16_on_device",
           "receptive_halo_frames", "stream_chunks"]


def pcm16_on_device(wav: jnp.ndarray) -> jnp.ndarray:
  """``convert_wav(clip(wav, -1, 1), int16)`` as XLA ops: scale by the int16
  max, round half-to-even, cast — so PCM responses leave the device already
  converted (half the device->host bytes of float32)."""
  return jnp.asarray(jnp.round(jnp.clip(wav, -1.0, 1.0) * 32767.0),
                     jnp.int16)


def receptive_halo_frames(config: WaveGlowConfig) -> int:
  """Mel frames one synthesized sample can depend on, per side.

  WN reach per flow: (k-1)/2 * sum(dilations) audio groups; flows compose
  additively. Plus the upsampler's kernel/stride frames.
  """
  per_flow_groups = ((config.kernel_size - 1) // 2) * (2 ** config.n_layers - 1)
  halo_groups = config.n_flows * per_flow_groups
  groups_per_frame = UPSAMPLE_STRIDE // config.n_group
  upsample_frames = UPSAMPLE_KERNEL // UPSAMPLE_STRIDE
  return math.ceil(halo_groups / groups_per_frame) + upsample_frames


def infer_chunked(params, config: WaveGlowConfig, mel: jnp.ndarray, *,
                  sigma: float = 1.0, rng: Optional[jax.Array] = None,
                  chunk_frames: int = 256,
                  halo_frames: Optional[int] = None,
                  compute_dtype=None, scan_flows: bool = False,
                  use_pallas: bool = False,
                  true_frames: Optional[int] = None) -> jnp.ndarray:
  """Constant-memory mel->wav synthesis, exact vs one-call :func:`infer`.

  Args:
    mel: [B, n_mels, frames].
    chunk_frames: frames emitted per window; window = chunk + 2*halo.
    halo_frames: receptive-field halo (default: derived from the config).
    true_frames: real frame count when ``mel`` carries bucket-pad frames
      (see models.waveglow.infer) — windows mask WN rows past it so kept
      samples match the unpadded call exactly.
  Returns:
    waveform [B, frames * UPSAMPLE_STRIDE], matching
    ``infer(params, config, mel, noise=block_noise(...))`` with identical
    injected noise, up to compilation-dependent float rounding.
  """
  pieces = [piece for _, piece in
            stream_chunks(params, config, mel, sigma=sigma, rng=rng,
                          chunk_frames=chunk_frames, halo_frames=halo_frames,
                          compute_dtype=compute_dtype, scan_flows=scan_flows,
                          use_pallas=use_pallas, true_frames=true_frames)]
  return jnp.concatenate(pieces, axis=1)


def stream_chunks(params, config: WaveGlowConfig, mel: jnp.ndarray, *,
                  sigma: float = 1.0, rng: Optional[jax.Array] = None,
                  chunk_frames: int = 256,
                  halo_frames: Optional[int] = None,
                  compute_dtype=None, scan_flows: bool = False,
                  use_pallas: bool = False, pcm16: bool = False,
                  true_frames: Optional[int] = None
                  ) -> Iterator[Tuple[int, jnp.ndarray]]:
  """Generator form of :func:`infer_chunked` for low-latency serving.

  Yields ``(start_sample, wav_piece [B, piece_samples])`` in time order as
  each window finishes on-device — a player can start after the first chunk
  (~chunk latency) instead of waiting for the whole utterance. Concatenating
  every piece reproduces :func:`infer_chunked` exactly (same windows, same
  position-keyed noise). ``pcm16=True`` applies :func:`pcm16_on_device`
  inside the window program, so PCM-streaming responses fetch int16 pieces
  (half the tunnel bytes, no host conversion on the latency path).
  """
  if chunk_frames < 1:
    raise ValueError(f"chunk_frames must be >= 1, got {chunk_frames}")
  if rng is None:
    rng = jax.random.PRNGKey(0)
  mel = jnp.asarray(mel)  # device-resident once; window slices stay on-device
  batch, n_mels, total_frames = mel.shape
  if halo_frames is None:
    halo_frames = receptive_halo_frames(config)
  window = chunk_frames + 2 * halo_frames

  dtype_key = None if compute_dtype is None else jnp.dtype(compute_dtype).name

  masked = true_frames is not None
  tf = jnp.int32(true_frames if masked else 0)

  if total_frames <= window:
    # whole utterance fits one window: pad it UP to the standard window
    # shape and mask, so it reuses the SAME compiled program as the
    # steady-state windows — an exact-length program here compiled once
    # per distinct short-utterance length (~37 s each over a tunneled
    # TPU) and thrashed the 16-entry jit cache. Masking (true_frames)
    # makes the kept samples bit-identical to the exact-length program
    # (position-keyed noise draws identically; WN pad rows are zeroed —
    # the bucket-exactness property, tests/test_serving.py), so the pad
    # VALUE is irrelevant; the mel silence floor keeps the convention.
    if total_frames < window and not (use_pallas and not masked):
      # (the Pallas path cannot take traced true_frames — it keeps the
      # old per-length program rather than failing)
      from waveglow_tpu.dsp.mel import CLIP_VAL
      mel = jnp.pad(mel, ((0, 0), (0, 0), (0, window - total_frames)),
                    constant_values=float(math.log(CLIP_VAL)))
      if not masked:
        masked = True
        tf = jnp.int32(total_frames)
      run_window = _window_fn(config, window, dtype_key, scan_flows,
                              use_pallas, pcm16, masked)
    else:
      run_window = _window_fn(config, total_frames, dtype_key, scan_flows,
                              use_pallas, pcm16, masked)
    wav = run_window(params, mel, 0, jnp.float32(sigma), rng, tf)
    yield 0, wav[:, :total_frames * UPSAMPLE_STRIDE]
    return

  run_window = _window_fn(config, window, dtype_key, scan_flows, use_pallas,
                          pcm16, masked)

  for s in range(0, total_frames, chunk_frames):
    e = min(s + chunk_frames, total_frames)
    a = max(0, min(s - halo_frames, total_frames - window))
    # the slice happens OUTSIDE jit, so the window program's input shape —
    # and therefore its one compilation — is independent of the utterance
    # length; a folder of distinct-length files reuses a single program
    mel_w = jax.lax.dynamic_slice(mel, (0, 0, a), (batch, n_mels, window))
    wav_w = run_window(params, mel_w, a, jnp.float32(sigma), rng, tf)
    lo = (s - a) * UPSAMPLE_STRIDE
    yield (s * UPSAMPLE_STRIDE,
           wav_w[:, lo:lo + (e - s) * UPSAMPLE_STRIDE])


@functools.lru_cache(maxsize=16)
def _window_fn(config: WaveGlowConfig, window: int, dtype_key,
               scan_flows: bool, use_pallas: bool, pcm16: bool = False,
               masked: bool = False):
  """One jitted fixed-window program, cached so repeated calls (and every
  chunk of every call) reuse a single compilation. ``masked`` compiles the
  bucket-exact variant: the global true frame count is an argument and the
  window masks its slice of the pad region (no-op for windows entirely
  inside the real utterance)."""
  cdt = None if dtype_key is None else jnp.dtype(dtype_key)

  @jax.jit
  def run_window(params, mel_w, start, sigma, key, true_frames):
    batch = mel_w.shape[0]
    noise = block_noise(key, config, batch, start, window)
    tf_w = (jnp.clip(true_frames - start, 0, window) if masked else None)
    wav = infer(params, config, mel_w, sigma=sigma, noise=noise,
                compute_dtype=cdt, scan_flows=scan_flows,
                use_pallas=use_pallas, true_frames=tf_w)
    return pcm16_on_device(wav) if pcm16 else wav

  return run_window
