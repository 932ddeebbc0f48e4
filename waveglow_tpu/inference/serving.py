"""Multi-chip synthesis serving: batch-parallel and time-sharded inference.

The reference synthesizes one utterance per call on one device
(synthesizer.py:54-68). For production serving this module adds:

  * :class:`BatchSynthesizer` — batched z-sampling over same-length mels,
    data-parallel across a device mesh (each chip synthesizes a slice of the
    batch; no cross-chip communication on the hot path);
  * tensor-parallel serving — a mesh with a ``model`` axis shards the WN
    hidden channels Megatron-style (parallel/sharding.py); one psum per WN
    layer rides ICI. Use when one model exceeds a chip's HBM or to cut
    single-utterance latency;
  * time-sharded synthesis for single long utterances — the mel frame axis is
    sharded across chips and GSPMD inserts halo collective-permutes for the
    convolution overlaps (all WaveGlow ops are local in time, SURVEY §5.7).

Both paths reuse the exact fused-params synthesis function; sharding is
placement-driven (no model changes).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from waveglow_tpu.checkpointing.store import CheckpointWaveglow
from waveglow_tpu.hparams import overwrite_custom_hparams
from waveglow_tpu.models.waveglow import (UPSAMPLE_STRIDE, WaveGlowConfig,
                                          fuse_for_inference, infer)
from waveglow_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, TIME_AXIS

logger = logging.getLogger(__name__)


class BatchSynthesizer:
  """Batched mel->wav synthesis, optionally sharded over a device mesh."""

  def __init__(self, checkpoint: CheckpointWaveglow, *,
               custom_hparams: Optional[Dict[str, str]] = None,
               compute_dtype: Optional[str] = None,
               mesh: Optional[Mesh] = None):
    hparams = checkpoint.get_hparams()
    hparams = overwrite_custom_hparams(hparams, custom_hparams)
    if compute_dtype is not None:
      hparams.compute_dtype = compute_dtype
    self.hparams = hparams
    self.config = WaveGlowConfig.from_hparams(hparams)
    self.mesh = mesh
    cdt = jnp.bfloat16 if hparams.compute_dtype == "bfloat16" else None

    params = fuse_for_inference(checkpoint.state_dict)
    if mesh is not None:
      if MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1:
        # tensor-parallel serving: WN hidden channels sharded over the
        # model axis (column-parallel in/cond, row-parallel res_skip);
        # GSPMD adds one psum per WN layer
        from waveglow_tpu.parallel.sharding import shard_params
        params = shard_params(params, mesh)
      else:
        params = jax.device_put(params, NamedSharding(mesh, P()))
    else:
      params = jax.device_put(params)
    self.params = params

    config = self.config
    scan = hparams.scan_flows
    self._infer = jax.jit(
        lambda p, m, sigma, key: infer(p, config, m, sigma=sigma, rng=key,
                                       compute_dtype=cdt, scan_flows=scan))
    # bucketed variant: per-row true frame counts mask WN pad rows, so kept
    # samples are bit-identical to unpadded solo calls (models.waveglow.infer)
    self._infer_masked = jax.jit(
        lambda p, m, sigma, key, tf: infer(p, config, m, sigma=sigma,
                                           rng=key, compute_dtype=cdt,
                                           scan_flows=scan, true_frames=tf))

  def _put_batch(self, mels: jnp.ndarray) -> jnp.ndarray:
    if self.mesh is not None and DATA_AXIS in self.mesh.axis_names:
      return jax.device_put(
          mels, NamedSharding(self.mesh, P(DATA_AXIS)))
    return jnp.asarray(mels)

  def infer_batch(self, mels: np.ndarray, *, sigma: float = 1.0,
                  seed: int = 0) -> np.ndarray:
    """[B, n_mels, frames] -> [B, T] waveforms.

    With a data mesh, B must be divisible by the data-axis size; each chip
    synthesizes its batch slice independently.
    """
    mels = self._put_batch(jnp.asarray(mels, dtype=jnp.float32))
    wav = self._infer(self.params, mels, jnp.float32(sigma),
                      jax.random.PRNGKey(seed))
    return np.asarray(wav)

  def infer_many(self, mels: Sequence[np.ndarray], *, sigma: float = 1.0,
                 seed: int = 0, bucket_frames: int = 64,
                 max_batch: Optional[int] = None) -> List[np.ndarray]:
    """Variable-length batch serving: [n_mels, frames_i] each -> [T_i] each.

    A production queue hands the server mels of many different lengths;
    synthesizing them one-by-one wastes MXU batch parallelism and compiling
    one program per distinct length wastes minutes of XLA compile time. This
    groups utterances into LENGTH BUCKETS (frame count rounded up to a
    multiple of ``bucket_frames``), pads each mel to its bucket with the
    log-clamp silence floor (log(1e-5), the value trailing silence produces
    through the mel pipeline — dsp/mel.py CLIP_VAL), synthesizes each bucket
    as one batched call, and trims every waveform to its utterance's true
    sample count. Compile count is bounded by the number of distinct
    (bucket length, batch size) pairs, not utterance lengths; ``max_batch``
    splits oversized buckets.

    Padding semantics (exact): the conv-transpose upsample cannot leak pad
    frames into kept samples (pad frame f >= F_true contributes only to
    audio positions t >= f*hop, all trimmed), and the WN stack's dilated
    convs — the one leak path, through their 'same' time padding — run with
    per-row ``true_frames`` masking (models.waveglow.infer), which zeroes
    residual rows past each row's real frame count so kept samples equal
    the zero conv boundary of an unpadded call bit-for-bit. (The unmasked
    deviation class this removes is still characterized in
    tests/test_serving.py::test_infer_many_padding_deviation_bound.)
    Outputs are deterministic for a fixed (seed, bucket shape).

    With a data mesh, bucket batches are padded (by repeating the last row)
    to a multiple of the data-axis size, and the repeats are dropped.
    """
    hop = UPSAMPLE_STRIDE  # audio samples per mel frame
    if bucket_frames < 1:
      raise ValueError("bucket_frames must be >= 1")
    if max_batch is not None and max_batch < 1:
      # -1 made range() empty and returned [None]*N silently; 0 died with
      # a cryptic range() error
      raise ValueError(f"max_batch must be >= 1 or None, got {max_batch}")
    floor = float(np.log(1e-5))  # dsp/mel.py dynamic_range_compression floor

    buckets: Dict[int, List[int]] = {}
    frames = []
    for i, mel in enumerate(mels):
      f = int(np.shape(mel)[-1])
      if f < 1:
        raise ValueError(f"mel {i} has no frames")
      frames.append(f)
      padded = -(-f // bucket_frames) * bucket_frames
      buckets.setdefault(padded, []).append(i)

    data_n = (self.mesh.shape[DATA_AXIS]
              if self.mesh is not None and DATA_AXIS in self.mesh.axis_names
              else 1)
    out: List[Optional[np.ndarray]] = [None] * len(frames)
    for padded_f in sorted(buckets):
      idxs = buckets[padded_f]
      step = max_batch if max_batch is not None else len(idxs)
      for s in range(0, len(idxs), step):
        group = idxs[s:s + step]
        batch = np.full((len(group), np.shape(mels[group[0]])[0], padded_f),
                        floor, dtype=np.float32)
        for row, i in enumerate(group):
          batch[row, :, :frames[i]] = mels[i]
        pad_rows = (-len(group)) % data_n
        if pad_rows:
          batch = np.concatenate(
              [batch, np.repeat(batch[-1:], pad_rows, axis=0)], axis=0)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), padded_f)
        if s:
          # distinct noise per max_batch SUB-group: without this, row r of
          # every sub-group drew bit-identical noise to row r of the
          # first (16 stochastic variants of one mel at max_batch=8 would
          # yield only 8 unique waveforms). s=0 keeps the first group's
          # draw identical to infer_batch at the padded shape (pinned by
          # test_same_length_matches_infer_batch).
          key = jax.random.fold_in(key, s)
        true_f = jnp.asarray(
            [frames[i] for i in group] + [frames[group[-1]]] * pad_rows,
            dtype=jnp.int32)
        wav = np.asarray(self._infer_masked(
            self.params, self._put_batch(batch), jnp.float32(sigma), key,
            true_f))
        for row, i in enumerate(group):
          out[i] = wav[row, :frames[i] * hop]
    return out  # type: ignore[return-value]

  def infer_chunked(self, mel: np.ndarray, *, sigma: float = 1.0,
                    seed: int = 0, chunk_frames: int = 1024) -> np.ndarray:
    """Single utterance [n_mels, frames] -> [T] at CONSTANT activation
    memory: fixed mel windows with receptive-field halos slide over the
    utterance on one chip (exact vs one-call synthesis; see
    waveglow_tpu.inference.streaming). Use for utterances too long for
    HBM — unlike :meth:`infer_long` it needs no multi-chip mesh.
    """
    from waveglow_tpu.inference.streaming import infer_chunked
    cdt = (jnp.bfloat16 if self.hparams.compute_dtype == "bfloat16" else None)
    wav = infer_chunked(self.params, self.config,
                        jnp.asarray(mel, dtype=jnp.float32)[None],
                        sigma=sigma, rng=jax.random.PRNGKey(seed),
                        chunk_frames=chunk_frames, compute_dtype=cdt,
                        scan_flows=self.hparams.scan_flows)
    return np.asarray(wav)[0]

  def infer_long(self, mel: np.ndarray, *, sigma: float = 1.0,
                 seed: int = 0) -> np.ndarray:
    """Single long utterance [n_mels, frames] -> [T], time-sharded.

    Requires a mesh with a ``time`` axis; the mel frame axis is sharded and
    XLA exchanges conv halos over ICI. Numerics match unsharded synthesis.
    """
    mel = jnp.asarray(mel, dtype=jnp.float32)[None]
    if self.mesh is None or TIME_AXIS not in self.mesh.axis_names:
      # the docstring's contract — callers reach for infer_long precisely
      # because one chip cannot hold the utterance; a silent unsharded
      # fallback would OOM (or quietly lose the latency benefit)
      raise ValueError(
          "infer_long requires a mesh with a 'time' axis "
          "(make_time_mesh); use infer_chunked for single-chip "
          "constant-memory synthesis")
    mel = jax.device_put(
        mel, NamedSharding(self.mesh, P(None, None, TIME_AXIS)))
    with jax.set_mesh(self.mesh):
      wav = self._infer(self.params, mel, jnp.float32(sigma),
                        jax.random.PRNGKey(seed))
    return np.asarray(wav)[0]
