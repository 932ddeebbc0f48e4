"""The Synthesizer: checkpoint -> jitted mel->waveform runtime.

API contract mirrors reference synthesizer.py:31-92: construction loads the
model from a checkpoint (with hparam overrides), folds weight-norm, and
builds a zeros-mode Denoiser; ``infer(mel, sigma, denoiser_strength, seed)``
returns an InferenceResult carrying both raw and denoised waveforms, per-
phase durations and an overamplification flag.

TPU-native specifics:
  * the whole mel->wav path (noise sampling included) is one jitted XLA
    program, cached per mel length; synthesis noise comes from
    ``jax.random`` keyed by the seed (the reference reseeds all global RNGs
    per call, synthesizer.py:56) — or from explicitly injected ``noise``
    tensors for reference-RNG parity;
  * ``compute_dtype='bfloat16'`` selects the fast MXU path; default float32
    holds the allclose oracle.
"""

from __future__ import annotations

import datetime
import logging
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from waveglow_tpu.checkpointing.store import CheckpointWaveglow
from waveglow_tpu.hparams import HParams, overwrite_custom_hparams
from waveglow_tpu.inference.denoiser import Denoiser
from waveglow_tpu.dsp.mel import CLIP_VAL
from waveglow_tpu.models.waveglow import (UPSAMPLE_STRIDE, WaveGlowConfig,
                                          fuse_for_inference, infer,
                                          infer_noise_shapes)

logger = logging.getLogger(__name__)


@dataclass
class InferenceResult:
  wav: np.ndarray
  wav_denoised: np.ndarray
  sampling_rate: int
  inference_duration_s: float
  denoising_duration_s: float
  was_overamplified: bool
  timepoint: datetime.datetime


@dataclass
class ServingResult:
  """Result of the single-fetch serving path (:meth:`Synthesizer.infer_serving`).

  ``samples`` is the denoised waveform only — float32 in [-1, 1] or int16
  PCM (``pcm16=True``), already converted on-device. The raw waveform never
  leaves the device; overamplification is judged from an on-device
  max(|wav|) scalar instead.
  """
  samples: np.ndarray
  sampling_rate: int
  duration_s: float
  was_overamplified: bool
  timepoint: datetime.datetime


def _per_request(value, n: int, name: str) -> np.ndarray:
  """Broadcast a scalar (or validate a length-n sequence) to a per-request
  float32 array — sigma and denoiser strength are per-row inputs of the
  micro-batched serving programs, so heterogeneous requests co-batch."""
  arr = np.asarray(value, dtype=np.float32)
  if arr.ndim == 0:
    return np.full((n,), float(arr), dtype=np.float32)
  if arr.shape != (n,):
    raise ValueError(
        f"{name}: expected a scalar or {n} per-request values, got shape "
        f"{tuple(arr.shape)}")
  return arr


class Synthesizer:

  def __init__(self, checkpoint: CheckpointWaveglow, *,
               custom_hparams: Optional[Dict[str, str]] = None,
               compute_dtype: Optional[str] = None,
               mesh: Optional[Mesh] = None):
    """``mesh`` makes every serving program mesh-sharded (the sharded
    synthesis SERVICE of BASELINE config 5, not just the BatchSynthesizer
    library): a ``model`` axis shards the WN hidden channels Megatron-style
    (parallel/sharding.py — one psum per WN layer rides ICI), a ``data``
    axis shards micro-batch rows across chips (each chip synthesizes its
    rows independently), and a ``time`` axis shards a single utterance's
    mel frame axis (GSPMD halo exchanges for the conv overlaps). Placement
    is purely input-driven — the jitted programs are unchanged, GSPMD
    propagates from the committed param/mel shardings — so every
    single-device contract (bucket exactness, per-row seeds, hot reload)
    carries over; ``mesh=None`` is the unchanged single-device path.

    Single-controller requirement: result fetches (``np.asarray`` on the
    sharded outputs) need every mesh device addressable from THIS process
    — true for single-host multi-chip (e.g. one v4/v5e host's 4-8 chips)
    and for single-controller runtimes (Pathways); a multi-HOST mesh under
    plain multi-process jax would leave shards non-addressable. Scale the
    daemon across hosts by running one daemon per host behind a load
    balancer (docs/OPERATIONS.md) rather than one daemon over a
    multi-host mesh."""
    hparams = checkpoint.get_hparams()
    hparams = overwrite_custom_hparams(hparams, custom_hparams)
    if compute_dtype is not None:
      hparams.compute_dtype = compute_dtype

    self.hparams = hparams
    self.config = WaveGlowConfig.from_hparams(hparams)
    self.mesh = mesh
    # device-resident once at construction — passing host numpy params to a
    # jitted call would re-upload the whole model every inference
    self.params = self._put_params(fuse_for_inference(checkpoint.state_dict))
    cdt = (jnp.bfloat16 if hparams.compute_dtype == "bfloat16" else None)
    self._cdt = cdt

    # The denoiser stays float32 even in bf16 serving mode: spectral
    # subtraction is <1% of synthesis time (one STFT roundtrip), and f32
    # keeps the bias-removal output inside the reference-parity bound
    # (docs/PARITY.md, denoiser section) at no measurable cost.
    self.denoiser = Denoiser(self.params, self.config, hparams,
                             mode="zeros", compute_dtype=None)
    # device-resident bias, passed to the fused programs as a traced
    # ARGUMENT (not a closure constant) so update_params can hot-swap it
    self._bias = self._put_replicated(jnp.asarray(self.denoiser.bias_spec))
    self.iteration = checkpoint.iteration

    config = self.config
    denoiser = self.denoiser  # early-bound: reloads swap self._bias instead

    scan = hparams.scan_flows

    def _infer_keyed(params, mel, sigma, key, true_frames):
      # true_frames masking makes bucket-padded programs bit-exact vs the
      # unpadded call (a no-op when the mel is unpadded)
      wav = infer(params, config, mel, sigma=sigma, rng=key,
                  compute_dtype=cdt, scan_flows=scan,
                  true_frames=true_frames)
      return wav

    def _infer_noise(params, mel, sigma, noise):
      return infer(params, config, mel, sigma=sigma, noise=noise,
                   compute_dtype=cdt, scan_flows=scan)

    self._infer_keyed = jax.jit(_infer_keyed)
    self._infer_noise = jax.jit(_infer_noise)
    self._denoise_jit = jax.jit(lambda wav, strength, bias:
                                denoiser(wav, strength, bias))

    # Single-fetch serving programs: synthesis + denoise + on-device PCM16
    # + overamp max fused into ONE dispatch, so a request pays one program
    # launch and fetches one waveform-sized buffer instead of two full f32
    # waveforms plus separate denoise/trim dispatches (the raw waveform
    # never crosses the tunnel — measured breakdown in docs/PERFORMANCE.md,
    # serving-latency section).
    def _packed_outputs(wav, true_n):
      mask = jnp.arange(wav.shape[-1]) < true_n
      max_abs = jnp.max(jnp.abs(wav) * mask)
      return max_abs

    from waveglow_tpu.inference.streaming import pcm16_on_device as _pcm16_dev

    def _infer_packed(params, mel, sigma, key, strength, true_n, bias):
      wav = infer(params, config, mel, sigma=sigma, rng=key,
                  compute_dtype=cdt, scan_flows=scan,
                  true_frames=true_n // UPSAMPLE_STRIDE)
      max_abs = _packed_outputs(wav, true_n)
      dn = denoiser(wav, strength, bias)
      pad = wav.shape[-1] - dn.shape[-1]
      if pad > 0:  # iSTFT is frame-aligned; restore the static sample count
        dn = jnp.pad(dn, ((0, 0), (0, pad)))
      dn = dn[..., :wav.shape[-1]]
      return dn, _pcm16_dev(dn), max_abs

    def _infer_packed_raw(params, mel, sigma, key, true_n):
      wav = infer(params, config, mel, sigma=sigma, rng=key,
                  compute_dtype=cdt, scan_flows=scan,
                  true_frames=true_n // UPSAMPLE_STRIDE)
      return wav, _pcm16_dev(wav), _packed_outputs(wav, true_n)

    self._infer_packed = jax.jit(_infer_packed)
    self._infer_packed_raw = jax.jit(_infer_packed_raw)

    # Micro-batched serving programs: one fused dispatch synthesizes B
    # queued requests together. Noise is drawn PER ROW with each request's
    # own seed through the identical batch-1 derivation
    # (block_noise(key, batch=1)), so a request's waveform does not depend
    # on what it was co-batched with and matches the solo infer_serving
    # output for the same seed up to compilation-dependent rounding.
    # sigma and denoiser strength are PER-ROW [B] arrays, so requests with
    # heterogeneous parameters co-batch instead of splitting into smaller
    # dispatches: the model applies sigma as a pure linear scale on each
    # noise tensor (models/waveglow.py:417,443,451), so scaling the row's
    # noise by sigma_i and running the model at sigma=1 computes the same
    # product the solo program does; per-row strength pre-scales the bias
    # the denoiser subtracts (bias enters only as `bias * strength`).
    from waveglow_tpu.models.waveglow import block_noise

    def _row_noise(seed, sigma, n_frames):
      key = jax.random.PRNGKey(seed)
      return [sigma * z[0] for z in block_noise(key, config, 1, 0, n_frames)]

    def _batch_outputs(wav, true_ns):
      mask = jnp.arange(wav.shape[-1])[None, :] < true_ns[:, None]
      return jnp.max(jnp.abs(wav) * mask, axis=-1)  # [B]

    def _batch_noise(mel_batch, seeds, sigmas):
      return jax.vmap(
          lambda s, g: _row_noise(s, g, mel_batch.shape[-1]))(seeds, sigmas)

    def _infer_packed_many(params, mel_batch, sigmas, seeds, strengths,
                           true_ns, bias):
      noise = _batch_noise(mel_batch, seeds, sigmas)
      wav = infer(params, config, mel_batch, sigma=1.0, noise=noise,
                  compute_dtype=cdt, scan_flows=scan,
                  true_frames=true_ns // UPSAMPLE_STRIDE)
      max_abs = _batch_outputs(wav, true_ns)
      # bias [1, cutoff, 1] * strengths [B] -> per-row [B, cutoff, 1]
      dn = denoiser(wav, 1.0, bias * strengths[:, None, None])
      pad = wav.shape[-1] - dn.shape[-1]
      if pad > 0:
        dn = jnp.pad(dn, ((0, 0), (0, pad)))
      dn = dn[..., :wav.shape[-1]]
      return dn, _pcm16_dev(dn), max_abs

    def _infer_packed_many_raw(params, mel_batch, sigmas, seeds, true_ns):
      noise = _batch_noise(mel_batch, seeds, sigmas)
      wav = infer(params, config, mel_batch, sigma=1.0, noise=noise,
                  compute_dtype=cdt, scan_flows=scan,
                  true_frames=true_ns // UPSAMPLE_STRIDE)
      return wav, _pcm16_dev(wav), _batch_outputs(wav, true_ns)

    self._infer_packed_many = jax.jit(_infer_packed_many)
    self._infer_packed_many_raw = jax.jit(_infer_packed_many_raw)

  # -- mesh placement ---------------------------------------------------------

  def _put_params(self, fused):
    """Commit a fused params pytree: TP-sharded over a ``model`` axis
    (Megatron col/row WN specs), replicated otherwise."""
    if self.mesh is None:
      return jax.device_put(fused)
    from waveglow_tpu.parallel.mesh import MODEL_AXIS
    if MODEL_AXIS in self.mesh.axis_names and self.mesh.shape[MODEL_AXIS] > 1:
      from waveglow_tpu.parallel.sharding import shard_params
      return shard_params(fused, self.mesh)
    return jax.device_put(fused, NamedSharding(self.mesh, P()))

  def _put_replicated(self, x):
    if self.mesh is None:
      return jax.device_put(x)
    return jax.device_put(x, NamedSharding(self.mesh, P()))

  def _put_mel(self, mel: np.ndarray):
    """Commit a prepared [B, n_mels, F] mel: rows over the ``data`` axis
    when B divides evenly (micro-batches are powers of two, so full
    batches always shard; undersized remainders replicate — still correct,
    just less parallel), the frame axis over a ``time`` axis (GSPMD halo
    exchange), replicated otherwise. Single committed transfer either way."""
    if self.mesh is None:
      return mel
    from waveglow_tpu.parallel.mesh import DATA_AXIS, TIME_AXIS
    names = self.mesh.axis_names
    spec = P()
    if TIME_AXIS in names and self.mesh.shape[TIME_AXIS] > 1:
      spec = P(None, None, TIME_AXIS)
    elif (DATA_AXIS in names and self.mesh.shape[DATA_AXIS] > 1
          and mel.shape[0] % self.mesh.shape[DATA_AXIS] == 0):
      spec = P(DATA_AXIS)
    return jax.device_put(mel, NamedSharding(self.mesh, spec))

  def update_params(self, checkpoint: CheckpointWaveglow, *,
                    custom_hparams: Optional[Dict[str, str]] = None) -> int:
    """Hot-swap model weights WITHOUT recompiling any program.

    Every jitted program takes the params pytree (and the denoiser bias)
    as traced arguments, so swapping in a same-architecture checkpoint —
    a newly fine-tuned iteration of the serving model, say — keeps every
    compiled XLA program valid: upload the fused weights, re-capture the
    denoiser bias through the lru-cached capture program (already compiled
    for this config), and replace the device references. No counterpart in
    the reference (one Synthesizer per checkpoint, synthesizer.py:31-44);
    a production daemon can't afford minutes of recompiles per rollout.

    Checkpoints with a different architecture are rejected — the compiled
    programs' shapes would be invalid (restart to change architecture).
    Returns the new checkpoint's iteration. In-flight streams keep the
    params/bias they started with (pinned at generator start).
    """
    hparams = checkpoint.get_hparams()
    hparams = overwrite_custom_hparams(hparams, custom_hparams)
    new_config = WaveGlowConfig.from_hparams(hparams)
    if new_config != self.config:
      raise ValueError(
          f"checkpoint architecture {new_config} does not match the "
          f"serving model {self.config}; hot-swap is weights-only — "
          "restart to change architecture")
    # the flow/channel config alone doesn't pin the AUDIO contract: a
    # checkpoint trained at a different sampling rate or STFT geometry has
    # identical param shapes, so it would swap in silently — and the daemon
    # would then label served audio with the old rate and recapture the
    # denoiser bias with the old STFT. Reject those too.
    audio_fields = ("sampling_rate", "filter_length", "hop_length",
                    "win_length", "window", "mel_fmin", "mel_fmax")
    mismatched = {f: (getattr(self.hparams, f), getattr(hparams, f))
                  for f in audio_fields
                  if getattr(hparams, f) != getattr(self.hparams, f)}
    if mismatched:
      raise ValueError(
          "checkpoint audio/STFT hparams do not match the serving model "
          f"(serving vs checkpoint): {mismatched}; hot-swap is "
          "weights-only — restart to change the audio pipeline")
    fused = fuse_for_inference(checkpoint.state_dict)

    def _check(path, old, new):
      if np.shape(old) != np.shape(new):
        raise ValueError(
            f"param {jax.tree_util.keystr(path)} shape "
            f"{np.shape(new)} != serving shape {np.shape(old)}")
      return new

    # tree_map_with_path also rejects tree-structure mismatches outright
    fused = jax.tree_util.tree_map_with_path(_check, self.params, fused)
    new_params = self._put_params(fused)
    new_denoiser = Denoiser(new_params, self.config, self.hparams,
                            mode="zeros", compute_dtype=None)
    # swap order: bias+denoiser first, params last — a racing dispatch sees
    # a consistent-enough pair either way (bias only shapes the subtracted
    # floor), and after this returns every new program call uses the pair
    self.denoiser = new_denoiser
    self._bias = self._put_replicated(jnp.asarray(new_denoiser.bias_spec))
    self.params = new_params
    self.iteration = checkpoint.iteration
    logger.info("Hot-swapped weights to iteration %s", checkpoint.iteration)
    return checkpoint.iteration

  def infer(self, mel: np.ndarray, *, sigma: float = 1.0,
            denoiser_strength: float = 0.0005, seed: int = 0,
            noise: Optional[Sequence[np.ndarray]] = None,
            chunk_frames: Optional[int] = None,
            bucket_frames: Optional[int] = None) -> InferenceResult:
    """mel [n_mels, frames] (or [1, n_mels, frames]) -> InferenceResult.

    ``noise``: optional injected standard-normal tensors in the draw order
    of waveglow_tpu.models.waveglow.infer_noise_shapes (parity harnesses).
    ``chunk_frames``: synthesize in fixed mel windows of this size (plus the
    model's receptive-field halo) at constant activation memory — for
    utterances too long to fit HBM in one call (see
    waveglow_tpu.inference.streaming).
    ``bucket_frames``: pad the mel's frame count up to a multiple of this
    with the log-clamp silence floor before synthesis and trim the waveform
    back to the true sample count. Ignored when explicit ``noise`` tensors
    are injected (their shapes pin the exact unpadded draw order — parity
    harnesses need the precise program). The jitted program is cached per
    PADDED length, so a folder of N distinct-length files costs O(distinct
    buckets) XLA compiles instead of N (each full-model remote compile takes
    ~37 s over a tunneled TPU, docs/PERFORMANCE.md folder-synthesis
    section). Bucketing is EXACT end-to-end (round 4): noise is position-
    keyed per absolute mel frame, so kept samples draw the identical noise
    the unbucketed call would, and the true frame count rides into the
    program as a traced argument that zero-masks WN residual rows past it —
    the one path (the dilated convs' 'same' padding) through which pad
    frames could reach kept samples — so every kept sample matches the
    unbucketed program bit-for-bit
    (tests/test_serving.py::TestBucketExactness; the unmasked deviation
    class this removes is kept characterized in
    test_bucket_padding_deviation_bound and docs/PARITY.md).
    """
    timepoint = datetime.datetime.now()
    # composes with chunk_frames: the chunked window program is also traced
    # against the full mel's (padded) shape, so bucketing bounds its
    # compile count the same way
    mel, true_samples = self._prepare_mel(
        mel, bucket_frames if noise is None else None)
    mel = self._put_mel(mel)

    sigma_arr = jnp.float32(sigma)
    start = time.perf_counter()
    if noise is not None:
      wav = self._infer_noise(self.params, mel, sigma_arr,
                              [jnp.asarray(n) for n in noise])
    elif chunk_frames is not None:
      from waveglow_tpu.inference.streaming import infer_chunked
      tf = true_samples // UPSAMPLE_STRIDE
      wav = infer_chunked(self.params, self.config, mel, sigma=sigma,
                          rng=jax.random.PRNGKey(seed),
                          chunk_frames=chunk_frames, compute_dtype=self._cdt,
                          scan_flows=self.hparams.scan_flows,
                          true_frames=(tf if mel.shape[-1] != tf else None))
    else:
      wav = self._infer_keyed(self.params, mel, sigma_arr,
                              jax.random.PRNGKey(seed),
                              jnp.int32(true_samples // UPSAMPLE_STRIDE))
    wav.block_until_ready()
    inference_duration_s = time.perf_counter() - start

    # The denoiser runs on the still-padded waveform (its STFT roundtrip is
    # also an XLA program cached per length); both outputs are trimmed to the
    # true sample count afterwards.
    denoising_duration_s = 0.0
    wav_denoised = wav
    if denoiser_strength > 0:
      start_dn = time.perf_counter()
      wav_denoised = self._denoise_jit(wav, jnp.float32(denoiser_strength),
                                       self._bias)
      wav_denoised.block_until_ready()
      denoising_duration_s = time.perf_counter() - start_dn

    if wav.shape[-1] > true_samples:
      wav = wav[..., :true_samples]
      wav_denoised = wav_denoised[..., :true_samples]

    wav_np = np.asarray(wav).squeeze()
    wav_denoised_np = np.asarray(wav_denoised).squeeze()
    return self._result(wav_np, wav_denoised_np, inference_duration_s,
                        denoising_duration_s, timepoint)

  def _prepare_mel(self, mel, bucket_frames: Optional[int]):
    """Validate to [1, n_mels, frames]; bucket-pad with the log-clamp
    silence floor. Returns (mel, true_samples before padding).

    Pure numpy on purpose: over a tunneled TPU every eager device op costs
    a ~30 ms round trip, so preparing on host and letting the jitted call
    move the finished mel in ONE transfer is materially cheaper than the
    old jnp.asarray + jnp.pad pair (one upload + one device pad program per
    request — the dominant non-device cost in the micro-batched serving
    path, where a batch of B paid B uploads before one fused dispatch)."""
    mel = np.asarray(mel, dtype=np.float32)
    if mel.ndim == 2:
      mel = mel[None]
    if mel.ndim != 3 or mel.shape[1] != self.config.n_mel_channels:
      raise ValueError(
          f"expected mel of shape [{self.config.n_mel_channels}, frames] "
          f"(or [1, {self.config.n_mel_channels}, frames]), got "
          f"{tuple(np.shape(mel))}")
    frames = mel.shape[-1]
    true_samples = frames * UPSAMPLE_STRIDE
    if bucket_frames is not None and bucket_frames > 0:
      padded = -(-frames // bucket_frames) * bucket_frames
      if padded != frames:
        mel = np.pad(mel, ((0, 0), (0, 0), (0, padded - frames)),
                     constant_values=float(np.log(CLIP_VAL)))
    return mel, true_samples

  def infer_serving(self, mel: np.ndarray, *, sigma: float = 1.0,
                    denoiser_strength: float = 0.0005, seed: int = 0,
                    bucket_frames: Optional[int] = 64,
                    pcm16: bool = False) -> ServingResult:
    """Latency-lean mel -> denoised waveform for the serving daemon.

    One fused XLA program (synthesis + denoise + on-device PCM16 conversion
    + masked max(|wav|) for the overamp flag) and ONE device->host array
    fetch — the f32 OR int16 denoised waveform, whichever the caller needs.
    Over a tunneled TPU this is the difference between ~460 ms and ~<150 ms
    per 9.6 s request (docs/PERFORMANCE.md, serving-latency section): the
    separate-dispatch :meth:`infer` fetches both full f32 waveforms and
    launches denoise + trim programs individually. Programs are cached per
    padded (bucketed) mel length; the padded tail is trimmed on the host
    after the fetch so no per-length device programs exist at all.

    Output contract: ``samples`` equals :meth:`infer`'s ``wav_denoised``
    (same bucketing semantics) — int16 mode additionally applies
    ``convert_wav(clip(wav), int16)`` on-device
    (tests/test_serving.py::TestInferServing pins both).
    """
    return self.serving_finalize(self.serving_dispatch(
        mel, sigma=sigma, denoiser_strength=denoiser_strength, seed=seed,
        bucket_frames=bucket_frames, pcm16=pcm16))

  def serving_dispatch(self, mel: np.ndarray, *, sigma: float = 1.0,
                       denoiser_strength: float = 0.0005, seed: int = 0,
                       bucket_frames: Optional[int] = 64,
                       pcm16: bool = False):
    """Asynchronously dispatch one :meth:`infer_serving` program; fetch
    nothing. Returns an opaque record for :meth:`serving_finalize` —
    the same submit/fetch split as :meth:`serving_many_dispatch`, kept
    separate so solo requests retain the exact batch-1 program (the
    micro-batcher's bit-for-bit solo contract) while its dispatcher
    thread still hands the device->host fetch to the finisher."""
    timepoint = datetime.datetime.now()
    mel, true_samples = self._prepare_mel(mel, bucket_frames)
    mel = self._put_mel(mel)
    start = time.perf_counter()
    key = jax.random.PRNGKey(seed)
    if denoiser_strength > 0:
      dn, pcm, max_abs = self._infer_packed(
          self.params, mel, jnp.float32(sigma), key,
          jnp.float32(denoiser_strength), jnp.int32(true_samples),
          self._bias)
    else:
      dn, pcm, max_abs = self._infer_packed_raw(
          self.params, mel, jnp.float32(sigma), key, jnp.int32(true_samples))
    return (pcm if pcm16 else dn, max_abs, true_samples, start, timepoint)

  def serving_finalize(self, dispatched) -> "ServingResult":
    """Fetch a :meth:`serving_dispatch` record into a ServingResult."""
    samples_dev, max_abs_dev, true_samples, start, timepoint = dispatched
    samples = np.asarray(samples_dev)[0, :true_samples]
    was_overamplified = bool(np.asarray(max_abs_dev) > 1.0)
    duration_s = time.perf_counter() - start
    return ServingResult(
        samples=samples, sampling_rate=self.hparams.sampling_rate,
        duration_s=duration_s, was_overamplified=was_overamplified,
        timepoint=timepoint)

  def infer_serving_many(self, mels: Sequence[np.ndarray], *,
                         sigma=1.0,
                         denoiser_strength=0.0005,
                         seeds: Optional[Sequence[int]] = None,
                         bucket_frames: Optional[int] = 64,
                         pcm16: bool = False,
                         max_batch: int = 8) -> List["ServingResult"]:
    """Micro-batched :meth:`infer_serving`: N requests, few fused dispatches.

    ``sigma`` and ``denoiser_strength`` accept a scalar or one value PER
    REQUEST — they enter the fused programs as per-row [B] inputs (noise
    is scaled per row; the denoiser bias is pre-scaled per row), so
    heterogeneous-parameter traffic co-batches instead of splitting. Only
    ``denoiser_strength == 0`` rows dispatch separately: they keep the
    exact raw program rather than a strength-0 STFT roundtrip.

    Requests are grouped into length buckets (mel frames rounded up to
    ``bucket_frames``), each bucket split into power-of-two sub-batches
    (binary decomposition, largest first — a 5-request group dispatches as
    4+1, never as a padded 8) and synthesized as O(log) fused programs — so
    a burst of concurrent traffic costs O(buckets * log max_batch) device
    dispatches at full MXU batch parallelism with ZERO padded batch rows,
    instead of N serialized batch-1 calls. Compile count is bounded by
    distinct (bucket, pow2-batch<=max_batch) pairs.

    Per-request determinism: row i draws its noise from ``seeds[i]``
    through the exact batch-1 derivation, so each result is independent of
    its co-batched neighbors and matches ``infer_serving(mel_i,
    seed=seeds[i])`` up to compilation-dependent float rounding
    (tests/test_serving.py pins the bound).
    """
    return self.serving_many_finalize(
        self.serving_many_dispatch(mels, sigma=sigma,
                                   denoiser_strength=denoiser_strength,
                                   seeds=seeds, bucket_frames=bucket_frames,
                                   pcm16=pcm16, max_batch=max_batch))

  def serving_many_dispatch(self, mels: Sequence[np.ndarray], *,
                            sigma=1.0,
                            denoiser_strength=0.0005,
                            seeds: Optional[Sequence[int]] = None,
                            bucket_frames: Optional[int] = 64,
                            pcm16: bool = False, max_batch: int = 8):
    """Asynchronously dispatch the micro-batch programs; fetch nothing.

    Returns an opaque pending record for :meth:`serving_many_finalize`.
    Split so a serving loop can release its device-serialization lock right
    after dispatch — jax execution is async and programs queue in order on
    the device stream, so fetching THIS batch's waveforms then overlaps the
    NEXT batch's device time (measured ~25% aggregate throughput win over
    the tunneled link, benchmarks/server_microbatch_tpu.json).
    """
    timepoint = datetime.datetime.now()
    n = len(mels)
    if seeds is None:
      seeds = [0] * n
    if len(seeds) != n:
      raise ValueError(f"{n} mels but {len(seeds)} seeds")
    if max_batch < 1:
      raise ValueError("max_batch must be >= 1")
    sigmas = _per_request(sigma, n, "sigma")
    strengths = _per_request(denoiser_strength, n, "denoiser_strength")
    prepared = [self._prepare_mel(m, bucket_frames) for m in mels]

    # heterogeneous sigma/strength co-batch (they are per-row program
    # inputs); only raw (strength==0) rows split off — they must keep the
    # exact no-denoise program, not a strength-0 STFT roundtrip
    groups: Dict[tuple, List[int]] = {}
    for i, (mel, _) in enumerate(prepared):
      groups.setdefault((mel.shape[-1], bool(strengths[i] > 0)), []).append(i)

    start = time.perf_counter()
    pending = []
    for padded_f, denoise in sorted(groups):
      idxs = groups[(padded_f, denoise)]
      pos = 0
      while pos < len(idxs):
        # binary decomposition: split the group into power-of-two
        # sub-batches (largest first), so every dispatched row is a real
        # request. Padding to the NEXT power of two instead (the round-4
        # first cut) repeated rows the device synthesized and the host
        # dropped — a 5-request group paid batch-8 device time (+60%
        # wasted rows); 4+1 reuses the same O(log max_batch) compiled
        # programs with zero waste, and the small sub-batch finalizes
        # (and answers its callers) earlier.
        b = 1
        while b * 2 <= min(len(idxs) - pos, max_batch):
          b *= 2
        rows = idxs[pos:pos + b]
        pos += b
        if b == 1:
          # size-1 remainder: the SOLO batch-1 program (_infer_packed) —
          # always compiled already, since all solo traffic and warmups go
          # through it; the batch-1 shape of _infer_packed_many is a
          # DISTINCT jit whose first compile (~37 s on a tunneled TPU,
          # docs/PERFORMANCE.md) would otherwise land inside a dispatch.
          # block_noise(key, batch=1) is the solo derivation, so outputs
          # are identical either way.
          i = rows[0]
          key = jax.random.PRNGKey(seeds[i])
          true_n = jnp.int32(prepared[i][1])
          solo_mel = self._put_mel(prepared[i][0])
          if denoise:
            dn, pcm, max_abs = self._infer_packed(
                self.params, solo_mel, jnp.float32(sigmas[i]), key,
                jnp.float32(strengths[i]), true_n, self._bias)
          else:
            dn, pcm, max_abs = self._infer_packed_raw(
                self.params, solo_mel, jnp.float32(sigmas[i]), key,
                true_n)
          pending.append((rows, pcm if pcm16 else dn,
                          jnp.reshape(max_abs, (1,))))
          continue
        # host-side stack: the whole batch crosses the tunnel as ONE
        # transfer inside the jitted call below, instead of one ~30 ms
        # upload per request plus a device concat (_prepare_mel docstring);
        # with a data mesh the rows commit sharded across chips here
        mel_batch = self._put_mel(
            np.concatenate([prepared[i][0] for i in rows], axis=0))
        seed_arr = np.asarray([seeds[i] for i in rows], dtype=np.uint32)
        true_arr = np.asarray([prepared[i][1] for i in rows],
                              dtype=np.int32)
        sig_arr = sigmas[rows]
        if denoise:
          dn, pcm, max_abs = self._infer_packed_many(
              self.params, mel_batch, sig_arr, seed_arr,
              strengths[rows], true_arr, self._bias)
        else:
          dn, pcm, max_abs = self._infer_packed_many_raw(
              self.params, mel_batch, sig_arr, seed_arr, true_arr)
        pending.append((rows, pcm if pcm16 else dn, max_abs))
    return (pending, prepared, n, start, timepoint)

  def serving_many_finalize(self, dispatched) -> List["ServingResult"]:
    """Fetch a :meth:`serving_many_dispatch` record into ServingResults."""
    pending, prepared, n, start, timepoint = dispatched
    out: List[Optional[ServingResult]] = [None] * n
    for chunk, samples_dev, max_abs_dev in pending:
      samples = np.asarray(samples_dev)
      max_abs = np.asarray(max_abs_dev)
      duration_s = time.perf_counter() - start
      for row, i in enumerate(chunk):
        out[i] = ServingResult(
            samples=samples[row, :prepared[i][1]],
            sampling_rate=self.hparams.sampling_rate,
            duration_s=duration_s,
            was_overamplified=bool(max_abs[row] > 1.0),
            timepoint=timepoint)
    return out  # type: ignore[return-value]

  def stream(self, mel: np.ndarray, *, sigma: float = 1.0, seed: int = 0,
             chunk_frames: int = 256, pcm16: bool = False,
             denoiser_strength: float = 0.0):
    """Yield ``(start_sample, wav_piece)`` numpy pairs as synthesis
    progresses — playback can begin after the first chunk instead of the
    whole utterance. ``pcm16=True`` converts to int16 PCM inside the
    window program (half the device->host bytes per piece). See
    waveglow_tpu.inference.streaming.stream_chunks.

    ``denoiser_strength > 0`` applies the reference's spectral-subtraction
    bias removal (reference synthesizer.py:63-66) incrementally: raw
    synthesis chunks feed a windowed overlap-correct denoiser
    (waveglow_tpu.inference.stream_denoise) whose emitted pieces
    reassemble to :meth:`infer`'s ``wav_denoised`` (the denoised stream
    lags the raw one by < filter_length samples, ~46 ms; its total length
    is the iSTFT's frame-aligned truncation of the raw length). Without
    denoising, pieces reassemble to the chunked path's output exactly.
    """
    from waveglow_tpu.inference.streaming import stream_chunks
    mel = jnp.asarray(mel, dtype=jnp.float32)
    if mel.ndim == 2:
      mel = mel[None]
    denoise = denoiser_strength is not None and denoiser_strength > 0
    gen = stream_chunks(
        self.params, self.config, mel, sigma=sigma,
        rng=jax.random.PRNGKey(seed), chunk_frames=chunk_frames,
        compute_dtype=self._cdt, scan_flows=self.hparams.scan_flows,
        pcm16=pcm16 and not denoise)
    if not denoise:
      for start, piece in gen:
        yield start, np.asarray(piece)[0]
      return

    from waveglow_tpu.inference.stream_denoise import StreamingDenoiser
    stft = self.denoiser.stft
    edge = stft.filter_length - stft.hop_length
    # one denoise block per synthesis chunk: block k becomes computable the
    # moment raw piece k arrives, so denoising never delays the first-audio
    # latency by more than one small window program. Block 0's window is
    # left-clamped to position 0 and needs E + 2*edge - half raw samples,
    # the binding constraint: E = piece - 2*edge + half (every later block
    # then needs (k+1)E + edge <= (k+1)*piece).
    block = max(stft.hop_length,
                (chunk_frames * UPSAMPLE_STRIDE - 2 * edge
                 + stft.filter_length // 2)
                // stft.hop_length * stft.hop_length)
    sd = StreamingDenoiser(self.denoiser, denoiser_strength,
                           block_samples=block, pcm16=pcm16)
    for _, piece in gen:
      for out_start, out in sd.push(np.asarray(piece)[0]):
        yield out_start, out
    for out_start, out in sd.flush():
      yield out_start, out

  def _result(self, wav_np, wav_denoised_np, inference_duration_s,
              denoising_duration_s, timepoint) -> InferenceResult:

    was_overamplified = bool(np.abs(wav_np).max() > 1.0)
    if was_overamplified:
      logger.debug("Waveglow output was overamplified.")

    return InferenceResult(
        wav=wav_np, wav_denoised=wav_denoised_np,
        sampling_rate=self.hparams.sampling_rate,
        inference_duration_s=inference_duration_s,
        denoising_duration_s=denoising_duration_s,
        was_overamplified=was_overamplified, timepoint=timepoint)
