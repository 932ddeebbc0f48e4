"""HTTP serving daemon: production mel->wav synthesis over the network.

The reference is batch-CLI only (reference inference_v2.py walks a folder);
a production vocoder is usually deployed as a long-lived service so the
~320 MB of parameters upload once and every XLA program compiles once. This
daemon wraps :class:`waveglow_tpu.inference.synthesizer.Synthesizer` with the
TPU-serving defaults already measured in docs/PERFORMANCE.md:

  * params stay device-resident across requests (Synthesizer construction);
  * request mels are length-bucketed (``bucket_frames``) so arbitrary-length
    traffic costs O(distinct buckets) compiles, not O(distinct lengths);
  * an optional ``chunk_frames`` bounds activation memory for unbounded
    utterance lengths (waveglow_tpu.inference.streaming);
  * each request is ONE fused XLA program and ONE device->host fetch
    (Synthesizer.infer_serving): synthesis + denoise + on-device int16 PCM
    + the overamp max run fused, and only the denoised waveform — in the
    representation the response format needs — crosses the tunnel;
  * one lock serializes device work — programs never interleave on the chip;
    threads only overlap IO;
  * concurrent /synthesize traffic MICRO-BATCHES: requests that arrive while
    the device is busy are drained as a group, bucketed by length, and
    dispatched through power-of-two fused batched programs (binary
    decomposition up to ``max_batch``, default 8) at full MXU batch
    parallelism with zero padded rows — solo requests still dispatch
    immediately through the exact batch-1 program with zero added latency;
  * ADMISSION CONTROL sheds excess load on BOTH axes: past ``max_queue``
    in-flight requests (default 64) new ones get an immediate HTTP 503 +
    Retry-After instead of unbounded queueing, and a single mel over
    ``max_frames`` frames (default 8192, ~95 s of audio) gets HTTP 413
    instead of one unbounded device program; /stats reports request-latency
    percentiles (p50/p95/p99), in-flight depth, and the rejected count.

The daemon also serves MESH-SHARDED (multi-chip) models — the sharded
synthesis service of BASELINE config 5: ``serve --mesh-data/--mesh-model/
--mesh-time`` (see SynthesisService.__init__ and docs/OPERATIONS.md).

Endpoints (JSON errors, application/json):

  GET  /healthz               -> {"status": "ok", model/config/mesh summary}
  GET  /stats                 -> counters, latency percentiles, per-stage
                              decomposition (stages_ms), in-flight
  GET  /metrics               -> the same in Prometheus text format
  POST /reload                body: JSON {"checkpoint": "<daemon-side
                              path>"}; zero-recompile weight hot-swap
                              (same architecture only; torch-format
                              checkpoints need --allow-torch-reload)
  POST /synthesize            body: .npy mel [n_mels, frames] (float32)
  POST /synthesize-wav        body: .wav file (copy synthesis)
  POST /stream                body: .npy mel; response: PCM16 chunks
                              written as they leave the device (first-audio
                              latency ~36 ms on a v5e instead of the whole
                              utterance), denoised incrementally by default
                              (denoiser_strength=0 streams raw)

Query params for the POST endpoints: ``sigma`` (default 1.0),
``denoiser_strength`` (default 0.0005), ``seed`` (default 0), and
``format=wav|npy`` (synthesize* only; wav = int16 RIFF, npy = float32
samples). Responses carry ``X-Sampling-Rate`` and ``X-Audio-Seconds``.
Request mels over ``max_frames`` are rejected with HTTP 413 (size-axis
admission control, RequestTooLargeError).

Run it: ``waveglow-tpu serve CHECKPOINT --port 8642`` (cli/serve_cmd.py).
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

logger = logging.getLogger(__name__)

MAX_BODY_BYTES = 256 * 1024 * 1024


class ServerOverloadedError(RuntimeError):
  """Raised when admission control rejects a request (handler -> 503).

  The round-3 daemon had no load-shedding policy: unbounded traffic queued
  without limit, so every client's latency grew without bound and none got
  an actionable signal. Production serving sheds instead — a bounded
  in-flight admission count (``max_queue``) turns excess load into an
  immediate 503 + Retry-After, which well-behaved callers back off on.
  """


class RequestTooLargeError(ValueError):
  """Raised when a request mel exceeds ``max_frames`` (handler -> 413).

  ``max_queue`` bounds how MANY requests are admitted but not how BIG one
  is: MAX_BODY_BYTES (256 MB) alone admits a single ~840k-frame mel, which
  on the non-chunked path is one fused program over ~2.7 hours of audio —
  an HBM OOM or a multi-minute stall under the device lock from one
  request. ``max_frames`` completes admission control on the size axis;
  operators serving legitimately long inputs raise it together with
  ``chunk_frames`` (constant-memory windows) so admitted work stays
  bounded per device dispatch.
  """


class _BatchRequest:
  """One queued synthesis request awaiting micro-batch dispatch.

  The t_* marks decompose a request's service time into the stages /stats
  reports (``stages_ms``): queue wait (enqueue -> its batch is taken),
  submit (host prep + program submission under the device lock), and
  device+fetch (async execution + the device->host transfer, which are
  indistinguishable from the host without a profiler)."""

  __slots__ = ("mel", "sigma", "strength", "seed", "pcm16", "done",
               "result", "error", "t_enqueue", "t_taken", "t_submitted",
               "t_done")

  def __init__(self, mel, sigma, strength, seed, pcm16):
    self.mel = mel
    self.sigma = sigma
    self.strength = strength
    self.seed = seed
    self.pcm16 = pcm16
    self.done = threading.Event()
    self.result = None
    self.error = None
    self.t_enqueue = time.perf_counter()
    self.t_taken = None
    self.t_submitted = None
    self.t_done = None


class _MicroBatcher:
  """Groups concurrent requests into batched device dispatches.

  The round-3 daemon serialized device work per request: under concurrent
  load a chip delivered batch-1 throughput (~98 ms/request) instead of the
  batched rate it benches at. This layer fixes that with the classic
  dynamic-batching loop: a dispatcher thread takes the oldest queued
  request, waits up to ``batch_window_ms`` for companions (so simultaneous
  arrivals group even when the device is idle; a batch also builds up
  naturally while the device is busy with the previous dispatch), drains
  the rest of the queue, groups by (bucket length, raw-vs-denoised,
  pcm16) — sigma and strength are per-row program inputs, so
  heterogeneous-parameter requests co-batch —
  and runs each group through the fused batched program
  (Synthesizer.infer_serving_many). Size-1 groups take the exact batch-1
  path, so solo traffic keeps its bit-for-bit serving contract at
  ``batch_window_ms`` added latency (~5 ms against a ~100 ms request;
  0 disables the wait — only busy-device accumulation batches then).
  """

  def __init__(self, service: "SynthesisService", max_batch: int,
               batch_window_ms: float = 5.0):
    self._service = service
    self._max_batch = max_batch
    self._window_s = max(0.0, batch_window_ms) / 1e3
    self._q: "queue.SimpleQueue[Optional[_BatchRequest]]" = queue.SimpleQueue()
    self._finish_q: "queue.SimpleQueue" = queue.SimpleQueue()
    self._started = False
    self._start_lock = threading.Lock()

  def submit(self, mel, sigma, strength, seed, pcm16):
    """Enqueue one request and block until its result is ready."""
    with self._start_lock:
      if not self._started:
        threading.Thread(target=self._loop, daemon=True,
                         name="waveglow-microbatch").start()
        threading.Thread(target=self._finish_loop, daemon=True,
                         name="waveglow-microbatch-finish").start()
        self._started = True
    req = _BatchRequest(mel, sigma, strength, seed, pcm16)
    self._q.put(req)
    req.done.wait()
    if req.t_done is not None:  # error paths may leave marks unset
      self._service._record_stages(
          queue_wait=(req.t_taken - req.t_enqueue) * 1e3,
          submit=(req.t_submitted - req.t_taken) * 1e3,
          device_fetch=(req.t_done - req.t_submitted) * 1e3)
    if req.error is not None:
      raise req.error
    return req.result

  def close(self):
    if self._started:
      self._q.put(None)

  def _loop(self):
    while True:
      first = self._q.get()
      if first is None:
        self._finish_q.put(None)
        return
      batch = [first]
      # rolling window: every arrival extends the deadline by window_s (a
      # straggler re-request from a just-answered client still joins), with
      # a hard cap of 4 windows from the first arrival so latency stays
      # bounded; a full drain (4*max_batch) dispatches immediately
      t0 = time.monotonic()
      deadline = t0 + self._window_s
      cap = t0 + 4 * self._window_s
      while len(batch) < 4 * self._max_batch:
        try:
          remaining = min(deadline, cap) - time.monotonic()
          nxt = (self._q.get(timeout=remaining) if remaining > 0
                 else self._q.get_nowait())
        except queue.Empty:
          break
        if nxt is None:
          self._dispatch(batch)
          self._finish_q.put(None)
          return
        batch.append(nxt)
        deadline = time.monotonic() + self._window_s
      self._dispatch(batch)

  def _finish_loop(self):
    """Fetch dispatched batches and fan results out, OFF the dispatcher
    thread — the dispatcher moves on to submit the next batch while this
    thread blocks on the previous one's device->host transfer, keeping the
    device stream fed."""
    while True:
      item = self._finish_q.get()
      if item is None:
        return
      dispatched, reqs, many = item
      try:
        if many:
          results = self._service.synth.serving_many_finalize(dispatched)
          for r, res in zip(reqs, results):
            r.result = res
        else:
          reqs[0].result = self._service.synth.serving_finalize(dispatched)
        now = time.perf_counter()
        for r in reqs:
          r.t_done = now
      except Exception as e:  # noqa: BLE001
        for r in reqs:
          r.error = e
      finally:
        for r in reqs:
          r.done.set()

  def _bucket(self, frames: int) -> int:
    b = self._service.bucket_frames
    return -(-frames // b) * b if b else frames

  def _dispatch(self, batch: List[_BatchRequest]):
    # sigma and strength are per-row inputs of the fused batched programs
    # (Synthesizer.infer_serving_many), so heterogeneous-parameter requests
    # co-batch; only the raw/denoised program split (strength == 0) and the
    # response representation (pcm16 — it selects WHICH device buffer the
    # finisher fetches) partition the group. The pcm16 partition is a
    # deliberate trade-off: same-bucket wav- and npy-format requests never
    # co-batch, so under mixed-format traffic the per-dispatch batch size
    # halves. Co-batching them would mean fetching BOTH full batch buffers
    # (f32 + int16 waveforms, 1.5x the device->host bytes — the dominant
    # serving cost over a tunneled link) or per-row gather programs; real
    # deployments serve one format, so the split costs nothing there.
    now = time.perf_counter()
    for req in batch:
      req.t_taken = now
    groups: Dict[tuple, List[_BatchRequest]] = {}
    for req in batch:
      key = (self._bucket(req.mel.shape[-1]), req.strength > 0, req.pcm16)
      groups.setdefault(key, []).append(req)
    for (_, _, pcm16), reqs in groups.items():
      if len(reqs) > 1:
        with self._service._stats_lock:
          self._service.stats["batches"] += 1
          self._service.stats["batched_requests"] += len(reqs)
      # hold the lock only for program SUBMISSION — execution is async
      # and queues in order on the device stream; the finisher thread
      # fetches, so the dispatcher can submit the NEXT batch (solo or
      # grouped) while this one's waveforms cross the link. Solo requests
      # keep the exact batch-1 program (serving_dispatch).
      try:
        with self._service._device_lock:
          if len(reqs) == 1:
            dispatched = self._service.synth.serving_dispatch(
                reqs[0].mel, sigma=reqs[0].sigma,
                denoiser_strength=reqs[0].strength, seed=reqs[0].seed,
                bucket_frames=self._service.bucket_frames or None,
                pcm16=pcm16)
          else:
            dispatched = self._service.synth.serving_many_dispatch(
                [r.mel for r in reqs], sigma=[r.sigma for r in reqs],
                denoiser_strength=[r.strength for r in reqs],
                seeds=[r.seed for r in reqs],
                bucket_frames=self._service.bucket_frames or None,
                pcm16=pcm16, max_batch=self._max_batch)
      except Exception as e:  # noqa: BLE001 — fan the failure out per request
        for r in reqs:
          r.error = e
          r.done.set()
        continue
      submitted = time.perf_counter()
      for r in reqs:
        r.t_submitted = submitted
      self._finish_q.put((dispatched, reqs, len(reqs) > 1))


class SynthesisService:
  """Transport-agnostic serving core around one device-resident model."""

  def __init__(self, checkpoint, *, custom_hparams: Optional[Dict] = None,
               bucket_frames: int = 64, chunk_frames: Optional[int] = None,
               sigma: float = 1.0, denoiser_strength: float = 0.0005,
               max_batch: int = 8, batch_window_ms: float = 5.0,
               max_queue: int = 64, max_frames: int = 8192,
               allow_torch_reload: bool = False, mesh=None):
    """``mesh`` (a jax.sharding.Mesh) makes this a SHARDED synthesis
    service — BASELINE config 5 as a runnable daemon, not just a library:
    a ``model`` axis tensor-shards the WN stacks across chips (per-layer
    psums over ICI), a ``data`` axis spreads micro-batched request rows so
    each chip synthesizes its slice, a ``time`` axis shards single long
    utterances along the mel frame axis. The HTTP surface, micro-batcher,
    admission control and hot reload are unchanged — sharding is purely
    placement-driven inside the Synthesizer (see Synthesizer.__init__)."""
    from waveglow_tpu.dsp.mel import MelSTFT
    from waveglow_tpu.inference.synthesizer import Synthesizer

    self.synth = Synthesizer(checkpoint, custom_hparams=custom_hparams,
                             mesh=mesh)
    # kept for /reload: update_params must apply the SAME serve-time
    # overrides, or a daemon started with config-affecting custom hparams
    # would spuriously reject every hot-swap as an architecture mismatch
    self.custom_hparams = custom_hparams
    self.mel_op = MelSTFT(self.synth.hparams)
    self.bucket_frames = bucket_frames
    self.chunk_frames = chunk_frames
    self.default_sigma = sigma
    self.default_denoiser_strength = denoiser_strength
    # one chip, one program at a time: serialize device work so concurrent
    # requests queue (threads still overlap request parsing / response IO)
    self._device_lock = threading.Lock()
    self._stats_lock = threading.Lock()
    # concurrent /synthesize traffic batches onto the device instead of
    # queueing one-by-one behind the lock (max_batch=1 disables)
    self.max_batch = max_batch
    self._batcher = (_MicroBatcher(self, max_batch, batch_window_ms)
                     if max_batch > 1 and not chunk_frames else None)
    # admission control: at most max_queue synthesis requests in flight
    # (queued + executing, streams included); excess load is rejected with
    # ServerOverloadedError (HTTP 503) instead of queueing unboundedly.
    # 0 disables shedding.
    self.max_queue = max_queue
    # size-axis admission: a single mel over max_frames frames is rejected
    # with RequestTooLargeError (HTTP 413). 0 disables. Default 8192 frames
    # = ~95 s of audio per request at the reference hop.
    self.max_frames = max_frames
    # /reload reaches torch.load (arbitrary pickle) for torch-format
    # checkpoints; off by default — opt in only on trusted networks
    self.allow_torch_reload = allow_torch_reload
    self._inflight = 0
    self._inflight_lock = threading.Lock()
    self._draining = False  # graceful shutdown: reject new, finish current
    # per-request wall latencies (seconds): a trimmed window for /stats
    # percentiles plus CUMULATIVE sum/count for the Prometheus summary
    # (_sum/_count must be monotonic counters — a scraper rates them)
    self._latencies: List[float] = []
    self._latency_cap = 1024
    self._latency_total_n = 0
    self._latency_total_sum = 0.0
    # per-stage latency decomposition (ms), trimmed windows like
    # _latencies: transport stages (read/parse/serialize) recorded by the
    # HTTP handler, service stages (queue_wait/submit/device_fetch) by the
    # micro-batcher — /stats exposes them as "stages_ms" so the serving
    # ceiling decomposes under REAL load, not only in offline harnesses
    self._stages: Dict[str, List[float]] = {}
    self.started = time.time()
    self.stats = {"requests": 0, "errors": 0, "audio_seconds": 0.0,
                  "batched_requests": 0, "batches": 0, "rejected": 0,
                  "reloads": 0}

  # -- admission control -----------------------------------------------------

  def _admit(self):
    """Count one request in; raise ServerOverloadedError past max_queue."""
    with self._inflight_lock:
      self._reject_if_saturated()
      self._inflight += 1

  def check_capacity(self):
    """Early shed point for transports: raise ServerOverloadedError while
    the daemon is saturated, BEFORE the caller buffers a request body (up
    to 256 MB) it would only throw away. Advisory — _admit() still
    enforces at dispatch, and a request passing both points is rejected at
    most once (the raise happens at whichever check it fails first)."""
    with self._inflight_lock:
      self._reject_if_saturated()

  def _reject_if_saturated(self):
    # caller holds _inflight_lock
    if self._draining:
      with self._stats_lock:
        self.stats["rejected"] += 1
      raise ServerOverloadedError("daemon is draining for shutdown")
    if self.max_queue and self._inflight >= self.max_queue:
      with self._stats_lock:
        self.stats["rejected"] += 1
      raise ServerOverloadedError(
          f"{self._inflight} requests in flight (max_queue="
          f"{self.max_queue}); retry later")

  def begin_drain(self) -> None:
    """Stop admitting new synthesis work (503s) while in-flight requests
    finish — the graceful half of a SIGTERM shutdown."""
    with self._inflight_lock:
      self._draining = True

  def in_flight(self) -> int:
    with self._inflight_lock:
      return self._inflight

  def _release(self):
    with self._inflight_lock:
      self._inflight -= 1

  # -- core operations ------------------------------------------------------

  def synthesize_mel(self, mel: np.ndarray, *, sigma: Optional[float] = None,
                     denoiser_strength: Optional[float] = None,
                     seed: int = 0):
    mel = self._check_mel(mel)
    self._admit()
    try:
      return self._synthesize_mel_admitted(mel, sigma, denoiser_strength,
                                           seed)
    finally:
      self._release()

  def _synthesize_mel_admitted(self, mel, sigma, denoiser_strength, seed):
    t0 = time.perf_counter()
    with self._device_lock:
      result = self.synth.infer(
          mel,
          sigma=self.default_sigma if sigma is None else sigma,
          denoiser_strength=(self.default_denoiser_strength
                             if denoiser_strength is None
                             else denoiser_strength),
          seed=seed, bucket_frames=self.bucket_frames or None,
          chunk_frames=self.chunk_frames)
    self._count(result.wav.shape[0] / self.sampling_rate,
                time.perf_counter() - t0)
    return result

  def synthesize_mel_packed(self, mel: np.ndarray, *,
                            sigma: Optional[float] = None,
                            denoiser_strength: Optional[float] = None,
                            seed: int = 0, pcm16: bool = False):
    """Single-fetch request path (Synthesizer.infer_serving): one fused XLA
    program, one device->host transfer of exactly the representation the
    response needs (int16 PCM for format=wav, float32 for format=npy)."""
    mel = self._check_mel(mel)
    sigma = self.default_sigma if sigma is None else sigma
    strength = (self.default_denoiser_strength if denoiser_strength is None
                else denoiser_strength)
    self._admit()
    try:
      return self._synthesize_packed_admitted(mel, sigma, strength, seed,
                                              pcm16)
    finally:
      self._release()

  def _synthesize_packed_admitted(self, mel, sigma, strength, seed, pcm16):
    t0 = time.perf_counter()
    if self._batcher is not None:
      out = self._batcher.submit(mel, sigma, strength, seed, pcm16)
      self._count(out.samples.shape[0] / self.sampling_rate,
                  time.perf_counter() - t0)
      return out
    with self._device_lock:
      if self.chunk_frames:
        # constant-memory path: no fused program exists; fall back to the
        # chunked infer and convert on host
        from waveglow_tpu.inference.synthesizer import ServingResult
        result = self.synth.infer(mel, sigma=sigma, denoiser_strength=strength,
                                  seed=seed, bucket_frames=self.bucket_frames
                                  or None, chunk_frames=self.chunk_frames)
        wav = result.wav_denoised
        out = ServingResult(
            samples=_pcm16(wav) if pcm16 else np.asarray(wav, np.float32),
            sampling_rate=result.sampling_rate,
            duration_s=(result.inference_duration_s
                        + result.denoising_duration_s),
            was_overamplified=result.was_overamplified,
            timepoint=result.timepoint)
      else:
        out = self.synth.infer_serving(
            mel, sigma=sigma, denoiser_strength=strength, seed=seed,
            bucket_frames=self.bucket_frames or None, pcm16=pcm16)
    self._count(out.samples.shape[0] / self.sampling_rate,
                time.perf_counter() - t0)
    return out

  def synthesize_wav(self, wav: np.ndarray, **kw):
    """Copy synthesis: wav -> mel -> wav (reference inference_wav.py)."""
    mel = np.asarray(self.mel_op.get_mel(np.asarray(wav, dtype=np.float32)))
    return self.synthesize_mel_packed(mel, **kw)

  def warmup(self, frames_list: Optional[List[int]] = None) -> Dict:
    """Pre-compile the serving programs a traffic burst would otherwise
    compile INSIDE the device lock (~37 s per full-model program over a
    tunneled chip — the first batch-2/4/8 dispatches of a fresh daemon
    each stall every queued request for one compile). For each entry of
    ``frames_list`` (mel frame counts; default: one entry of
    ``bucket_frames``, i.e. the shortest bucket) this compiles the solo
    program and every power-of-two micro-batch program up to
    ``max_batch``, in both raw and denoised variants. Trades startup time
    for first-burst latency; `serve --warmup-frames` exposes it.
    Returns {"programs": N, "seconds": wall}.
    """
    bucket = self.bucket_frames or 64
    frames_list = list(frames_list or [bucket])
    t0 = time.perf_counter()
    n = 0
    rng = np.random.default_rng(0)
    n_mels = self.synth.hparams.n_mel_channels
    with self._device_lock:
      for frames in frames_list:
        mel = rng.standard_normal((n_mels, frames)).astype(np.float32)
        for strength in (self.default_denoiser_strength, 0.0):
          self.synth.infer_serving(
              mel, denoiser_strength=strength,
              bucket_frames=self.bucket_frames or None)
          n += 1
          b = 2
          while b <= self.max_batch:
            self.synth.infer_serving_many(
                [mel] * b, denoiser_strength=strength,
                seeds=list(range(b)),
                bucket_frames=self.bucket_frames or None, max_batch=b)
            n += 1
            b *= 2
    seconds = round(time.perf_counter() - t0, 1)
    logger.info("Warmup compiled %d programs in %.1f s", n, seconds)
    return {"programs": n, "seconds": seconds}

  def reload(self, checkpoint_path: str) -> Dict:
    """Hot-swap the serving weights from a checkpoint on the DAEMON's
    filesystem (Synthesizer.update_params: zero recompiles; architecture
    changes are rejected — restart for those). The swap runs under the
    device lock so it serializes with dispatches; requests submitted
    before the swap complete on the old weights, requests after use the
    new ones, and in-flight streams keep the weights they started with.

    Torch-format checkpoints are REFUSED unless the daemon was started
    with ``allow_torch_reload``: the torch importer deserializes arbitrary
    pickles (``torch.load(weights_only=False)`` — it must, to read the
    reference's full-module format), so a client-supplied path reaching it
    is remote code execution for anyone who can reach the port and stage a
    file. The safe formats (native npz, orbax) carry no executable content
    and stay hot-swappable by default.
    """
    from waveglow_tpu.checkpointing import (load_checkpoint_as,
                                            sniff_checkpoint_format)

    fmt = sniff_checkpoint_format(checkpoint_path)
    if not self.allow_torch_reload and fmt == "torch":
      raise ValueError(
          "refusing to hot-swap a torch-format checkpoint: the torch "
          "importer deserializes arbitrary pickles. Convert it to the "
          "native format first (waveglow-tpu download / export), or start "
          "the daemon with --allow-torch-reload on a trusted network")
    # load through the SAME sniff result: re-sniffing inside the loader
    # would let a file swapped between the checks reach torch.load (TOCTOU)
    checkpoint = load_checkpoint_as(checkpoint_path, fmt)
    with self._device_lock:
      iteration = self.synth.update_params(
          checkpoint, custom_hparams=self.custom_hparams)
    with self._stats_lock:
      self.stats["reloads"] += 1
    return {"status": "reloaded", "iteration": int(iteration),
            "checkpoint": str(checkpoint_path)}

  def stream_mel(self, mel: np.ndarray, *, sigma: Optional[float] = None,
                 denoiser_strength: Optional[float] = None, seed: int = 0,
                 chunk_frames: Optional[int] = None, pcm16: bool = False):
    """Yield waveform pieces in time order as they leave the device.

    Like every other synthesis path, streamed audio is denoised by default
    (reference synthesizer.py:63-66) — incrementally, via the windowed
    overlap-correct denoiser (waveglow_tpu.inference.stream_denoise), so
    the reassembled stream matches the non-streamed ``wav_denoised``.
    Pass ``denoiser_strength=0`` for the raw waveform.

    The device lock is held per WINDOW, not for the whole utterance: a
    long-running stream releases the device between chunks so concurrent
    /synthesize micro-batches interleave instead of queueing behind the
    stream for its full duration. A chunk synthesizes ~1.5 s of audio in
    ~20 ms of device time, so even with batch programs interleaved between
    every chunk the stream stays far ahead of realtime playback.
    """
    mel = self._check_mel(mel)
    self._admit()
    n = 0.0
    gen = self.synth.stream(
        mel, sigma=self.default_sigma if sigma is None else sigma,
        denoiser_strength=(self.default_denoiser_strength
                           if denoiser_strength is None
                           else denoiser_strength),
        seed=seed, chunk_frames=chunk_frames or self.chunk_frames or 128,
        pcm16=pcm16)
    # served=True on normal exhaustion AND on client abort (GeneratorExit
    # from the transport closing us): both delivered audio and must land in
    # requests/audio_seconds — code AFTER a plain finally would never run
    # on abort, silently dropping every aborted stream from /stats. A
    # SYNTHESIS error unwinding through here stays served=False: the
    # transport layer counts it as an error, and counting it as a request
    # too would skew success rates vs every other endpoint. Stream wall
    # time is paced by the CONSUMING client (socket backpressure), so it
    # stays out of the request-latency histogram.
    served = False
    try:
      while True:
        with self._device_lock:
          try:
            _, piece = next(gen)
          except StopIteration:
            break
        n += len(piece) / self.sampling_rate
        yield piece
      served = True
    except GeneratorExit:
      served = True
      raise
    finally:
      gen.close()
      self._release()
      if served:
        self._count(n)

  # -- helpers ---------------------------------------------------------------

  @property
  def sampling_rate(self) -> int:
    return self.synth.hparams.sampling_rate

  def _check_mel(self, mel: np.ndarray) -> np.ndarray:
    mel = np.asarray(mel)
    if mel.ndim == 3 and mel.shape[0] == 1:
      mel = mel[0]
    n_mels = self.synth.hparams.n_mel_channels
    if mel.ndim != 2 or mel.shape[0] != n_mels:
      raise ValueError(
          f"expected mel [{n_mels}, frames], got shape {tuple(mel.shape)}")
    if self.max_frames and mel.shape[1] > self.max_frames:
      with self._stats_lock:
        self.stats["rejected"] += 1
      raise RequestTooLargeError(
          f"mel has {mel.shape[1]} frames, over the admission limit "
          f"max_frames={self.max_frames} "
          f"(~{self.max_frames * 256 / self.sampling_rate:.0f} s of audio); "
          "raise --max-frames (with --chunk-frames to bound memory) to "
          "serve longer inputs")
    return mel.astype(np.float32)

  def _count(self, audio_seconds: float,
             latency_s: Optional[float] = None) -> None:
    with self._stats_lock:
      self.stats["requests"] += 1
      self.stats["audio_seconds"] += audio_seconds
      if latency_s is not None:
        self._latencies.append(latency_s)
        self._latency_total_n += 1
        self._latency_total_sum += latency_s
        if len(self._latencies) > self._latency_cap:
          # keep the newest half: recent traffic, O(1) amortized
          del self._latencies[:self._latency_cap // 2]

  def _record_stages(self, **stage_ms: float) -> None:
    """Record per-request stage durations (milliseconds) into bounded
    windows; None values are skipped."""
    with self._stats_lock:
      for name, v in stage_ms.items():
        if v is None:
          continue
        w = self._stages.setdefault(name, [])
        w.append(float(v))
        if len(w) > self._latency_cap:
          del w[:self._latency_cap // 2]

  def health(self) -> Dict:
    hp = self.synth.hparams
    return {
        "status": "ok",
        "model": {"n_flows": hp.n_flows, "n_channels": hp.n_channels,
                  "n_layers": hp.n_layers, "n_mel_channels": hp.n_mel_channels,
                  "sampling_rate": hp.sampling_rate,
                  "compute_dtype": hp.compute_dtype,
                  "iteration": int(self.synth.iteration)},
        "serving": {"bucket_frames": self.bucket_frames,
                    "chunk_frames": self.chunk_frames,
                    "max_batch": self.max_batch,
                    "max_queue": self.max_queue,
                    "max_frames": self.max_frames},
        "mesh": (dict(self.synth.mesh.shape) if self.synth.mesh is not None
                 else None),
    }

  def snapshot_stats(self) -> Dict:
    with self._stats_lock:
      out = dict(self.stats)
      lats = list(self._latencies)
      total_n, total_sum = self._latency_total_n, self._latency_total_sum
      stages = {k: list(v) for k, v in self._stages.items()}
    out["uptime_seconds"] = round(time.time() - self.started, 1)
    out["audio_seconds"] = round(out["audio_seconds"], 3)
    with self._inflight_lock:
      out["in_flight"] = self._inflight
    out["max_queue"] = self.max_queue
    if lats:
      q = np.quantile(lats, [0.5, 0.95, 0.99])
      out["latency_s"] = {
          "count": total_n, "sum": round(total_sum, 4),
          "window": len(lats), "mean": round(float(np.mean(lats)), 4),
          "p50": round(float(q[0]), 4), "p95": round(float(q[1]), 4),
          "p99": round(float(q[2]), 4)}
    if stages:
      out["stages_ms"] = {
          name: {"n": len(w), "mean": round(float(np.mean(w)), 2),
                 "p50": round(float(np.median(w)), 2),
                 "p95": round(float(np.quantile(w, 0.95)), 2)}
          for name, w in stages.items()}
    return out

  def prometheus_metrics(self) -> str:
    """/stats in Prometheus text exposition format (GET /metrics) so a
    standard scraper monitors the daemon without an adapter."""
    s = self.snapshot_stats()
    lines = []

    def metric(name, mtype, value, help_text):
      lines.append(f"# HELP {name} {help_text}")
      lines.append(f"# TYPE {name} {mtype}")
      lines.append(f"{name} {value}")

    metric("waveglow_requests_total", "counter", s["requests"],
           "Completed synthesis requests")
    metric("waveglow_errors_total", "counter", s["errors"],
           "Requests answered with an error status")
    metric("waveglow_rejected_total", "counter", s["rejected"],
           "Requests shed by admission control (HTTP 503)")
    metric("waveglow_reloads_total", "counter", s["reloads"],
           "Checkpoint hot-swaps performed")
    metric("waveglow_batches_total", "counter", s["batches"],
           "Micro-batched device dispatches of more than one request")
    metric("waveglow_batched_requests_total", "counter",
           s["batched_requests"], "Requests served through micro-batches")
    metric("waveglow_audio_seconds_total", "counter",
           s["audio_seconds"], "Audio seconds synthesized")
    metric("waveglow_in_flight", "gauge", s["in_flight"],
           "Requests currently admitted (queued + executing)")
    metric("waveglow_uptime_seconds", "gauge", s["uptime_seconds"],
           "Seconds since daemon start")
    if "latency_s" in s:
      lat = s["latency_s"]
      lines.append("# HELP waveglow_request_latency_seconds "
                   "Request wall latency (quantiles over the newest "
                   f"{self._latency_cap} requests; sum/count cumulative)")
      lines.append("# TYPE waveglow_request_latency_seconds summary")
      for qt, key in (("0.5", "p50"), ("0.95", "p95"), ("0.99", "p99")):
        lines.append("waveglow_request_latency_seconds"
                     f'{{quantile="{qt}"}} {lat[key]}')
      lines.append(f"waveglow_request_latency_seconds_sum {lat['sum']}")
      lines.append(f"waveglow_request_latency_seconds_count {lat['count']}")
    if "stages_ms" in s:
      # windowed per-stage quantiles (no cumulative sum exists for them,
      # so a gauge with stage/quantile labels, not a summary)
      lines.append("# HELP waveglow_request_stage_seconds Per-stage request "
                   "latency over the newest requests")
      lines.append("# TYPE waveglow_request_stage_seconds gauge")
      for stage, st in sorted(s["stages_ms"].items()):
        for qt, key in (("0.5", "p50"), ("0.95", "p95")):
          lines.append("waveglow_request_stage_seconds"
                       f'{{stage="{stage}",quantile="{qt}"}} '
                       f"{st[key] / 1e3:.6f}")
    return "\n".join(lines) + "\n"


def _pcm16(wav: np.ndarray) -> np.ndarray:
  """float -> int16 samples, clipped: convert_wav alone WRAPS on |x| > 1
  (int16 overflow), which turns an overamplified utterance into noise.
  Responses carry X-Overamplified so callers can renormalize from the
  format=npy floats instead. int16 input (already converted on-device by
  streaming.pcm16_on_device) passes through."""
  from waveglow_tpu.dsp.audio_io import convert_wav
  wav = np.asarray(wav)
  if wav.dtype == np.int16:
    return wav
  return convert_wav(np.clip(wav, -1.0, 1.0), np.int16)


def _wav_bytes(wav: np.ndarray, sampling_rate: int) -> bytes:
  from scipy.io import wavfile
  wav = np.asarray(wav)
  buf = io.BytesIO()
  wavfile.write(buf, sampling_rate,
                wav if wav.dtype == np.int16 else _pcm16(wav))
  return buf.getvalue()


def _npy_bytes(arr: np.ndarray) -> bytes:
  buf = io.BytesIO()
  np.save(buf, np.asarray(arr, dtype=np.float32), allow_pickle=False)
  return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
  # set by make_server
  service: SynthesisService = None
  protocol_version = "HTTP/1.1"

  # -- plumbing --------------------------------------------------------------

  def log_message(self, fmt, *args):  # route to logging, not stderr
    logger.info("%s %s", self.address_string(), fmt % args)

  def _send_json(self, code: int, payload: Dict, *,
                 close: bool = False) -> None:
    """``close=True`` sends ``Connection: close`` (which also flips
    ``self.close_connection``): required whenever an error response goes
    out BEFORE the request body was read — this handler is HTTP/1.1
    keep-alive, and a reused connection would otherwise parse the next
    request starting at the leftover body bytes (protocol desync)."""
    body = json.dumps(payload).encode()
    self.send_response(code)
    self.send_header("Content-Type", "application/json")
    self.send_header("Content-Length", str(len(body)))
    if close:
      self.send_header("Connection", "close")
    self.end_headers()
    self.wfile.write(body)

  def _send_error_json(self, code: int, message: str, *,
                       close: bool = False) -> None:
    with self.service._stats_lock:
      self.service.stats["errors"] += 1
    self._send_json(code, {"error": message}, close=close)

  def _read_body(self) -> bytes:
    length = int(self.headers.get("Content-Length", 0))
    if length <= 0:
      raise ValueError("empty request body")
    if length > MAX_BODY_BYTES:
      raise ValueError(f"request body over {MAX_BODY_BYTES} bytes")
    return self.rfile.read(length)

  def _query(self):
    q = parse_qs(urlparse(self.path).query)

    def get(name, cast, default):
      if name not in q:
        return default
      return cast(q[name][0])

    return get

  # -- endpoints --------------------------------------------------------------

  def do_GET(self):
    route = urlparse(self.path).path
    if route == "/healthz":
      self._send_json(200, self.service.health())
    elif route == "/stats":
      self._send_json(200, self.service.snapshot_stats())
    elif route == "/metrics":
      body = self.service.prometheus_metrics().encode()
      self.send_response(200)
      self.send_header("Content-Type",
                       "text/plain; version=0.0.4; charset=utf-8")
      self.send_header("Content-Length", str(len(body)))
      self.end_headers()
      self.wfile.write(body)
    else:
      self._send_error_json(404, f"unknown path {route}")

  def do_POST(self):
    route = urlparse(self.path).path
    # Until _read_body() succeeds, the request body sits unread on the
    # socket. This handler speaks HTTP/1.1 keep-alive, so answering an
    # early error (503 shed, bad query param, oversize Content-Length)
    # and then reusing the connection would make the NEXT request parse
    # start at the leftover body bytes — protocol desync, garbage 400s.
    # Any error response sent before the body was consumed must therefore
    # close the connection.
    body_read = False
    try:
      get = self._query()
      sigma = get("sigma", float, None)
      strength = get("denoiser_strength", float, None)
      seed = get("seed", int, 0)
      fmt = get("format", str, "wav")
      if fmt not in ("wav", "npy"):
        raise ValueError(f"format must be wav or npy, got {fmt!r}")
      if route in ("/synthesize", "/synthesize-wav", "/stream"):
        # shed BEFORE buffering the body (up to 256 MB a saturated daemon
        # would only discard); _admit() still enforces at dispatch
        self.service.check_capacity()
      t_read = time.perf_counter()
      body = self._read_body()
      body_read = True
      t_parse = time.perf_counter()

      if route == "/reload":
        payload = json.loads(body)
        if not isinstance(payload, dict) or "checkpoint" not in payload:
          raise ValueError('body must be JSON {"checkpoint": "<path>"}')
        self._send_json(200, self.service.reload(payload["checkpoint"]))
        return

      pcm16 = fmt == "wav"  # int16 conversion happens on-device
      if route == "/synthesize":
        mel = np.load(io.BytesIO(body), allow_pickle=False)
        t_service = time.perf_counter()
        result = self.service.synthesize_mel_packed(
            mel, sigma=sigma, denoiser_strength=strength, seed=seed,
            pcm16=pcm16)
      elif route == "/synthesize-wav":
        from waveglow_tpu.dsp.audio_io import convert_wav
        from scipy.io import wavfile
        rate, wav = wavfile.read(io.BytesIO(body))
        if rate != self.service.sampling_rate:
          raise ValueError(f"expected {self.service.sampling_rate} Hz wav, "
                           f"got {rate}")
        t_service = time.perf_counter()
        result = self.service.synthesize_wav(
            convert_wav(wav, np.float32),
            sigma=sigma, denoiser_strength=strength, seed=seed, pcm16=pcm16)
      elif route == "/stream":
        mel = np.load(io.BytesIO(body), allow_pickle=False)
        self._stream_response(mel, sigma=sigma, denoiser_strength=strength,
                              seed=seed,
                              chunk_frames=get("chunk_frames", int, None))
        return
      else:
        self._send_error_json(404, f"unknown path {route}")
        return
    except ServerOverloadedError as e:
      # admission control: shed load with an actionable signal (counted in
      # stats["rejected"] by _admit, not in stats["errors"])
      body = json.dumps({"error": f"overloaded: {e}"}).encode()
      self.send_response(503)
      self.send_header("Content-Type", "application/json")
      self.send_header("Content-Length", str(len(body)))
      self.send_header("Retry-After", "1")
      if not body_read:  # early shed: body still on the socket (see above)
        self.send_header("Connection", "close")
      self.end_headers()
      self.wfile.write(body)
      return
    except RequestTooLargeError as e:
      # size-axis admission control (counted in stats["rejected"] by
      # _check_mel, not in stats["errors"]); body was read, so keep-alive
      # stays safe
      self._send_json(413, {"error": f"too large: {e}"})
      return
    except Exception as e:  # noqa: BLE001 — client errors become 400s
      self._send_error_json(400, f"{type(e).__name__}: {e}",
                            close=not body_read)
      return

    wav = result.samples
    t_serialize = time.perf_counter()
    payload = (_wav_bytes(wav, self.service.sampling_rate) if fmt == "wav"
               else _npy_bytes(wav))
    self.send_response(200)
    self.send_header("Content-Type", "audio/wav" if fmt == "wav"
                     else "application/octet-stream")
    self.send_header("Content-Length", str(len(payload)))
    self.send_header("X-Sampling-Rate", str(self.service.sampling_rate))
    self.send_header("X-Audio-Seconds",
                     f"{wav.shape[0] / self.service.sampling_rate:.3f}")
    self.send_header("X-Overamplified",
                     "true" if result.was_overamplified else "false")
    self.end_headers()
    self.wfile.write(payload)
    done = time.perf_counter()
    self.service._record_stages(read=(t_parse - t_read) * 1e3,
                                parse=(t_service - t_parse) * 1e3,
                                service=(t_serialize - t_service) * 1e3,
                                serialize=(done - t_serialize) * 1e3)

  def _stream_response(self, mel, *, sigma, denoiser_strength, seed,
                       chunk_frames):
    """Denoised PCM16 pieces flushed as the device produces them (bias
    removal runs incrementally via the windowed streaming denoiser;
    ``denoiser_strength=0`` streams the raw waveform)."""
    pieces = self.service.stream_mel(mel, sigma=sigma,
                                     denoiser_strength=denoiser_strength,
                                     seed=seed, chunk_frames=chunk_frames,
                                     pcm16=True)
    first = next(pieces)  # raise (-> 400) before committing to a 200
    self.send_response(200)
    self.send_header("Content-Type", "application/octet-stream")
    self.send_header("X-Sampling-Rate", str(self.service.sampling_rate))
    self.send_header("X-PCM-Format", "s16le")
    # no Content-Length: the connection closes when the utterance ends
    self.send_header("Connection", "close")
    self.end_headers()
    try:
      for piece in _chain_first(first, pieces):
        self.wfile.write(_pcm16(piece).tobytes())
        self.wfile.flush()
    except (BrokenPipeError, ConnectionResetError):
      # client hung up mid-utterance: stop synthesizing the remaining
      # chunks and release the device lock (held by the open generator)
      logger.info("stream client disconnected early")
    except Exception:  # noqa: BLE001 — the 200 is already committed: a
      # second status line / JSON body would decode as garbage PCM
      # appended to the client's audio. Truncate the stream (the
      # Connection: close below tells the client it ended) and count the
      # failure here, since do_POST's 400 path must not run.
      logger.exception("stream failed mid-utterance; truncating response")
      with self.service._stats_lock:
        self.service.stats["errors"] += 1
    finally:
      pieces.close()
    self.close_connection = True


def _chain_first(first, rest):
  yield first
  yield from rest


def make_server(service: SynthesisService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
  """Bind a ready-to-run server (port 0 = ephemeral; see server_port)."""
  handler = type("BoundHandler", (_Handler,), {"service": service})
  return ThreadingHTTPServer((host, port), handler)


def serve_forever(service: SynthesisService, host: str, port: int, *,
                  warmup_frames: Optional[List[int]] = None,
                  drain_timeout_s: float = 30.0) -> None:
  """Run the daemon until interrupted.

  ``warmup_frames``: pre-compile serving programs for these mel lengths
  before binding the port (see SynthesisService.warmup) so the first
  traffic burst never pays an XLA compile inside the device lock.
  SIGTERM drains gracefully: new requests get 503s, in-flight ones finish
  (up to ``drain_timeout_s``), then the listener closes — what a rolling
  restart under an orchestrator needs.
  """
  import signal

  import jax

  if warmup_frames:
    logger.info("Warming serving programs for frame counts %s ...",
                warmup_frames)
    service.warmup(warmup_frames)
  httpd = make_server(service, host, port)

  def _drain_then_stop():
    service.begin_drain()
    deadline = time.time() + drain_timeout_s
    while time.time() < deadline and service.in_flight() > 0:
      time.sleep(0.1)
    httpd.shutdown()

  def _on_sigterm(signum, frame):  # noqa: ARG001
    logger.info("SIGTERM: draining %d in-flight requests, then stopping",
                service.in_flight())
    threading.Thread(target=_drain_then_stop, daemon=True,
                     name="waveglow-drain").start()

  try:
    signal.signal(signal.SIGTERM, _on_sigterm)
  except ValueError:
    pass  # not the main thread (e.g. a test harness): no signal hook
  logger.info("Serving on http://%s:%d (model on %s)", host,
              httpd.server_port, jax.devices()[0])
  try:
    httpd.serve_forever()
  except KeyboardInterrupt:
    logger.info("Shutting down")
  finally:
    httpd.server_close()
    if service._batcher is not None:
      service._batcher.close()
