"""Measure the serve daemon's request overhead vs the direct library call.

Runs the full-size model behind the real HTTP daemon (in-process thread,
loopback socket) and times end-to-end request latency for a 9.6 s utterance
— the number a network caller of `waveglow-tpu serve` actually pays — next
to the direct Synthesizer.infer wall time. The difference is the HTTP + npy
serialization overhead. Also times the /stream first-chunk latency.

Prints one JSON line; --save writes it to a benchmarks/ artifact.
Committed result: benchmarks/server_overhead_tpu.json.
"""

import argparse
import io
import json
import os
import subprocess
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _worker_main(args):
  """Out-of-process load client: its own interpreter (own GIL), stdlib+numpy
  only — no jax import. Sleeps until the shared --start-at instant so all
  workers hit the daemon simultaneously, then runs --per-client requests and
  prints one JSON line with its own start/end timestamps (parent computes
  aggregate wall = max(end) - min(start))."""
  from waveglow_tpu.inference.client import SynthesisClient

  client = SynthesisClient(args.url)
  mel = np.load(args.mel_file, allow_pickle=False)
  delay = args.start_at - time.time()
  if delay > 0:
    time.sleep(delay)
  t0 = time.time()
  for i in range(args.per_client):
    client.synthesize_to_wav_bytes(mel, seed=args.seed_base + i)
  t1 = time.time()
  print(json.dumps({"start": t0, "end": t1, "n": args.per_client}))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--frames", type=int, default=826)
  ap.add_argument("--iters", type=int, default=7)
  ap.add_argument("--dtype", default="bfloat16")
  ap.add_argument("--stream-chunk-frames", type=int, default=128)
  ap.add_argument("--save", type=Path, default=None)
  ap.add_argument("--platform", default=None)
  ap.add_argument("--extra-hparams", default=None,
                  help="e.g. tiny model for CPU smoke runs")
  ap.add_argument("--clients", type=int, default=8,
                  help="concurrent clients for the micro-batch section")
  ap.add_argument("--per-client", type=int, default=3)
  ap.add_argument("--skip-concurrency", action="store_true")
  ap.add_argument("--client-procs", action="store_true",
                  help="drive the concurrent section from SEPARATE client "
                  "processes (own GILs) instead of in-process threads — the "
                  "true server-under-load number, free of load-generator "
                  "interpreter contention")
  # hidden worker mode (spawned by --client-procs)
  ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
  ap.add_argument("--url", help=argparse.SUPPRESS)
  ap.add_argument("--mel-file", help=argparse.SUPPRESS)
  ap.add_argument("--seed-base", type=int, default=0, help=argparse.SUPPRESS)
  ap.add_argument("--start-at", type=float, default=0.0,
                  help=argparse.SUPPRESS)
  args = ap.parse_args()

  if args.worker:
    _worker_main(args)
    return

  import jax
  if args.platform:
    jax.config.update("jax_platforms", args.platform)

  from dataclasses import asdict

  from waveglow_tpu.checkpointing.store import CheckpointWaveglow
  from waveglow_tpu.hparams import (HParams, overwrite_custom_hparams,
                                    parse_custom_hparams)
  from waveglow_tpu.inference.client import SynthesisClient
  from waveglow_tpu.inference.server import SynthesisService, make_server
  from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params

  hp = overwrite_custom_hparams(
      HParams(), {"compute_dtype": args.dtype,
                  **parse_custom_hparams(args.extra_hparams)})
  ckpt = CheckpointWaveglow(
      state_dict=init_params(WaveGlowConfig.from_hparams(hp), seed=0),
      optimizer=None, learning_rate=hp.learning_rate, iteration=1,
      hparams=asdict(hp))

  service = SynthesisService(ckpt)
  httpd = make_server(service, "127.0.0.1", 0)
  threading.Thread(target=httpd.serve_forever, daemon=True).start()
  client = SynthesisClient(f"http://127.0.0.1:{httpd.server_port}")

  rng = np.random.default_rng(0)
  mel = rng.standard_normal((hp.n_mel_channels, args.frames)).astype(
      np.float32)
  utt_seconds = args.frames * 256 / hp.sampling_rate

  def p50(fn):
    fn(0)  # compile / warm
    lats = []
    for i in range(args.iters):
      t0 = time.perf_counter()
      fn(i + 1)
      lats.append(time.perf_counter() - t0)
    return float(np.median(lats))

  # direct library calls: classic two-fetch InferenceResult path vs the
  # fused single-fetch path the daemon actually serves from
  direct_classic = p50(lambda s: service.synthesize_mel(mel, seed=s))
  direct = p50(lambda s: service.synthesize_mel_packed(mel, seed=s,
                                                       pcm16=True))
  # full HTTP round trip, float32 response
  http_npy = p50(lambda s: client.synthesize(mel, seed=s))
  # full HTTP round trip, RIFF response (what a file-writing caller gets)
  http_wav = p50(lambda s: client.synthesize_to_wav_bytes(mel, seed=s))
  # streaming: time to FIRST audio piece on the client (the generator is
  # then drained — abandoning it mid-stream leaves the server synthesizing
  # chunks that would delay the NEXT request and skew its measurement)
  def stream_lat(s):
    t0 = time.perf_counter()
    gen = client.stream(mel, seed=s, chunk_frames=args.stream_chunk_frames)
    next(gen)
    lat = time.perf_counter() - t0
    for _ in gen:
      pass
    return lat

  stream_lat(0)  # compile / warm
  stream_first = float(np.median([stream_lat(i + 1)
                                  for i in range(args.iters)]))

  if not args.skip_concurrency:
    # -- concurrent load: micro-batched vs serialized batch-1 ---------------
    # N clients hammer /synthesize simultaneously. With the micro-batcher
    # (default), requests arriving while the device is busy dispatch as one
    # fused batched program; with the batcher disabled they serialize on
    # the device lock at batch-1 throughput.
    import concurrent.futures

    def hammer(tag):
      barrier = threading.Barrier(args.clients)

      def worker(c):
        barrier.wait()
        for i in range(args.per_client):
          # int16 RIFF responses: the production format (half the fetch and
          # response bytes of float32 npy)
          client.synthesize_to_wav_bytes(mel,
                                         seed=c * 100 + i + hash(tag) % 97)

      with concurrent.futures.ThreadPoolExecutor(args.clients) as pool:
        t0 = time.perf_counter()
        list(pool.map(worker, range(args.clients)))
        wall = time.perf_counter() - t0
      total_audio = args.clients * args.per_client * utt_seconds
      return total_audio / wall

    def hammer_procs(tag):
      """Same load, but each client is its OWN PROCESS (own GIL): the
      server's interpreter only runs server work, so this is the throughput
      a fleet of network callers actually sees."""
      with tempfile.NamedTemporaryFile(suffix=".npy", delete=False) as f:
        np.save(f, mel, allow_pickle=False)
        mel_path = f.name
      # the workers must NEVER claim the TPU (one process per chip): strip
      # every axon/jax knob so the sitecustomize hook stays dormant, and pin
      # JAX_PLATFORMS=cpu in case anything still imports jax
      env = {k: v for k, v in os.environ.items()
             if not k.startswith(("JAX_", "XLA_", "PALLAS_", "AXON_", "TPU_"))}
      env["JAX_PLATFORMS"] = "cpu"
      try:
        start_at = time.time() + 3.0  # cover interpreter + numpy startup
        procs = [
            subprocess.Popen(
                [sys.executable, __file__, "--worker",
                 "--url", f"http://127.0.0.1:{httpd.server_port}",
                 "--mel-file", mel_path,
                 "--per-client", str(args.per_client),
                 "--seed-base", str(c * 1000 + hash(tag) % 97),
                 "--start-at", f"{start_at:.6f}"],
                stdout=subprocess.PIPE, env=env)
            for c in range(args.clients)]
        reports = []
        for p in procs:
          out, _ = p.communicate(timeout=600)
          if p.returncode != 0:
            raise RuntimeError(f"load worker failed (rc={p.returncode})")
          reports.append(json.loads(out))
      finally:
        os.unlink(mel_path)
      wall = max(r["end"] for r in reports) - min(r["start"] for r in reports)
      total_audio = args.clients * args.per_client * utt_seconds
      return total_audio / wall

    if args.client_procs:
      hammer = hammer_procs

    # compile every pow2 batched program a racing drain can produce, so no
    # XLA compile lands inside the measured wall time (size-1 remainders
    # route through the solo program, already warmed by the latency section)
    b = 2
    while b <= min(args.clients, service.max_batch):
      service.synth.infer_serving_many([mel] * b, seeds=list(range(b)),
                                       bucket_frames=service.bucket_frames,
                                       pcm16=True)
      b *= 2
    hammer("warm-batched")
    with service._stats_lock:  # isolate the measured section's stages
      service._stages.clear()
    concurrent_batched = hammer("batched")
    # per-request stage decomposition UNDER the measured load (VERDICT r4
    # weak #5): body read / npy parse / service (queue wait + submit +
    # device+fetch from the micro-batcher's marks) / response serialize
    stage_breakdown = service.snapshot_stats().get("stages_ms", {})
    batched_stats = {k: service.stats[k] for k in ("batches",
                                                   "batched_requests")}
    saved_batcher, service._batcher = service._batcher, None
    try:
      hammer("warm-serial")
      concurrent_serialized = hammer("serialized")
    finally:
      service._batcher = saved_batcher
  else:
    concurrent_batched = concurrent_serialized = None
    batched_stats = {}
    stage_breakdown = {}

  result = {
      "metric": "server_request_latency",
      "dtype": args.dtype,
      "frames": args.frames,
      "utterance_seconds": round(utt_seconds, 3),
      "platform": jax.devices()[0].platform,
      "direct_call_s_p50": round(direct, 4),
      "direct_classic_two_fetch_s_p50": round(direct_classic, 4),
      "http_npy_s_p50": round(http_npy, 4),
      "http_wav_s_p50": round(http_wav, 4),
      "http_overhead_ms": round((http_npy - direct) * 1e3, 2),
      "stream_first_audio_s_p50": round(stream_first, 4),
      "stream_chunk_frames": args.stream_chunk_frames,
      "realtime_factor_over_http": round(utt_seconds / http_npy, 1),
  }
  if concurrent_batched is not None:
    result.update({
        "concurrent_clients": args.clients,
        "requests_per_client": args.per_client,
        "concurrent_batched_audio_sec_per_s": round(concurrent_batched, 1),
        "concurrent_serialized_audio_sec_per_s": round(
            concurrent_serialized, 1),
        "microbatch_speedup": round(
            concurrent_batched / concurrent_serialized, 2),
        "microbatch_stats": batched_stats,
        "concurrent_stages_ms": stage_breakdown,
    })
  httpd.shutdown()
  line = json.dumps(result)
  print(line)
  if args.save:
    args.save.parent.mkdir(parents=True, exist_ok=True)
    args.save.write_text(line + "\n")


if __name__ == "__main__":
  main()
