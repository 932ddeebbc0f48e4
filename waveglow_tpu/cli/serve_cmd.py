"""``serve`` subcommand: run the HTTP synthesis daemon.

Beyond the reference's CLI surface (which only batch-processes folders,
reference inference_v2.py): a long-lived service keeps the model
device-resident and its XLA programs compiled across requests — the right
deployment shape for a TPU vocoder, where a cold Synthesizer construction
costs ~20-150 s over a tunneled chip (docs/PERFORMANCE.md). See
waveglow_tpu.inference.server for the endpoint contract.
"""

from __future__ import annotations

import logging
from argparse import ArgumentParser, Namespace

from waveglow_tpu.cli.argparse_helpers import (add_denoiser_and_sigma_arguments,
                                               add_hparams_argument,
                                               get_optional,
                                               parse_existing_path,
                                               parse_non_negative_integer,
                                               parse_positive_integer)
from waveglow_tpu.hparams import parse_custom_hparams

logger = logging.getLogger(__name__)


def init_serve_parser(parser: ArgumentParser):
  parser.description = ("Serve mel->wav synthesis over HTTP "
                        "(POST /synthesize, /synthesize-wav, /stream).")
  parser.add_argument("checkpoint", metavar="CHECKPOINT",
                      type=parse_existing_path,
                      help="checkpoint to serve (.npz, .pt or .orbax)")
  parser.add_argument("--host", default="127.0.0.1",
                      help="bind address (0.0.0.0 exposes the service "
                           "beyond this machine)")
  parser.add_argument("--port", type=parse_non_negative_integer,
                      default=8642, help="TCP port (0 = ephemeral)")
  add_denoiser_and_sigma_arguments(parser)
  add_hparams_argument(parser)
  parser.add_argument("--bucket-frames", type=parse_non_negative_integer,
                      default=64,
                      help="pad request mels to a multiple of this so "
                           "arbitrary-length traffic reuses O(buckets) "
                           "compiled programs; 0 disables (one compile per "
                           "distinct request length)")
  parser.add_argument("--chunk-frames",
                      type=get_optional(parse_positive_integer),
                      default=None,
                      help="synthesize in fixed mel windows of this many "
                           "frames (bounds activation memory for unbounded "
                           "request lengths)")
  parser.add_argument("--max-batch", type=parse_positive_integer, default=8,
                      help="micro-batch up to this many concurrent requests "
                           "into one fused device dispatch (1 serializes "
                           "requests batch-1)")
  parser.add_argument("--batch-window-ms", type=float, default=5.0,
                      help="wait this long for companion requests before "
                           "dispatching (simultaneous arrivals batch even "
                           "on an idle device; 0 = dispatch immediately)")
  parser.add_argument("--max-queue", type=parse_non_negative_integer,
                      default=64,
                      help="admission limit: reject requests with HTTP 503 "
                           "once this many are in flight (queued + "
                           "executing; 0 = never shed)")
  parser.add_argument("--mesh-data", type=parse_positive_integer, default=1,
                      help="shard micro-batched request rows over this many "
                           "chips (data parallelism; each chip synthesizes "
                           "its rows independently)")
  parser.add_argument("--mesh-model", type=parse_positive_integer, default=1,
                      help="tensor-shard the WN hidden channels over this "
                           "many chips (Megatron col/row specs, one psum "
                           "per WN layer over ICI — for models over one "
                           "chip's HBM or to cut single-request latency)")
  parser.add_argument("--mesh-time", type=parse_positive_integer, default=1,
                      help="shard each utterance's mel frame axis over this "
                           "many chips (long-utterance synthesis; GSPMD "
                           "halo exchange for the conv overlaps). Mutually "
                           "exclusive with --mesh-data/--mesh-model")
  parser.add_argument("--max-frames", type=parse_non_negative_integer,
                      default=8192,
                      help="size-axis admission limit: reject request mels "
                           "over this many frames with HTTP 413 (8192 ~= "
                           "95 s of audio; 0 = unlimited — combine a higher "
                           "limit with --chunk-frames to bound memory)")
  parser.add_argument("--allow-torch-reload", action="store_true",
                      default=False,
                      help="let POST /reload hot-swap torch-format "
                           "checkpoints (loads arbitrary pickles — enable "
                           "only on trusted networks; native npz/orbax "
                           "reloads are always allowed)")
  parser.add_argument("--compile-cache", type=str, default=None,
                      metavar="DIR",
                      help="persistent XLA compile cache directory: a "
                           "restarted daemon re-loads its warmed serving "
                           "programs from disk in ~1 s each instead of "
                           "recompiling ~37 s each (default: "
                           "$WAVEGLOW_TPU_COMPILE_CACHE if set)")
  parser.add_argument("--warmup-frames", type=str, default=None,
                      help="comma-separated mel frame counts to pre-compile "
                           "serving programs for (solo + every pow2 micro-"
                           "batch, raw + denoised) BEFORE binding the port "
                           "— slower start, no compile stalls on the first "
                           "traffic bursts (e.g. '832' or '512,832,1600')")
  return _run


def _run(ns: Namespace) -> bool:
  from waveglow_tpu.checkpointing import load_checkpoint_any
  from waveglow_tpu.inference.server import SynthesisService, serve_forever

  # --compile-cache is enabled centrally by cli/main.py's run wrapper
  # BEFORE this handler (it must precede the first jit compile)
  mesh = None
  if ns.mesh_time > 1:
    if ns.mesh_data > 1 or ns.mesh_model > 1:
      raise ValueError("--mesh-time is mutually exclusive with "
                       "--mesh-data/--mesh-model")
    from waveglow_tpu.parallel.mesh import make_time_mesh
    mesh = make_time_mesh(ns.mesh_time)
  elif ns.mesh_data > 1 or ns.mesh_model > 1:
    from waveglow_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(data=ns.mesh_data, model=ns.mesh_model)
  checkpoint = load_checkpoint_any(ns.checkpoint)
  service = SynthesisService(
      checkpoint,
      custom_hparams=parse_custom_hparams(ns.custom_hparams),
      bucket_frames=ns.bucket_frames, chunk_frames=ns.chunk_frames,
      sigma=ns.sigma, denoiser_strength=ns.denoiser_strength,
      max_batch=ns.max_batch, batch_window_ms=ns.batch_window_ms,
      max_queue=ns.max_queue, max_frames=ns.max_frames,
      allow_torch_reload=ns.allow_torch_reload, mesh=mesh)
  if mesh is not None:
    logger.info("Serving over a device mesh: %s", dict(mesh.shape))
  warmup_frames = ([int(f) for f in ns.warmup_frames.split(",") if f]
                   if ns.warmup_frames else None)
  logger.info("Model ready; binding %s:%d", ns.host, ns.port)
  serve_forever(service, ns.host, ns.port, warmup_frames=warmup_frames)
  return True
