"""CLI dispatcher: waveglow-tpu {download,train,continue-train,validate,
synthesize,synthesize-wav,benchmark}.

Same command surface as the reference console script (reference cli.py:39-45
registers the first six; ``benchmark`` is TPU-native). Each subcommand's
init function configures its parser and returns the handler; the run wrapper
sets up logging, logs a platform banner to the file logger, times the
handler and prints a success/failure banner (reference cli.py:104-141).
"""

from __future__ import annotations

import argparse
import logging
import sys
import tempfile
import time
from pathlib import Path

from waveglow_tpu import __version__
from waveglow_tpu.cli.argparse_helpers import parse_path

PROG = "waveglow-tpu"
DEFAULT_LOG = Path(tempfile.gettempdir()) / f"{PROG}.log"

logger = logging.getLogger(__name__)


def _init_download_parser(parser: argparse.ArgumentParser):
  from waveglow_tpu.cli.argparse_helpers import parse_path as pp
  parser.description = ("Download a pre-trained model from Nvidia and "
                        "convert it to the native format.")
  parser.add_argument("checkpoint", metavar="CHECKPOINT", type=pp,
                      help="download checkpoint to this path")
  parser.add_argument("--ver", type=int, metavar="VERSION",
                      choices=[1, 2, 3, 5], default=3,
                      help="pre-trained version")
  return _download_ns


def _download_ns(ns: argparse.Namespace) -> bool:
  from waveglow_tpu.checkpointing.download import download_pretrained_model
  from waveglow_tpu.checkpointing.import_torch import convert_torch_checkpoint

  download_pretrained_model(destination=ns.checkpoint, version=ns.ver)
  convert_torch_checkpoint(origin=ns.checkpoint, destination=ns.checkpoint)
  logger.info("Completed. Downloaded and converted to: %s",
              ns.checkpoint.absolute())
  return True


def _init_benchmark_parser(parser: argparse.ArgumentParser):
  parser.description = "Benchmark synthesis/training throughput on-device."
  parser.add_argument("--batch", type=int, default=8)
  parser.add_argument("--frames", type=int, default=826)
  parser.add_argument("--iters", type=int, default=5)
  parser.add_argument("--dtype", default="bfloat16",
                      choices=["bfloat16", "float32"])
  parser.add_argument("--compile-cache", type=str, default=None,
                      metavar="DIR",
                      help="persistent XLA compile cache directory "
                           "(default: $WAVEGLOW_TPU_COMPILE_CACHE, else "
                           "/tmp/waveglow_tpu_xla_cache)")
  return _benchmark_ns


def _benchmark_ns(ns: argparse.Namespace) -> bool:
  import subprocess
  repo_root = Path(__file__).resolve().parent.parent.parent
  if not (repo_root / "bench.py").is_file():
    # site-packages installs don't carry the repo-root bench harness
    logger.error(
        "bench.py not found at %s — the benchmark subcommand runs the "
        "repo-root harness and needs a source checkout.", repo_root)
    return False
  cmd = [sys.executable, str(repo_root / "bench.py"),
         "--batch", str(ns.batch), "--frames", str(ns.frames),
         "--iters", str(ns.iters), "--dtype", ns.dtype]
  if ns.compile_cache:
    cmd += ["--compile-cache", ns.compile_cache]
  return subprocess.call(cmd) == 0


_SUBCOMMANDS = None


def _subcommands():
  global _SUBCOMMANDS
  if _SUBCOMMANDS is None:
    from waveglow_tpu.cli.serve_cmd import init_serve_parser
    from waveglow_tpu.cli.synthesis_cmd import (init_synthesis_parser,
                                                init_synthesis_wav_parser)
    from waveglow_tpu.cli.training_cmd import (init_continue_training_parser,
                                               init_training_parser)
    from waveglow_tpu.cli.validation_cmd import init_validation_parser
    _SUBCOMMANDS = (
        ("download", "download pre-trained checkpoints from Nvidia",
         _init_download_parser),
        ("train", "start training", init_training_parser),
        ("continue-train", "continue training from a checkpoint",
         init_continue_training_parser),
        ("validate", "validate checkpoint(s)", init_validation_parser),
        ("synthesize", "synthesize mel-spectrograms into an audio signal",
         init_synthesis_parser),
        ("synthesize-wav", "synthesize audio files sample-wise "
         "(copy synthesis)", init_synthesis_wav_parser),
        ("benchmark", "measure synthesis/training throughput",
         _init_benchmark_parser),
        ("serve", "run the HTTP synthesis daemon", init_serve_parser),
    )
  return _SUBCOMMANDS


def build_parser() -> argparse.ArgumentParser:
  parser = argparse.ArgumentParser(
      prog=PROG,
      description="TPU-native CLI to train and use WaveGlow.",
      formatter_class=argparse.ArgumentDefaultsHelpFormatter)
  parser.add_argument("-v", "--version", action="version",
                      version=f"{PROG} {__version__}")
  subparsers = parser.add_subparsers(dest="command")
  for name, description, init_fn in _subcommands():
    sub = subparsers.add_parser(
        name, help=description,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    handler = init_fn(sub)
    sub.set_defaults(handler=handler)
    sub.add_argument("--log", type=parse_path, metavar="FILE",
                     default=DEFAULT_LOG, help="path to write the log")
    sub.add_argument("--debug", action="store_true",
                     help="include debugging information in the log")
  return parser


def debug_file_exists() -> bool:
  """``$TMP/waveglow-tpu-debug`` marker forces debug logging for every run
  without editing commands (reference cli.py:156-161 semantics)."""
  return (Path(tempfile.gettempdir()) / "waveglow-tpu-debug").is_file()


def run(args=None) -> int:
  from waveglow_tpu.cli.logging_config import (configure_root_logger,
                                               log_platform_banner,
                                               try_init_file_logger)

  parser = build_parser()
  ns = parser.parse_args(args)
  if not hasattr(ns, "handler"):
    # bare invocation prints help and succeeds (reference cli.py:143-144
    # returns None from parse_args -> exit 0; its tox smoke-runs this)
    parser.print_help()
    return 0

  debug = ns.debug or debug_file_exists()
  configure_root_logger(debug=debug)
  try_init_file_logger(ns.log, debug=debug)
  log_platform_banner(__version__)

  # persistent XLA compile cache, centrally for every subcommand BEFORE the
  # handler's first jit: --compile-cache where the subcommand defines it,
  # else $WAVEGLOW_TPU_COMPILE_CACHE (a no-op when neither is set; commands
  # that never compile pay nothing — jax is only imported if enabled)
  from waveglow_tpu.compile_cache import enable_compile_cache
  enable_compile_cache(getattr(ns, "compile_cache", None))

  start = time.perf_counter()
  try:
    success = ns.handler(ns)
  except KeyboardInterrupt:
    logger.warning("Interrupted.")
    return 130
  except Exception:  # noqa: BLE001
    logger.exception("Command failed with an unexpected error.")
    success = False
  duration = time.perf_counter() - start

  if success or success is None:
    logger.info("\x1b[32mEverything was successful!\x1b[0m "
                "(%.2fs)", duration)
    return 0
  logger.error("\x1b[31mSomething went wrong! See the log for details: "
               "%s\x1b[0m (%.2fs)", ns.log, duration)
  return 1


def run_prod() -> None:
  sys.exit(run())


if __name__ == "__main__":
  run_prod()
