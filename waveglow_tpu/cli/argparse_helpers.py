"""Typed argparse validators (reference: waveglow_cli/argparse_helper.py)."""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Callable, Optional


def parse_path(value: str) -> Path:
  try:
    return Path(value)
  except ValueError as ex:
    raise argparse.ArgumentTypeError(f"invalid path: {value!r}") from ex


def parse_existing_file(value: str) -> Path:
  path = parse_path(value)
  if not path.is_file():
    raise argparse.ArgumentTypeError(f"file does not exist: {value!r}")
  return path


def parse_existing_directory(value: str) -> Path:
  path = parse_path(value)
  if not path.is_dir():
    raise argparse.ArgumentTypeError(f"directory does not exist: {value!r}")
  return path


def parse_existing_path(value: str) -> Path:
  """A file OR a directory (orbax checkpoints are directories)."""
  path = parse_path(value)
  if not path.exists():
    raise argparse.ArgumentTypeError(f"path does not exist: {value!r}")
  return path


def parse_non_empty(value: str) -> str:
  if not value:
    raise argparse.ArgumentTypeError("value must not be empty")
  return value


def parse_positive_integer(value: str) -> int:
  try:
    result = int(value)
  except ValueError as ex:
    raise argparse.ArgumentTypeError(f"not an integer: {value!r}") from ex
  if result <= 0:
    raise argparse.ArgumentTypeError(f"value must be > 0: {value!r}")
  return result


def parse_non_negative_integer(value: str) -> int:
  try:
    result = int(value)
  except ValueError as ex:
    raise argparse.ArgumentTypeError(f"not an integer: {value!r}") from ex
  if result < 0:
    raise argparse.ArgumentTypeError(f"value must be >= 0: {value!r}")
  return result


def parse_float(value: str) -> float:
  try:
    return float(value)
  except ValueError as ex:
    raise argparse.ArgumentTypeError(f"not a float: {value!r}") from ex


def parse_float_0_to_1(value: str) -> float:
  result = parse_float(value)
  if not 0.0 <= result <= 1.0:
    raise argparse.ArgumentTypeError(f"value must be in [0, 1]: {value!r}")
  return result


def get_optional(parser_fn: Callable) -> Callable:
  def wrapper(value: str):
    if value is None or value == "":
      return None
    return parser_fn(value)
  return wrapper


def add_hparams_argument(parser: argparse.ArgumentParser) -> None:
  parser.add_argument(
      "--custom-hparams", type=get_optional(parse_non_empty), default=None,
      metavar="CUSTOM-HYPERPARAMETERS",
      help='custom hyperparameters comma separated, e.g. '
           '"batch_size=4,n_flows=12"')


def add_denoiser_and_sigma_arguments(parser: argparse.ArgumentParser) -> None:
  parser.add_argument("--sigma", type=parse_float, default=1.0,
                      help="sigma used for synthesis")
  parser.add_argument("--denoiser-strength", type=parse_float_0_to_1,
                      default=0.0005, metavar="DENOISER-STRENGTH",
                      help="strength of denoising to remove model bias")


def add_compute_arguments(parser: argparse.ArgumentParser) -> None:
  parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                      default=None,
                      help="matmul precision: float32 (reference parity) or "
                           "bfloat16 (fast TPU path)")
  parser.add_argument("--compile-cache", type=str, default=None,
                      metavar="DIR",
                      help="persistent XLA compile cache directory: repeat "
                           "runs load their compiled programs from disk "
                           "instead of recompiling (~37 s per full-model "
                           "program on a tunneled TPU; default: "
                           "$WAVEGLOW_TPU_COMPILE_CACHE if set)")
