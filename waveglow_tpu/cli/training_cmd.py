"""``train`` / ``continue-train`` subcommands (reference cli/training.py)."""

from __future__ import annotations

import logging
import tempfile
from argparse import ArgumentParser, Namespace
from pathlib import Path

from waveglow_tpu.cli.argparse_helpers import (add_compute_arguments,
                                               add_hparams_argument,
                                               get_optional,
                                               parse_existing_directory,
                                               parse_existing_path,
                                               parse_path)
from waveglow_tpu.hparams import parse_custom_hparams

logger = logging.getLogger(__name__)


def init_training_parser(parser: ArgumentParser):
  default_log = Path(tempfile.gettempdir()) / "waveglow-tpu_logs"
  parser.description = "Start training of a new model."
  parser.add_argument("train_folder", metavar="TRAIN-FOLDER",
                      type=parse_existing_directory,
                      help="path to folder containing training data "
                           "(i.e., .wav files)")
  parser.add_argument("val_folder", metavar="VAL-FOLDER",
                      type=parse_existing_directory,
                      help="path to folder containing validation data")
  parser.add_argument("checkpoints_dir", metavar="CHECKPOINTS-FOLDER",
                      type=parse_path, help="path to folder to write "
                      "checkpoints")
  add_hparams_argument(parser)
  add_compute_arguments(parser)
  parser.add_argument("--pre-trained-model", metavar="PRE-TRAINED-MODEL",
                      type=get_optional(parse_existing_path), default=None,
                      help="path to checkpoint used for warm start "
                           "(native .npz or torch .pt)")
  parser.add_argument("--warm-start", action="store_true",
                      help="warm start using PRE-TRAINED-MODEL")
  parser.add_argument("--tl-dir", type=parse_path, metavar="LOG-DIR",
                      default=default_log,
                      help="folder for training metrics (JSONL)")
  parser.add_argument("--auto-resume", action="store_true",
                      help="if CHECKPOINTS-FOLDER already holds checkpoints, "
                           "continue from the latest instead of failing — "
                           "makes the same command preemption-safe to re-run")
  _add_tensorboard_arg(parser)
  _add_profile_arg(parser)
  _add_multihost_args(parser)
  return train_ns


def init_continue_training_parser(parser: ArgumentParser):
  default_log = Path(tempfile.gettempdir()) / "waveglow-tpu_logs"
  parser.description = "Continue training from the latest checkpoint."
  parser.add_argument("train_folder", metavar="TRAIN-FOLDER",
                      type=parse_existing_directory)
  parser.add_argument("val_folder", metavar="VAL-FOLDER",
                      type=parse_existing_directory)
  parser.add_argument("checkpoints_dir", metavar="CHECKPOINTS-FOLDER",
                      type=parse_existing_directory)
  add_hparams_argument(parser)
  add_compute_arguments(parser)
  parser.add_argument("--tl-dir", type=parse_path, metavar="LOG-DIR",
                      default=default_log)
  _add_tensorboard_arg(parser)
  _add_profile_arg(parser)
  _add_multihost_args(parser)
  return continue_train_ns


def _add_tensorboard_arg(parser: ArgumentParser) -> None:
  parser.add_argument("--tensorboard-dir", type=get_optional(parse_path),
                      metavar="EVENT-DIR", default=None,
                      help="write TensorBoard scalar events (train loss, "
                           "step duration, validation loss) into this "
                           "folder — the working version of the "
                           "reference's stubbed tensorboard logger")


def _add_profile_arg(parser: ArgumentParser) -> None:
  parser.add_argument("--profile-dir", type=get_optional(parse_path),
                      metavar="TRACE-DIR", default=None,
                      help="capture a jax.profiler trace of the run into "
                           "this folder (open with TensorBoard/XProf); use "
                           "with a bounded run — traces grow with steps")


def _add_multihost_args(parser: ArgumentParser) -> None:
  parser.add_argument("--coordinator-address", default=None,
                      metavar="HOST:PORT",
                      help="multi-host coordinator (jax.distributed); "
                           "auto-detected on Cloud TPU pods")
  parser.add_argument("--num-processes", type=int, default=None)
  parser.add_argument("--process-id", type=int, default=None)


def _maybe_init_multihost(ns: Namespace) -> None:
  from waveglow_tpu.parallel.mesh import initialize_multihost
  initialize_multihost(coordinator_address=ns.coordinator_address,
                       num_processes=ns.num_processes,
                       process_id=ns.process_id)


def _custom_hparams(ns: Namespace):
  custom = parse_custom_hparams(ns.custom_hparams)
  if getattr(ns, "compute_dtype", None):
    custom["compute_dtype"] = ns.compute_dtype
  return custom or None


def train_ns(ns: Namespace) -> bool:
  _maybe_init_multihost(ns)
  from waveglow_tpu.checkpointing import (get_all_iterations_any,
                                          get_last_checkpoint_any,
                                          load_checkpoint_any,
                                          load_checkpoint_lazy)
  from waveglow_tpu.training.data import load_dataset
  from waveglow_tpu.training.loop import train

  checkpoint = None
  existing = get_all_iterations_any(ns.checkpoints_dir) \
      if Path(ns.checkpoints_dir).exists() else []
  if getattr(ns, "auto_resume", False) and existing:
    # preemption-safe restart: the SAME train command picks up where the
    # killed run left off (all hosts load the same file, so a multi-host
    # job restarts coordinated at one step). Lazy: orbax checkpoints open
    # by reference and restore straight onto the training mesh.
    last_path, last_it = get_last_checkpoint_any(ns.checkpoints_dir)
    logger.info("Auto-resume: continuing from iteration %d (%s)",
                last_it, last_path)
    checkpoint = load_checkpoint_lazy(last_path)
  elif existing:
    # fail instead of silently restarting at iteration 0 and OVERWRITING
    # the prior run's checkpoints at the same iteration numbers (what the
    # --auto-resume help always promised the default would do)
    logger.error(
        "Checkpoints already exist in %s (iterations %s..%s). Use "
        "continue-train to resume, --auto-resume to make this command "
        "preemption-safe, or point CHECKPOINTS-FOLDER somewhere fresh.",
        ns.checkpoints_dir, min(existing), max(existing))
    return False

  if bool(ns.pre_trained_model is not None) != bool(ns.warm_start):
    # one without the other silently trained from random init; the user
    # discovered hours later that the pretrained weights never loaded
    logger.error("--pre-trained-model and --warm-start must be used "
                 "together (got %s without %s).",
                 "--pre-trained-model" if ns.pre_trained_model is not None
                 else "--warm-start",
                 "--warm-start" if ns.pre_trained_model is not None
                 else "--pre-trained-model")
    return False
  warm_model = None
  if ns.pre_trained_model is not None and ns.warm_start and checkpoint is None:
    warm_model = load_checkpoint_any(ns.pre_trained_model)

  trainset = load_dataset(ns.train_folder)
  valset = load_dataset(ns.val_folder)
  logger.info("Trainset: %d entries | Valset: %d entries",
              len(trainset), len(valset))

  from waveglow_tpu.profiling import trace
  with trace(ns.profile_dir):
    train(custom_hparams=_custom_hparams(ns), logdir=ns.tl_dir,
          trainset=trainset, valset=valset,
          save_checkpoint_dir=ns.checkpoints_dir, checkpoint=checkpoint,
          warm_model=warm_model, tensorboard_dir=ns.tensorboard_dir)
  return True


def continue_train_ns(ns: Namespace) -> bool:
  _maybe_init_multihost(ns)
  from waveglow_tpu.checkpointing import (get_last_checkpoint_any,
                                          load_checkpoint_lazy)
  from waveglow_tpu.training.data import load_dataset
  from waveglow_tpu.training.loop import train

  last_path, last_it = get_last_checkpoint_any(ns.checkpoints_dir)
  logger.info("Continuing from iteration %d (%s)", last_it, last_path)
  checkpoint = load_checkpoint_lazy(last_path)

  trainset = load_dataset(ns.train_folder)
  valset = load_dataset(ns.val_folder)

  from waveglow_tpu.profiling import trace
  with trace(ns.profile_dir):
    train(custom_hparams=_custom_hparams(ns), logdir=ns.tl_dir,
          trainset=trainset, valset=valset,
          save_checkpoint_dir=ns.checkpoints_dir, checkpoint=checkpoint,
          warm_model=None, tensorboard_dir=ns.tensorboard_dir)
  return True
