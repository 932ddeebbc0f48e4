"""Working TensorBoard event logging for training runs.

The reference ships a tensorboard logger that is stubbed to no-ops: both
``log_training`` and ``log_validation`` hit a bare ``return`` before the
dead SummaryWriter calls below them, and the SummaryWriter import itself is
commented out (reference logger.py:1, 13-21). This module is the working
realization of that intent — standard TensorBoard event files readable by
TensorBoard/XProf — kept opt-in (``train --tensorboard-dir``) because the
always-on JSONL :class:`waveglow_tpu.training.loop.MetricsLogger` remains
the canonical machine-readable record.

Scalars written:

  * ``train/loss``        — NLL per step (reference logger.py:14 intent)
  * ``train/duration_s``  — wall seconds per step
  * ``validation/loss``   — mean NLL over the validation set at every
    checkpoint save (reference logger.py:18 intent)

The writer is created lazily so importing this module costs nothing and
environments without the ``tensorboard`` package degrade with a clear
error only when the feature is actually requested.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union


class TensorBoardLogger:
  """Thin scalar-event writer around ``torch.utils.tensorboard``."""

  def __init__(self, logdir: Union[str, Path]):
    try:
      from torch.utils.tensorboard import SummaryWriter
    except ImportError as e:  # pragma: no cover - env always has torch+tb
      raise RuntimeError(
          "--tensorboard-dir requires the tensorboard package "
          "(torch.utils.tensorboard could not be imported)") from e
    logdir = Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    self._writer = SummaryWriter(log_dir=str(logdir))

  def log_training(self, iteration: int, loss: float,
                   duration_s: Optional[float] = None) -> None:
    self._writer.add_scalar("train/loss", loss, iteration)
    if duration_s is not None:
      self._writer.add_scalar("train/duration_s", duration_s, iteration)

  def log_validation(self, iteration: int, loss: float) -> None:
    self._writer.add_scalar("validation/loss", loss, iteration)

  def flush(self) -> None:
    self._writer.flush()

  def close(self) -> None:
    self._writer.close()


def make_tensorboard_logger(
    logdir: Optional[Union[str, Path]]) -> Optional[TensorBoardLogger]:
  """``None``-propagating constructor (mirrors MetricsLogger's gating)."""
  if logdir is None:
    return None
  return TensorBoardLogger(logdir)
