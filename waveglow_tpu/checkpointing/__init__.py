"""Checkpointing: native npz store, torch import, pretrained download."""

from pathlib import Path
from typing import Union

from waveglow_tpu.checkpointing.store import CheckpointWaveglow  # noqa: F401


def load_checkpoint_any(path: Union[str, Path]) -> CheckpointWaveglow:
  """Load a checkpoint regardless of format: native .npz or torch .pt.

  Detection is by content, not extension: npz files start with the zip
  magic ``PK``; anything else is handed to the torch importer (which
  understands all three reference formats).
  """
  path = Path(path)
  with open(path, "rb") as f:
    magic = f.read(2)
  if magic == b"PK":
    return CheckpointWaveglow.load(path)
  from waveglow_tpu.checkpointing.import_torch import load_torch_checkpoint
  return load_torch_checkpoint(path)
