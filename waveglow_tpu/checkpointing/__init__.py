"""Checkpointing: native npz store, orbax sharded store, torch import,
pretrained download."""

from pathlib import Path
from typing import List, Tuple, Union

from waveglow_tpu.checkpointing.store import CheckpointWaveglow  # noqa: F401


def load_checkpoint_any(path: Union[str, Path]) -> CheckpointWaveglow:
  """Load a checkpoint regardless of format: native .npz, orbax directory,
  or torch .pt.

  Detection is by content, not extension: orbax checkpoints are directories;
  npz files start with the zip magic ``PK``; anything else is handed to the
  torch importer (which understands all three reference formats).
  """
  path = Path(path)
  if path.is_dir():
    from waveglow_tpu.checkpointing.orbax_store import restore_host
    return restore_host(path)
  with open(path, "rb") as f:
    magic = f.read(2)
  if magic == b"PK":
    return CheckpointWaveglow.load(path)
  from waveglow_tpu.checkpointing.import_torch import load_torch_checkpoint
  return load_torch_checkpoint(path)


def load_checkpoint_lazy(path: Union[str, Path]):
  """Like :func:`load_checkpoint_any`, but orbax checkpoints open by
  REFERENCE (metadata only — no tensor bytes): ``train()`` then restores the
  leaves directly onto the training mesh via ``restore_sharded``, each
  process reading only its own shards. Non-orbax formats load eagerly (they
  are single-file formats; there is nothing shard-local to defer)."""
  path = Path(path)
  if path.is_dir():
    from waveglow_tpu.checkpointing.orbax_store import load_checkpoint_ref
    return load_checkpoint_ref(path)
  return load_checkpoint_any(path)


def get_all_iterations_any(checkpoints_dir: Union[str, Path]) -> List[int]:
  """All checkpoint iterations in a directory across both native backends
  (``<it>.npz`` files and ``<it>.orbax`` directories)."""
  from waveglow_tpu.checkpointing.orbax_store import get_all_orbax_iterations
  from waveglow_tpu.checkpointing.store import get_all_checkpoint_iterations
  return sorted(set(get_all_checkpoint_iterations(Path(checkpoints_dir)))
                | set(get_all_orbax_iterations(checkpoints_dir)))


def get_checkpoint_any(checkpoints_dir: Union[str, Path],
                       iteration: int) -> Path:
  """Path of the checkpoint at ``iteration`` in either backend format
  (npz preferred when both exist, as the reference-parity format)."""
  from waveglow_tpu.checkpointing.orbax_store import (checkpoint_path,
                                                      is_orbax_checkpoint)
  npz = Path(checkpoints_dir) / f"{iteration}.npz"
  if npz.is_file():
    return npz
  orbax = checkpoint_path(checkpoints_dir, iteration)
  if is_orbax_checkpoint(orbax):
    return orbax
  raise FileNotFoundError(
      f"Checkpoint with iteration {iteration} not found in {checkpoints_dir}")


def get_last_checkpoint_any(
    checkpoints_dir: Union[str, Path]) -> Tuple[Path, int]:
  its = get_all_iterations_any(checkpoints_dir)
  if not its:
    raise FileNotFoundError(f"No checkpoint found in {checkpoints_dir}")
  last = max(its)
  return get_checkpoint_any(checkpoints_dir, last), last
