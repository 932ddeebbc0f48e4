"""Checkpointing: native npz store, orbax sharded store, torch import,
pretrained download."""

from pathlib import Path
from typing import List, Tuple, Union

from waveglow_tpu.checkpointing.store import CheckpointWaveglow  # noqa: F401


def sniff_checkpoint_format(path: Union[str, Path]) -> str:
  """Detect a checkpoint's on-disk format by CONTENT: ``"orbax"`` (a
  directory), ``"npz"`` (the native single-file store) or ``"torch"``
  (any reference-era format, loaded via pickle by the torch importer).

  npz and modern torch ``.pt`` files are BOTH zip archives (``PK`` magic —
  torch defaults to its zipfile serialization since 1.6), so the zip cases
  are told apart by their members: a torch archive carries a ``data.pkl``
  pickle entry, an npz only ``.npy`` arrays. This matters twice: routing a
  torch zip into ``np.load`` fails with an opaque KeyError, and the serving
  daemon's ``/reload`` must know whether a path would reach ``torch.load``
  (arbitrary pickle deserialization) BEFORE loading it.
  """
  path = Path(path)
  if path.is_dir():
    return "orbax"
  with open(path, "rb") as f:
    magic = f.read(2)
  if magic != b"PK":
    return "torch"  # legacy torch pickle stream (pre-1.6 serialization)
  import zipfile
  try:
    with zipfile.ZipFile(path) as z:
      names = z.namelist()
  except zipfile.BadZipFile:
    return "torch"  # PK magic but not a readable zip: let torch complain
  if any(n == "data.pkl" or n.endswith("/data.pkl") for n in names):
    return "torch"
  return "npz"


def load_checkpoint_as(path: Union[str, Path],
                       fmt: str) -> CheckpointWaveglow:
  """Load a checkpoint as a SPECIFIC format (from
  :func:`sniff_checkpoint_format`). Callers that gate on the sniffed
  format (the serving daemon's /reload torch-pickle gate) must load
  through the SAME sniff result — re-sniffing at load time would let a
  file swapped between the two reads reach ``torch.load`` despite the
  gate (TOCTOU). A swapped file under a non-torch ``fmt`` fails safely:
  ``np.load(allow_pickle=False)`` and the orbax restore never execute
  pickle content.
  """
  if fmt == "orbax":
    from waveglow_tpu.checkpointing.orbax_store import restore_host
    return restore_host(Path(path))
  if fmt == "npz":
    return CheckpointWaveglow.load(path)
  if fmt != "torch":
    raise ValueError(f"unknown checkpoint format {fmt!r}")
  from waveglow_tpu.checkpointing.import_torch import load_torch_checkpoint
  return load_torch_checkpoint(path)


def load_checkpoint_any(path: Union[str, Path]) -> CheckpointWaveglow:
  """Load a checkpoint regardless of format: native .npz, orbax directory,
  or torch .pt (all reference formats). Detection is by content, not
  extension — see :func:`sniff_checkpoint_format`.
  """
  return load_checkpoint_as(path, sniff_checkpoint_format(path))


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
