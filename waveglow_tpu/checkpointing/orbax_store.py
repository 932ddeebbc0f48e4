"""Orbax-backed distributed checkpoint store (per-shard, gather-free saves).

The npz store (store.py) is the reference-parity format — one file carrying
the reference's exact payload (reference checkpoint.py:13-45) — but saving a
*sharded* train state through it all-gathers every non-addressable leaf to
every host first (store.py:_fetch_leaf). That is fine on one host and
acceptable at two; on a pod it moves O(model bytes) over ICI per save and
peaks host RAM at the full model size.

This store is the pod-scale alternative: Orbax/TensorStore writes each
process's **addressable shards only** (OCDBT key-value layout), so save cost
scales with the local shard bytes, hosts never materialize remote shards, and
:func:`restore_sharded` places every leaf straight onto the target mesh
sharding with no host-side gather or broadcast. Commit is atomic (orbax
writes into a temp dir and renames after a cross-process barrier), which is
the multi-host equivalent of store.py's tmpfile+rename.

Payload semantics stay the reference's: the params pytree, the optax state
as positional leaves, and ``{learning_rate, iteration, hparams}`` metadata
(JSON). One checkpoint = one directory ``<checkpoints_dir>/<iteration>.orbax``
next to any ``<iteration>.npz`` files, so both backends share a directory and
the discovery helpers in ``checkpointing/__init__`` see them uniformly.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import numpy as np

from waveglow_tpu.checkpointing.store import CheckpointWaveglow
from waveglow_tpu.hparams import HParams

ORBAX_SUFFIX = ".orbax"
_STATE_ITEM = "state"
_META_ITEM = "meta"


def checkpoint_path(checkpoints_dir: Union[str, Path],
                    iteration: int) -> Path:
  # orbax/TensorStore requires absolute paths — resolve() here keeps every
  # caller (CLI with relative CHECKPOINTS-FOLDER included) working
  return Path(checkpoints_dir).resolve() / f"{iteration}{ORBAX_SUFFIX}"


def is_orbax_checkpoint(path: Union[str, Path]) -> bool:
  """An orbax checkpoint is a directory containing the composite items."""
  path = Path(path)
  return path.is_dir() and (path / _STATE_ITEM).exists()


def get_all_orbax_iterations(checkpoints_dir: Union[str, Path]) -> List[int]:
  checkpoints_dir = Path(checkpoints_dir)
  if not checkpoints_dir.is_dir():
    return []
  its = []
  for p in checkpoints_dir.iterdir():
    if p.suffix == ORBAX_SUFFIX and p.stem.isdigit() and is_orbax_checkpoint(p):
      its.append(int(p.stem))
  return sorted(its)


def _checkpointer():
  import orbax.checkpoint as ocp
  return ocp.Checkpointer(ocp.CompositeCheckpointHandler())


def _build_save_args(checkpoints_dir: Union[str, Path], iteration: int,
                     params: Dict, opt_state: Any, hparams: HParams):
  import orbax.checkpoint as ocp

  path = checkpoint_path(checkpoints_dir, iteration)
  Path(checkpoints_dir).mkdir(parents=True, exist_ok=True)
  state = {
      "params": params,
      # positional leaves, same convention as store.py (the treedef is
      # rebuilt from optimizer.init(params) at restore)
      "opt": list(jax.tree_util.tree_leaves(opt_state)),
  }
  meta = {
      "learning_rate": hparams.learning_rate,
      "iteration": iteration,
      "hparams": asdict(hparams),
      "format_version": 1,
  }
  return path, ocp.args.Composite(
      **{_STATE_ITEM: ocp.args.StandardSave(state),
         _META_ITEM: ocp.args.JsonSave(meta)})


class AsyncSaver:
  """Non-blocking orbax saves: the device-to-host fetch is synchronous (so
  donated train-state buffers are safe to overwrite the moment ``save``
  returns), but the TensorStore disk/network write proceeds in background
  threads while training continues. ``wait()`` barriers on the in-flight
  write; it is called automatically before the next save and must be called
  (or ``close()``) before reading the checkpoint back.

  The reference has no async saving (its torch.save blocks the loop,
  reference checkpoint.py:30-35); at pod scale a blocking 644 MB write is a
  multi-second stall per save, which this removes from the step timeline.
  """

  def __init__(self):
    import orbax.checkpoint as ocp
    self._ckptr = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())

  def save(self, checkpoints_dir: Union[str, Path], iteration: int,
           params: Dict, opt_state: Any, hparams: HParams) -> Path:
    path, args = _build_save_args(checkpoints_dir, iteration, params,
                                  opt_state, hparams)
    self._ckptr.wait_until_finished()  # serialize with any in-flight save
    self._ckptr.save(path, force=True, args=args)
    return path

  def wait(self) -> None:
    self._ckptr.wait_until_finished()

  def close(self) -> None:
    self._ckptr.close()  # waits, then releases the thread pool

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()


def save_sharded(checkpoints_dir: Union[str, Path], iteration: int,
                 params: Dict, opt_state: Any, hparams: HParams) -> Path:
  """Save a (possibly sharded) train state. COLLECTIVE in multi-process runs:
  every process must call this at the same point; each writes only its own
  addressable shards and orbax barriers before the atomic rename.

  Unlike the npz path there is no process_index gate — all processes
  participate in one coordinated save.
  """
  path, args = _build_save_args(checkpoints_dir, iteration, params,
                                opt_state, hparams)
  ckptr = _checkpointer()
  try:
    ckptr.save(path, force=True, args=args)
  finally:
    ckptr.close()
  return path


def read_meta(path: Union[str, Path]) -> Dict:
  """Read only the JSON metadata item — no tensor bytes are touched."""
  import orbax.checkpoint as ocp

  path = Path(path).resolve()
  assert is_orbax_checkpoint(path), f"not an orbax checkpoint: {path}"
  ckptr = _checkpointer()
  try:
    restored = ckptr.restore(path, args=ocp.args.Composite(
        **{_META_ITEM: ocp.args.JsonRestore()}))
  finally:
    ckptr.close()
  return restored[_META_ITEM]


@dataclass
class OrbaxCheckpointRef:
  """A checkpoint by reference: metadata is loaded, tensors are NOT.

  This is what lets ``train()`` resume at pod scale without ever
  materializing the full model on a host — hparams/iteration come from the
  JSON item here, and the tensor leaves are later placed straight onto the
  training mesh via :func:`restore_sharded`, each process reading only the
  shard bytes it owns (the reference's resume loads everything eagerly,
  reference train.py:98-112 — fine single-host, quadratic waste on a pod).
  """
  path: Path
  learning_rate: float
  iteration: int
  hparams: Dict

  def get_hparams(self) -> HParams:
    from waveglow_tpu.hparams import hparams_from_dict
    hp, ignored = hparams_from_dict(self.hparams)
    if ignored:
      import logging
      logging.getLogger(__name__).warning(
          "Ignored checkpoint hparams unknown to this version: %s", ignored)
    return hp


def load_checkpoint_ref(path: Union[str, Path]) -> OrbaxCheckpointRef:
  """Metadata-only open of an orbax checkpoint (see OrbaxCheckpointRef)."""
  path = Path(path).resolve()
  meta = read_meta(path)
  return OrbaxCheckpointRef(path=path, learning_rate=meta["learning_rate"],
                            iteration=meta["iteration"],
                            hparams=meta["hparams"])


def restore_host(path: Union[str, Path]) -> CheckpointWaveglow:
  """Restore into the reference-payload container (host/replicated arrays).

  Template-free restore: leaves come back with the dtypes/shapes they were
  saved with, fully addressable. This is the interop path — the result feeds
  ``train(checkpoint=...)``, the Synthesizer, and the torch exporter exactly
  like an npz-loaded checkpoint.
  """
  import orbax.checkpoint as ocp

  path = Path(path).resolve()
  assert is_orbax_checkpoint(path), f"not an orbax checkpoint: {path}"
  ckptr = _checkpointer()
  try:
    restored = ckptr.restore(path, args=ocp.args.Composite(
        **{_STATE_ITEM: ocp.args.StandardRestore(),
           _META_ITEM: ocp.args.JsonRestore()}))
  finally:
    ckptr.close()
  state = restored[_STATE_ITEM]
  meta = restored[_META_ITEM]
  params = jax.tree_util.tree_map(np.asarray, state["params"])
  opt = [np.asarray(x) for x in state["opt"]] if state["opt"] else None
  return CheckpointWaveglow(state_dict=params, optimizer=opt,
                            learning_rate=meta["learning_rate"],
                            iteration=meta["iteration"],
                            hparams=meta["hparams"])


def restore_sharded(path: Union[str, Path], params_template: Dict,
                    optimizer) -> Tuple[Dict, Any, Dict]:
  """Restore directly onto a mesh: every leaf lands with the template's
  sharding, each process reading only the shard bytes it owns.

  Args:
    path: an ``<iteration>.orbax`` directory.
    params_template: pytree of REAL sharded ``jax.Array``s with the target
      placement — e.g. the output of ``parallel.sharding.shard_params``
      (real arrays, not ShapeDtypeStructs, so that ``optimizer.init`` can
      propagate each leaf's sharding to its adam mu/nu slots via
      ``zeros_like`` — no heuristic shape-matching).
    optimizer: the optax transformation; its ``init`` on the template gives
      the opt-state treedef and leaf shardings.

  Returns:
    (params, opt_state, meta) with params/opt_state placed per the template.
  """
  import orbax.checkpoint as ocp

  path = Path(path).resolve()
  assert is_orbax_checkpoint(path), f"not an orbax checkpoint: {path}"

  from jax.sharding import NamedSharding, PartitionSpec

  # the target mesh, from any sharded template leaf
  mesh = None
  for leaf in jax.tree_util.tree_leaves(params_template):
    mesh = getattr(getattr(leaf, "sharding", None), "mesh", None)
    if mesh is not None:
      break

  def abstract(a):
    sharding = getattr(a, "sharding", None)
    if mesh is not None and getattr(sharding, "mesh", None) != mesh:
      # leaves born outside the mesh (e.g. adam's scalar step counter,
      # created by optimizer.init as a fresh default-placement zero) must
      # come back replicated ON the mesh, or the first train step sees
      # mixed device sets
      sharding = NamedSharding(mesh, PartitionSpec())
    return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding)

  # optax.adam's mu/nu are zeros_like copies of the params tree, so they
  # inherit the template shardings exactly; scalar counters come out
  # replicated. The zeros are thrown away after shape/sharding extraction.
  opt_template = optimizer.init(params_template)
  template = {
      "params": jax.tree_util.tree_map(abstract, params_template),
      "opt": [abstract(x) for x in jax.tree_util.tree_leaves(opt_template)],
  }
  ckptr = _checkpointer()
  try:
    restored = ckptr.restore(path, args=ocp.args.Composite(
        **{_STATE_ITEM: ocp.args.StandardRestore(template),
           _META_ITEM: ocp.args.JsonRestore()}))
  finally:
    ckptr.close()
  state = restored[_STATE_ITEM]
  treedef = jax.tree_util.tree_structure(opt_template)
  opt_state = jax.tree_util.tree_unflatten(treedef, state["opt"])
  return state["params"], opt_state, restored[_META_ITEM]
