"""Native checkpoint store: single-file npz with the reference's payload.

Payload semantics match reference checkpoint.py:13-45 / model_checkpoint.py:
one file per save named ``<iteration>.npz`` carrying
``{state_dict (params), optimizer, learning_rate, iteration, hparams}``;
hparams travel inside the checkpoint and are reloaded leniently (unknown keys
dropped). Discovery helpers mirror reference utils.py:255-294 and 464-474.

Format: the params pytree (nested dicts/lists of arrays) is flattened to
``'/'``-joined keys; the optax optimizer state is flattened positionally (its
treedef is reconstructed from ``optimizer.init(params)`` at load); metadata is
a JSON sidecar entry inside the npz. Saves are atomic (tmp file + rename).
"""

from __future__ import annotations

import functools
import json
import os
import tempfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import numpy as np

from waveglow_tpu.hparams import HParams, hparams_from_dict

CKPT_EXT = ".npz"
_META_KEY = "__meta__"
_OPT_PREFIX = "__opt__/"


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
  """Flatten nested dicts/lists of arrays into '/'-joined keys."""
  flat: Dict[str, np.ndarray] = {}
  if isinstance(tree, dict):
    for k, v in tree.items():
      flat.update(flatten_tree(v, f"{prefix}{k}/"))
  elif isinstance(tree, (list, tuple)):
    for i, v in enumerate(tree):
      flat.update(flatten_tree(v, f"{prefix}{i}/"))
  else:
    flat[prefix[:-1]] = np.asarray(tree)
  return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
  """Inverse of :func:`flatten_tree` (integer-keyed levels become lists)."""
  root: Dict = {}
  for key, value in flat.items():
    parts = key.split("/")
    node = root
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = value

  def build(node):
    if not isinstance(node, dict):
      return node
    keys = list(node.keys())
    # only a CONTIGUOUS 0..n-1 digit key set is a flattened list; a dict
    # that merely happens to have digit keys (e.g. only '10') would
    # otherwise crash on node['0'] — and is not a list round-trip anyway
    if keys and all(k.isdigit() for k in keys) and (
        {int(k) for k in keys} == set(range(len(keys)))):
      return [build(node[str(i)]) for i in range(len(keys))]
    return {k: build(v) for k, v in node.items()}

  return build(root)


@functools.lru_cache(maxsize=8)
def _replicate_fn(mesh):
  """One jitted identity-with-replicated-output per mesh: building a fresh
  ``jax.jit(lambda ...)`` per LEAF re-traced the gather program and
  dispatched one synchronous collective per leaf on the checkpoint-save
  path (hundreds of tiny round-trips per save)."""
  from jax.sharding import NamedSharding, PartitionSpec
  return jax.jit(lambda a: a,
                 out_shardings=NamedSharding(mesh, PartitionSpec()))


def _fetch_leaf(x: Any) -> np.ndarray:
  """Fetch one leaf to host numpy, gathering non-addressable shards.

  In multi-process runs a sharded ``jax.Array`` owns only its local shards;
  ``np.asarray`` on it raises. A jitted identity with a fully-replicated
  output sharding performs the all-gather (collective — every process must
  call this at the same point), after which the value is addressable
  everywhere. Replicated/host arrays pass straight through.
  """
  if isinstance(x, jax.Array) and not (x.is_fully_addressable
                                       or x.is_fully_replicated):
    mesh = getattr(x.sharding, "mesh", None)
    if mesh is not None:
      x = _replicate_fn(mesh)(x)
  return np.asarray(x)


def _to_host(tree: Any) -> Any:
  return jax.tree_util.tree_map(_fetch_leaf, tree)


@dataclass
class CheckpointWaveglow:
  """The reference's checkpoint container (checkpoint.py:13-21), natively."""
  state_dict: Dict                       # params pytree
  optimizer: Optional[List[np.ndarray]]  # optax state leaves (positional)
  learning_rate: float
  iteration: int
  hparams: Dict

  def get_hparams(self) -> HParams:
    hp, ignored = hparams_from_dict(self.hparams)
    if ignored:
      import logging
      logging.getLogger(__name__).warning(
          "Ignored checkpoint hparams unknown to this version: %s", ignored)
    return hp

  @classmethod
  def from_state(cls, params: Dict, opt_state: Any, hparams: HParams,
                 iteration: int) -> "CheckpointWaveglow":
    from dataclasses import asdict
    opt_leaves = [_fetch_leaf(x) for x in jax.tree_util.tree_leaves(opt_state)]
    return cls(state_dict=_to_host(params), optimizer=opt_leaves,
               learning_rate=hparams.learning_rate, iteration=iteration,
               hparams=asdict(hparams))

  def save(self, path: Union[str, Path]) -> None:
    path = Path(path)
    arrays = {f"params/{k}": v
              for k, v in flatten_tree(self.state_dict).items()}
    if self.optimizer is not None:
      for i, leaf in enumerate(self.optimizer):
        arrays[f"{_OPT_PREFIX}{i}"] = np.asarray(leaf)
    meta = json.dumps({
        "learning_rate": self.learning_rate,
        "iteration": self.iteration,
        "hparams": self.hparams,
        "format_version": 1,
    })
    arrays[_META_KEY] = np.frombuffer(meta.encode("utf-8"), dtype=np.uint8)

    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    os.close(fd)
    try:
      with open(tmp, "wb") as f:
        np.savez(f, **arrays)
      os.replace(tmp, path)
    finally:
      if os.path.exists(tmp):
        os.remove(tmp)

  @classmethod
  def load(cls, path: Union[str, Path]) -> "CheckpointWaveglow":
    path = Path(path)
    assert path.is_file(), f"checkpoint not found: {path}"
    with np.load(path, allow_pickle=False) as data:
      meta = json.loads(bytes(data[_META_KEY].tobytes()).decode("utf-8"))
      params_flat = {}
      opt_leaves: Dict[int, np.ndarray] = {}
      for key in data.files:
        if key == _META_KEY:
          continue
        if key.startswith(_OPT_PREFIX):
          opt_leaves[int(key[len(_OPT_PREFIX):])] = data[key]
        elif key.startswith("params/"):
          params_flat[key[len("params/"):]] = data[key]
    optimizer = ([opt_leaves[i] for i in range(len(opt_leaves))]
                 if opt_leaves else None)
    return cls(state_dict=unflatten_tree(params_flat), optimizer=optimizer,
               learning_rate=meta["learning_rate"],
               iteration=meta["iteration"], hparams=meta["hparams"])


def restore_opt_state(leaves: Optional[List[np.ndarray]], optimizer,
                      params: Dict) -> Any:
  """Rebuild an optax state pytree from positional leaves."""
  if leaves is None:
    return optimizer.init(params)
  # only the treedef is needed — eval_shape gives it without allocating
  # a throwaway zeros copy of the full optimizer state
  treedef = jax.tree_util.tree_structure(
      jax.eval_shape(optimizer.init, params))
  return jax.tree_util.tree_unflatten(treedef, leaves)


def get_checkpoint_filename(iteration: int) -> str:
  return f"{iteration}{CKPT_EXT}"


def get_all_checkpoint_iterations(checkpoint_dir: Path) -> List[int]:
  checkpoint_dir = Path(checkpoint_dir)
  if not checkpoint_dir.is_dir():
    return []
  its = []
  for p in checkpoint_dir.iterdir():
    if p.suffix == CKPT_EXT and p.stem.isdigit():
      its.append(int(p.stem))
  return sorted(its)


def get_last_checkpoint(checkpoint_dir: Path) -> Tuple[Path, int]:
  its = get_all_checkpoint_iterations(checkpoint_dir)
  if not its:
    raise FileNotFoundError(f"No checkpoint found in {checkpoint_dir}")
  last = max(its)
  return Path(checkpoint_dir) / get_checkpoint_filename(last), last


def get_checkpoint(checkpoint_dir: Path, iteration: int) -> Path:
  path = Path(checkpoint_dir) / get_checkpoint_filename(iteration)
  if not path.is_file():
    raise FileNotFoundError(
        f"Checkpoint with iteration {iteration} not found in {checkpoint_dir}")
  return path


def get_custom_or_last_checkpoint(
    checkpoint_dir: Path, custom_iteration: Optional[int]) -> Tuple[Path, int]:
  if custom_iteration is not None:
    return get_checkpoint(checkpoint_dir, custom_iteration), custom_iteration
  return get_last_checkpoint(checkpoint_dir)


def filter_checkpoints(iterations: List[int], select: Optional[int] = None,
                       min_it: Optional[int] = None,
                       max_it: Optional[int] = None) -> List[int]:
  select = select or 0
  min_it = min_it or 0
  if max_it is None and iterations:
    max_it = max(iterations)
  result = [it for it in iterations
            if min_it <= it <= (max_it if max_it is not None else it)]
  if select > 0:
    result = [it for it in result if it % select == 0]
  return result
