"""Import torch WaveGlow checkpoints into the native params pytree.

Handles all three on-disk variants the reference ecosystem produces:
  1. the stefantaubert ``Checkpoint`` dict ``{state_dict, optimizer,
     learning_rate, iteration, hparams}`` (reference checkpoint.py:13-45),
     whose state dict uses torch's *new* weight-norm parametrization keys
     (``...parametrizations.weight.original0/original1``, model.py:85-112);
  2. legacy weight-norm naming (``weight_g``/``weight_v``) as found in
     NVIDIA-trained state dicts;
  3. NVIDIA's raw pickled-module checkpoint (the published LJS files): the
     full ``nn.Module`` is unpickled via a shim ``glow`` module (the same
     trick as reference converter/convert.py:39-42 + converter/glow.py) and
     its ``state_dict()`` extracted with paper-constant hparams fabricated
     (reference converter/convert.py:45-68).

Fused state dicts (post ``remove_weightnorm``) are detected per-conv and
imported as plain weights.

Weight-layout mapping (torch -> native, see waveglow_tpu.models.wn):
  Conv1d        [Cout, Cin, 1]   -> [Cin, Cout]
  Conv1d k-tap  [Cout, Cin, K]   -> [K, Cin, Cout'] with gate/pair axes split
  ConvTranspose [Cin, Cout, K]   -> [Cin, K, Cout]
torch packs gate channels as [tanh C; sigmoid C] blocks and cond layers
layer-major (model.py:124-126) — both become explicit axes here via reshape.

The torch Adam ``optimizer`` state maps onto optax: ``exp_avg``/``exp_avg_sq``
are per-parameter elementwise moments, so each goes through the SAME layout
transform as its weight and lands on ``optax.ScaleByAdamState(count, mu,
nu)`` (:func:`torch_adam_to_opt_leaves`). ``continue-train`` from an imported
reference checkpoint therefore resumes Adam momentum exactly like the
reference's own resume (reference train.py:241-250, checkpoint.py:13-21);
torch and optax Adam share the update rule bit-for-bit modulo float order
(torch ``sqrt(v)/sqrt(bc2) + eps`` == optax ``sqrt(v/bc2) + eps``).
Checkpoints without a usable optimizer dict restart the optimizer, mirroring
the reference's warm-start semantics (train.py:85-90).
"""

from __future__ import annotations

import logging
import sys
import types
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np

from waveglow_tpu.checkpointing.store import CheckpointWaveglow
from waveglow_tpu.hparams import HParams

logger = logging.getLogger(__name__)


def _t(x) -> np.ndarray:
  import torch
  if isinstance(x, torch.Tensor):
    return x.detach().cpu().numpy().astype(np.float32)
  return np.asarray(x, dtype=np.float32)


def _get_conv(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
  """Fetch one torch conv's params in whichever weight-norm naming exists.

  Returns a dict with torch-layout arrays: {'w'} or {'g','v'}, plus 'b' if
  a bias exists.
  """
  out: Dict[str, np.ndarray] = {}
  if f"{prefix}.parametrizations.weight.original0" in sd:
    out["g"] = _t(sd[f"{prefix}.parametrizations.weight.original0"])
    out["v"] = _t(sd[f"{prefix}.parametrizations.weight.original1"])
  elif f"{prefix}.weight_g" in sd:
    out["g"] = _t(sd[f"{prefix}.weight_g"])
    out["v"] = _t(sd[f"{prefix}.weight_v"])
  elif f"{prefix}.weight" in sd:
    out["w"] = _t(sd[f"{prefix}.weight"])
  else:
    raise KeyError(f"no weight found for conv {prefix!r}")
  if f"{prefix}.bias" in sd:
    out["b"] = _t(sd[f"{prefix}.bias"])
  return out


def _map_1x1(conv: Dict, out_reshape=None) -> Dict:
  """torch [Cout, Cin, 1] -> native [Cin, Cout] (+ optional out-axes split)."""
  result: Dict[str, np.ndarray] = {}
  for key in ("w", "v"):
    if key in conv:
      w = conv[key][:, :, 0].T  # [Cin, Cout]
      if out_reshape is not None:
        w = w.reshape(w.shape[0], *out_reshape)
      result[key] = np.ascontiguousarray(w)
  for key in ("g", "b"):
    if key in conv:
      arr = conv[key].reshape(-1)
      if out_reshape is not None:
        arr = arr.reshape(*out_reshape)
      result[key] = np.ascontiguousarray(arr)
  return result


def _map_ktap(conv: Dict, out_reshape) -> Dict:
  """torch [Cout, Cin, K] -> native [K, Cin, *out_reshape]."""
  result: Dict[str, np.ndarray] = {}
  for key in ("w", "v"):
    if key in conv:
      w = conv[key].transpose(2, 1, 0)  # [K, Cin, Cout]
      result[key] = np.ascontiguousarray(
          w.reshape(w.shape[0], w.shape[1], *out_reshape))
  for key in ("g", "b"):
    if key in conv:
      result[key] = np.ascontiguousarray(conv[key].reshape(*out_reshape))
  return result


def state_dict_to_params(sd: Dict, hparams: HParams) -> Dict:
  """Map a torch WaveGlow state dict onto the native params pytree."""
  c = hparams.n_channels
  n_layers = hparams.n_layers

  up_w = _t(sd["upsample.weight"])  # [Cin, Cout, K]
  params: Dict = {
      "upsample": {
          "w": np.ascontiguousarray(up_w.transpose(0, 2, 1)),  # [Cin, K, Cout]
          "b": _t(sd["upsample.bias"]),
      },
      "flows": [],
  }

  for k in range(hparams.n_flows):
    inv_w = _t(sd[f"convinv.{k}.conv.weight"])[:, :, 0]  # [C, C]
    wn_prefix = f"WN.{k}"
    wn = {
        "start": _map_1x1(_get_conv(sd, f"{wn_prefix}.start")),
        "cond": _map_1x1(_get_conv(sd, f"{wn_prefix}.cond_layer"),
                         out_reshape=(n_layers, 2, c)),
        "in_layers": [
            _map_ktap(_get_conv(sd, f"{wn_prefix}.in_layers.{i}"),
                      out_reshape=(2, c))
            for i in range(n_layers)
        ],
        "res_skip": [
            _map_1x1(_get_conv(sd, f"{wn_prefix}.res_skip_layers.{i}"),
                     out_reshape=(2, c) if i < n_layers - 1 else None)
            for i in range(n_layers)
        ],
        "end": _map_1x1(_get_conv(sd, f"{wn_prefix}.end")),
    }
    params["flows"].append({"inv1x1": {"w": inv_w}, "wn": wn})
  return params


def torch_adam_to_opt_leaves(opt_sd: Dict, torch_sd: Dict,
                             hparams: HParams) -> Optional[List[np.ndarray]]:
  """Map a torch ``optim.Adam.state_dict()`` onto positional optax leaves.

  torch indexes optimizer state by the position of each tensor in
  ``model.parameters()`` — the same registration-order traversal that
  produces ``state_dict()`` keys (WaveGlow registers no buffers, so the
  orders coincide; every pairing is shape-checked below and any mismatch
  aborts the mapping rather than silently misassigning moments).

  ``exp_avg``/``exp_avg_sq`` are elementwise per-parameter, so each runs
  through the exact weight-layout transform of its own parameter
  (:func:`state_dict_to_params` on a synthetic state dict) and the results
  land on ``optax.ScaleByAdamState(count, mu, nu)`` in the positional leaf
  order :func:`waveglow_tpu.checkpointing.store.restore_opt_state` expects
  for ``optax.adam`` (reference resume semantics: train.py:241-250).

  Returns None (with a logged reason) when the state is absent/partial —
  the caller falls back to a fresh optimizer, the reference's warm-start
  behavior.
  """
  import optax

  state = opt_sd.get("state") if isinstance(opt_sd, dict) else None
  groups = opt_sd.get("param_groups") if isinstance(opt_sd, dict) else None
  if not state or not groups:
    logger.info("torch checkpoint has no Adam state; optimizer restarts")
    return None
  order = [i for g in groups for i in g.get("params", ())]
  # canonical parameters() order, NOT dict insertion order: a reference
  # state_dict already iterates in registration order, but checkpoints this
  # framework exported carry the same keys in a different insertion order
  from waveglow_tpu.checkpointing.export_torch import \
      reference_parameter_order
  try:
    names = reference_parameter_order(dict(torch_sd))
  except AssertionError:
    logger.warning("state dict keys do not match the reference WaveGlow "
                   "parameter layout; optimizer restarts")
    return None
  if len(order) != len(names):
    logger.warning(
        "torch optimizer covers %d params but the state dict has %d "
        "tensors; optimizer restarts", len(order), len(names))
    return None

  avg_sd: Dict[str, np.ndarray] = {}
  avg_sq_sd: Dict[str, np.ndarray] = {}
  step = 0
  for idx, name in zip(order, names):
    st = state.get(idx)
    if st is None or "exp_avg" not in st or "exp_avg_sq" not in st:
      logger.warning("torch Adam state missing for param %d (%s); "
                     "optimizer restarts", idx, name)
      return None
    avg = _t(st["exp_avg"])
    avg_sq = _t(st["exp_avg_sq"])
    want = tuple(torch_sd[name].shape)
    if avg.shape != want or avg_sq.shape != want:
      logger.warning("torch Adam moment shape %s != param %s shape %s; "
                     "optimizer restarts", avg.shape, name, want)
      return None
    avg_sd[name] = avg
    avg_sq_sd[name] = avg_sq
    step = max(step, int(float(_t(st["step"]).reshape(-1)[0]))
               if "step" in st else 0)

  mu = state_dict_to_params(avg_sd, hparams)
  nu = state_dict_to_params(avg_sq_sd, hparams)
  # optax.adam(float lr) state structure: (ScaleByAdamState, EmptyState) —
  # flattening the real structure keeps the positional order honest; a
  # structural drift in optax is caught by restore_opt_state's unflatten
  # (and pinned in tests/test_interop.py)
  import jax
  opt_state = (optax.ScaleByAdamState(
      count=np.asarray(step, np.int32), mu=mu, nu=nu), optax.EmptyState())
  return [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(opt_state)]


def _install_glow_shim() -> None:
  """Register a dummy ``glow`` module so NVIDIA's pickled full-module
  checkpoints resolve (reference converter/glow.py:6-15 ships a shim file)."""
  import torch

  if "glow" in sys.modules:
    return
  shim = types.ModuleType("glow")

  class WaveGlow(torch.nn.Module):
    pass

  class WN(torch.nn.Module):
    pass

  class Invertible1x1Conv(torch.nn.Module):
    pass

  shim.WaveGlow = WaveGlow
  shim.WN = WN
  shim.Invertible1x1Conv = Invertible1x1Conv
  sys.modules["glow"] = shim


def derive_hparams_from_state_dict(sd: Dict) -> HParams:
  """Infer the model architecture from a torch state dict's shapes.

  Training-related fields default to the WaveGlow-paper constants the
  reference fabricates for NVIDIA checkpoints (converter/convert.py:45-68);
  the architecture itself (flows, layers, channels, early-output schedule)
  is read off the weights so non-standard models import correctly.
  """

  def shape_of(prefix: str):
    for suffix in (".weight", ".weight_v", ".parametrizations.weight.original1"):
      key = prefix + suffix
      if key in sd:
        return tuple(sd[key].shape)
    raise KeyError(f"no weight found for {prefix}")

  n_flows = 0
  while f"convinv.{n_flows}.conv.weight" in sd:
    n_flows += 1
  n_layers = 0
  while any(f"WN.0.in_layers.{n_layers}{s}" in sd for s in
            (".weight", ".weight_v", ".parametrizations.weight.original1")):
    n_layers += 1

  in0 = shape_of("WN.0.in_layers.0")        # [2C, C, K]
  n_channels = in0[1]
  kernel_size = in0[2]
  n_mel_channels = tuple(sd["upsample.weight"].shape)[0]

  # early-output schedule from the convinv channel counts
  convinv_ch = [tuple(sd[f"convinv.{k}.conv.weight"].shape)[0]
                for k in range(n_flows)]
  n_group = convinv_ch[0]
  n_early_every = 0
  n_early_size = 0
  for k in range(1, n_flows):
    if convinv_ch[k] != convinv_ch[k - 1]:
      n_early_every = k
      n_early_size = convinv_ch[k - 1] - convinv_ch[k]
      break
  if n_early_every == 0:  # no drop observed; keep reference defaults
    n_early_every, n_early_size = 4, 2

  return HParams(
      batch_size=24, learning_rate=1e-4, sigma=1.0, segment_length=16000,
      n_mel_channels=n_mel_channels, sampling_rate=22050, filter_length=1024,
      hop_length=256, win_length=1024, mel_fmin=0.0, mel_fmax=8000.0,
      n_flows=n_flows, n_group=n_group, n_early_every=n_early_every,
      n_early_size=n_early_size, n_layers=n_layers, n_channels=n_channels,
      kernel_size=kernel_size)


def nvidia_paper_hparams(iteration: int = 580000) -> HParams:
  """Hparams fabricated for NVIDIA's published LJS checkpoints — paper
  constants, reference converter/convert.py:45-68."""
  return HParams(
      batch_size=24, learning_rate=1e-4, sigma=1.0, segment_length=16000,
      n_mel_channels=80, sampling_rate=22050, filter_length=1024,
      hop_length=256, win_length=1024, mel_fmin=0.0, mel_fmax=8000.0,
      n_flows=12, n_group=8, n_early_every=4, n_early_size=2,
      n_layers=8, n_channels=256, kernel_size=3)


def load_torch_checkpoint(path: Union[str, Path]) -> CheckpointWaveglow:
  """Load any of the three torch checkpoint variants into native form."""
  import torch

  _install_glow_shim()
  ckpt = torch.load(str(path), map_location="cpu", weights_only=False)

  if isinstance(ckpt, dict) and "state_dict" in ckpt and "hparams" in ckpt:
    # stefantaubert Checkpoint dict
    hparams_dict = dict(ckpt["hparams"])
    from waveglow_tpu.hparams import hparams_from_dict
    hparams, _ = hparams_from_dict(hparams_dict)
    sd = ckpt["state_dict"]
    params = state_dict_to_params(sd, hparams)
    opt_leaves = (torch_adam_to_opt_leaves(ckpt["optimizer"], sd, hparams)
                  if ckpt.get("optimizer") is not None else None)
    from dataclasses import asdict
    return CheckpointWaveglow(
        state_dict=params, optimizer=opt_leaves,
        learning_rate=float(ckpt.get("learning_rate", hparams.learning_rate)),
        iteration=int(ckpt.get("iteration", 0)), hparams=asdict(hparams))

  if isinstance(ckpt, dict) and "model" in ckpt:
    # NVIDIA raw checkpoint: {"model": nn.Module, "iteration": ..., ...}
    model = ckpt["model"]
    sd = model.state_dict() if hasattr(model, "state_dict") else model
    iteration = int(ckpt.get("iteration", 580000))
    hparams = derive_hparams_from_state_dict(sd)
    params = state_dict_to_params(sd, hparams)
    opt_leaves = (torch_adam_to_opt_leaves(ckpt["optimizer"], sd, hparams)
                  if ckpt.get("optimizer") is not None else None)
    from dataclasses import asdict
    return CheckpointWaveglow(
        state_dict=params, optimizer=opt_leaves, learning_rate=1e-4,
        iteration=iteration, hparams=asdict(hparams))

  raise ValueError(f"unrecognized torch checkpoint structure at {path}")


def convert_torch_checkpoint(origin: Path, destination: Path,
                             keep_orig: bool = False) -> CheckpointWaveglow:
  """Convert a torch checkpoint file to the native npz format in place
  (reference converter/convert.py:18-34 semantics: atomic, optional .orig)."""
  origin, destination = Path(origin), Path(destination)
  ckpt = load_torch_checkpoint(origin)
  # compare RESOLVED paths: a relative vs absolute (or symlinked) spelling
  # of the same file compared unequal lexically, skipping the backup and
  # then destroying the original despite keep_orig=True
  if keep_orig and origin.resolve() == destination.resolve():
    backup = origin.with_suffix(origin.suffix + ".orig")
    origin.replace(backup)
  ckpt.save(destination)
  return ckpt
