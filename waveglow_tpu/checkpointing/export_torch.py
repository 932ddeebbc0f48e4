"""Export native params to a reference-compatible torch checkpoint.

The inverse of waveglow_tpu.checkpointing.import_torch: produces the
stefantaubert ``Checkpoint`` dict ``{state_dict, optimizer, learning_rate,
iteration, hparams}`` (reference checkpoint.py:13-21) whose state dict uses
torch's new weight-norm parametrization naming — directly loadable by the
reference's ``CheckpointWaveglow.load`` + ``load_model`` path. This closes
the interop loop: models trained on TPU can be served by the reference
PyTorch stack and vice versa.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Union

import numpy as np

from waveglow_tpu.checkpointing.store import CheckpointWaveglow
from waveglow_tpu.hparams import HParams, hparams_from_dict


def _t(arr: np.ndarray):
  import torch
  return torch.from_numpy(np.ascontiguousarray(np.asarray(arr,
                                                          dtype=np.float32)))


def _conv_to_torch(conv: Dict, sd: Dict, prefix: str, kernel_axis: bool
                   ) -> None:
  """Write one conv dict into torch naming/layout.

  Native layouts: 1x1 ``[Cin, *out]``; k-tap ``[K, Cin, *out]``. Torch conv
  weight: ``[Cout, Cin, K]``.
  """
  def to_torch_w(w: np.ndarray) -> np.ndarray:
    w = np.asarray(w)
    if kernel_axis:
      k, cin = w.shape[0], w.shape[1]
      w = w.reshape(k, cin, -1)           # [K, Cin, Cout]
      return w.transpose(2, 1, 0)         # [Cout, Cin, K]
    cin = w.shape[0]
    w = w.reshape(cin, -1)                # [Cin, Cout]
    return w.T[:, :, None]                # [Cout, Cin, 1]

  if "v" in conv:
    g = np.asarray(conv["g"]).reshape(-1)
    sd[f"{prefix}.parametrizations.weight.original0"] = _t(
        g[:, None, None])
    sd[f"{prefix}.parametrizations.weight.original1"] = _t(
        to_torch_w(conv["v"]))
  else:
    sd[f"{prefix}.weight"] = _t(to_torch_w(conv["w"]))
  if "b" in conv:
    sd[f"{prefix}.bias"] = _t(np.asarray(conv["b"]).reshape(-1))


def params_to_state_dict(params: Dict) -> Dict:
  """Native params pytree -> torch state dict (reference model naming)."""
  sd: Dict = {}
  up_w = np.asarray(params["upsample"]["w"])        # [Cin, K, Cout]
  sd["upsample.weight"] = _t(up_w.transpose(0, 2, 1))  # [Cin, Cout, K]
  sd["upsample.bias"] = _t(params["upsample"]["b"])

  for k, flow in enumerate(params["flows"]):
    w = np.asarray(flow["inv1x1"]["w"])
    sd[f"convinv.{k}.conv.weight"] = _t(w[:, :, None])
    wn = flow["wn"]
    _conv_to_torch(wn["start"], sd, f"WN.{k}.start", kernel_axis=False)
    _conv_to_torch(wn["cond"], sd, f"WN.{k}.cond_layer", kernel_axis=False)
    for i, conv in enumerate(wn["in_layers"]):
      _conv_to_torch(conv, sd, f"WN.{k}.in_layers.{i}", kernel_axis=True)
    for i, conv in enumerate(wn["res_skip"]):
      _conv_to_torch(conv, sd, f"WN.{k}.res_skip_layers.{i}",
                     kernel_axis=False)
    _conv_to_torch(wn["end"], sd, f"WN.{k}.end", kernel_axis=False)
  return sd


def reference_parameter_order(sd: Dict) -> list:
  """State-dict keys in the reference model's ``parameters()`` order.

  torch indexes optimizer state by parameter POSITION, which follows module
  registration order — for the reference WaveGlow (model.py:142-175):
  ``upsample``, then each ``WN.k`` (whose __init__ registers ``in_layers``,
  ``res_skip_layers``, ``start``, ``end``, ``cond_layer`` in that order,
  model.py:75-113), then each ``convinv.k``. Within a conv, torch removes
  the parametrized ``weight`` from its own parameter dict, leaving ``bias``
  first, then the ``parametrizations.weight.original0/1`` submodule params;
  a plain conv keeps ``weight`` then ``bias``. Our own emit order
  interleaves differently, so the optimizer export must NOT rely on dict
  insertion order.
  """
  def conv_keys(prefix):
    keys = []
    if f"{prefix}.parametrizations.weight.original0" in sd:
      # parametrized weight norm removed 'weight' before 'bias', so bias
      # leads, then the parametrization submodule's params
      if f"{prefix}.bias" in sd:
        keys.append(f"{prefix}.bias")
      keys += [f"{prefix}.parametrizations.weight.original0",
               f"{prefix}.parametrizations.weight.original1"]
    elif f"{prefix}.weight_g" in sd:
      # legacy weight_norm hook: weight deleted, g/v registered after bias
      if f"{prefix}.bias" in sd:
        keys.append(f"{prefix}.bias")
      keys += [f"{prefix}.weight_g", f"{prefix}.weight_v"]
    else:
      if f"{prefix}.weight" in sd:
        keys.append(f"{prefix}.weight")
      if f"{prefix}.bias" in sd:
        keys.append(f"{prefix}.bias")
    return keys

  n_flows = 0
  while f"convinv.{n_flows}.conv.weight" in sd:
    n_flows += 1
  n_layers = 0
  while any(f"WN.0.in_layers.{n_layers}{s}" in sd
            for s in (".weight", ".weight_v",
                      ".parametrizations.weight.original1")):
    n_layers += 1

  order = ["upsample.weight", "upsample.bias"]
  for k in range(n_flows):
    for i in range(n_layers):
      order += conv_keys(f"WN.{k}.in_layers.{i}")
    for i in range(n_layers):
      order += conv_keys(f"WN.{k}.res_skip_layers.{i}")
    order += conv_keys(f"WN.{k}.start")
    order += conv_keys(f"WN.{k}.end")
    order += conv_keys(f"WN.{k}.cond_layer")
  for k in range(n_flows):
    order.append(f"convinv.{k}.conv.weight")

  assert set(order) == set(sd.keys()), (
      sorted(set(sd.keys()) - set(order)), sorted(set(order) - set(sd.keys())))
  return order


def opt_leaves_to_torch_adam(opt_leaves, params: Dict,
                             learning_rate: float) -> Dict:
  """Positional optax Adam leaves -> a torch ``optim.Adam.state_dict()``.

  The inverse of import_torch.torch_adam_to_opt_leaves: mu/nu are unflattened
  against the canonical ``optax.adam`` state structure, pushed through the
  SAME weight-layout transforms as the parameters (:func:`params_to_state_dict`
  on the moment trees), and keyed by the position each tensor takes in the
  reference model's ``parameters()`` order (== its state-dict order; WaveGlow
  registers no buffers). The reference's ``load_optimizer``
  (train.py:241-250) then resumes with this framework's momentum.
  """
  import jax
  import optax

  skeleton = jax.eval_shape(
      optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8).init, params)
  treedef = jax.tree_util.tree_structure(skeleton)
  state = jax.tree_util.tree_unflatten(
      treedef, [np.asarray(x) for x in opt_leaves])
  adam = state[0]  # ScaleByAdamState(count, mu, nu)
  step = float(np.asarray(adam.count))

  avg_sd = params_to_state_dict(adam.mu)
  avg_sq_sd = params_to_state_dict(adam.nu)
  names = reference_parameter_order(params_to_state_dict(params))
  torch_state = {}
  import torch
  for i, name in enumerate(names):
    torch_state[i] = {
        "step": torch.tensor(step),
        "exp_avg": avg_sd[name],
        "exp_avg_sq": avg_sq_sd[name],
    }
  return {
      "state": torch_state,
      "param_groups": [{
          "params": list(range(len(names))),
          "lr": float(learning_rate),
          "betas": (0.9, 0.999),
          "eps": 1e-8,
          "weight_decay": 0,
          "amsgrad": False,
          "maximize": False,
      }],
  }


def export_torch_checkpoint(checkpoint: CheckpointWaveglow,
                            path: Union[str, Path]) -> None:
  """Write a reference-loadable ``.pt`` checkpoint file."""
  import torch

  # strip TPU-only hparams the reference doesn't know
  hp, _ = hparams_from_dict(checkpoint.hparams)
  reference_keys = {
      "filter_length", "hop_length", "win_length", "window",
      "n_mel_channels", "sampling_rate", "mel_fmin", "mel_fmax",
      "epochs", "iters_per_checkpoint", "epochs_per_checkpoint", "seed",
      "cache_wavs", "cudnn_enabled", "cudnn_benchmark",
      "segment_length", "n_flows", "n_group", "n_early_every",
      "n_early_size", "n_layers", "n_channels", "kernel_size",
      "learning_rate", "sigma", "batch_size",
  }
  from dataclasses import asdict
  hparams_dict = {k: v for k, v in asdict(hp).items() if k in reference_keys}

  if checkpoint.optimizer is not None:
    optimizer = opt_leaves_to_torch_adam(checkpoint.optimizer,
                                         checkpoint.state_dict,
                                         checkpoint.learning_rate)
  else:
    # None (not {}): the reference's load_optimizer starts fresh on None
    # (train.py:246-249) but would crash load_state_dict on an empty dict
    optimizer = None

  payload = {
      "state_dict": params_to_state_dict(checkpoint.state_dict),
      "optimizer": optimizer,
      "learning_rate": checkpoint.learning_rate,
      "iteration": checkpoint.iteration,
      "hparams": hparams_dict,
  }
  torch.save(payload, str(path))
