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

  payload = {
      "state_dict": params_to_state_dict(checkpoint.state_dict),
      "optimizer": {},   # torch Adam state is not representable from optax
      "learning_rate": checkpoint.learning_rate,
      "iteration": checkpoint.iteration,
      "hparams": hparams_dict,
  }
  torch.save(payload, str(path))
