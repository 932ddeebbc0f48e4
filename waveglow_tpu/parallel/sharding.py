"""Sharding specifications for the WaveGlow params pytree.

Tensor parallelism follows the Megatron pattern over the WN hidden channel
axis C (the 256-channel stacks are the only weights big enough to matter —
the north-star config shards them across chips when a model exceeds one
chip's HBM):

  * ``in_layers`` / ``cond`` are column-parallel: outputs sharded on the
    trailing C (the gate-pair axis keeps tanh/sigmoid halves co-located
    per shard);
  * ``res_skip`` is row-parallel: contraction over its leading (sharded) C,
    XLA inserts one psum per layer to restore the replicated residual/skip;
  * ``start`` / ``end`` / ``inv1x1`` / ``upsample`` are tiny and replicated.

Data parallelism shards the batch axis; every spec here is implicitly
replicated over the ``data`` mesh axis. GSPMD propagates activation
shardings from these parameter specs — no per-op annotations needed.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from waveglow_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _conv_specs(conv: Dict, w_spec: P, out_spec: P) -> Dict:
  """Specs for a conv dict: fused {'w','b'} or weight-normed {'g','v','b'}."""
  specs = {}
  if "w" in conv:
    specs["w"] = w_spec
  if "v" in conv:
    specs["v"] = w_spec
  if "g" in conv:
    specs["g"] = out_spec
  if "b" in conv:
    specs["b"] = out_spec
  return specs


def wn_pspecs(wn: Dict) -> Dict:
  """PartitionSpec pytree matching one WN params dict."""
  rep1 = P()           # replicated, any rank (P() covers all)
  col_in = P(None, None, None, MODEL_AXIS)      # [K, C, 2, C']
  col_in_out = P(None, MODEL_AXIS)              # [2, C']
  col_cond = P(None, None, None, MODEL_AXIS)    # [M, L, 2, C']
  col_cond_out = P(None, None, MODEL_AXIS)      # [L, 2, C']
  row_rs = P(MODEL_AXIS, None, None)            # [C', 2, C]
  row_rs_last = P(MODEL_AXIS, None)             # [C', C]

  n_layers = len(wn["in_layers"])
  specs = {
      "start": _conv_specs(wn["start"], rep1, rep1),
      "cond": _conv_specs(wn["cond"], col_cond, col_cond_out),
      "in_layers": [
          _conv_specs(c, col_in, col_in_out) for c in wn["in_layers"]
      ],
      "res_skip": [
          _conv_specs(c, row_rs if i < n_layers - 1 else row_rs_last, rep1)
          for i, c in enumerate(wn["res_skip"])
      ],
      "end": _conv_specs(wn["end"], rep1, rep1),
  }
  return specs


def param_pspecs(params: Dict) -> Dict:
  """PartitionSpec pytree matching a full WaveGlow params pytree."""
  rep = P()
  specs = {
      "upsample": {k: rep for k in params["upsample"]},
      "flows": [],
  }
  for flow in params["flows"]:
    specs["flows"].append({
        "inv1x1": {k: rep for k in flow["inv1x1"]},
        "wn": wn_pspecs(flow["wn"]),
    })
  return specs


def batch_pspec() -> P:
  """Batch arrays shard their leading axis over the data mesh axis."""
  return P(DATA_AXIS)


def shard_params(params: Dict, mesh: jax.sharding.Mesh) -> Dict:
  """Place a host params pytree onto the mesh per :func:`param_pspecs`."""
  specs = param_pspecs(params)
  return jax.tree_util.tree_map(
      lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def named_shardings(tree_specs: Dict, mesh: jax.sharding.Mesh):
  return jax.tree_util.tree_map(
      lambda s: NamedSharding(mesh, s), tree_specs,
      is_leaf=lambda x: isinstance(x, P))
