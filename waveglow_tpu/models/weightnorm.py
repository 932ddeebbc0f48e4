"""Weight-norm parametrization ``w = g * v / ||v||`` as explicit pytree leaves.

The reference wraps most WN convs in torch's weight-norm parametrization for
training and folds it away for inference (reference model.py:85-112 and
remove_weightnorm at model.py:276-297). Here the parametrization is explicit
data: a weight-normed conv is a dict ``{"g", "v", "b"}``; a fused conv is
``{"w", "b"}``. ``materialize`` computes the effective weight
(differentiable, used inside the jitted training step); ``fuse`` folds
(g, v) -> w on the host for inference, matching what torch's
``remove_parametrizations`` produces.

Norms are per output channel, which in this framework's layouts means the
TRAILING axes: ``g.shape == v.shape[-g.ndim:]`` and the norm reduces over the
leading ``v.ndim - g.ndim`` axes (mirror of torch's dim=0 over [Cout, Cin, K]).
This generalizes to the gate-explicit layouts ([K, Cin, 2, C] with g [2, C])
used for tensor-parallel sharding.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def is_weightnormed(conv: Dict) -> bool:
  return "v" in conv


def materialize(conv: Dict) -> jnp.ndarray:
  """Effective weight of a (possibly weight-normed) conv param dict."""
  if "w" in conv:
    return conv["w"]
  v = conv["v"]
  g = conv["g"]
  axes = tuple(range(v.ndim - g.ndim))
  norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
  return g * v / norm


def init_weightnorm(w: np.ndarray, out_ndim: int = 1) -> Dict[str, np.ndarray]:
  """Wrap a plain weight as (g, v) with g = ||v|| so w is unchanged.

  ``out_ndim``: number of trailing output-channel axes (g's rank).
  """
  axes = tuple(range(w.ndim - out_ndim))
  norm = np.sqrt(np.sum(np.square(w), axis=axes))
  return {"g": norm.astype(np.float32), "v": w.astype(np.float32)}


def fuse(conv: Dict) -> Dict:
  """Fold weight-norm into a plain weight (host-side, float32)."""
  if "w" in conv:
    return {k: np.asarray(v, dtype=np.float32) for k, v in conv.items()}
  v = np.asarray(conv["v"], dtype=np.float64)
  g = np.asarray(conv["g"], dtype=np.float64)
  axes = tuple(range(v.ndim - g.ndim))
  norm = np.sqrt(np.sum(np.square(v), axis=axes, keepdims=True))
  out = {"w": (g * v / norm).astype(np.float32)}
  if "b" in conv:
    out["b"] = np.asarray(conv["b"], dtype=np.float32)
  return out
