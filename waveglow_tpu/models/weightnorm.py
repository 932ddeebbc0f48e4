"""Weight-norm parametrization ``w = g * v / ||v||`` as explicit pytree leaves.

The reference wraps most WN convs in torch's weight-norm parametrization for
training and folds it away for inference (reference model.py:85-112 and
remove_weightnorm at model.py:276-297). Here the parametrization is explicit
data: a weight-normed conv is a dict ``{"g": [Cout], "v": <w-shaped>, "b"}``;
a fused conv is ``{"w": ..., "b"}``. ``materialize`` computes the effective
weight (differentiable, used inside the jitted training step); ``fuse`` folds
(g, v) -> w on the host for inference, exactly matching what torch's
``remove_parametrizations`` produces.

Norms are taken per output channel — the LAST axis in this framework's
layouts ([Cin, Cout] / [K, Cin, Cout]), mirroring torch's dim=0 over its
[Cout, Cin, K] layout.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def is_weightnormed(conv: Dict) -> bool:
  return "v" in conv


def materialize(conv: Dict) -> jnp.ndarray:
  """Effective weight of a (possibly weight-normed) conv param dict."""
  if "w" in conv:
    return conv["w"]
  v = conv["v"]
  # norm over all axes except the output-channel (last) axis
  axes = tuple(range(v.ndim - 1))
  norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
  return conv["g"] * v / norm


def init_weightnorm(w: np.ndarray) -> Dict[str, np.ndarray]:
  """Wrap a plain weight as (g, v) with g = ||v|| so w is unchanged."""
  axes = tuple(range(w.ndim - 1))
  norm = np.sqrt(np.sum(np.square(w), axis=axes, keepdims=False))
  return {"g": norm.astype(np.float32), "v": w.astype(np.float32)}


def fuse(conv: Dict) -> Dict:
  """Fold weight-norm into a plain weight (host-side, float32)."""
  if "w" in conv:
    return conv
  v = np.asarray(conv["v"], dtype=np.float64)
  g = np.asarray(conv["g"], dtype=np.float64)
  axes = tuple(range(v.ndim - 1))
  norm = np.sqrt(np.sum(np.square(v), axis=axes, keepdims=True))
  out = {"w": (g * v / norm).astype(np.float32)}
  if "b" in conv:
    out["b"] = np.asarray(conv["b"], dtype=np.float32)
  return out
