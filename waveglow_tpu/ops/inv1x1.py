"""Invertible 1x1 convolution: channel-mixing matmul with exact log-det.

Reference behavior (model.py:23-65): forward applies an orthonormally
initialized square matrix per audio-group channel and returns
``log_det_W = B * n_of_groups * logdet(W)``; the reverse path applies a cached
dense inverse.

TPU-native realization: the "conv" is a ``[B*T, C] @ [C, C]`` matmul (C is
the tiny group size, 8/6/4 — the cost is negligible next to the WN stack);
``logdet`` uses ``jnp.linalg.slogdet`` (sign is +1 by construction at init and
stays positive under continuous training updates). The inverse for synthesis
is precomputed on the host at weight-fusing time rather than lazily cached.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def init_orthonormal(rng: np.random.Generator, channels: int) -> np.ndarray:
  """QR of a Gaussian with determinant forced to +1 (reference model.py:37-43).

  Returns W with convention ``y = x @ W.T`` for channels-last activations
  (same matrix as torch's ``conv.weight.squeeze()``).
  """
  w, _ = np.linalg.qr(rng.standard_normal((channels, channels)))
  if np.linalg.det(w) < 0:
    w[:, 0] = -w[:, 0]
  return w.astype(np.float32)


def forward(z: jnp.ndarray, w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """[B, T, C] x [C, C] -> (mixed z, log|det W| summed over batch*time).

  ``log_det`` matches the reference scaling ``B * n_of_groups * logdet(W)``
  (model.py:63).
  """
  batch, t, _ = z.shape
  out = jnp.dot(z, w.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
  _, logabsdet = jnp.linalg.slogdet(w.astype(jnp.float32))
  return out, batch * t * logabsdet


def inverse_matrix(w: np.ndarray) -> np.ndarray:
  """Dense inverse, computed once on the host in float32 (model.py:52-58)."""
  return np.linalg.inv(np.asarray(w, dtype=np.float32)).astype(np.float32)


def reverse(z: jnp.ndarray, w_inverse: jnp.ndarray) -> jnp.ndarray:
  """Apply the precomputed inverse: [B, T, C] @ inv(W).T."""
  return jnp.dot(z, w_inverse.T, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
