"""WaveGlow negative log-likelihood.

``loss = sum(z^2)/(2 sigma^2) - sum_k sum(log_s_k) - sum_k log_det_W_k``,
normalized by the element count of z — identical math to reference
train.py:26-45 (WaveGlowLoss).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp


def waveglow_loss(z: jnp.ndarray, log_s_list: Sequence[jnp.ndarray],
                  log_det_w_list: Sequence[jnp.ndarray],
                  sigma: float = 1.0) -> jnp.ndarray:
  log_s_total = sum(jnp.sum(s) for s in log_s_list)
  log_det_w_total = sum(log_det_w_list)
  loss = (jnp.sum(z * z) / (2 * sigma * sigma)
          - log_s_total - log_det_w_total)
  return loss / z.size
