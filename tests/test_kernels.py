"""Pallas kernel tests (interpret mode on CPU) against the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveglow_tpu.kernels.wn_layer import wn_layer_fused


def xla_reference_layer(x, cond_i, w_in, b_in, w_rs, b_rs, dilation):
  """The exact math of one WN layer via plain jnp (mirrors wn_forward)."""
  from waveglow_tpu.ops.conv import shift_time
  c = x.shape[-1]
  pre = None
  for tap in range(3):
    shifted = shift_time(x, (tap - 1) * dilation)
    term = jnp.dot(shifted, w_in[tap], preferred_element_type=jnp.float32)
    pre = term if pre is None else pre + term
  pre = pre + b_in.reshape(-1)
  gates = pre + cond_i.reshape(cond_i.shape[0], cond_i.shape[1], -1)
  acts = jnp.tanh(gates[..., :c]) * jax.nn.sigmoid(gates[..., c:])
  rs = jnp.dot(acts.astype(x.dtype), w_rs,
               preferred_element_type=jnp.float32) + b_rs.reshape(-1)
  if w_rs.shape[-1] == c:
    return x, rs
  return x + rs[..., :c], rs[..., c:]


def make_inputs(batch=2, t=300, c=128, last=False, seed=0, dtype=jnp.float32):
  rng = np.random.default_rng(seed)
  x = jnp.asarray(rng.standard_normal((batch, t, c)).astype(np.float32) * 0.1,
                  dtype=dtype)
  cond = jnp.asarray(rng.standard_normal((batch, t, 2, c)).astype(np.float32)
                     * 0.1, dtype=dtype)
  w_in = jnp.asarray(rng.standard_normal((3, c, 2 * c)).astype(np.float32)
                     * 0.05, dtype=dtype)
  b_in = jnp.asarray(rng.standard_normal((2, c)).astype(np.float32) * 0.05,
                     dtype=dtype)
  rs_out = c if last else 2 * c
  w_rs = jnp.asarray(rng.standard_normal((c, rs_out)).astype(np.float32)
                     * 0.05, dtype=dtype)
  b_rs = jnp.asarray(rng.standard_normal((rs_out,)).astype(np.float32) * 0.05,
                     dtype=dtype)
  return x, cond, w_in, b_in, w_rs, b_rs


class TestWNLayerFused:

  @pytest.mark.parametrize("dilation", [1, 4, 64])
  def test_matches_xla_path(self, dilation):
    inputs = make_inputs(t=300, c=128)
    x_k, skip_k = wn_layer_fused(*inputs, dilation=dilation, tile=128,
                                 interpret=True)
    x_r, skip_r = xla_reference_layer(*inputs, dilation=dilation)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(skip_k), np.asarray(skip_r),
                               atol=1e-5)

  def test_last_layer_variant(self):
    inputs = make_inputs(t=256, c=128, last=True)
    x_k, skip_k = wn_layer_fused(*inputs, dilation=2, tile=128,
                                 interpret=True)
    x_r, skip_r = xla_reference_layer(*inputs, dilation=2)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(skip_k), np.asarray(skip_r),
                               atol=1e-5)

  def test_skip_accumulator_and_valid_t(self):
    """In-kernel skip accumulation (aliased buffer) + pad-row masking."""
    t, valid = 256, 200
    inputs = make_inputs(t=t, c=128)
    x, cond, w_in, b_in, w_rs, b_rs = inputs
    # zero the pad rows of x, as the model-level contract requires
    mask = (np.arange(t) < valid)[None, :, None]
    x = jnp.asarray(np.asarray(x) * mask)
    acc = jnp.asarray(np.random.default_rng(7).standard_normal(
        (x.shape[0], t, 128)).astype(np.float32))
    x_k, skip_k = wn_layer_fused(x, cond, w_in, b_in, w_rs, b_rs,
                                 dilation=8, tile=128, skip_acc=acc,
                                 valid_t=valid, interpret=True)
    x_r, skip_r = xla_reference_layer(x, cond, w_in, b_in, w_rs, b_rs, 8)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r) * mask,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(skip_k),
                               np.asarray(skip_r + acc), atol=1e-5)
    assert skip_k.dtype == jnp.float32  # inherits the accumulator dtype

  def test_non_tile_multiple_length(self):
    inputs = make_inputs(t=200, c=128)
    x_k, skip_k = wn_layer_fused(*inputs, dilation=8, tile=128,
                                 interpret=True)
    x_r, skip_r = xla_reference_layer(*inputs, dilation=8)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(skip_k), np.asarray(skip_r),
                               atol=1e-5)


class TestPallasModelIntegration:

  def test_full_infer_pallas_matches_xla(self):
    """End-to-end infer with use_pallas (interpret on CPU) == XLA path."""
    import jax.numpy as jnp
    from waveglow_tpu.models.waveglow import (WaveGlowConfig,
                                              fuse_for_inference, infer,
                                              infer_noise_shapes,
                                              init_params)
    cfg = WaveGlowConfig(n_flows=2, n_channels=128, n_layers=3)
    params = fuse_for_inference(init_params(cfg, seed=0))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 80, 6)).astype(np.float32))
    shapes = infer_noise_shapes(cfg, 1, 6 * 32)
    noise = [jnp.asarray(rng.standard_normal(s).astype(np.float32))
             for s in shapes]
    w_xla = np.asarray(infer(params, cfg, mel, noise=noise))
    w_pl = np.asarray(infer(params, cfg, mel, noise=noise, use_pallas=True))
    np.testing.assert_allclose(w_pl, w_xla, atol=2e-4)
    # scan_flows + Pallas + model-level time padding together (the exact
    # combination bench.py --pallas runs on hardware)
    w_pl_scan = np.asarray(infer(params, cfg, mel, noise=noise,
                                 use_pallas=True, scan_flows=True))
    np.testing.assert_allclose(w_pl_scan, w_xla, atol=2e-4)
