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

  @pytest.mark.parametrize("t", [301, 13])
  def test_sublane_misaligned_length_pads(self, t):
    """T with no multiple-of-8 divisor: the wrapper pads T to a sublane
    multiple (misaligned tiles are rejected by the Mosaic compiler) and
    slices the outputs back."""
    inputs = make_inputs(t=t, c=128)
    x_k, skip_k = wn_layer_fused(*inputs, dilation=2, tile=128,
                                 interpret=True)
    assert x_k.shape[1] == t and skip_k.shape[1] == t
    x_r, skip_r = xla_reference_layer(*inputs, dilation=2)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(skip_k), np.asarray(skip_r),
                               atol=1e-5)


class TestWNLayerTrainable:
  """Custom-VJP (Pallas forward, analytic XLA backward) vs jax.grad of the
  plain-XLA layer math."""

  @pytest.mark.parametrize("dilation,last", [(1, False), (8, False),
                                             (64, True)])
  def test_grads_match_xla_autodiff(self, dilation, last):
    from waveglow_tpu.kernels.wn_layer import wn_layer_trainable
    inputs = make_inputs(t=256, c=128, last=last, seed=3)

    def loss_kernel(*args):
      x_n, skip = wn_layer_trainable(*args, dilation, 128, None)
      return jnp.sum(x_n * 1.3) + jnp.sum(skip * 0.7)

    def loss_xla(*args):
      x_n, skip = xla_reference_layer(*args, dilation=dilation)
      return jnp.sum(x_n * 1.3) + jnp.sum(skip * 0.7)

    grads_k = jax.grad(loss_kernel, argnums=tuple(range(6)))(*inputs)
    grads_x = jax.grad(loss_xla, argnums=tuple(range(6)))(*inputs)
    names = ["x", "cond", "w_in", "b_in", "w_rs", "b_rs"]
    for name, gk, gx in zip(names, grads_k, grads_x):
      np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=1e-4,
                                 err_msg=f"grad mismatch for {name}")

  def test_value_matches_fused_forward(self):
    from waveglow_tpu.kernels.wn_layer import (wn_layer_fused,
                                               wn_layer_trainable)
    inputs = make_inputs(t=256, c=128, seed=4)
    x_t, skip_t = wn_layer_trainable(*inputs, 4, 128, None)
    x_f, skip_f = wn_layer_fused(*inputs, dilation=4, tile=128,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(x_t), np.asarray(x_f))
    np.testing.assert_array_equal(np.asarray(skip_t), np.asarray(skip_f))


class TestPallasModelIntegration:

  def test_train_step_pallas_matches_xla(self):
    """A full jitted train step with hparams.use_pallas (interpret mode)
    tracks the XLA step: same loss, same updated params."""
    import jax
    from waveglow_tpu.dsp.mel import MelSTFT
    from waveglow_tpu.hparams import HParams, overwrite_custom_hparams
    from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params
    from waveglow_tpu.training.step import (init_state, make_optimizer,
                                            make_train_step)

    base = {"n_flows": "2", "n_layers": "3", "n_channels": "128",
            "segment_length": "2048", "batch_size": "2", "remat": "false"}
    rng = np.random.default_rng(11)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 2048)).astype(np.float32))

    losses, states = [], []
    for pallas in ("false", "true"):
      hp = overwrite_custom_hparams(HParams(), {**base,
                                                "use_pallas": pallas})
      config = WaveGlowConfig.from_hparams(hp)
      optimizer = make_optimizer(hp.learning_rate)
      state = init_state(init_params(config, seed=0), optimizer)
      step = make_train_step(config, hp, MelSTFT(hp), optimizer)
      state, loss = step(state, audio)
      losses.append(float(loss))
      states.append(state)

    assert losses[1] == pytest.approx(losses[0], rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(states[0]["params"]),
                    jax.tree_util.tree_leaves(states[1]["params"])):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

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
