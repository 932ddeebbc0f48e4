"""Learning-dynamics tests: the NLL actually decreases under training,
gradient accumulation matches large-batch training, bf16 stays close to f32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveglow_tpu.dsp.mel import MelSTFT
from waveglow_tpu.hparams import HParams, overwrite_custom_hparams
from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params
from waveglow_tpu.training.step import (init_state, make_eval_loss,
                                        make_loss_fn, make_optimizer,
                                        make_train_step)


def tiny_hp(**kw):
  base = {"n_flows": "2", "n_layers": "2", "n_channels": "32",
          "segment_length": "2048", "batch_size": "2",
          "learning_rate": "1e-3"}
  base.update({k: str(v) for k, v in kw.items()})
  return overwrite_custom_hparams(HParams(), base)


def sine_batch(hp, seed=0):
  """Deterministic multi-sine audio — learnable structure, unlike noise."""
  rng = np.random.default_rng(seed)
  t = np.arange(hp.segment_length) / hp.sampling_rate
  batch = []
  for _ in range(int(hp.batch_size)):
    f0 = rng.uniform(100, 400)
    wav = sum(0.2 / (k + 1) * np.sin(2 * np.pi * f0 * (k + 1) * t)
              for k in range(3))
    batch.append(wav)
  return np.stack(batch).astype(np.float32)


class TestLearning:

  def test_loss_decreases(self):
    hp = tiny_hp()
    config = WaveGlowConfig.from_hparams(hp)
    mel_op = MelSTFT(hp)
    optimizer = make_optimizer(hp.learning_rate)
    state = init_state(init_params(config, seed=0), optimizer)
    step = make_train_step(config, hp, mel_op, optimizer)

    audio = jnp.asarray(sine_batch(hp))
    losses = []
    for _ in range(25):
      state, loss = step(state, audio)
      losses.append(float(loss))
    assert all(np.isfinite(losses))
    # NLL on a fixed batch must drop substantially over 25 Adam steps
    assert losses[-1] < losses[0] - 0.05, losses

  def test_grad_accum_matches_full_batch(self):
    hp_full = tiny_hp(batch_size=4)
    hp_acc = tiny_hp(batch_size=4, grad_accum=2)
    config = WaveGlowConfig.from_hparams(hp_full)
    mel_op = MelSTFT(hp_full)
    optimizer = make_optimizer(hp_full.learning_rate)
    audio = jnp.asarray(sine_batch(hp_full))

    s1, l1 = make_train_step(config, hp_full, mel_op, optimizer)(
        init_state(init_params(config, seed=1), optimizer), audio)
    s2, l2 = make_train_step(config, hp_acc, mel_op, optimizer)(
        init_state(init_params(config, seed=1), optimizer), audio)

    assert float(l1) == pytest.approx(float(l2), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s2["params"])):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

  @pytest.mark.parametrize("scope", ["flow", "wn"])
  def test_remat_matches_plain(self, scope):
    hp_plain = tiny_hp()
    hp_remat = tiny_hp(remat=True, remat_scope=scope)
    config = WaveGlowConfig.from_hparams(hp_plain)
    mel_op = MelSTFT(hp_plain)
    audio = jnp.asarray(sine_batch(hp_plain))
    params = init_params(config, seed=2)

    loss_plain = make_loss_fn(config, hp_plain, mel_op)
    loss_remat = make_loss_fn(config, hp_remat, mel_op)
    g1 = jax.grad(loss_plain)(params, audio)
    g2 = jax.grad(loss_remat)(params, audio)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

  def test_bf16_loss_close_to_f32(self):
    hp32 = tiny_hp()
    hp16 = tiny_hp(compute_dtype="bfloat16")
    config = WaveGlowConfig.from_hparams(hp32)
    mel_op = MelSTFT(hp32)
    params = init_params(config, seed=3)
    audio = jnp.asarray(sine_batch(hp32, seed=3))

    l32 = float(make_eval_loss(config, hp32, mel_op)(params, audio))
    l16 = float(make_eval_loss(config, hp16, mel_op)(params, audio))
    assert l16 == pytest.approx(l32, rel=0.05)
