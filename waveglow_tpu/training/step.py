"""The jit-compiled training step: on-device mel, NLL, grad, Adam update.

Replaces the reference's per-batch host loop (train.py:190-199: zero_grad ->
forward -> loss -> backward -> step) with a single XLA program that also
computes the mel-spectrogram from the raw audio segment on-device — the
reference computes mels per item on one host thread (dataloader.py:45-54),
which is its throughput ceiling; here the host only ships int16-decoded audio
segments.

Parallelism is placement-driven: the caller puts params/opt-state on a mesh
via waveglow_tpu.parallel.sharding and shards the batch on the ``data`` axis;
GSPMD then inserts the gradient all-reduce (DP) and per-layer psums (TP) —
no explicit collectives in this file.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from waveglow_tpu.dsp.mel import MelSTFT
from waveglow_tpu.hparams import HParams
from waveglow_tpu.models.waveglow import WaveGlowConfig, forward
from waveglow_tpu.training.loss import waveglow_loss

TrainState = Dict  # {"params": pytree, "opt_state": pytree, "step": int32}


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
  """Adam with torch defaults (b1=0.9, b2=0.999, eps=1e-8) — reference
  train.py:241-250."""
  return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def init_state(params: Dict, optimizer: optax.GradientTransformation,
               iteration: int = 0, opt_state=None) -> TrainState:
  """Assemble a train state; ``opt_state`` (e.g. restored from a checkpoint)
  skips the fresh ``optimizer.init`` allocation."""
  return {
      "params": params,
      "opt_state": optimizer.init(params) if opt_state is None else opt_state,
      "step": jnp.asarray(iteration, dtype=jnp.int32),
  }


def _compute_dtype(hp: HParams):
  return jnp.bfloat16 if hp.compute_dtype == "bfloat16" else None


def make_loss_fn(config: WaveGlowConfig, hp: HParams,
                 mel_op: MelSTFT) -> Callable:
  cdt = _compute_dtype(hp)

  def loss_fn(params: Dict, audio: jnp.ndarray) -> jnp.ndarray:
    """audio [B, segment] -> scalar NLL (mel computed on-device)."""
    mel = mel_op.mel_spectrogram(audio)
    z, log_s_list, log_det_w_list = forward(
        params, config, mel, audio, compute_dtype=cdt, remat=hp.remat,
        scan_flows=hp.scan_flows, use_pallas=hp.use_pallas,
        remat_scope=hp.remat_scope)
    return waveglow_loss(z, log_s_list, log_det_w_list, hp.sigma)

  return loss_fn


def make_train_step(config: WaveGlowConfig, hp: HParams, mel_op: MelSTFT,
                    optimizer: optax.GradientTransformation) -> Callable:
  """Returns jitted ``step(state, audio[B, segment]) -> (state, loss)``.

  With ``hp.grad_accum > 1`` the batch leading axis must be
  ``grad_accum * micro_batch`` and gradients are accumulated over a
  ``lax.scan`` of micro-steps before one optimizer update.
  """
  loss_fn = make_loss_fn(config, hp, mel_op)
  accum = hp.grad_accum

  def step(state: TrainState, audio: jnp.ndarray
           ) -> Tuple[TrainState, jnp.ndarray]:
    params = state["params"]
    if accum <= 1:
      loss, grads = jax.value_and_grad(loss_fn)(params, audio)
    else:
      if audio.shape[0] % accum:
        # fail fast with the actual knobs — the reshape below would raise
        # a generic XLA shape error that never mentions grad_accum
        raise ValueError(
            f"batch size {audio.shape[0]} is not divisible by "
            f"grad_accum={accum}")
      micro = audio.reshape((accum, audio.shape[0] // accum) + audio.shape[1:])

      def micro_step(carry, micro_audio):
        loss_i, grads_i = jax.value_and_grad(loss_fn)(params, micro_audio)
        acc_loss, acc_grads = carry
        return (acc_loss + loss_i,
                jax.tree_util.tree_map(jnp.add, acc_grads, grads_i)), None

      zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
      (loss, grads), _ = jax.lax.scan(micro_step, (jnp.float32(0.0),
                                                   zero_grads), micro)
      loss = loss / accum
      grads = jax.tree_util.tree_map(lambda g: g / accum, grads)

    updates, opt_state = optimizer.update(grads, state["opt_state"], params)
    new_params = optax.apply_updates(params, updates)
    return {
        "params": new_params,
        "opt_state": opt_state,
        "step": state["step"] + 1,
    }, loss

  return jax.jit(step, donate_argnums=(0,))


def make_eval_loss(config: WaveGlowConfig, hp: HParams,
                   mel_op: MelSTFT) -> Callable:
  """Jitted validation loss: ``eval_loss(params, audio) -> scalar``."""
  return jax.jit(make_loss_fn(config, hp, mel_op))
