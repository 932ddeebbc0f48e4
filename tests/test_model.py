"""Model-level tests: flow structure, invertibility, weight fusion.

The central correctness property of a normalizing flow — ``infer`` is the
exact inverse of ``forward`` — is checked end-to-end on the tiny config
(4 flows / 64 channels, BASELINE config 1) and on the full-size config.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveglow_tpu.models import waveglow
from waveglow_tpu.models.waveglow import (WaveGlowConfig, forward,
                                          fuse_for_inference, infer,
                                          infer_noise_shapes, init_params,
                                          unfold_groups)

TINY = WaveGlowConfig(n_flows=4, n_channels=64, n_layers=4)
FULL = WaveGlowConfig()


class TestConfig:

  def test_flow_channel_counts_full(self):
    # 12 flows: 8,8,8,8 then early drops of 2 at k=4 and k=8
    assert FULL.flow_channel_counts() == [8, 8, 8, 8, 6, 6, 6, 6, 4, 4, 4, 4]
    assert FULL.n_remaining_channels == 4

  def test_noise_shapes_full(self):
    shapes = infer_noise_shapes(FULL, 1, 100)
    assert shapes == [(1, 100, 4), (1, 100, 2), (1, 100, 2)]

  def test_noise_shapes_tiny(self):
    # 4 flows, early at none (k=4 doesn't exist); all 8 channels remain
    assert TINY.flow_channel_counts() == [8, 8, 8, 8]
    assert infer_noise_shapes(TINY, 2, 10) == [(2, 10, 8)]


class TestUnfold:

  def test_unfold_ordering_matches_torch_unfold(self):
    import torch
    rng = np.random.default_rng(0)
    up = rng.standard_normal((2, 32, 5)).astype(np.float32)  # [B, T, n_mels]
    mine = np.asarray(unfold_groups(jnp.asarray(up), 8))     # [B, 4, 40]

    t = torch.from_numpy(up.transpose(0, 2, 1))              # [B, n_mels, T]
    ref = t.unfold(2, 8, 8).permute(0, 2, 1, 3)              # [B, 4, n_mels, 8]
    ref = ref.contiguous().view(2, 4, -1)                    # [B, 4, 40]
    np.testing.assert_array_equal(mine, ref.numpy())


def _random_inputs(config, batch=1, frames=8, seed=0):
  rng = np.random.default_rng(seed)
  mel = rng.standard_normal(
      (batch, config.n_mel_channels, frames)).astype(np.float32)
  audio = rng.uniform(-0.5, 0.5, (batch, frames * 256)).astype(np.float32)
  return jnp.asarray(mel), jnp.asarray(audio)


class TestForward:

  def test_forward_shapes(self):
    params = init_params(TINY, seed=0)
    mel, audio = _random_inputs(TINY)
    z, log_s_list, log_det_list = forward(params, TINY, mel, audio)
    n_groups = audio.shape[1] // TINY.n_group
    assert z.shape == (1, n_groups, TINY.n_group)
    assert len(log_s_list) == TINY.n_flows
    assert len(log_det_list) == TINY.n_flows
    for log_det in log_det_list:
      assert np.isfinite(float(log_det))

  def test_zero_init_end_makes_identity_coupling(self):
    """With end conv zero-init, log_s == 0 for the first flow applied to
    fresh params (coupling starts as identity, reference model.py:88-92)."""
    params = init_params(TINY, seed=1)
    mel, audio = _random_inputs(TINY, seed=1)
    _, log_s_list, _ = forward(params, TINY, mel, audio)
    for log_s in log_s_list:
      np.testing.assert_allclose(np.asarray(log_s), 0.0, atol=1e-7)


class TestInvertibility:

  @pytest.mark.parametrize("config,seed", [(TINY, 0), (FULL, 7)])
  def test_infer_inverts_forward(self, config, seed):
    """forward(audio) -> z; infer(noise=z-chunks) must reconstruct audio.

    With audio length = frames*256, forward's length-trim and infer's
    (kernel - stride)-trim produce identical conditioning, so the round trip
    is exact up to float error.
    """
    params = init_params(config, seed=seed, weight_norm=True)
    # Give the couplings non-trivial scales: randomize the end convs.
    rng = np.random.default_rng(seed + 100)
    for flow in params["flows"]:
      end = flow["wn"]["end"]
      end["w"] = (0.1 * rng.standard_normal(end["w"].shape)).astype(np.float32)
      end["b"] = (0.1 * rng.standard_normal(end["b"].shape)).astype(np.float32)

    mel, audio = _random_inputs(config, frames=8, seed=seed)
    z, _, _ = forward(params, config, mel, audio)
    z = np.asarray(z)

    # Slice z into the injected-noise layout: forward emits early chunks
    # (in flow order) then the final channels; infer consumes the final
    # channels first, then early chunks in *reversed* flow order.
    early_total = config.n_group - config.n_remaining_channels
    chunks = []
    chunks.append(z[..., early_total:])                  # main z
    n_early_blocks = early_total // config.n_early_size
    for i in reversed(range(n_early_blocks)):
      lo = i * config.n_early_size
      chunks.append(z[..., lo:lo + config.n_early_size])

    fused = fuse_for_inference(params)
    recon = np.asarray(infer(fused, config, mel, sigma=1.0,
                             noise=[jnp.asarray(c) for c in chunks]))
    audio = np.asarray(audio)
    assert recon.shape == audio.shape
    np.testing.assert_allclose(recon, audio, atol=2e-3)
    assert np.abs(recon - audio).mean() < 2e-4

  def test_infer_rng_path_runs(self):
    params = fuse_for_inference(init_params(TINY, seed=2))
    mel, _ = _random_inputs(TINY, frames=6, seed=2)
    wav = infer(params, TINY, mel, sigma=0.8, rng=jax.random.PRNGKey(42))
    assert wav.shape == (1, 6 * 256)
    assert np.isfinite(np.asarray(wav)).all()

  def test_sigma_zero_is_deterministic_zero_noise(self):
    """sigma=0 kills the noise (denoiser bias-capture path)."""
    params = fuse_for_inference(init_params(TINY, seed=3))
    mel, _ = _random_inputs(TINY, frames=6, seed=3)
    w1 = np.asarray(infer(params, TINY, mel, sigma=0.0,
                          rng=jax.random.PRNGKey(1)))
    w2 = np.asarray(infer(params, TINY, mel, sigma=0.0,
                          rng=jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(w1, w2)


class TestFusion:

  def test_fused_forward_matches_weightnormed(self):
    """Materialized (g,v) weights and fused weights give identical infer."""
    params = init_params(TINY, seed=4)
    fused = fuse_for_inference(params)
    mel, audio = _random_inputs(TINY, seed=4)
    z1, ls1, ld1 = forward(params, TINY, mel, audio)
    z2, ls2, ld2 = forward(fused, TINY, mel, audio)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)

  def test_jit_forward(self):
    params = init_params(TINY, seed=5)
    mel, audio = _random_inputs(TINY, seed=5)

    @jax.jit
    def fwd(p, m, a):
      z, log_s_list, log_det_list = forward(p, TINY, m, a)
      return z, sum(jnp.sum(s) for s in log_s_list), sum(log_det_list)

    z, s_tot, d_tot = fwd(params, mel, audio)
    assert np.isfinite(np.asarray(z)).all()
    assert np.isfinite(float(s_tot)) and np.isfinite(float(d_tot))


class TestAbstractParams:
  """abstract_params must stay in lockstep with init_params: the sharded
  orbax resume builds its placement template from the skeleton instead of
  materializing the full model per host (training/loop.py)."""

  @pytest.mark.parametrize("config,weight_norm", [
      (TINY, True),
      (FULL, True),
      (FULL, False),
      # asymmetric config exercising every shape formula differently
      (WaveGlowConfig(n_flows=3, n_channels=48, n_layers=3, n_group=4,
                      n_early_every=2, n_early_size=2, kernel_size=5), True),
  ])
  def test_abstract_params_matches_init(self, config, weight_norm):
    concrete = init_params(config, seed=0, weight_norm=weight_norm)
    skeleton = waveglow.abstract_params(config, weight_norm=weight_norm)
    c_leaves, c_def = jax.tree_util.tree_flatten(concrete)
    s_leaves, s_def = jax.tree_util.tree_flatten(skeleton)
    assert c_def == s_def
    for c, s in zip(c_leaves, s_leaves):
      assert tuple(c.shape) == tuple(s.shape)
      assert np.dtype(c.dtype) == np.dtype(s.dtype)

  def test_skeleton_leaves_are_abstract(self):
    for leaf in jax.tree_util.tree_leaves(waveglow.abstract_params(TINY)):
      assert isinstance(leaf, jax.ShapeDtypeStruct)
