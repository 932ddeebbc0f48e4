"""Numeric parity against the ACTUAL reference implementation (torch, CPU).

These tests instantiate the reference WaveGlow with random init, export its
torch state dict, import it through waveglow_tpu's checkpoint importer, and
require allclose agreement on every pipeline stage: mel extraction, training
forward (z / log_s / log_det / loss), synthesis with bit-identical injected
noise, weight-norm removal, and the denoiser.

This is the same oracle chain as the reference's golden test
(test_Synthesizer.py) but self-contained: no 644 MB download needed.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from waveglow_tpu.checkpointing.import_torch import state_dict_to_params
from waveglow_tpu.dsp.mel import MelSTFT
from waveglow_tpu.hparams import HParams, TSTFTHParams
from waveglow_tpu.inference.denoiser import Denoiser
from waveglow_tpu.models.waveglow import (WaveGlowConfig, forward,
                                          fuse_for_inference, infer)
from waveglow_tpu.training.loss import waveglow_loss

from reference_oracle import (FIXTURE_WAV, import_reference, tiny_ref_hparams,
                              torch_infer_noise)

ref = import_reference()


def fixture_audio(n: int = None, offset: int = 0) -> np.ndarray:
  """The reference's real speech fixture (211,357 samples, 22050 Hz) —
  real-speech spectral statistics, unlike white noise."""
  from waveglow_tpu.dsp.audio_io import wav_to_float32
  wav, sr = wav_to_float32(FIXTURE_WAV)
  assert sr == 22050
  return wav if n is None else wav[offset:offset + n]


def make_pair(seed=0, **hp_overrides):
  """(reference model, native params, config, native hparams) with identical
  weights."""
  torch.manual_seed(seed)
  ref_hp = tiny_ref_hparams(**hp_overrides)
  model = ref.model.WaveGlow(ref_hp).eval()

  hp = HParams(n_flows=ref_hp.n_flows, n_group=ref_hp.n_group,
               n_early_every=ref_hp.n_early_every,
               n_early_size=ref_hp.n_early_size, n_layers=ref_hp.n_layers,
               n_channels=ref_hp.n_channels, kernel_size=ref_hp.kernel_size,
               n_mel_channels=ref_hp.n_mel_channels)
  params = state_dict_to_params(model.state_dict(), hp)
  config = WaveGlowConfig.from_hparams(hp)
  return model, params, config, hp


def randomize_end_convs(model, seed: int, std: float = 0.01,
                        log_s_bias: float = 0.3):
  """Give a fresh reference model non-trivial couplings.

  The reference zero-initializes every WN ``end`` conv (model.py:88-92), so
  couplings start as the identity and an infer-parity test on a fresh model
  never exercises the WN conditioning in the inference direction. This
  randomizes them like a trained model: small weights plus a positive log_s
  bias (second channel half, reference model.py:253) so the inverse pass is
  contractive the way a converged vocoder's is.
  """
  torch.manual_seed(seed)
  for wnet in model.WN:
    wnet.end.weight.data.normal_(0, std)
    wnet.end.bias.data.normal_(0, 0.02)
    half = wnet.end.bias.shape[0] // 2
    wnet.end.bias.data[half:] += log_s_bias
  return model


def rand_mel_audio(frames=6, batch=1, seed=0, n_mels=80):
  rng = np.random.default_rng(seed)
  mel = rng.standard_normal((batch, n_mels, frames)).astype(np.float32)
  audio = rng.uniform(-0.7, 0.7, (batch, frames * 256)).astype(np.float32)
  return mel, audio


def _audio_case(kind: str, n: int, seed: int) -> np.ndarray:
  if kind == "fixture":
    return fixture_audio(n)
  rng = np.random.default_rng(seed)
  return rng.uniform(-0.8, 0.8, n).astype(np.float32)


def assert_logmel_close(mine: np.ndarray, theirs: np.ndarray):
  """Two-domain log-mel comparison.

  Near the reference's 1e-5 dynamic-range clamp (taco_stft.py:10-16), log
  amplifies float32 STFT rounding by 1/x — real speech has near-silent
  bins where a 3e-8 linear wobble becomes ~3e-3 in log space. So: tight
  RELATIVE agreement in the linear domain, plus a log-domain cap that
  tolerates only that clamp-floor amplification.
  """
  np.testing.assert_allclose(np.exp(mine), np.exp(theirs),
                             rtol=5e-4, atol=5e-8)
  np.testing.assert_allclose(mine, theirs, atol=5e-3)


class TestMelParity:

  @pytest.mark.parametrize("kind", ["fixture", "noise"])
  def test_mel_spectrogram_matches_reference(self, kind):
    tstft_hp = ref.taco_stft.TSTFTHParams()
    taco = ref.taco_stft.TacotronSTFT(tstft_hp, device=torch.device("cpu"))
    mine = MelSTFT(TSTFTHParams())

    # real speech (the reference's own fixture, full length) AND white noise
    audio = _audio_case(kind, None if kind == "fixture" else 22050, seed=1)

    ref_mel = taco.get_mel_tensor(torch.from_numpy(audio)).numpy()
    my_mel = np.asarray(mine.get_mel(audio))
    assert my_mel.shape == ref_mel.shape
    assert_logmel_close(my_mel, ref_mel)

  def test_mel_from_file_matches_reference(self):
    """The full file loader chain on the real fixture (reference
    taco_stft.py:105-125)."""
    tstft_hp = ref.taco_stft.TSTFTHParams()
    taco = ref.taco_stft.TacotronSTFT(tstft_hp, device=torch.device("cpu"))
    mine = MelSTFT(TSTFTHParams())
    from pathlib import Path
    ref_mel = taco.get_mel_tensor_from_file(Path(FIXTURE_WAV)).numpy()
    my_mel = np.asarray(mine.get_mel_from_file(FIXTURE_WAV))
    assert my_mel.shape == ref_mel.shape
    assert_logmel_close(my_mel, ref_mel)


class TestSTFTParity:

  @pytest.mark.parametrize("kind", ["fixture", "noise"])
  def test_transform_and_inverse_match_reference(self, kind):
    ref_stft = ref.stft.STFT(device=torch.device("cpu"), filter_length=1024,
                             hop_length=256, win_length=1024)
    from waveglow_tpu.dsp.stft import STFT
    mine = STFT()

    audio = _audio_case(kind, 10240, seed=2)[None, :]

    ref_mag, ref_phase = ref_stft.transform(torch.from_numpy(audio))
    my_mag, my_phase = mine.transform(jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(my_mag), ref_mag.numpy(), atol=2e-4)

    ref_rec = ref_stft.inverse(ref_mag, ref_phase).numpy()[:, 0, :]
    my_rec = np.asarray(mine.inverse(my_mag, my_phase))
    assert my_rec.shape == ref_rec.shape
    np.testing.assert_allclose(my_rec, ref_rec, atol=2e-4)


class TestForwardParity:

  @pytest.mark.parametrize("seed", [0, 3])
  def test_forward_z_and_loss(self, seed):
    model, params, config, hp = make_pair(seed=seed)
    mel, audio = rand_mel_audio(seed=seed)

    with torch.no_grad():
      ref_z, ref_log_s, ref_log_det = model(
          (torch.from_numpy(mel), torch.from_numpy(audio)))

    my_z, my_log_s, my_log_det = forward(params, config, jnp.asarray(mel),
                                         jnp.asarray(audio))

    # z: reference is [B, C, T'], native is [B, T', C]
    np.testing.assert_allclose(np.asarray(my_z).transpose(0, 2, 1),
                               ref_z.numpy(), atol=2e-4)
    for mine_s, theirs_s in zip(my_log_s, ref_log_s):
      np.testing.assert_allclose(np.asarray(mine_s).transpose(0, 2, 1),
                                 theirs_s.numpy(), atol=2e-4)
    # log_det is ~0 for orthonormal-init W (f32 slogdet noise dominates);
    # compare with an absolute floor scaled to the batch*time multiplier.
    scale = audio.shape[0] * audio.shape[1] // 8
    for mine_d, theirs_d in zip(my_log_det, ref_log_det):
      assert float(mine_d) == pytest.approx(float(theirs_d), rel=1e-3,
                                            abs=2e-6 * scale)

    # loss parity
    criterion = ref.train.WaveGlowLoss(sigma=0.9)
    ref_loss = float(criterion((ref_z, ref_log_s, ref_log_det), None))
    my_loss = float(waveglow_loss(my_z, my_log_s, my_log_det, sigma=0.9))
    assert my_loss == pytest.approx(ref_loss, rel=1e-4)


class TestInferParity:

  @pytest.mark.parametrize("sigma", [1.0, 0.666])
  def test_infer_with_bit_identical_noise(self, sigma):
    model, params, config, hp = make_pair(seed=1)
    # non-trivial couplings — a fresh model's zero end convs would make the
    # WN conditioning invisible to this test (see randomize_end_convs)
    randomize_end_convs(model, seed=11)
    params = state_dict_to_params(model.state_dict(), hp)
    remove_wn = ref.model.WaveGlow.remove_weightnorm(model)
    mel, _ = rand_mel_audio(frames=7, seed=1)

    torch.manual_seed(0)
    with torch.no_grad():
      ref_wav = remove_wn.infer(torch.from_numpy(mel), sigma=sigma).numpy()

    n_groups = ((7 - 1) * 256 + 1024 - 768) // 8
    noise = torch_infer_noise(config, 1, n_groups, seed=0)
    fused = fuse_for_inference(params)
    my_wav = np.asarray(infer(fused, config, jnp.asarray(mel), sigma=sigma,
                              noise=[jnp.asarray(n) for n in noise]))
    assert my_wav.shape == ref_wav.shape
    np.testing.assert_allclose(my_wav, ref_wav, atol=1e-4)

  @pytest.mark.slow
  def test_full_size_full_fixture_end_to_end(self):
    """Golden-oracle surrogate: full 12-flow / 256-channel model over the
    ENTIRE res/audio.wav mel (826 frames, 211,357 samples), each pipeline
    computing its OWN mel from the file — torch CPU reference vs native
    float32, bit-identical injected noise, ``wav`` AND ``wav_denoised``
    (strength 0.0005) at the driver's atol 1e-3 end-to-end bar.

    This exercises the exact tensor shapes, conv-transpose upsample trim
    (reference model.py:226-228), early-output schedule, and denoiser flow
    the published LJS-v3-580000 checkpoint would (reference
    test_Synthesizer.py:15-60) — everything but NVIDIA's trained weights,
    which are unreachable from this zero-egress environment
    (docs/PARITY.md, golden oracle status)."""
    from pathlib import Path

    model, params, config, hp = make_pair(
        seed=7, n_flows=12, n_early_every=4, n_early_size=2,
        n_layers=8, n_channels=256)
    # fresh models zero-init the end convs (couplings start as identity and
    # the denoiser bias would be exactly zero) — make them non-trivial and
    # inverse-contractive, like a trained model (see randomize_end_convs)
    randomize_end_convs(model, seed=70)
    params = state_dict_to_params(model.state_dict(), hp)
    ref_fused = ref.model.WaveGlow.remove_weightnorm(model)

    # --- reference pipeline: file -> mel -> infer -> denoise (torch) ---
    tstft_hp = ref.taco_stft.TSTFTHParams()
    taco = ref.taco_stft.TacotronSTFT(tstft_hp, device=torch.device("cpu"))
    ref_mel = taco.get_mel_tensor_from_file(Path(FIXTURE_WAV))
    frames = int(ref_mel.shape[-1])
    assert frames == 826  # the whole 9.585 s fixture, not a snippet
    torch.manual_seed(0)  # the reference draws its noise from the global RNG
    with torch.no_grad():
      ref_wav = ref_fused.infer(ref_mel[None], sigma=1.0).numpy()
    ref_denoiser = ref.denoiser.Denoiser(ref_fused, tstft_hp, mode="zeros",
                                         device=torch.device("cpu"))
    with torch.no_grad():
      ref_den = ref_denoiser(torch.from_numpy(ref_wav),
                             strength=0.0005).numpy()[:, 0, :]

    # --- native pipeline: file -> mel -> infer -> denoise (jax f32) ---
    my_mel = np.asarray(MelSTFT(TSTFTHParams()).get_mel_from_file(FIXTURE_WAV))
    assert my_mel.shape == tuple(ref_mel.shape)
    n_groups = ((frames - 1) * 256 + 1024 - 768) // 8
    noise = torch_infer_noise(config, 1, n_groups, seed=0)
    fused = fuse_for_inference(params)
    my_wav = np.asarray(infer(fused, config, jnp.asarray(my_mel)[None],
                              sigma=1.0,
                              noise=[jnp.asarray(n) for n in noise]))
    my_denoiser = Denoiser(fused, config, TSTFTHParams(), mode="zeros")
    my_den = np.asarray(my_denoiser(jnp.asarray(my_wav), strength=0.0005))

    assert my_wav.shape == ref_wav.shape == (1, n_groups * 8)
    # the couplings must actually transform (guard against the vacuous
    # zero-end-conv identity case)
    assert float(np.abs(my_denoiser.bias_spec).max()) > 0
    np.testing.assert_allclose(my_wav, ref_wav, atol=1e-3)
    assert my_den.shape == ref_den.shape
    np.testing.assert_allclose(my_den, ref_den, atol=1e-3)

  def test_full_size_config_short_mel(self):
    """Full 12-flow / 256-channel architecture, short mel (CPU-feasible)."""
    model, params, config, hp = make_pair(
        seed=2, n_flows=12, n_early_every=4, n_early_size=2,
        n_layers=8, n_channels=256)
    randomize_end_convs(model, seed=22)
    params = state_dict_to_params(model.state_dict(), hp)
    model = ref.model.WaveGlow.remove_weightnorm(model)
    mel, _ = rand_mel_audio(frames=4, seed=2)

    torch.manual_seed(0)
    with torch.no_grad():
      ref_wav = model.infer(torch.from_numpy(mel), sigma=1.0).numpy()

    n_groups = ((4 - 1) * 256 + 256) // 8
    noise = torch_infer_noise(config, 1, n_groups, seed=0)
    fused = fuse_for_inference(params)
    my_wav = np.asarray(infer(fused, config, jnp.asarray(mel), sigma=1.0,
                              noise=[jnp.asarray(n) for n in noise]))
    np.testing.assert_allclose(my_wav, ref_wav, atol=1e-3)
    # the driver's correctness bar: atol 1e-3 end-to-end
    assert np.abs(my_wav - ref_wav).max() < 1e-3


class TestLegacyWeightNormImport:

  def test_weight_g_v_naming_equivalent(self):
    """Old-style weight_g/weight_v keys import identically to the new
    parametrizations naming (NVIDIA checkpoint compatibility)."""
    model, params_new, config, hp = make_pair(seed=4)
    sd = model.state_dict()
    legacy = {}
    for key, value in sd.items():
      if key.endswith(".parametrizations.weight.original0"):
        legacy[key.replace(".parametrizations.weight.original0",
                           ".weight_g")] = value
      elif key.endswith(".parametrizations.weight.original1"):
        legacy[key.replace(".parametrizations.weight.original1",
                           ".weight_v")] = value
      else:
        legacy[key] = value
    params_legacy = state_dict_to_params(legacy, hp)

    flat_new = jnp.asarray(0)  # noqa: placeholder to keep jax imported
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(params_new),
                    jax.tree_util.tree_leaves(params_legacy)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_fused_state_dict_import(self):
    """A remove_weightnorm'ed state dict imports as plain weights and
    produces the same synthesis output."""
    model, params, config, hp = make_pair(seed=5)
    fused_ref = ref.model.WaveGlow.remove_weightnorm(model)
    params_fused_sd = state_dict_to_params(fused_ref.state_dict(), hp)

    mel, _ = rand_mel_audio(frames=5, seed=5)
    n_groups = ((5 - 1) * 256 + 256) // 8
    noise = torch_infer_noise(config, 1, n_groups, seed=3)

    w1 = np.asarray(infer(fuse_for_inference(params), config,
                          jnp.asarray(mel), noise=[jnp.asarray(n) for n in noise]))
    w2 = np.asarray(infer(fuse_for_inference(params_fused_sd), config,
                          jnp.asarray(mel), noise=[jnp.asarray(n) for n in noise]))
    np.testing.assert_allclose(w1, w2, atol=1e-5)


class TestDenoiserParity:

  def test_bias_spec_and_forward_match(self):
    model, params, config, hp = make_pair(seed=6)
    # fresh models have zero end convs -> zero bias spec; randomize them so
    # the bias capture is non-trivial, then re-import the modified weights
    torch.manual_seed(60)
    for wnet in model.WN:
      wnet.end.weight.data.normal_(0, 0.1)
      wnet.end.bias.data.normal_(0, 0.1)
    params = state_dict_to_params(model.state_dict(), hp)
    model = ref.model.WaveGlow.remove_weightnorm(model)

    tstft_hp = ref.taco_stft.TSTFTHParams()
    ref_denoiser = ref.denoiser.Denoiser(model, tstft_hp, mode="zeros",
                                         device=torch.device("cpu"))

    fused = fuse_for_inference(params)
    my_denoiser = Denoiser(fused, config, TSTFTHParams(), mode="zeros")

    np.testing.assert_allclose(
        my_denoiser.bias_spec, ref_denoiser.bias_spec.numpy(), atol=1e-4)

    # real speech from the reference fixture, not synthetic noise
    audio = fixture_audio(4096, offset=60000)[None, :]
    with torch.no_grad():
      ref_out = ref_denoiser(torch.from_numpy(audio), strength=0.01)
    my_out = np.asarray(my_denoiser(jnp.asarray(audio), strength=0.01))
    np.testing.assert_allclose(my_out, ref_out.numpy()[:, 0, :], atol=1e-4)

  def test_denoiser_deviation_bound_documented(self):
    """BASELINE.md asks for bit-for-bit bias removal; across frameworks the
    STFT matmuls reduce in different orders, so bit-identity is unattainable.
    This test QUANTIFIES the actual deviation on the real fixture and pins
    the achievable bound (documented in docs/PARITY.md): the denoiser output
    differs from the reference by < 2e-5 absolute (float32 STFT roundtrip
    noise), about 100x tighter than the driver's 1e-3 end-to-end bar."""
    model, params, config, hp = make_pair(seed=6)
    torch.manual_seed(61)
    for wnet in model.WN:
      wnet.end.weight.data.normal_(0, 0.1)
      wnet.end.bias.data.normal_(0, 0.1)
    params = state_dict_to_params(model.state_dict(), hp)
    model = ref.model.WaveGlow.remove_weightnorm(model)

    tstft_hp = ref.taco_stft.TSTFTHParams()
    ref_denoiser = ref.denoiser.Denoiser(model, tstft_hp, mode="zeros",
                                         device=torch.device("cpu"))
    my_denoiser = Denoiser(fuse_for_inference(params), config,
                           TSTFTHParams(), mode="zeros")

    audio = fixture_audio(8192, offset=100000)[None, :]
    with torch.no_grad():
      ref_out = ref_denoiser(torch.from_numpy(audio),
                             strength=0.0005).numpy()[:, 0, :]
    my_out = np.asarray(my_denoiser(jnp.asarray(audio), strength=0.0005))
    max_abs = float(np.abs(my_out - ref_out).max())
    assert max_abs < 2e-5, f"denoiser deviation grew: {max_abs}"
    # bias_spec runs the full random-weight model once (12 matmul-heavy
    # flows), so its float32 noise is a bit larger than the STFT path alone
    bias_dev = float(np.abs(my_denoiser.bias_spec
                            - ref_denoiser.bias_spec.numpy()).max())
    assert bias_dev < 1e-4, f"bias_spec deviation grew: {bias_dev}"


class TestTrainingTrajectoryParity:
  """Gradients + Adam dynamics vs the reference, end-to-end: identical
  weights and batch, N optimizer steps, loss trajectories must track.

  Forward parity alone (above) does not cover the backward pass; this does —
  torch autograd + torch.optim.Adam (reference train.py:190-199, 241-250)
  against jax.grad + optax.adam over the SAME weight-normed parametrization.
  """

  def test_adam_loss_trajectory_matches(self):
    import optax

    from waveglow_tpu.training.step import make_optimizer

    model, params, config, hp = make_pair(seed=8)
    mel, audio = rand_mel_audio(frames=6, seed=8)
    lr, sigma, steps = 1e-3, 1.0, 3

    # --- reference trajectory (torch) ---
    criterion = ref.train.WaveGlowLoss(sigma=sigma)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    ref_losses = []
    for _ in range(steps):
      opt.zero_grad()
      out = model((torch.from_numpy(mel), torch.from_numpy(audio)))
      loss = criterion(out, None)
      ref_losses.append(float(loss))
      loss.backward()
      opt.step()

    # --- native trajectory (jax.grad + optax) on the imported params ---
    import jax

    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(params)

    def loss_fn(p):
      z, log_s, log_det = forward(p, config, jnp.asarray(mel),
                                  jnp.asarray(audio))
      return waveglow_loss(z, log_s, log_det, sigma)

    loss_grad = jax.jit(jax.value_and_grad(loss_fn))
    my_losses = []
    for _ in range(steps):
      loss, grads = loss_grad(params)
      my_losses.append(float(loss))
      updates, opt_state = optimizer.update(grads, opt_state, params)
      params = optax.apply_updates(params, updates)

    # step 1 is pure forward parity; later steps additionally require the
    # grads and Adam moments to match (zero-grad leaves stay zero in both;
    # float-noise-gradient leaves can step differently but are first-order
    # loss-insensitive)
    assert my_losses[0] == pytest.approx(ref_losses[0], rel=1e-4)
    for mine, theirs in zip(my_losses[1:], ref_losses[1:]):
      assert mine == pytest.approx(theirs, rel=1e-3)
    # the trajectory must actually move (guard against vacuous comparison)
    assert abs(ref_losses[-1] - ref_losses[0]) > 1e-4

  def test_continue_from_imported_checkpoint_resumes_adam(self, tmp_path):
    """continue-train from a reference torch checkpoint resumes Adam
    momentum (reference train.py:241-250, checkpoint.py:13-21): 3 torch
    warmup steps build real moments, the reference-format checkpoint is
    imported, and 3 MORE steps on each side must track — they only can if
    exp_avg/exp_avg_sq/step landed correctly on the optax state (a
    restarted Adam takes visibly different steps from zero moments)."""
    import optax
    from dataclasses import asdict

    import jax

    from waveglow_tpu.checkpointing.import_torch import load_torch_checkpoint
    from waveglow_tpu.checkpointing.store import restore_opt_state
    from waveglow_tpu.training.step import make_optimizer

    model, _, config, hp = make_pair(seed=9)
    mel, audio = rand_mel_audio(frames=6, seed=9)
    lr, sigma = 1e-3, 1.0

    criterion = ref.train.WaveGlowLoss(sigma=sigma)
    opt = torch.optim.Adam(model.parameters(), lr=lr)

    def torch_step():
      opt.zero_grad()
      out = model((torch.from_numpy(mel), torch.from_numpy(audio)))
      loss = criterion(out, None)
      loss.backward()
      opt.step()
      return float(loss)

    for _ in range(3):  # warmup: build real momentum
      torch_step()

    # the reference's own checkpoint payload (checkpoint.py:13-21)
    path = tmp_path / "ref_ckpt.pt"
    torch.save({"state_dict": model.state_dict(),
                "optimizer": opt.state_dict(), "learning_rate": lr,
                "iteration": 3, "hparams": asdict(hp)}, str(path))

    imported = load_torch_checkpoint(path)
    assert imported.optimizer is not None, "Adam state was not imported"

    ref_losses = [torch_step() for _ in range(3)]

    # native: params AND optimizer state from the imported checkpoint
    optimizer = make_optimizer(lr)
    params = imported.state_dict
    opt_state = restore_opt_state(imported.optimizer, optimizer, params)
    assert int(jax.tree_util.tree_leaves(opt_state)[0]) == 3  # Adam count

    def loss_fn(p):
      z, log_s, log_det = forward(p, config, jnp.asarray(mel),
                                  jnp.asarray(audio))
      return waveglow_loss(z, log_s, log_det, sigma)

    loss_grad = jax.jit(jax.value_and_grad(loss_fn))
    my_losses = []
    for _ in range(3):
      loss, grads = loss_grad(params)
      my_losses.append(float(loss))
      updates, opt_state = optimizer.update(grads, opt_state, params)
      params = optax.apply_updates(params, updates)

    for mine, theirs in zip(my_losses, ref_losses):
      assert mine == pytest.approx(theirs, rel=1e-3)
    assert abs(ref_losses[-1] - ref_losses[0]) > 1e-4

    # the moments really carried over: a zero-moment restart diverges from
    # the reference trajectory where the resumed one tracks it
    fresh_state = optimizer.init(imported.state_dict)
    p2 = imported.state_dict
    loss2, grads2 = loss_grad(p2)
    updates2, fresh_state = optimizer.update(grads2, fresh_state, p2)
    p2 = optax.apply_updates(p2, updates2)
    restart_loss2 = float(loss_grad(p2)[0])
    assert abs(restart_loss2 - ref_losses[1]) > \
        3 * abs(my_losses[1] - ref_losses[1])

  def test_reference_resumes_from_exported_adam_state(self, tmp_path):
    """The reverse direction: momentum built NATIVELY (optax) exports into
    the reference's checkpoint format, the real torch Adam loads it
    (train.py:241-250), and 2 continued steps on each side track — the
    full bidirectional continue-train interop loop."""
    import optax
    from dataclasses import asdict

    import jax

    from waveglow_tpu.checkpointing.export_torch import export_torch_checkpoint
    from waveglow_tpu.checkpointing.store import CheckpointWaveglow
    from waveglow_tpu.training.step import make_optimizer

    model, params, config, hp = make_pair(seed=12)
    mel, audio = rand_mel_audio(frames=6, seed=12)
    lr, sigma = 1e-3, 1.0

    def loss_fn(p):
      z, log_s, log_det = forward(p, config, jnp.asarray(mel),
                                  jnp.asarray(audio))
      return waveglow_loss(z, log_s, log_det, sigma)

    loss_grad = jax.jit(jax.value_and_grad(loss_fn))
    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(params)
    for _ in range(3):  # native warmup: build momentum in optax
      _, grads = loss_grad(params)
      updates, opt_state = optimizer.update(grads, opt_state, params)
      params = optax.apply_updates(params, updates)

    ckpt = CheckpointWaveglow(
        state_dict=jax.tree_util.tree_map(np.asarray, params),
        optimizer=[np.asarray(x)
                   for x in jax.tree_util.tree_leaves(opt_state)],
        learning_rate=lr, iteration=3, hparams=asdict(hp))
    path = tmp_path / "native_with_adam.pt"
    export_torch_checkpoint(ckpt, path)

    # reference side: load weights + optimizer exactly like train.py
    payload = torch.load(str(path), map_location="cpu", weights_only=False)
    model.load_state_dict(payload["state_dict"])
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    opt.load_state_dict(payload["optimizer"])
    criterion = ref.train.WaveGlowLoss(sigma=sigma)

    ref_losses = []
    for _ in range(2):
      opt.zero_grad()
      loss = criterion(model((torch.from_numpy(mel),
                              torch.from_numpy(audio))), None)
      ref_losses.append(float(loss))
      loss.backward()
      opt.step()

    my_losses = []
    for _ in range(2):
      loss, grads = loss_grad(params)
      my_losses.append(float(loss))
      updates, opt_state = optimizer.update(grads, opt_state, params)
      params = optax.apply_updates(params, updates)

    for mine, theirs in zip(my_losses, ref_losses):
      assert mine == pytest.approx(theirs, rel=1e-3)
    assert abs(ref_losses[-1] - ref_losses[0]) > 1e-5
