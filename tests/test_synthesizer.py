"""Synthesizer runtime tests (the reference's test_Synthesizer analogue,
with random weights instead of the 644 MB download: determinism, seeding,
denoiser behavior, result metadata)."""

import numpy as np
import pytest

from waveglow_tpu.checkpointing.store import CheckpointWaveglow
from waveglow_tpu.hparams import HParams, overwrite_custom_hparams, parse_custom_hparams
from waveglow_tpu.inference.synthesizer import Synthesizer
from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params

TINY = "n_flows=2,n_channels=32,n_layers=2"


@pytest.fixture(scope="module")
def synth():
  from dataclasses import asdict
  hp = overwrite_custom_hparams(HParams(), parse_custom_hparams(TINY))
  config = WaveGlowConfig.from_hparams(hp)
  params = init_params(config, seed=0)
  ckpt = CheckpointWaveglow(state_dict=params, optimizer=None,
                            learning_rate=hp.learning_rate, iteration=500,
                            hparams=asdict(hp))
  return Synthesizer(ckpt)


def rand_mel(frames=10, seed=0):
  return np.random.default_rng(seed).standard_normal(
      (80, frames)).astype(np.float32)


class TestSynthesizer:

  def test_result_contract(self, synth):
    res = synth.infer(rand_mel(), seed=0)
    assert res.sampling_rate == 22050
    assert res.wav.shape == (10 * 256,)
    assert res.wav.dtype == np.float32
    assert res.inference_duration_s > 0
    assert res.denoising_duration_s > 0  # default strength 0.0005 > 0
    assert np.isfinite(res.wav).all()
    assert np.isfinite(res.wav_denoised).all()

  def test_same_seed_same_output(self, synth):
    mel = rand_mel(8, seed=1)
    r1 = synth.infer(mel, seed=42)
    r2 = synth.infer(mel, seed=42)
    np.testing.assert_array_equal(r1.wav, r2.wav)

  def test_different_seed_different_output(self, synth):
    mel = rand_mel(8, seed=1)
    r1 = synth.infer(mel, seed=1)
    r2 = synth.infer(mel, seed=2)
    assert not np.array_equal(r1.wav, r2.wav)

  def test_zero_denoiser_strength_skips_denoising(self, synth):
    res = synth.infer(rand_mel(6), seed=0, denoiser_strength=0.0)
    assert res.denoising_duration_s == 0.0
    np.testing.assert_array_equal(res.wav, res.wav_denoised)

  def test_denoiser_changes_output(self, synth):
    mel = rand_mel(6, seed=2)
    raw = synth.infer(mel, seed=0, denoiser_strength=0.0)
    dn = synth.infer(mel, seed=0, denoiser_strength=0.01)
    np.testing.assert_array_equal(raw.wav, dn.wav)
    assert not np.array_equal(dn.wav, dn.wav_denoised)
    # same length in/out (frame-aligned inputs)
    assert dn.wav_denoised.shape == dn.wav.shape

  def test_sigma_scales_energy(self, synth):
    mel = rand_mel(8, seed=3)
    quiet = synth.infer(mel, sigma=0.01, seed=0, denoiser_strength=0.0)
    loud = synth.infer(mel, sigma=1.0, seed=0, denoiser_strength=0.0)
    # more noise energy in -> more variance out (couplings near-identity
    # would make this exact; with random weights just require a gap)
    assert np.std(loud.wav) > np.std(quiet.wav)

  def test_batched_mel_input_accepted(self, synth):
    res = synth.infer(rand_mel(6)[None], seed=0)
    assert res.wav.shape == (6 * 256,)

  def test_2d_and_3d_mel_equivalent(self, synth):
    mel = rand_mel(6, seed=4)
    r1 = synth.infer(mel, seed=9)
    r2 = synth.infer(mel[None], seed=9)
    np.testing.assert_array_equal(r1.wav, r2.wav)


class TestDenoiserModes:

  @staticmethod
  def _nontrivial_params():
    """Fresh params have zero end convs (identity couplings) -> zero bias;
    perturb them so the denoiser has something to capture."""
    from waveglow_tpu.hparams import HParams, overwrite_custom_hparams, parse_custom_hparams
    from waveglow_tpu.models.waveglow import (WaveGlowConfig,
                                              fuse_for_inference, init_params)
    hp = overwrite_custom_hparams(HParams(), parse_custom_hparams(TINY))
    config = WaveGlowConfig.from_hparams(hp)
    params = init_params(config, seed=0)
    rng = np.random.default_rng(11)
    for flow in params["flows"]:
      end = flow["wn"]["end"]
      end["w"] = (0.1 * rng.standard_normal(end["w"].shape)).astype(np.float32)
      end["b"] = (0.1 * rng.standard_normal(end["b"].shape)).astype(np.float32)
    return fuse_for_inference(params), config

  def test_normal_mode_differs_from_zeros(self, synth):
    from waveglow_tpu.hparams import TSTFTHParams
    from waveglow_tpu.inference.denoiser import Denoiser
    import jax
    params, config = self._nontrivial_params()
    dn_zeros = Denoiser(params, config, TSTFTHParams(), mode="zeros")
    dn_normal = Denoiser(params, config, TSTFTHParams(),
                         mode="normal", rng=jax.random.PRNGKey(7))
    assert np.abs(dn_zeros.bias_spec).max() > 0
    assert dn_normal.bias_spec.shape == dn_zeros.bias_spec.shape
    assert not np.array_equal(dn_normal.bias_spec, dn_zeros.bias_spec)

  def test_unknown_mode_raises(self, synth):
    from waveglow_tpu.hparams import TSTFTHParams
    from waveglow_tpu.inference.denoiser import Denoiser
    with pytest.raises(ValueError):
      Denoiser(synth.params, synth.config, TSTFTHParams(), mode="bogus")


def fresh_tiny_synth():
  """A fresh Synthesizer (fresh program caches — TestBucketFrames counts
  compiled programs, so the shared module fixture would skew the counts)."""
  from dataclasses import asdict
  hp = overwrite_custom_hparams(HParams(), parse_custom_hparams(TINY))
  params = init_params(WaveGlowConfig.from_hparams(hp), seed=0)
  ckpt = CheckpointWaveglow(state_dict=params, optimizer=None,
                            learning_rate=hp.learning_rate, iteration=1,
                            hparams=asdict(hp))
  return Synthesizer(ckpt)


class TestBucketFrames:
  """bucket_frames: distinct-length mels share one compiled program per
  bucket (the synthesize CLI default — a folder of N lengths must not cost
  N multi-minute XLA compiles over a tunneled TPU)."""

  def test_program_reuse_across_lengths(self):
    synth = fresh_tiny_synth()
    lengths = [10, 13, 16]  # all bucket to 16 frames
    for f in lengths:
      res = synth.infer(rand_mel(f, seed=f), seed=0, bucket_frames=16)
      assert res.wav.shape == (f * 256,)
      assert res.wav_denoised.shape == (f * 256,)
    # one traced synthesis program and one denoiser program for all three
    assert synth._infer_keyed._cache_size() == 1
    assert synth._denoise_jit._cache_size() == 1

  def test_bucket_composes_with_chunked(self):
    """bucket_frames + chunk_frames: the chunked window program is traced
    against the padded mel shape (bounded compile count for folders of long
    files), output still trimmed to the true length and equal to the
    unbucketed chunked call outside the pad-conditioning tail window."""
    from tests.test_serving import _pad_reach_samples
    synth = fresh_tiny_synth()
    mel = rand_mel(20, seed=5)
    plain = synth.infer(mel, seed=4, denoiser_strength=0.0, chunk_frames=8)
    bucketed = synth.infer(mel, seed=4, denoiser_strength=0.0,
                           chunk_frames=8, bucket_frames=16)
    assert bucketed.wav.shape == plain.wav.shape == (20 * 256,)
    reach = _pad_reach_samples(synth.config)
    np.testing.assert_allclose(bucketed.wav[:20 * 256 - reach],
                               plain.wav[:20 * 256 - reach], atol=1e-5)

  def test_exact_multiple_is_unpadded_program(self):
    """A mel already on the bucket boundary is bit-identical to the
    unbucketed call (no padding happened)."""
    synth = fresh_tiny_synth()
    mel = rand_mel(16, seed=2)
    plain = synth.infer(mel, seed=3, denoiser_strength=0.0)
    bucketed = synth.infer(mel, seed=3, denoiser_strength=0.0,
                           bucket_frames=16)
    np.testing.assert_array_equal(plain.wav, bucketed.wav)


class TestSynthesizerStreaming:

  def test_stream_pieces_cover_utterance(self, synth):
    mel = rand_mel(frames=30, seed=4)
    offset, pieces = 0, []
    for start, piece in synth.stream(mel, seed=2, chunk_frames=8):
      assert start == offset
      assert piece.ndim == 1
      offset += len(piece)
      pieces.append(piece)
    assert offset == 30 * 256
    # streaming reassembles to the chunked-inference output for the same seed
    whole = synth.infer(mel, seed=2, denoiser_strength=0.0,
                        chunk_frames=8).wav
    np.testing.assert_array_equal(np.concatenate(pieces), whole)


def test_wrong_mel_bins_rejected(synth):
  with pytest.raises(ValueError, match="expected mel of shape"):
    synth.infer(np.zeros((79, 20), np.float32))
  with pytest.raises(ValueError, match="expected mel of shape"):
    synth.infer(np.zeros((2, 80, 20, 1), np.float32))
