"""Streaming denoiser: windowed spectral subtraction == one-call Denoiser.

The reference denoises every synthesis result with a whole-utterance STFT
roundtrip (reference denoiser.py:51-57, synthesizer.py:63-66); streamed
audio must reassemble to that same denoised waveform. These tests pin:

  * StreamingDenoiser(pieces) concatenates to Denoiser(full) at atol 2e-6
    for arbitrary piece patterns (the only differences are compilation-
    dependent float roundings of the framed matmuls);
  * end-to-end: Synthesizer.stream(denoiser_strength=s) reassembles to
    InferenceResult.wav_denoised at the chunked-synthesis bound;
  * pcm16 emission matches the int16 conversion of the float emission;
  * the short-utterance one-shot fallback.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from waveglow_tpu.hparams import TSTFTHParams
from waveglow_tpu.inference.denoiser import Denoiser
from waveglow_tpu.inference.stream_denoise import StreamingDenoiser
from waveglow_tpu.models.waveglow import (WaveGlowConfig, fuse_for_inference,
                                          init_params)

CFG = WaveGlowConfig(n_flows=2, n_channels=32, n_layers=2)
STRENGTH = 0.02


@pytest.fixture(scope="module")
def denoiser():
  params = fuse_for_inference(init_params(CFG, seed=0))
  return Denoiser(params, CFG, TSTFTHParams(), mode="normal")


def _audio(n, seed=0):
  return np.random.default_rng(seed).standard_normal(n).astype(np.float32) * 0.3


def _run_stream(denoiser, wav, piece_sizes, **kw):
  sd = StreamingDenoiser(denoiser, STRENGTH, **kw)
  outs, pos = [], 0
  expected_start = 0
  for size in piece_sizes:
    for start, piece in sd.push(wav[pos:pos + size]):
      assert start == expected_start
      expected_start += len(piece)
      outs.append(piece)
    pos += size
  assert pos == len(wav)
  for start, piece in sd.flush():
    assert start == expected_start
    expected_start += len(piece)
    outs.append(piece)
  return np.concatenate(outs) if outs else np.zeros((0,), np.float32)


class TestStreamingDenoiser:

  def test_reassembles_to_full_denoiser(self, denoiser):
    wav = _audio(48 * 256, seed=1)
    full = np.asarray(denoiser(jnp.asarray(wav[None]), STRENGTH))[0]
    streamed = _run_stream(denoiser, wav, [4096] * 3, block_samples=2048)
    assert streamed.shape == full.shape == wav.shape
    np.testing.assert_allclose(streamed, full, atol=2e-6)

  def test_uneven_piece_pattern(self, denoiser):
    """Arbitrary piece sizes (including tiny and non-hop-aligned pushes)
    reassemble identically — only flush/emit geometry is hop-aligned."""
    wav = _audio(40 * 256, seed=2)
    full = np.asarray(denoiser(jnp.asarray(wav[None]), STRENGTH))[0]
    pieces = [100, 5000, 1, 3000, 123, 10240 - 100 - 5000 - 1 - 3000 - 123]
    pieces.append(len(wav) - sum(pieces))
    streamed = _run_stream(denoiser, wav, pieces, block_samples=1536)
    np.testing.assert_allclose(streamed, full, atol=2e-6)

  def test_single_push_then_flush(self, denoiser):
    wav = _audio(24 * 256, seed=3)
    full = np.asarray(denoiser(jnp.asarray(wav[None]), STRENGTH))[0]
    streamed = _run_stream(denoiser, wav, [len(wav)], block_samples=2048)
    np.testing.assert_allclose(streamed, full, atol=2e-6)

  def test_non_hop_aligned_total_truncates_like_istft(self, denoiser):
    """A total length not divisible by hop emits the same frame-aligned
    truncation the full iSTFT produces."""
    n = 20 * 256 + 100
    wav = _audio(n, seed=4)
    full = np.asarray(denoiser(jnp.asarray(wav[None]), STRENGTH))[0]
    streamed = _run_stream(denoiser, wav, [n], block_samples=1024)
    assert streamed.shape[0] == (n // 256) * 256 == full.shape[0]
    np.testing.assert_allclose(streamed, full, atol=2e-6)

  def test_short_utterance_one_shot_fallback(self, denoiser):
    """Shorter than one window: falls back to the full Denoiser call."""
    wav = _audio(4 * 256, seed=5)
    full = np.asarray(denoiser(jnp.asarray(wav[None]), STRENGTH))[0]
    streamed = _run_stream(denoiser, wav, [512, 512], block_samples=4096)
    np.testing.assert_allclose(streamed, full, atol=2e-6)

  def test_pcm16_matches_float_emission(self, denoiser):
    wav = _audio(24 * 256, seed=6) * 4.0  # force some clipping too
    f = _run_stream(denoiser, wav, [3072, 3072], block_samples=2048)
    p = _run_stream(denoiser, wav, [3072, 3072], block_samples=2048,
                    pcm16=True)
    assert p.dtype == np.int16
    expect = np.asarray(np.round(np.clip(f, -1.0, 1.0) * 32767.0), np.int16)
    np.testing.assert_array_equal(p, expect)

  def test_push_after_flush_rejected(self, denoiser):
    sd = StreamingDenoiser(denoiser, STRENGTH)
    sd.push(_audio(1024))
    sd.flush()
    with pytest.raises(RuntimeError):
      sd.push(_audio(256))

  def test_bad_block_size_rejected(self, denoiser):
    with pytest.raises(ValueError):
      StreamingDenoiser(denoiser, STRENGTH, block_samples=1000)
    with pytest.raises(ValueError):
      StreamingDenoiser(denoiser, STRENGTH, block_samples=0)

  def test_one_program_for_all_blocks(self, denoiser):
    """Interior, left-boundary and right-boundary blocks share one compiled
    window program (the envelope is an argument, not a constant)."""
    from waveglow_tpu.inference.stream_denoise import _denoise_window_fn
    stft = denoiser.stft
    fn = _denoise_window_fn(stft.filter_length, stft.hop_length,
                            stft.win_length, stft.window, False)
    before = fn._cache_size()
    wav = _audio(64 * 256, seed=7)
    _run_stream(denoiser, wav, [8192, 8192], block_samples=2048)
    assert fn._cache_size() <= before + 1


class TestStreamedSynthesisDenoised:

  @pytest.fixture(scope="class")
  def synth(self):
    from dataclasses import asdict
    from waveglow_tpu.checkpointing.store import CheckpointWaveglow
    from waveglow_tpu.hparams import HParams, overwrite_custom_hparams, \
        parse_custom_hparams
    from waveglow_tpu.inference.synthesizer import Synthesizer
    hp = overwrite_custom_hparams(
        HParams(), parse_custom_hparams("n_flows=2,n_channels=32,n_layers=2"))
    config = WaveGlowConfig.from_hparams(hp)
    params = init_params(config, seed=0)
    ckpt = CheckpointWaveglow(state_dict=params, optimizer=None,
                              learning_rate=hp.learning_rate, iteration=500,
                              hparams=asdict(hp))
    return Synthesizer(ckpt)

  def test_stream_matches_wav_denoised(self, synth):
    """The round-3 feature hole: streamed synthesis is now denoised, and
    reassembles to the non-streamed denoised output (chunked-synthesis
    noise is position-keyed, so raw streams match infer(chunk_frames=...)
    exactly; the denoiser adds only float rounding)."""
    mel = np.random.default_rng(8).standard_normal((80, 30)).astype(np.float32)
    strength = 0.01
    whole = synth.infer(mel, seed=3, denoiser_strength=strength,
                        chunk_frames=8).wav_denoised
    pieces = [p for _, p in synth.stream(mel, seed=3, chunk_frames=8,
                                         denoiser_strength=strength)]
    streamed = np.concatenate(pieces)
    assert streamed.shape == whole.shape
    np.testing.assert_allclose(streamed, whole, atol=1e-5)

  def test_stream_strength_zero_is_raw(self, synth):
    mel = np.random.default_rng(9).standard_normal((80, 20)).astype(np.float32)
    raw = np.concatenate(
        [p for _, p in synth.stream(mel, seed=1, chunk_frames=8)])
    explicit = np.concatenate(
        [p for _, p in synth.stream(mel, seed=1, chunk_frames=8,
                                    denoiser_strength=0.0)])
    np.testing.assert_array_equal(raw, explicit)

  def test_stream_pcm16_denoised(self, synth):
    mel = np.random.default_rng(10).standard_normal((80, 20)).astype(np.float32)
    f = np.concatenate([p for _, p in synth.stream(
        mel, seed=2, chunk_frames=8, denoiser_strength=0.01)])
    p = np.concatenate([p for _, p in synth.stream(
        mel, seed=2, chunk_frames=8, denoiser_strength=0.01, pcm16=True)])
    assert p.dtype == np.int16
    expect = np.asarray(np.round(np.clip(f, -1.0, 1.0) * 32767.0), np.int16)
    np.testing.assert_array_equal(p, expect)


@pytest.fixture(scope="module")
def denoiser_bias():
  """A denoiser with a NONZERO bias spectrum: fresh init_params zero-init
  the WN end convs, so sigma=0 synthesis — and therefore bias_spec — is
  exactly zero and the spectral-subtraction path (bias*strength, clip)
  goes unexercised. Perturbing the end convs makes the bias real."""
  params = init_params(CFG, seed=0)
  rng = np.random.default_rng(100)
  for flow in params["flows"]:
    end = flow["wn"]["end"]
    end["w"] = (0.3 * rng.standard_normal(end["w"].shape)).astype(np.float32)
    end["b"] = (0.3 * rng.standard_normal(end["b"].shape)).astype(np.float32)
  dn = Denoiser(fuse_for_inference(params), CFG, TSTFTHParams(), mode="zeros")
  assert float(np.abs(np.asarray(dn.bias_spec)).max()) > 0
  return dn


class TestStreamingDenoiserWithRealBias:
  """Regression coverage for the round-5 review findings: the original
  exactness pins all ran with bias_spec == 0, so bias-dependent bugs (and
  a flush-time buffer-retention crash) passed the suite."""

  def test_short_tail_flush_matches_full(self, denoiser_bias):
    """Streams whose tail (total mod block) is under block - hop - half
    crashed flush(): the final window's left-clamp reached raw samples the
    push-time retention had already dropped. Default 16384 block with a
    30000-sample stream is such a case."""
    wav = _audio(30000, seed=11)
    full = np.asarray(denoiser_bias(jnp.asarray(wav[None]), STRENGTH))[0]
    sd = StreamingDenoiser(denoiser_bias, STRENGTH, block_samples=16384)
    outs = [p for _, p in sd.push(wav)] + [p for _, p in sd.flush()]
    streamed = np.concatenate(outs)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=2e-6)

  def test_many_tail_lengths_match_full(self, denoiser_bias):
    """Sweep tails across the block: every residue class must flush
    cleanly and reassemble to the one-call denoiser (nonzero bias)."""
    block = 2048
    for total in (4096, 4096 + 256, 4096 + 1024, 6144 - 256, 8191):
      wav = _audio(total, seed=total)
      full = np.asarray(denoiser_bias(jnp.asarray(wav[None]), STRENGTH))[0]
      sd = StreamingDenoiser(denoiser_bias, STRENGTH, block_samples=block)
      outs = [p for _, p in sd.push(wav)] + [p for _, p in sd.flush()]
      streamed = np.concatenate(outs)
      assert streamed.shape == full.shape, total
      np.testing.assert_allclose(streamed, full, atol=2e-6,
                                 err_msg=f"total={total}")

  def test_empty_and_subhop_flush_return_nothing(self, denoiser_bias):
    """A stream aborted before any audio (or a sub-hop utterance) ends
    gracefully: flush() returns [] instead of pushing an empty waveform
    through the full denoiser's reflect pad (a crash)."""
    assert StreamingDenoiser(denoiser_bias, STRENGTH).flush() == []
    sd = StreamingDenoiser(denoiser_bias, STRENGTH)
    assert sd.push(np.zeros(100, np.float32)) == []
    assert sd.flush() == []

  def test_odd_stft_ratio_rejected_at_construction(self):
    """hop must divide filter_length/2: an odd ratio (768/256) misaligns
    every window's frame grid with the full-signal one and the stream
    SILENTLY diverged from Denoiser (2.9e-3 measured) — now it fails
    loudly at construction."""
    hp = TSTFTHParams()
    hp.filter_length = 768
    hp.win_length = 768
    params = fuse_for_inference(init_params(CFG, seed=0))
    dn = Denoiser(params, CFG, hp, mode="zeros")
    with pytest.raises(ValueError, match="divide"):
      StreamingDenoiser(dn, STRENGTH)
