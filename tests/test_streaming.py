"""Chunked (constant-memory) synthesis: exactness vs one-call infer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveglow_tpu.models.waveglow import (WaveGlowConfig, fuse_for_inference,
                                          infer, init_params)
from waveglow_tpu.inference.streaming import (block_noise, infer_chunked,
                                              receptive_halo_frames)

CFG = WaveGlowConfig(n_flows=4, n_channels=64, n_layers=3)


def _model(seed=0):
  """Fused random params with NON-zero end convs.

  Fresh models zero-init the end conv (couplings start as identity,
  reference model.py:88-92), which would make mel/halo exactness checks
  vacuous — the conditioning path would never reach the output.
  """
  params = init_params(CFG, seed=seed)
  rng = np.random.default_rng(seed + 100)
  for flow in params["flows"]:
    end = flow["wn"]["end"]
    end["w"] = (rng.standard_normal(end["w"].shape) * 0.2).astype(np.float32)
    end["b"] = (rng.standard_normal(end["b"].shape) * 0.05).astype(np.float32)
  return fuse_for_inference(params)


class TestBlockNoise:

  def test_position_keyed_consistency(self):
    """Any window covering a frame draws the same values there."""
    key = jax.random.PRNGKey(3)
    full = block_noise(key, CFG, batch=2, start_frame=0, n_frames=20)
    part = block_noise(key, CFG, batch=2, start_frame=10, n_frames=5)
    gpf = 256 // CFG.n_group
    for f, p in zip(full, part):
      np.testing.assert_array_equal(np.asarray(f[:, 10 * gpf:15 * gpf]),
                                    np.asarray(p))

  def test_matches_infer_contract(self):
    """Shapes line up with infer_noise_shapes and infer accepts them."""
    key = jax.random.PRNGKey(0)
    mel = jnp.zeros((1, 80, 6))
    noise = block_noise(key, CFG, batch=1, start_frame=0, n_frames=6)
    wav = infer(_model(), CFG, mel, noise=noise)
    assert wav.shape == (1, 6 * 256)


class TestInferChunked:

  def test_exact_vs_full(self):
    params = _model()
    rng = np.random.default_rng(0)
    frames = 40
    mel = jnp.asarray(rng.standard_normal((2, 80, frames)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    full = infer(params, CFG, mel,
                 noise=block_noise(key, CFG, 2, 0, frames))
    chunked = infer_chunked(params, CFG, mel, rng=key, chunk_frames=8)
    assert chunked.shape == full.shape == (2, frames * 256)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)

  def test_exact_with_scan_flows(self):
    params = _model(seed=1)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, 80, 30)).astype(np.float32))
    key = jax.random.PRNGKey(9)
    full = infer(params, CFG, mel, noise=block_noise(key, CFG, 1, 0, 30),
                 scan_flows=True)
    chunked = infer_chunked(params, CFG, mel, rng=key, chunk_frames=7,
                            scan_flows=True)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)

  def test_short_input_falls_back_to_single_call(self):
    params = _model()
    mel = jnp.zeros((1, 80, 10))
    key = jax.random.PRNGKey(0)
    full = infer(params, CFG, mel, noise=block_noise(key, CFG, 1, 0, 10))
    chunked = infer_chunked(params, CFG, mel, rng=key, chunk_frames=64)
    # same math, same noise; the one-window call is JITTED (so repeated
    # short-mel serving reuses one compiled program instead of dispatching
    # per-op) and jit fusion rounds differently than the eager reference —
    # the documented compilation-dependent tolerance applies
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)

  def test_halo_too_small_diverges(self):
    """Negative control: without the receptive-field halo the chunk
    boundaries would be wrong — proves the exactness test has teeth."""
    params = _model()
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, 80, 40)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    full = infer(params, CFG, mel, noise=block_noise(key, CFG, 1, 0, 40))
    bad = infer_chunked(params, CFG, mel, rng=key, chunk_frames=8,
                        halo_frames=1)
    assert not np.allclose(np.asarray(bad), np.asarray(full), atol=1e-5)

  def test_derived_halo_is_tight(self):
    """halo-1 must diverge somewhere across seeds — the derived halo is not
    wastefully large. (A probabilistic property; several seeds hedge it.)"""
    halo = receptive_halo_frames(CFG)
    assert halo == int(np.ceil(4 * (2 ** 3 - 1) / 32)) + 4
    diverged = False
    for seed in range(3):
      params = _model(seed=seed)
      rng = np.random.default_rng(seed)
      mel = jnp.asarray(
          rng.standard_normal((1, 80, 48)).astype(np.float32) * 2.0)
      key = jax.random.PRNGKey(seed)
      full = infer(params, CFG, mel, noise=block_noise(key, CFG, 1, 0, 48))
      near = infer_chunked(params, CFG, mel, rng=key, chunk_frames=8,
                           halo_frames=halo - 2)
      if not np.allclose(np.asarray(near), np.asarray(full), atol=1e-6):
        diverged = True
        break
    assert diverged


class TestStreamChunks:

  def test_pieces_reassemble_to_chunked_output(self):
    """The generator yields time-ordered (start_sample, piece) pairs whose
    concatenation equals infer_chunked exactly (same windows, same noise)."""
    from waveglow_tpu.inference.streaming import stream_chunks

    params = _model(seed=3)
    rng = np.random.default_rng(3)
    frames = 40
    mel = jnp.asarray(rng.standard_normal((1, 80, frames)).astype(np.float32))
    key = jax.random.PRNGKey(11)

    whole = infer_chunked(params, CFG, mel, rng=key, chunk_frames=8)

    starts, pieces = [], []
    for start, piece in stream_chunks(params, CFG, mel, rng=key,
                                      chunk_frames=8):
      starts.append(start)
      pieces.append(np.asarray(piece))

    # time-ordered, contiguous coverage
    assert starts[0] == 0
    offset = 0
    for start, piece in zip(starts, pieces):
      assert start == offset
      offset += piece.shape[1]
    assert offset == frames * 256

    np.testing.assert_array_equal(np.concatenate(pieces, axis=1),
                                  np.asarray(whole))


  def test_pcm16_pieces_match_host_conversion(self):
    """pcm16=True converts inside the window program; pieces must equal the
    host conversion (clip -> scale -> round-half-even -> int16) of the
    float pieces exactly."""
    from waveglow_tpu.inference.streaming import stream_chunks
    from waveglow_tpu.dsp.audio_io import convert_wav

    params = _model(seed=5)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((1, 80, 24)).astype(np.float32))
    key = jax.random.PRNGKey(13)

    f32 = [np.asarray(p) for _, p in
           stream_chunks(params, CFG, mel, rng=key, chunk_frames=8)]
    pcm = [np.asarray(p) for _, p in
           stream_chunks(params, CFG, mel, rng=key, chunk_frames=8,
                         pcm16=True)]
    assert all(p.dtype == np.int16 for p in pcm)
    for f, p in zip(f32, pcm):
      np.testing.assert_array_equal(
          p, convert_wav(np.clip(f, -1.0, 1.0), np.int16))

  def test_short_input_single_piece(self):
    from waveglow_tpu.inference.streaming import stream_chunks
    params = _model(seed=4)
    mel = jnp.zeros((1, 80, 6))
    out = list(stream_chunks(params, CFG, mel, chunk_frames=512))
    assert len(out) == 1 and out[0][0] == 0
    assert out[0][1].shape == (1, 6 * 256)


class TestProgramReuse:
  """The window program's shapes depend only on the window size: distinct
  utterance lengths (and short-mel one-window calls) share compilations."""

  def test_distinct_lengths_share_one_window_program(self):
    from waveglow_tpu.inference.streaming import _window_fn, stream_chunks
    _window_fn.cache_clear()
    params = _model()
    rng = np.random.default_rng(1)
    halo = receptive_halo_frames(CFG)
    out = {}
    for frames in (40, 47):  # both > window, different totals
      mel = jnp.asarray(rng.standard_normal((1, 80, frames)).astype(np.float32))
      pieces = [p for _, p in stream_chunks(params, CFG, mel, chunk_frames=8,
                                            rng=jax.random.PRNGKey(0))]
      out[frames] = np.concatenate([np.asarray(p) for p in pieces], axis=1)
      assert out[frames].shape == (1, frames * 256)
    assert _window_fn.cache_info().currsize == 1
    run_window = _window_fn(CFG, 8 + 2 * halo, None, False, False, False, False)
    assert run_window._cache_size() == 1  # ONE XLA program for both lengths

  def test_short_mel_uses_cached_jitted_program(self):
    """Mels shorter than the window pad UP to the standard window shape
    with true-frames masking, so DISTINCT short lengths share ONE compiled
    program (a per-length program compiled ~37 s each over a tunneled TPU
    and thrashed the 16-entry jit cache) — and the output still matches
    the one-call full infer bit-for-mask-bit."""
    from waveglow_tpu.inference.streaming import (_window_fn,
                                                  receptive_halo_frames,
                                                  stream_chunks)
    _window_fn.cache_clear()
    params = _model()
    rng = np.random.default_rng(2)
    window = 8 + 2 * receptive_halo_frames(CFG)
    outs = {}
    for frames in (6, 7):  # two distinct short lengths, one program
      mel = jnp.asarray(
          rng.standard_normal((1, 80, frames)).astype(np.float32))
      pieces = list(stream_chunks(params, CFG, mel, chunk_frames=8,
                                  rng=jax.random.PRNGKey(1)))
      assert len(pieces) == 1
      assert pieces[0][1].shape == (1, frames * 256)
      outs[frames] = (mel, pieces[0][1])
    run_window = _window_fn(CFG, window, None, False, False, False, True)
    assert run_window._cache_size() == 1  # both lengths, ONE compilation
    # and each matches the one-call full infer (same position-keyed noise)
    # up to the documented compilation-dependent rounding
    for frames, (mel, piece) in outs.items():
      noise = block_noise(jax.random.PRNGKey(1), CFG, 1, 0, frames)
      full = infer(params, CFG, mel, noise=noise)
      np.testing.assert_allclose(np.asarray(piece), np.asarray(full),
                                 atol=1e-5)
