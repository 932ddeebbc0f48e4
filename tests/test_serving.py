"""Serving tests: batched synthesis + mesh-sharded variants + mesh training."""

import numpy as np
import pytest

import jax

from waveglow_tpu.checkpointing.store import CheckpointWaveglow
from waveglow_tpu.hparams import HParams, overwrite_custom_hparams, parse_custom_hparams
from waveglow_tpu.inference.serving import BatchSynthesizer
from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params
from waveglow_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

TINY = "n_flows=2,n_channels=32,n_layers=2"


def tiny_checkpoint(seed=0, perturb_end=False):
  from dataclasses import asdict
  hp = overwrite_custom_hparams(HParams(), parse_custom_hparams(TINY))
  config = WaveGlowConfig.from_hparams(hp)
  params = init_params(config, seed=seed)
  if perturb_end:
    # fresh params zero-init the end convs (identity couplings) — perturb
    # them so the WN stack actually shapes the waveform and boundary
    # conditioning differences become observable
    rng = np.random.default_rng(seed + 100)
    for flow in params["flows"]:
      end = flow["wn"]["end"]
      end["w"] = (0.3 * rng.standard_normal(end["w"].shape)).astype(np.float32)
      end["b"] = (0.3 * rng.standard_normal(end["b"].shape)).astype(np.float32)
  return CheckpointWaveglow(state_dict=params, optimizer=None,
                            learning_rate=hp.learning_rate, iteration=100,
                            hparams=asdict(hp))


def rand_mels(batch, frames, seed=0):
  rng = np.random.default_rng(seed)
  return rng.standard_normal((batch, 80, frames)).astype(np.float32)


class TestBatchSynthesizer:

  def test_batch_matches_mesh_batch(self):
    ckpt = tiny_checkpoint()
    mels = rand_mels(4, 12)

    single = BatchSynthesizer(ckpt)
    wav_single = single.infer_batch(mels, seed=3)

    mesh = mesh_lib.make_mesh(data=4, model=1)
    sharded = BatchSynthesizer(ckpt, mesh=mesh)
    wav_sharded = sharded.infer_batch(mels, seed=3)

    assert wav_single.shape == wav_sharded.shape == (4, 12 * 256)
    np.testing.assert_allclose(wav_sharded, wav_single, atol=1e-4)

  def test_tensor_parallel_serving_matches(self):
    """A (data x model) mesh shards WN channels for serving; outputs must
    match the unsharded synthesizer, and the big WN weights must physically
    live sharded (model-parallel memory win)."""
    from jax.sharding import PartitionSpec as P

    ckpt = tiny_checkpoint(seed=2)
    mels = rand_mels(2, 12, seed=2)

    single = BatchSynthesizer(ckpt)
    wav_single = single.infer_batch(mels, seed=5)

    mesh = mesh_lib.make_mesh(data=2, model=4)
    tp = BatchSynthesizer(ckpt, mesh=mesh)
    wav_tp = tp.infer_batch(mels, seed=5)

    assert wav_single.shape == wav_tp.shape
    np.testing.assert_allclose(wav_tp, wav_single, atol=1e-4)

    # physical shard check: in_layer weights split on the trailing C'
    w = tp.params["flows"][0]["wn"]["in_layers"][0]["w"]
    shard_shape = w.sharding.shard_shape(w.shape)
    assert shard_shape[-1] == w.shape[-1] // 4

  def test_infer_long_time_sharded_matches(self):
    ckpt = tiny_checkpoint(seed=1)
    mel = rand_mels(1, 64, seed=1)[0]

    plain = BatchSynthesizer(ckpt)
    # the unsharded REFERENCE comes from the ordinary batch program;
    # infer_long itself now refuses to run without a time mesh (a silent
    # single-chip fallback defeated its whole purpose)
    wav_plain = plain.infer_batch(mel[None], seed=7)[0]
    with pytest.raises(ValueError, match="time"):
      plain.infer_long(mel, seed=7)

    tmesh = mesh_lib.make_time_mesh(time=8)
    sharded = BatchSynthesizer(ckpt, mesh=tmesh)
    wav_sharded = sharded.infer_long(mel, seed=7)

    assert wav_plain.shape == wav_sharded.shape == (64 * 256,)
    np.testing.assert_allclose(wav_sharded, wav_plain, atol=1e-4)


class TestMeshTraining:

  def test_train_loop_with_mesh_hparams(self, tmp_path):
    """train() with mesh_data=2, mesh_model=2 runs and checkpoints."""
    from tests.test_training import write_noise_dataset
    from waveglow_tpu.training.data import load_dataset
    from waveglow_tpu.training.loop import train

    data_dir = tmp_path / "data"
    write_noise_dataset(data_dir, n=4, seconds=0.4)
    entries = load_dataset(data_dir)

    custom = parse_custom_hparams(
        TINY + ",segment_length=2048,batch_size=2,epochs=1,"
        "iters_per_checkpoint=0,epochs_per_checkpoint=0,"
        "mesh_data=2,mesh_model=2")
    state = train(custom, tmp_path / "logs", entries, entries,
                  tmp_path / "ckpts", max_iterations=2)
    assert int(state["step"]) == 2


class TestInferMany:
  """Variable-length bucketed batch serving."""

  def test_same_length_matches_infer_batch(self):
    """Equal-length mels form one bucket whose program and noise draw are
    identical to infer_batch at the padded shape — outputs match exactly."""
    ckpt = tiny_checkpoint()
    synth = BatchSynthesizer(ckpt)
    mels = rand_mels(3, 16, seed=4)

    import jax as _jax
    key = _jax.random.fold_in(_jax.random.PRNGKey(7), 16)
    ref = np.asarray(synth._infer(synth.params, synth._put_batch(mels),
                                  np.float32(1.0), key))
    outs = synth.infer_many(list(mels), seed=7, bucket_frames=16)
    assert len(outs) == 3
    for row, out in enumerate(outs):
      np.testing.assert_array_equal(out, ref[row])

  def test_variable_lengths_trim_and_order(self):
    ckpt = tiny_checkpoint()
    synth = BatchSynthesizer(ckpt)
    lengths = [10, 33, 10, 64, 17]
    mels = [rand_mels(1, f, seed=f)[0] for f in lengths]
    outs = synth.infer_many(mels, seed=0, bucket_frames=16)
    assert [len(o) for o in outs] == [f * 256 for f in lengths]
    assert all(np.isfinite(o).all() for o in outs)
    # same-bucket same-content utterances (both 10 -> padded 16) get the
    # same bucket noise rows only if they differ by row; identical mels in
    # the SAME batched call at different rows draw different noise, so just
    # assert determinism across calls:
    outs2 = synth.infer_many(mels, seed=0, bucket_frames=16)
    for a, b in zip(outs, outs2):
      np.testing.assert_array_equal(a, b)

  def test_max_batch_splits_bucket(self):
    ckpt = tiny_checkpoint()
    synth = BatchSynthesizer(ckpt)
    mels = [rand_mels(1, 12, seed=i)[0] for i in range(5)]
    outs = synth.infer_many(mels, seed=1, bucket_frames=4, max_batch=2)
    assert [len(o) for o in outs] == [12 * 256] * 5

  def test_mesh_row_padding(self):
    """3 utterances on a 4-way data mesh: the bucket batch is padded to 4
    rows and the repeat dropped."""
    ckpt = tiny_checkpoint()
    mesh = mesh_lib.make_mesh(data=4, model=1)
    sharded = BatchSynthesizer(ckpt, mesh=mesh)
    mels = [rand_mels(1, 12, seed=i)[0] for i in range(3)]
    outs = sharded.infer_many(mels, seed=2, bucket_frames=4)
    assert [len(o) for o in outs] == [12 * 256] * 3
    assert all(np.isfinite(o).all() for o in outs)

  def test_empty_mel_rejected(self):
    ckpt = tiny_checkpoint()
    synth = BatchSynthesizer(ckpt)
    with pytest.raises(ValueError, match="no frames"):
      synth.infer_many([np.zeros((80, 0), np.float32)])


# Tail window affected by bucket padding, in audio samples: each WN layer's
# dilated conv ('same' padding) reaches 2^i groups each side, a whole stack
# reaches 2^n_layers - 1 groups, and the reach compounds across flows. The
# upsample's pad frames cannot touch kept samples at all (pad frame f >= F
# contributes only to audio positions >= f*hop, all trimmed), so this conv
# reach is the ONLY deviation channel.
def _pad_reach_samples(config):
  per_layer = (config.kernel_size - 1) // 2
  return (config.n_flows * per_layer * (2 ** config.n_layers - 1)
          * config.n_group)


def test_bucket_padding_deviation_bound():
  """Characterizes the UNMASKED padding deviation class (models-level infer
  without true_frames): pad conditioning reaches kept samples only through
  the WN convs' trailing receptive-field window, bounded magnitude. This is
  the deviation the true_frames masking removes — if masking silently
  became a no-op, TestBucketExactness would catch it because this test
  proves the unmasked programs genuinely differ."""
  import jax

  from waveglow_tpu.dsp.mel import CLIP_VAL
  from waveglow_tpu.models.waveglow import block_noise, fuse_for_inference, \
      infer

  ckpt = tiny_checkpoint(seed=3, perturb_end=True)
  from waveglow_tpu.hparams import HParams, overwrite_custom_hparams, \
      parse_custom_hparams
  config = WaveGlowConfig.from_hparams(ckpt.get_hparams())
  params = fuse_for_inference(ckpt.state_dict)
  frames, padded_f = 20, 32
  mel = rand_mels(1, frames, seed=6)
  floor = float(np.log(CLIP_VAL))
  mel_padded = np.pad(mel, ((0, 0), (0, 0), (0, padded_f - frames)),
                      constant_values=floor)
  key = jax.random.PRNGKey(5)

  solo = np.asarray(infer(params, config, mel, rng=key))[0]
  unmasked = np.asarray(infer(params, config, mel_padded,
                              rng=key))[0, :frames * 256]

  reach = _pad_reach_samples(config)
  cut = frames * 256 - reach
  # identical noise (position-keyed per absolute frame), identical upsampled
  # conditioning -> the prefix outside the conv-reach window must agree to
  # float-roundoff (the two XLA programs differ only in shape)
  np.testing.assert_allclose(unmasked[:cut], solo[:cut], atol=1e-6)
  # the tail sees silence-pad conditioning instead of the solo call's zero
  # conv boundary: the deviation is real (masking is not vacuous) and
  # bounded
  tail_dev = float(np.abs(unmasked[cut:] - solo[cut:]).max())
  assert 1e-6 < tail_dev < 0.5, tail_dev

  # the masked program removes it: bit-identical on every kept sample
  masked = np.asarray(infer(params, config, mel_padded, rng=key,
                            true_frames=frames))[0, :frames * 256]
  np.testing.assert_array_equal(masked, solo)


def test_bucket_padding_deviation_bound_denoised():
  """Raw bucketed synthesis is now bit-identical (true_frames masking);
  through the denoiser only the trailing STFT window can differ — the
  padded run denoises the padded waveform (whose pad region carries
  pointwise garbage the masking doesn't zero) before trimming, so frames
  overlapping the boundary and the boundary normalization envelope differ
  there by design."""
  from waveglow_tpu.inference.synthesizer import Synthesizer

  ckpt = tiny_checkpoint(seed=3, perturb_end=True)
  synth = Synthesizer(ckpt)
  frames = 20
  mel = rand_mels(1, frames, seed=6)[0]

  solo = synth.infer(mel, seed=5, denoiser_strength=0.01)
  bucketed = synth.infer(mel, seed=5, denoiser_strength=0.01,
                         bucket_frames=16)
  np.testing.assert_array_equal(bucketed.wav, solo.wav)
  stft_reach = 1024 + 256  # filter_length + hop of the denoiser STFT
  cut = frames * 256 - stft_reach
  np.testing.assert_allclose(bucketed.wav_denoised[:cut],
                             solo.wav_denoised[:cut], atol=1e-5)


def test_infer_many_padding_deviation_bound():
  """infer_many's padded bucket rows now match an exact-length call with
  the same key on EVERY sample (round 4: per-row true_frames masking; the
  unmasked deviation class is characterized in
  test_bucket_padding_deviation_bound)."""
  ckpt = tiny_checkpoint(seed=3, perturb_end=True)
  synth = BatchSynthesizer(ckpt)
  frames, bucket = 20, 16
  mel = rand_mels(1, frames, seed=6)[0]
  padded_f = -(-frames // bucket) * bucket

  bucketed = synth.infer_many([mel], seed=9, bucket_frames=bucket)[0]
  # solo reference at the TRUE length with infer_many's bucket key: the
  # position-keyed noise draw then matches on every kept frame
  key = jax.random.fold_in(jax.random.PRNGKey(9), padded_f)
  solo = np.asarray(synth._infer(synth.params, synth._put_batch(mel[None]),
                                 np.float32(1.0), key))[0]

  assert bucketed.shape == solo.shape == (frames * 256,)
  np.testing.assert_array_equal(bucketed, solo)


class TestInferServing:
  """Synthesizer.infer_serving: the fused single-fetch serving path."""

  @pytest.fixture(scope="class")
  def synth(self):
    from waveglow_tpu.inference.synthesizer import Synthesizer
    return Synthesizer(tiny_checkpoint(seed=3, perturb_end=True))

  def test_matches_infer_wav_denoised(self, synth):
    mel = rand_mels(1, 20, seed=6)[0]
    classic = synth.infer(mel, seed=5, denoiser_strength=0.0005,
                          bucket_frames=16)
    packed = synth.infer_serving(mel, seed=5, denoiser_strength=0.0005,
                                 bucket_frames=16)
    assert packed.samples.shape == classic.wav_denoised.shape
    np.testing.assert_allclose(packed.samples, classic.wav_denoised,
                               atol=1e-5)
    assert packed.was_overamplified == classic.was_overamplified
    assert packed.sampling_rate == classic.sampling_rate

  def test_pcm16_matches_host_conversion(self, synth):
    from waveglow_tpu.dsp.audio_io import convert_wav
    mel = rand_mels(1, 20, seed=7)[0]
    f32 = synth.infer_serving(mel, seed=5, bucket_frames=16)
    pcm = synth.infer_serving(mel, seed=5, bucket_frames=16, pcm16=True)
    assert pcm.samples.dtype == np.int16
    host = convert_wav(np.clip(f32.samples, -1.0, 1.0), np.int16)
    np.testing.assert_array_equal(pcm.samples, host)

  def test_zero_strength_returns_raw(self, synth):
    mel = rand_mels(1, 20, seed=8)[0]
    classic = synth.infer(mel, seed=5, denoiser_strength=0.0,
                          bucket_frames=16)
    packed = synth.infer_serving(mel, seed=5, denoiser_strength=0.0,
                                 bucket_frames=16)
    np.testing.assert_allclose(packed.samples, classic.wav, atol=1e-5)

  def test_distinct_lengths_share_program(self, synth):
    before = synth._infer_packed._cache_size()
    for frames, seed in ((9, 1), (13, 2), (16, 3)):
      synth.infer_serving(rand_mels(1, frames, seed=seed)[0], seed=seed,
                          bucket_frames=16)
    assert synth._infer_packed._cache_size() <= before + 1


class TestInferServingMany:
  """Synthesizer.infer_serving_many: the micro-batched serving path."""

  @pytest.fixture(scope="class")
  def synth(self):
    from waveglow_tpu.inference.synthesizer import Synthesizer
    return Synthesizer(tiny_checkpoint(seed=3, perturb_end=True))

  def test_rows_match_solo_serving(self, synth):
    """Each batched row draws its noise through the batch-1 derivation, so
    it matches infer_serving for the same seed up to compile rounding —
    a request's audio must not depend on what it was co-batched with."""
    mels = [rand_mels(1, f, seed=f)[0] for f in (9, 13, 12)]
    seeds = [11, 22, 33]
    batched = synth.infer_serving_many(mels, seeds=seeds, bucket_frames=16,
                                       denoiser_strength=0.0005)
    for mel, seed, res in zip(mels, seeds, batched):
      solo = synth.infer_serving(mel, seed=seed, bucket_frames=16,
                                 denoiser_strength=0.0005)
      assert res.samples.shape == solo.samples.shape
      np.testing.assert_allclose(res.samples, solo.samples, atol=1e-5)
      assert res.was_overamplified == solo.was_overamplified

  def test_distinct_seeds_distinct_audio(self, synth):
    mels = [rand_mels(1, 12, seed=1)[0]] * 2
    a, b = synth.infer_serving_many(mels, seeds=[5, 6], bucket_frames=16)
    assert np.abs(a.samples - b.samples).max() > 1e-3

  def test_batch_padding_rows_dropped(self, synth):
    """3 requests dispatch as 2+1 pow2 sub-batches (binary decomposition —
    no padded rows); outputs are per-request."""
    mels = [rand_mels(1, 12, seed=s)[0] for s in (1, 2, 3)]
    out = synth.infer_serving_many(mels, seeds=[1, 2, 3], bucket_frames=16)
    assert len(out) == 3
    for res in out:
      assert res.samples.shape == (12 * 256,)

  def test_zero_strength_raw(self, synth):
    mels = [rand_mels(1, 12, seed=4)[0]] * 2
    batched = synth.infer_serving_many(mels, seeds=[7, 8], bucket_frames=16,
                                       denoiser_strength=0.0)
    solo = synth.infer_serving(mels[0], seed=7, bucket_frames=16,
                               denoiser_strength=0.0)
    np.testing.assert_allclose(batched[0].samples, solo.samples, atol=1e-5)

  def test_pcm16(self, synth):
    from waveglow_tpu.dsp.audio_io import convert_wav
    mels = [rand_mels(1, 12, seed=5)[0]] * 2
    f = synth.infer_serving_many(mels, seeds=[1, 2], bucket_frames=16)
    p = synth.infer_serving_many(mels, seeds=[1, 2], bucket_frames=16,
                                 pcm16=True)
    for ff, pp in zip(f, p):
      assert pp.samples.dtype == np.int16
      np.testing.assert_array_equal(
          pp.samples, convert_wav(np.clip(ff.samples, -1, 1), np.int16))

  def test_mixed_lengths_grouped_by_bucket(self, synth):
    """Distinct buckets dispatch separately; results keep request order."""
    mels = [rand_mels(1, f, seed=f)[0] for f in (9, 40, 12, 35)]
    out = synth.infer_serving_many(mels, seeds=[0, 1, 2, 3],
                                   bucket_frames=16)
    for mel, res in zip(mels, out):
      assert res.samples.shape == (mel.shape[-1] * 256,)

  def test_seed_count_mismatch_rejected(self, synth):
    with pytest.raises(ValueError):
      synth.infer_serving_many([rand_mels(1, 12)[0]], seeds=[1, 2])

  def test_heterogeneous_sigma_strength_cobatch(self, synth):
    """Requests with different sigma/strength dispatch as ONE batched
    program (both are per-row inputs), each row matching its solo call."""
    mels = [rand_mels(1, 12, seed=s)[0] for s in (1, 2, 3, 4)]
    sigmas = [1.0, 0.8, 0.9, 1.0]
    strengths = [0.0005, 0.001, 0.0005, 0.002]
    seeds = [1, 2, 3, 4]
    dispatched = synth.serving_many_dispatch(
        mels, sigma=sigmas, denoiser_strength=strengths, seeds=seeds,
        bucket_frames=16)
    pending = dispatched[0]
    assert [len(c) for c, _, _ in pending] == [4]  # one batch, no split
    results = synth.serving_many_finalize(dispatched)
    for mel, sg, st, sd, res in zip(mels, sigmas, strengths, seeds, results):
      solo = synth.infer_serving(mel, sigma=sg, denoiser_strength=st,
                                 seed=sd, bucket_frames=16)
      np.testing.assert_allclose(res.samples, solo.samples, atol=1e-5)

  def test_raw_rows_split_from_denoised(self, synth):
    """strength == 0 rows keep the exact raw program (not a strength-0
    STFT roundtrip): they dispatch separately from denoised rows."""
    mels = [rand_mels(1, 12, seed=s)[0] for s in (1, 2, 3)]
    strengths = [0.0005, 0.0, 0.0005]
    dispatched = synth.serving_many_dispatch(
        mels, denoiser_strength=strengths, seeds=[1, 2, 3],
        bucket_frames=16)
    pending = dispatched[0]
    assert sorted(len(c) for c, _, _ in pending) == [1, 2]
    results = synth.serving_many_finalize(dispatched)
    raw_solo = synth.infer_serving(mels[1], denoiser_strength=0.0, seed=2,
                                   bucket_frames=16)
    np.testing.assert_array_equal(results[1].samples, raw_solo.samples)
    for i in (0, 2):
      solo = synth.infer_serving(mels[i], denoiser_strength=0.0005,
                                 seed=i + 1, bucket_frames=16)
      np.testing.assert_allclose(results[i].samples, solo.samples,
                                 atol=1e-5)

  def test_per_request_param_length_mismatch_rejected(self, synth):
    with pytest.raises(ValueError, match="sigma"):
      synth.infer_serving_many([rand_mels(1, 12)[0]], sigma=[1.0, 2.0],
                               seeds=[1])

  def test_binary_decomposition_no_padded_rows(self, synth):
    """A 5-request group dispatches as 4+1 (largest pow2 first), every
    device row a real request — never a padded batch-8 program."""
    mels = [rand_mels(1, 12, seed=s)[0] for s in range(5)]
    dispatched = synth.serving_many_dispatch(
        mels, seeds=list(range(5)), bucket_frames=16)
    pending = dispatched[0]
    sizes = [len(chunk) for chunk, _, _ in pending]
    assert sizes == [4, 1]
    for chunk, samples_dev, _ in pending:
      assert samples_dev.shape[0] == len(chunk)  # zero padded rows
    results = synth.serving_many_finalize(dispatched)
    assert len(results) == 5
    # the size-1 remainder routes through the SOLO batch-1 program (always
    # pre-compiled by solo traffic — a batch-1 _infer_packed_many would be
    # a distinct never-warmed jit), so it equals infer_serving EXACTLY
    solo = synth.infer_serving(mels[4], seed=4, bucket_frames=16)
    np.testing.assert_array_equal(results[4].samples, solo.samples)


class TestHotReload:
  """Synthesizer.update_params: zero-recompile weight hot-swap."""

  def test_swaps_weights_without_retrace(self):
    from waveglow_tpu.inference.synthesizer import Synthesizer

    synth = Synthesizer(tiny_checkpoint(seed=3, perturb_end=True))
    mel = rand_mels(1, 12, seed=0)[0]
    a = synth.infer_serving(mel, seed=5, bucket_frames=16)
    b_classic = synth.infer(mel, seed=5, bucket_frames=16)
    caches = (synth._infer_packed._cache_size(),
              synth._infer_keyed._cache_size(),
              synth._denoise_jit._cache_size())

    ck2 = tiny_checkpoint(seed=9, perturb_end=True)
    ck2.iteration = 4242  # distinct from the serving model's (100)
    assert synth.update_params(ck2) == 4242
    assert synth.iteration == 4242
    a2 = synth.infer_serving(mel, seed=5, bucket_frames=16)
    c2 = synth.infer(mel, seed=5, bucket_frames=16)
    # the swap actually changed the audio (weights AND denoiser bias)...
    assert np.abs(a.samples - a2.samples).max() > 1e-4
    assert np.abs(b_classic.wav_denoised - c2.wav_denoised).max() > 1e-4
    # ...without invalidating a single compiled program
    assert (synth._infer_packed._cache_size(),
            synth._infer_keyed._cache_size(),
            synth._denoise_jit._cache_size()) == caches
    # and matches a Synthesizer built fresh from the same checkpoint
    fresh = Synthesizer(ck2)
    f = fresh.infer_serving(mel, seed=5, bucket_frames=16)
    np.testing.assert_allclose(a2.samples, f.samples, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(synth._bias), np.asarray(fresh._bias), atol=0)

  def test_rejects_architecture_change(self):
    from dataclasses import asdict

    from waveglow_tpu.inference.synthesizer import Synthesizer
    from waveglow_tpu.models.waveglow import init_params

    synth = Synthesizer(tiny_checkpoint(seed=3))
    hp = overwrite_custom_hparams(
        HParams(), {**parse_custom_hparams(TINY), "n_flows": "3"})
    config = WaveGlowConfig.from_hparams(hp)
    other = CheckpointWaveglow(
        state_dict=init_params(config, seed=0), optimizer=None,
        learning_rate=hp.learning_rate, iteration=1, hparams=asdict(hp))
    with pytest.raises(ValueError, match="architecture"):
      synth.update_params(other)

  def test_rejects_audio_contract_change(self):
    """Same flow/channel architecture but a different sampling rate or STFT
    geometry has IDENTICAL param shapes — without an explicit check it
    would swap in silently, and the daemon would label served audio at the
    old rate and recapture the denoiser bias with the old STFT."""
    from dataclasses import asdict

    from waveglow_tpu.inference.synthesizer import Synthesizer

    synth = Synthesizer(tiny_checkpoint(seed=3))
    for field, value in (("sampling_rate", "16000"), ("hop_length", "200"),
                         ("filter_length", "2048")):
      hp = overwrite_custom_hparams(
          HParams(), {**parse_custom_hparams(TINY), field: value})
      config = WaveGlowConfig.from_hparams(hp)
      other = CheckpointWaveglow(
          state_dict=init_params(config, seed=0), optimizer=None,
          learning_rate=hp.learning_rate, iteration=1, hparams=asdict(hp))
      with pytest.raises(ValueError, match=field):
        synth.update_params(other)


class TestBucketExactness:
  """Round-4 exactness contract: bucket padding changes NOTHING about the
  kept samples — every serving path (classic, fused single-fetch, chunked
  windows) produces the identical waveform the unpadded program would."""

  @pytest.fixture(scope="class")
  def synth(self):
    from waveglow_tpu.inference.synthesizer import Synthesizer
    return Synthesizer(tiny_checkpoint(seed=3, perturb_end=True))

  def test_bucketed_equals_solo_on_all_samples(self, synth):
    for frames in (9, 13, 20):  # none a multiple of the bucket
      mel = rand_mels(1, frames, seed=frames)[0]
      solo = synth.infer(mel, seed=7, denoiser_strength=0.0)
      bucketed = synth.infer(mel, seed=7, denoiser_strength=0.0,
                             bucket_frames=16)
      assert bucketed.wav.shape == solo.wav.shape == (frames * 256,)
      np.testing.assert_array_equal(bucketed.wav, solo.wav)

  def test_fused_serving_path_exact(self, synth):
    mel = rand_mels(1, 13, seed=2)[0]
    solo = synth.infer_serving(mel, seed=3, denoiser_strength=0.0,
                               bucket_frames=None)
    bucketed = synth.infer_serving(mel, seed=3, denoiser_strength=0.0,
                                   bucket_frames=16)
    np.testing.assert_array_equal(bucketed.samples, solo.samples)

  def test_chunked_composition_exact(self, synth):
    """bucket_frames + chunk_frames: the masked window programs reproduce
    the unbucketed chunked output exactly."""
    mel = rand_mels(1, 21, seed=4)[0]
    solo = synth.infer(mel, seed=5, denoiser_strength=0.0, chunk_frames=6)
    bucketed = synth.infer(mel, seed=5, denoiser_strength=0.0,
                           chunk_frames=6, bucket_frames=16)
    assert bucketed.wav.shape == solo.wav.shape == (21 * 256,)
    np.testing.assert_allclose(bucketed.wav, solo.wav, atol=1e-6)

  def test_exact_multiple_still_shares_unmasked_program(self, synth):
    """A length already on the bucket boundary pads nothing and must give
    the plain program's output."""
    mel = rand_mels(1, 16, seed=5)[0]
    a = synth.infer(mel, seed=1, denoiser_strength=0.0)
    b = synth.infer(mel, seed=1, denoiser_strength=0.0, bucket_frames=16)
    np.testing.assert_array_equal(a.wav, b.wav)

  def test_pallas_with_true_frames_rejected(self, synth):
    from waveglow_tpu.models.waveglow import fuse_for_inference, infer
    import jax.numpy as jnp
    with pytest.raises(ValueError, match="Pallas"):
      infer(synth.params, synth.config,
            jnp.asarray(rand_mels(1, 8, seed=1)), rng=jax.random.PRNGKey(0),
            use_pallas=True, true_frames=4)


def test_infer_many_sub_groups_draw_distinct_noise():
  """Copies of ONE mel split across max_batch sub-groups must not replay
  the first sub-group's noise: sampling N stochastic variants of an
  utterance at max_batch=B previously returned only B unique waveforms
  (the bucket key ignored the sub-group offset)."""
  from tests.test_serving import tiny_checkpoint  # self-import safe

  synth = BatchSynthesizer(tiny_checkpoint(seed=1, perturb_end=True))
  mel = rand_mels(1, 8, seed=3)[0]
  outs = synth.infer_many([mel] * 4, seed=5, bucket_frames=8, max_batch=2)
  # rows 0/1 are sub-group one, rows 2/3 sub-group two: same row index
  # across sub-groups must differ (same mel, so only the noise can)
  assert np.abs(outs[0] - outs[2]).max() > 1e-6
  assert np.abs(outs[1] - outs[3]).max() > 1e-6
  # determinism across calls is unchanged
  outs2 = synth.infer_many([mel] * 4, seed=5, bucket_frames=8, max_batch=2)
  for a, b in zip(outs, outs2):
    np.testing.assert_array_equal(a, b)


def test_infer_many_rejects_bad_max_batch():
  synth = BatchSynthesizer(tiny_checkpoint(seed=1))
  mel = rand_mels(1, 8, seed=0)[0]
  for bad in (0, -1):
    with pytest.raises(ValueError, match="max_batch"):
      synth.infer_many([mel], max_batch=bad)
