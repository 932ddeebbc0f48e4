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


def tiny_checkpoint(seed=0):
  from dataclasses import asdict
  hp = overwrite_custom_hparams(HParams(), parse_custom_hparams(TINY))
  config = WaveGlowConfig.from_hparams(hp)
  params = init_params(config, seed=seed)
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
    wav_plain = plain.infer_long(mel, seed=7)

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
