"""Native C++ wavloader tests: decode parity with scipy, batch crops,
fallback behavior, integration with SegmentDataset."""

import numpy as np
import pytest

from waveglow_tpu import native
from waveglow_tpu.dsp.audio_io import float_to_wav, wav_to_float32

from tests.test_training import write_noise_dataset

needs_native = pytest.mark.skipif(not native.native_available(),
                                  reason="native wavloader not built")


@needs_native
class TestDecode:

  def test_decode_matches_scipy(self, tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, 5000).astype(np.float32)
    path = tmp_path / "a.wav"
    float_to_wav(x, path, sample_rate=22050)

    expected, sr_e = wav_to_float32(path)
    got, sr = native.decode_wav(path)
    assert sr == sr_e == 22050
    np.testing.assert_array_equal(got, expected)

  def test_decode_float32_wav(self, tmp_path):
    from scipy.io import wavfile
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.9, 0.9, 3000).astype(np.float32)
    path = tmp_path / "f.wav"
    wavfile.write(str(path), 22050, x)
    got, sr = native.decode_wav(path)
    np.testing.assert_array_equal(got, x)

  def test_decode_int32_wav(self, tmp_path):
    from scipy.io import wavfile
    rng = np.random.default_rng(2)
    x = (rng.uniform(-0.9, 0.9, 3000) * 2147483647).astype(np.int32)
    path = tmp_path / "i32.wav"
    wavfile.write(str(path), 22050, x)
    got, _ = native.decode_wav(path)
    expected, _ = wav_to_float32(path)
    np.testing.assert_allclose(got, expected, atol=1e-9)

  def test_missing_file_raises(self, tmp_path):
    with pytest.raises(ValueError):
      native.decode_wav(tmp_path / "nope.wav")


@needs_native
class TestBatch:

  def test_batch_crops_and_pads(self, tmp_path):
    rng = np.random.default_rng(3)
    long_wav = rng.uniform(-0.5, 0.5, 8000).astype(np.float32)
    short_wav = rng.uniform(-0.5, 0.5, 1000).astype(np.float32)
    p1, p2 = tmp_path / "long.wav", tmp_path / "short.wav"
    float_to_wav(long_wav, p1)
    float_to_wav(short_wav, p2)

    seg = 4096
    batch = native.load_segments_batch([p1, p2], [1234, -1], seg)
    assert batch.shape == (2, seg)
    ref_long, _ = wav_to_float32(p1)
    ref_short, _ = wav_to_float32(p2)
    np.testing.assert_array_equal(batch[0], ref_long[1234:1234 + seg])
    np.testing.assert_array_equal(batch[1][:1000], ref_short)
    assert np.all(batch[1][1000:] == 0)


class TestDatasetIntegration:

  def test_native_and_python_paths_identical(self, tmp_path):
    from waveglow_tpu.hparams import HParams, overwrite_custom_hparams
    from waveglow_tpu.training.data import SegmentDataset, load_dataset

    write_noise_dataset(tmp_path, n=4, seconds=0.5)
    hp = overwrite_custom_hparams(HParams(), {"segment_length": "4096"})
    entries = load_dataset(tmp_path)

    ds_native = SegmentDataset(entries, hp, use_native=True)
    ds_python = SegmentDataset(entries, hp, use_native=False)

    for epoch in (0, 1):
      b1 = ds_native.batch(range(4), epoch)
      b2 = ds_python.batch(range(4), epoch)
      np.testing.assert_array_equal(b1, b2)
