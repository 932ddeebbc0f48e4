"""Unit tests for the DSP layer: STFT, mel filterbank, mel pipeline, audio IO.

The STFT is validated against an independent numpy rfft formulation (the
conv-basis construction is mathematically identical to windowed rfft frames)
and against round-trip reconstruction; the mel filterbank against analytic
properties of the slaney construction.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from waveglow_tpu.dsp.audio_io import (convert_wav, float_to_wav,
                                       get_wav_segment, normalize_wav,
                                       wav_to_float32)
from waveglow_tpu.dsp.mel import MelSTFT
from waveglow_tpu.dsp.mel_filters import (hz_to_mel, mel_filterbank,
                                          mel_to_hz)
from waveglow_tpu.dsp.stft import STFT, frame_signal, overlap_add


def _rand_audio(n, seed=0):
  rng = np.random.default_rng(seed)
  return (rng.uniform(-0.5, 0.5, n)).astype(np.float32)


class TestFraming:

  def test_frame_signal_matches_strided_view(self):
    x = _rand_audio(5000)[None, :]
    frames = np.asarray(frame_signal(jnp.asarray(x), 1024, 256))
    n_frames = (5000 - 1024) // 256 + 1
    assert frames.shape == (1, n_frames, 1024)
    for i in range(n_frames):
      np.testing.assert_array_equal(frames[0, i], x[0, i * 256:i * 256 + 1024])

  def test_overlap_add_inverts_framing_sum(self):
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((2, 7, 1024)).astype(np.float32)
    out = np.asarray(overlap_add(jnp.asarray(frames), 256))
    expected = np.zeros((2, 6 * 256 + 1024), dtype=np.float32)
    for i in range(7):
      expected[:, i * 256:i * 256 + 1024] += frames[:, i]
    np.testing.assert_allclose(out, expected, atol=1e-5)


class TestSTFT:

  def test_transform_matches_windowed_rfft(self):
    """The conv-basis transform equals rfft of hann-windowed reflect-padded frames."""
    stft = STFT()
    x = _rand_audio(8000)
    mag, phase = stft.transform(jnp.asarray(x[None, :]))
    mag, phase = np.asarray(mag), np.asarray(phase)

    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(1024) / 1024)
    padded = np.pad(x, 512, mode="reflect")
    n_frames = (len(padded) - 1024) // 256 + 1
    assert mag.shape == (1, 513, n_frames)
    for i in range(0, n_frames, 5):
      frame = padded[i * 256:i * 256 + 1024] * window
      spec = np.fft.rfft(frame)
      np.testing.assert_allclose(mag[0, :, i], np.abs(spec),
                                 atol=2e-3, rtol=1e-4)

  def test_roundtrip_reconstruction(self):
    stft = STFT()
    x = _rand_audio(22050)
    mag, phase = stft.transform(jnp.asarray(x[None, :]))
    recon = np.asarray(stft.inverse(mag, phase))[0]
    # reference trims filter_length/2 from both sides of the OLA signal;
    # output aligns with the input start.
    n = min(len(recon), len(x))
    np.testing.assert_allclose(recon[256:n - 256], x[256:n - 256], atol=1e-3)

  def test_sine_wave_peak_bin(self):
    sr, f = 22050, 861.328125  # exactly bin 40 at n_fft=1024
    t = np.arange(22050) / sr
    x = (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    stft = STFT()
    mag, _ = stft.transform(jnp.asarray(x[None, :]))
    mid = np.asarray(mag)[0, :, 40]
    assert np.argmax(mid) == 40


class TestMelFilterbank:

  def test_mel_scale_roundtrip(self):
    freqs = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(freqs)), freqs, rtol=1e-10)

  def test_slaney_linear_below_1k(self):
    np.testing.assert_allclose(hz_to_mel(600.0), 600.0 / (200.0 / 3.0))

  def test_filterbank_shape_and_support(self):
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # filters must be zero above fmax's bin (plus one triangle edge)
    fmax_bin = int(np.ceil(8000.0 / (22050 / 2) * 512))
    assert np.all(fb[:, fmax_bin + 2:] == 0)
    # every filter has nonzero support
    assert np.all(fb.sum(axis=1) > 0)

  def test_slaney_normalization_area(self):
    """Slaney norm: each triangle integrates to ~1 over Hz."""
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    df = 22050 / 2 / 512  # Hz per fft bin
    areas = fb.sum(axis=1) * df
    # middle filters (away from the fmin/fmax edge rasterization) ≈ 1
    np.testing.assert_allclose(areas[10:70], 1.0, atol=0.08)

  def test_triangle_peaks_at_centers(self):
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    from waveglow_tpu.dsp.mel_filters import mel_frequencies
    centers = mel_frequencies(82, 0.0, 8000.0)[1:-1]
    df = 22050 / 2 / 512
    for i in range(20, 60, 10):
      peak_bin = np.argmax(fb[i])
      assert abs(peak_bin * df - centers[i]) < 2 * df


class TestMelPipeline:

  def test_mel_shape_and_range(self):
    mel_op = MelSTFT()
    x = _rand_audio(16000)
    mel = np.asarray(mel_op.get_mel(x))
    assert mel.shape[0] == 80
    assert mel.shape[1] == 16000 // 256 + 1
    # log-compressed with clip at 1e-5
    assert mel.min() >= np.log(1e-5) - 1e-5
    assert np.isfinite(mel).all()

  def test_silence_hits_clip_floor(self):
    mel_op = MelSTFT()
    mel = np.asarray(mel_op.get_mel(np.zeros(8192, dtype=np.float32)))
    np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-6)

  def test_batched_matches_single(self):
    mel_op = MelSTFT()
    x = np.stack([_rand_audio(8192, seed=i) for i in range(3)])
    batched = np.asarray(mel_op.mel_spectrogram(jnp.asarray(x)))
    for i in range(3):
      single = np.asarray(mel_op.get_mel(x[i]))
      np.testing.assert_allclose(batched[i], single, atol=1e-5)


class TestAudioIO:

  def test_convert_int16_float_roundtrip(self):
    rng = np.random.default_rng(2)
    wav = (rng.integers(-32768, 32767, 1000)).astype(np.int16)
    f = convert_wav(wav, np.float32)
    assert f.dtype == np.float32
    assert np.abs(f).max() <= 1.0
    back = convert_wav(f, np.int16)
    # scaling is -min -> +max asymmetric (reference convention), so allow 1 LSB
    np.testing.assert_allclose(back, wav, atol=2)

  def test_normalize_peaks_full_scale(self):
    wav = (np.array([100, -3000, 50], dtype=np.int16))
    out = normalize_wav(wav)
    assert np.abs(out).max() == 32767

  def test_wav_file_roundtrip(self, tmp_path):
    x = _rand_audio(4000)
    path = tmp_path / "t.wav"
    float_to_wav(x, path, sample_rate=22050)
    back, sr = wav_to_float32(path)
    assert sr == 22050
    np.testing.assert_allclose(back, x, atol=1e-3)

  def test_segment_crop_and_pad(self):
    rng = np.random.default_rng(3)
    long = _rand_audio(20000)
    seg = get_wav_segment(long, 16000, rng)
    assert len(seg) == 16000
    short = _rand_audio(1000)
    seg2 = get_wav_segment(short, 16000, rng)
    assert len(seg2) == 16000
    np.testing.assert_array_equal(seg2[:1000], short)
    assert np.all(seg2[1000:] == 0)
