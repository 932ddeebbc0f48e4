"""Host-side audio IO: wav read/write, dtype conversion, normalization.

Behavioral contract follows reference src/waveglow/audio_utils.py:
  * dtype conversion scales by ``-min(src)`` -> ``max(dst)`` with rounding for
    integer targets (audio_utils.py:53-64);
  * peak normalization to full scale with integer rounding and early-outs for
    already-clipped input (audio_utils.py:67-95);
  * random segment crop / trailing zero-pad to a fixed segment length
    (audio_utils.py:141-150);
  * concatenation with silence pauses (audio_utils.py:98-118).

All numpy, no device code — this is the boundary between disk and the
device-side DSP pipeline.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Tuple, Union

import numpy as np
from scipy.io import wavfile

FLOAT32_64_MIN_WAV = -1.0
FLOAT32_64_MAX_WAV = 1.0
INT16_MIN = np.iinfo(np.int16).min
INT16_MAX = np.iinfo(np.int16).max
INT32_MIN = np.iinfo(np.int32).min
INT32_MAX = np.iinfo(np.int32).max


def get_max_value(dtype):
  if dtype == np.int16:
    return INT16_MAX
  if dtype == np.int32:
    return INT32_MAX
  if dtype in (np.float32, np.float64):
    return FLOAT32_64_MAX_WAV
  raise ValueError(
      f"unsupported wav dtype {dtype} (supported: int16, int32, float32/64)")


def get_min_value(dtype):
  if dtype == np.int16:
    return INT16_MIN
  if dtype == np.int32:
    return INT32_MIN
  if dtype in (np.float32, np.float64):
    return FLOAT32_64_MIN_WAV
  raise ValueError(
      f"unsupported wav dtype {dtype} (supported: int16, int32, float32/64)")


def convert_wav(wav: np.ndarray, to_dtype) -> np.ndarray:
  """Rescale between int16/int32/float sample conventions."""
  if wav.dtype != to_dtype:
    wav = wav / (-1 * get_min_value(wav.dtype)) * get_max_value(to_dtype)
    if to_dtype in (np.int16, np.int32):
      wav = np.round(wav, 0)
    wav = wav.astype(to_dtype)
  return wav


def is_overamp(wav: np.ndarray) -> bool:
  return bool(np.min(wav) < get_min_value(wav.dtype) or
              np.max(wav) > get_max_value(wav.dtype))


def normalize_wav(wav: np.ndarray) -> np.ndarray:
  """Peak-normalize to full scale (mono or stereo)."""
  if wav.dtype == np.int16 and np.min(wav) == INT16_MIN:
    return wav
  if wav.dtype == np.int32 and np.min(wav) == INT32_MIN:
    return wav

  max_val = np.max(np.abs(wav))
  max_possible = get_max_value(wav.dtype)
  if max_val != 0 and max_val != max_possible:
    orig_dtype = wav.dtype
    wav_float = wav.astype(np.float32) * max_possible / max_val
    if orig_dtype in (np.int16, np.int32):
      wav_float = np.round(wav_float, 0)
    wav = wav_float.astype(orig_dtype)

  assert np.max(np.abs(wav)) in (max_possible, 0)
  assert not is_overamp(wav)
  return wav


def wav_to_float32(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
  sampling_rate, wav = wavfile.read(str(path))
  try:
    return convert_wav(wav, np.float32), sampling_rate
  except ValueError as e:
    # name the offending FILE: in a folder run an unsupported sample
    # format (e.g. 8-bit PCM -> uint8) is otherwise hard to attribute
    raise ValueError(f"{path}: {e}") from e


def float_to_wav(wav: np.ndarray, path: Union[str, Path], dtype=np.int16,
                 sample_rate: int = 22050) -> None:
  wav = convert_wav(np.asarray(wav), dtype)
  wavfile.write(str(path), sample_rate, wav)


def get_duration_s(wav: np.ndarray, sampling_rate: int) -> float:
  return len(wav) / sampling_rate


def get_duration_s_file(path: Union[str, Path]) -> float:
  sampling_rate, wav = wavfile.read(str(path))
  return get_duration_s(wav, sampling_rate)


def get_sample_count(sampling_rate: int, duration_s: float) -> int:
  return int(round(sampling_rate * duration_s, 0))


def get_wav_segment(wav: np.ndarray, segment_length: int,
                    rng: np.random.Generator) -> np.ndarray:
  """Random fixed-length crop, or trailing zero-pad when too short."""
  if len(wav) >= segment_length:
    start = int(rng.integers(0, len(wav) - segment_length + 1))
    return wav[start:start + segment_length]
  return np.pad(wav, (0, segment_length - len(wav)))


def concatenate_audios(audios: Sequence[np.ndarray], pause_s: float,
                       sampling_rate: int) -> np.ndarray:
  pause_samples = get_sample_count(sampling_rate, pause_s)
  if len(audios) == 1:
    return np.array(audios[0])
  pause_shape = list(audios[0].shape)
  pause_shape[-1] = pause_samples
  # the pause must carry the INPUT dtype: a default (float64) zeros array
  # makes np.concatenate promote int16 samples to float64, and a later
  # convert_wav then applies the float convention (x * 32767) to
  # int16-range values — wrapped, full-scale garbage in the written wav
  pause = np.zeros(tuple(pause_shape), dtype=np.result_type(*audios))
  parts: List[np.ndarray] = []
  for audio in audios[:-1]:
    parts.append(audio)
    parts.append(pause)
  parts.append(audios[-1])
  return np.concatenate(parts, axis=-1)
