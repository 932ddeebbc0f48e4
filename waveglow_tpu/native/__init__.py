"""Native host-runtime components (C++ via ctypes, compiled on demand).

The shared library is built with g++ the first time it is needed and cached
next to the source; every entry point has a pure-Python fallback so the
framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "wavloader.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _lib_path() -> Path:
  digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
  # default cache is PER-USER and 0700: a world-predictable shared /tmp
  # path would let any local user pre-plant a .so (the digest is
  # computable from the public source) that we then CDLL into this
  # process. WAVEGLOW_TPU_CACHE overrides for trusted locations, but the
  # ownership check below still applies.
  default = Path(tempfile.gettempdir()) / f"waveglow_tpu_native_{os.getuid()}"
  cache_dir = Path(os.environ.get("WAVEGLOW_TPU_CACHE", default))
  cache_dir.mkdir(parents=True, exist_ok=True)
  try:
    os.chmod(cache_dir, 0o700)
  except OSError:
    pass  # not ours to chmod — the uid check decides
  if cache_dir.stat().st_uid != os.getuid():
    raise RuntimeError(
        f"native cache dir {cache_dir} is owned by uid "
        f"{cache_dir.stat().st_uid}, not this process's user; refusing to "
        "load libraries from it (set WAVEGLOW_TPU_CACHE to a private dir)")
  return cache_dir / f"wavloader_{digest}.so"


def _build(lib_path: Path) -> None:
  # compile to a unique temp name, then atomically rename: concurrent
  # first-use processes (multi-process training on one host) would
  # otherwise race g++ writing the SAME output file while a third
  # process dlopens the partially written library
  tmp = lib_path.with_name(f"{lib_path.stem}.{os.getpid()}.tmp.so")
  cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
         str(_SRC), "-o", str(tmp)]
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    os.replace(tmp, lib_path)
  finally:
    if tmp.exists():
      tmp.unlink()


def get_lib() -> Optional[ctypes.CDLL]:
  """The compiled wavloader library, or None if unavailable."""
  global _LIB, _LIB_FAILED
  if _LIB is not None or _LIB_FAILED:
    return _LIB
  with _LOCK:
    if _LIB is not None or _LIB_FAILED:
      return _LIB
    try:
      lib_path = _lib_path()
      if not lib_path.exists():
        _build(lib_path)
      lib = ctypes.CDLL(str(lib_path))
      lib.wav_read_f32.restype = ctypes.c_long
      lib.wav_read_f32.argtypes = [
          ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
          ctypes.POINTER(ctypes.c_int)]
      lib.wav_info.restype = ctypes.c_long
      lib.wav_info.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int)]
      lib.batch_segments.restype = ctypes.c_int
      lib.batch_segments.argtypes = [
          ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
          ctypes.c_int, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
          ctypes.c_int]
      _LIB = lib
    except Exception as exc:  # noqa: BLE001 - any failure -> fallback
      logger.warning("native wavloader unavailable (%s); "
                     "using Python fallback", exc)
      _LIB_FAILED = True
  return _LIB


def native_available() -> bool:
  return get_lib() is not None


def wav_info(path) -> Tuple[int, int]:
  """(sample_count, sample_rate) from the wav HEADER — no data decode.
  Raises ValueError for unreadable/unsupported files."""
  lib = get_lib()
  if lib is None:
    raise RuntimeError("native wavloader unavailable")
  sr = ctypes.c_int(0)
  n = lib.wav_info(str(path).encode(), ctypes.byref(sr))
  if n < 0:
    raise ValueError(f"native header probe failed for {path}")
  return int(n), sr.value


def decode_wav(path) -> Tuple[np.ndarray, int]:
  """Decode a mono wav to float32 [-1, 1]; raises on failure (no fallback
  here — callers choose their own fallback)."""
  lib = get_lib()
  if lib is None:
    raise RuntimeError("native wavloader unavailable")
  sr = ctypes.c_int(0)
  path_b = str(path).encode()
  # size the buffer from the header probe — a wav_read_f32(out=None)
  # probe would run a FULL decode just to count, doubling decode cost
  n = lib.wav_info(path_b, ctypes.byref(sr))
  if n < 0:
    # the probe scans only the first 64 KiB: a wav whose data chunk sits
    # past heavy leading metadata needs the full-decode probe the fast
    # path replaced — fall back rather than regress on decodable files
    n = lib.wav_read_f32(path_b, None, 0, ctypes.byref(sr))
  if n < 0:
    raise ValueError(f"native decode failed for {path}")
  out = np.empty(n, dtype=np.float32)
  got = lib.wav_read_f32(
      path_b, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
      ctypes.byref(sr))
  if got != n:
    raise ValueError(f"{path} changed during read ({got} != {n} samples)")
  return out, sr.value


def load_segments_batch(paths: Sequence, offsets: Sequence[int],
                        segment_length: int,
                        n_threads: int = 0) -> np.ndarray:
  """Decode + crop a batch in parallel: -> [len(paths), segment_length] f32.

  ``offsets[i]`` is the crop start sample (from the Python-side
  deterministic RNG); short files are zero-padded at the tail.
  """
  lib = get_lib()
  if lib is None:
    raise RuntimeError("native wavloader unavailable")
  n = len(paths)
  if n_threads <= 0:
    n_threads = min(n, os.cpu_count() or 1)
  out = np.empty((n, segment_length), dtype=np.float32)
  c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
  c_offsets = (ctypes.c_long * n)(*[int(o) for o in offsets])
  rc = lib.batch_segments(
      c_paths, c_offsets, n, segment_length,
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
  if rc != 0:
    raise ValueError(f"native decode failed for {paths[rc - 1]}")
  return out
