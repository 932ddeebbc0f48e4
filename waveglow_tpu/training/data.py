"""Host data pipeline: dataset discovery, segment sampling, batched prefetch.

Replaces the reference's single-threaded ``MelLoader``/``DataLoader`` stack
(reference dataloader.py:16-105, parser.py:7-18) with a TPU-appropriate
design:

  * the host only decodes wavs and crops fixed-length segments — the mel
    transform runs on-device inside the jitted train step;
  * segment crops are deterministic per (seed, epoch, index), so resuming at
    iteration N reproduces the exact remaining batches of the epoch without
    the reference's replay-and-skip loop (train.py:170-187);
  * a background thread prefetches batches so the accelerator never waits on
    the host;
  * multi-host runs give each process a disjoint shard of the entry list.

Entry semantics match the reference parser: every ``*.wav`` under the folder,
recursively (reference parser.py:7-18).
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np

from waveglow_tpu.dsp import audio_io
from waveglow_tpu.hparams import HParams

logger = logging.getLogger(__name__)


@dataclass
class Entry:
  stem: str
  basename: str
  wav_absolute_path: Path


Entries = List[Entry]


def load_dataset(folder: Path) -> Entries:
  """Recursive ``*.wav`` walk -> entries (sorted for determinism)."""
  folder = Path(folder)
  result = [
      Entry(stem=p.stem, basename=p.name, wav_absolute_path=p.absolute())
      for p in sorted(folder.rglob("*.wav"))
  ]
  return result


class SegmentDataset:
  """Deterministic segment sampler over a wav dataset.

  Entries are shuffled once with the experiment seed (reference
  dataloader.py:28-30); per-(epoch, index) crop offsets come from a counter-
  based RNG so any iteration is reproducible in isolation. When the native
  C++ wavloader is available (waveglow_tpu.native), whole batches are
  decoded + cropped by a thread pool; the Python path is the fallback and
  produces bit-identical segments.
  """

  def __init__(self, entries: Entries, hparams: HParams,
               process_index: int = 0, process_count: int = 1,
               use_native: bool = True):
    order = list(entries)
    rng = np.random.RandomState(hparams.seed)
    rng.shuffle(order)
    # Per-host disjoint round-robin shard. With a per-host batch of
    # B/process_count, the union of all hosts' step-b rows is exactly the
    # single-process step-b batch order[b*B:(b+1)*B] (row-permuted), so
    # multi-process losses/gradients match single-process bit-for-bit up to
    # batch-reduction order.
    self.entries = order[process_index::process_count]
    # Crop RNG keys must be process-count-invariant: key on the entry's
    # GLOBAL position in the shuffled order, not its shard-local index, so
    # every host crops the same segment of the same file at the same epoch.
    self._global_index = list(range(process_index, len(order), process_count))
    self.segment_length = hparams.segment_length
    self.seed = hparams.seed
    self.sampling_rate = hparams.sampling_rate
    self._cache: Optional[Dict[int, np.ndarray]] = (
        {} if hparams.cache_wavs else None)
    self._lengths: Dict[int, int] = {}
    self._use_native = use_native

  def __len__(self) -> int:
    return len(self.entries)

  def _load(self, index: int) -> np.ndarray:
    if self._cache is not None and index in self._cache:
      return self._cache[index]
    wav, sr = audio_io.wav_to_float32(self.entries[index].wav_absolute_path)
    if sr != self.sampling_rate:
      raise ValueError(
          f"{self.entries[index].wav_absolute_path}: sampling rate {sr} != "
          f"{self.sampling_rate}")
    if self._cache is not None:
      self._cache[index] = wav
    self._lengths[index] = len(wav)
    return wav

  def _length(self, index: int) -> int:
    if index not in self._lengths:
      path = self.entries[index].wav_absolute_path
      frames, sr = _wav_header(path)
      # the native batch path computes crops from this header probe and
      # never re-reads the rate — validate it HERE, or a wrong-rate
      # dataset would train silently (the Python path's _load checks too)
      if sr != self.sampling_rate:
        raise ValueError(
            f"{path}: sampling rate {sr} != {self.sampling_rate}")
      self._lengths[index] = frames
    return self._lengths[index]

  def crop_offset(self, index: int, epoch: int, length: int) -> int:
    """Deterministic crop start; -1 means the file is shorter (zero-pad)."""
    if length < self.segment_length:
      return -1
    crop_rng = np.random.default_rng(
        np.random.SeedSequence(
            [self.seed, epoch, self._global_index[index]]))
    return int(crop_rng.integers(0, length - self.segment_length + 1))

  def segment(self, index: int, epoch: int) -> np.ndarray:
    wav = self._load(index)
    offset = self.crop_offset(index, epoch, len(wav))
    if offset < 0:
      return np.pad(wav, (0, self.segment_length - len(wav)))
    return wav[offset:offset + self.segment_length]

  def batch(self, indices, epoch: int) -> np.ndarray:
    """[len(indices), segment_length] float32 batch of segments."""
    if self._use_native and self._cache is None:
      from waveglow_tpu import native
      if native.native_available():
        paths = [self.entries[i].wav_absolute_path for i in indices]
        # OUTSIDE the try: _length's sampling-rate mismatch must abort
        # training with ITS message — inside, the native-fallback except
        # would mislabel a bad dataset as a native-decode failure
        offsets = [self.crop_offset(i, epoch, self._length(i))
                   for i in indices]
        try:
          return native.load_segments_batch(paths, offsets,
                                            self.segment_length)
        except ValueError as e:
          # unsupported wav variant -> python fallback, LATCHED for the
          # rest of the run: retrying natively every batch would fully
          # decode (and discard) the batch before falling back — ~2x the
          # host decode cost for the whole training run
          logger.warning(
              "native wav decode failed (%s); using the Python loader "
              "for the rest of this run", e)
          self._use_native = False
    return np.stack([self.segment(i, epoch) for i in indices]).astype(
        np.float32)


def _wav_header(path) -> "tuple[int, int]":
  """(sample_count, sample_rate) from the wav header (no data decode).

  stdlib ``wave`` cannot parse IEEE-float wavs (``wave.Error: unknown
  format: 3`` — NOT a ValueError, so it used to escape the native path's
  fallback and crash training on datasets both decoders fully support);
  the native header probe covers those, and a full scipy-based decode is
  the last resort."""
  import wave
  try:
    with wave.open(str(path), "rb") as f:
      return f.getnframes(), f.getframerate()
  except (wave.Error, EOFError):
    pass
  from waveglow_tpu import native
  if native.native_available():
    try:
      return native.wav_info(path)
    except ValueError:
      pass
  from waveglow_tpu.dsp import audio_io
  wav, sr = audio_io.wav_to_float32(path)
  return len(wav), sr


class BatchLoader:
  """Iterates [B, segment_length] float32 batches for one epoch.

  ``num_batches`` overrides the natural batch count — multi-process training
  passes a process-count-invariant value (min shard capacity across hosts) so
  every host runs the same number of collective steps per epoch even when
  entry shards differ in size by one.
  """

  def __init__(self, dataset: SegmentDataset, batch_size: int,
               drop_last: bool = True, prefetch: int = 2,
               num_batches: Optional[int] = None):
    self.dataset = dataset
    self.batch_size = batch_size
    self.drop_last = drop_last
    self.prefetch = prefetch
    self.num_batches = num_batches

  def __len__(self) -> int:
    if self.num_batches is not None:
      return self.num_batches
    n = len(self.dataset)
    if self.drop_last:
      return n // self.batch_size
    return (n + self.batch_size - 1) // self.batch_size

  def _batches(self, epoch: int, start_batch: int) -> Iterator[np.ndarray]:
    n = len(self.dataset)
    for b in range(start_batch, len(self)):
      lo = b * self.batch_size
      hi = min(lo + self.batch_size, n)
      yield self.dataset.batch(range(lo, hi), epoch)

  def epoch(self, epoch: int, start_batch: int = 0) -> Iterator[np.ndarray]:
    """Background-prefetched batch iterator for one epoch.

    A producer-side exception (e.g. a corrupt wav decoded mid-epoch) is
    re-raised in the consumer instead of silently truncating the epoch, and
    abandoning the iterator early (the train loop's ``max_iterations`` stop
    breaks out mid-epoch) unblocks and joins the producer thread instead of
    leaking it on a full queue.
    """
    q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
    sentinel = object()
    stop = threading.Event()
    error: List[BaseException] = []

    def _put(item) -> bool:
      """Bounded put that aborts when the consumer is gone."""
      while not stop.is_set():
        try:
          q.put(item, timeout=0.1)
          return True
        except queue.Full:
          continue
      return False

    def producer():
      try:
        for batch in self._batches(epoch, start_batch):
          if not _put(batch):
            return
      except BaseException as e:  # noqa: BLE001 - re-raised in the consumer
        error.append(e)
      finally:
        _put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
      while True:
        item = q.get()
        if item is sentinel:
          break
        yield item
      if error:
        raise error[0]
    finally:
      stop.set()
      thread.join()
