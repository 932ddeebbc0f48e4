"""``synthesize`` / ``synthesize-wav`` subcommands.

Reference behavior (cli/inference_v2.py, cli/inference_wav.py): walk FOLDER
for ``.npy`` mels (or ``.wav`` files converted to mel first), synthesize each
with a shared random-or-custom seed, normalize and write ``<stem>.wav``
mirroring the subfolder tree; ``--include-stats`` adds MCD/cosine/SSIM
metrics, a comparison PNG stack and a CSV.
"""

from __future__ import annotations

import logging
import random
from argparse import ArgumentParser, Namespace
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional

import numpy as np

from waveglow_tpu.cli.argparse_helpers import (add_compute_arguments,
                                               add_denoiser_and_sigma_arguments,
                                               add_hparams_argument,
                                               get_optional,
                                               parse_existing_directory,
                                               parse_existing_file,
                                               parse_non_negative_integer,
                                               parse_path,
                                               parse_positive_integer)
from waveglow_tpu.hparams import parse_custom_hparams

logger = logging.getLogger(__name__)


@dataclass
class InferenceEntry:
  mel_path: Path = None
  seed: int = None
  iteration: int = None
  inferred_duration_s: float = None
  inference_duration_s: float = None
  denoising_duration_s: float = None
  was_overamplified: bool = None
  mel_original_frames: int = None
  mel_inferred_frames: int = None
  mcd_dtw: float = None
  mcd_dtw_penalty: float = None
  mcd_dtw_frames: int = None
  mcd: float = None
  mcd_penalty: float = None
  mcd_frames: int = None
  structural_similarity: float = None
  cosine_similarity: float = None
  denoiser_strength: float = None
  sigma: float = None


def _add_common(parser: ArgumentParser) -> None:
  add_denoiser_and_sigma_arguments(parser)
  add_hparams_argument(parser)
  add_compute_arguments(parser)
  parser.add_argument("--custom-seed",
                      type=get_optional(parse_non_negative_integer),
                      default=None, help="custom seed used for synthesis; "
                      "random if unset")
  parser.add_argument("--include-stats", action="store_true",
                      help="compute quality statistics (slower)")
  parser.add_argument("--chunk-frames",
                      type=get_optional(parse_positive_integer),
                      default=None,
                      help="synthesize in fixed mel windows of this many "
                           "frames (constant activation memory; exact vs "
                           "one-call synthesis) — for very long inputs")
  parser.add_argument("--bucket-frames", type=parse_non_negative_integer,
                      default=64,
                      help="pad each mel's frame count up to a multiple of "
                           "this before synthesis (trimmed afterwards), so a "
                           "folder of distinct-length files reuses a handful "
                           "of compiled XLA programs instead of paying one "
                           "multi-minute compile per length; 0 disables "
                           "(exact per-length synthesis)")
  parser.add_argument("--batch", type=parse_positive_integer, default=1,
                      help="synthesize up to this many same-bucket files "
                           "per fused device dispatch (full MXU batch "
                           "parallelism — the single-chip batch-8 rate is "
                           "~1.35x the serialized one on a v5e: 212.7 vs "
                           "158 audio-sec/s). 1 (default) keeps the "
                           "reference's one-file-at-a-time path; batched "
                           "outputs match it up to float rounding (every "
                           "file still draws the identical seed-derived "
                           "noise), and per-file durations in logs/stats "
                           "are the batch wall time amortized per file. "
                           "Ignored with --chunk-frames")
  parser.add_argument("-out", "--output-directory", type=parse_path,
                      default=None,
                      help="custom output directory if FOLDER should not "
                           "be used")
  parser.add_argument("-o", "--overwrite", action="store_true",
                      help="overwrite already synthesized files")


def init_synthesis_parser(parser: ArgumentParser):
  parser.description = "Synthesize mel-spectrograms (.npy) to .wav files."
  parser.add_argument("checkpoint", metavar="CHECKPOINT",
                      type=parse_existing_file,
                      help="checkpoint to synthesize with (.npz or .pt)")
  parser.add_argument("folder", metavar="FOLDER",
                      type=parse_existing_directory,
                      help="folder containing mel-spectrogram .npy files")
  _add_common(parser)
  return lambda ns: _run(ns, source="npy")


def init_synthesis_wav_parser(parser: ArgumentParser):
  parser.description = ("Synthesize .wav files (via copy-synthesis through "
                        "the mel spectrogram).")
  parser.add_argument("checkpoint", metavar="CHECKPOINT",
                      type=parse_existing_file)
  parser.add_argument("folder", metavar="FOLDER",
                      type=parse_existing_directory,
                      help="folder containing .wav files")
  _add_common(parser)
  return lambda ns: _run(ns, source="wav")


def _run(ns: Namespace, source: str) -> bool:
  from waveglow_tpu.checkpointing import load_checkpoint_any
  from waveglow_tpu.dsp.audio_io import float_to_wav, normalize_wav
  from waveglow_tpu.dsp.mel import MelSTFT
  from waveglow_tpu.inference.synthesizer import Synthesizer

  output_directory = ns.output_directory or ns.folder
  if output_directory.is_file():
    logger.error("Output directory is a file!")
    return False

  seed = ns.custom_seed if ns.custom_seed is not None \
      else random.randint(1, 9999)
  if ns.custom_seed is None:
    logger.info("Using random seed: %d.", seed)

  try:
    checkpoint = load_checkpoint_any(ns.checkpoint)
  except Exception:  # noqa: BLE001
    logger.exception("Checkpoint couldn't be loaded!")
    return False

  custom_hparams = parse_custom_hparams(ns.custom_hparams) or None
  synth = Synthesizer(checkpoint, custom_hparams=custom_hparams,
                      compute_dtype=ns.compute_dtype)
  mel_op = MelSTFT(synth.hparams)

  suffix = ".npy" if source == "npy" else ".wav"
  files = sorted(
      p for p in ns.folder.rglob(f"*{suffix}")
      if p.is_file()
      # copy-synthesis outputs land next to their inputs as
      # <stem>.synthesized.wav — a rerun must not re-ingest them (it would
      # snowball <stem>.synthesized.synthesized.wav files every pass)
      and not (source == "wav" and p.name.endswith(".synthesized.wav")))
  logger.info("Found %d %s file(s).", len(files), suffix)

  # per-file queue loggers: batch-job messages land GROUPED per input file
  # in the --log file instead of interleaved (reference
  # logging_configuration.py:90-130)
  from waveglow_tpu.cli.logging_config import (flush_file_stem_loggers,
                                               get_file_stem_logger,
                                               init_file_stem_loggers)
  stem_keys = [str(p.relative_to(ns.folder)) for p in files]
  stem_queues = init_file_stem_loggers(stem_keys)

  # collect work first (skip existing outputs) WITHOUT loading audio —
  # mels load lazily (one at a time solo, one bounded slice batched), so
  # folder size never drives host memory
  work = []  # (path, stem_key, out_stem, wav_out)
  for path, stem_key in zip(files, stem_keys):
    stem_logger = get_file_stem_logger(stem_key)
    out_stem = path.stem
    wav_out = (output_directory / path.relative_to(ns.folder).parent
               / f"{out_stem}.wav")
    if source == "wav" and ns.output_directory is None:
      wav_out = wav_out.with_name(f"{out_stem}.synthesized.wav")
    if wav_out.exists() and not ns.overwrite:
      logger.info("Skipping %s (exists).", wav_out)
      stem_logger.info("Skipped (output exists): %s", wav_out)
      continue
    work.append((path, stem_key, out_stem, wav_out))

  def load_mel(path):
    if source == "npy":
      return np.load(path)
    return np.asarray(mel_op.get_mel_from_file(path))

  entries: List[InferenceEntry] = []

  def handle_output(item, mel, wav_denoised, infer_s, denoise_s, overamp,
                    batch_note=""):
    path, stem_key, out_stem, wav_out = item
    stem_logger = get_file_stem_logger(stem_key)
    wav_norm = normalize_wav(wav_denoised)
    wav_out.parent.mkdir(parents=True, exist_ok=True)
    float_to_wav(wav_norm, wav_out, sample_rate=synth.hparams.sampling_rate)
    logger.info("%s -> %s (%.2fs audio in %.2fs%s)", path.name, wav_out,
                len(wav_norm) / synth.hparams.sampling_rate, infer_s,
                batch_note)
    stem_logger.info(
        "Synthesized %s -> %s: %.2fs audio, infer %.3fs%s, denoise %.3fs, "
        "overamplified=%s", path.name, wav_out,
        len(wav_norm) / synth.hparams.sampling_rate, infer_s, batch_note,
        denoise_s, overamp)
    if ns.include_stats:
      from types import SimpleNamespace
      timing = SimpleNamespace(
          sampling_rate=synth.hparams.sampling_rate,
          inference_duration_s=infer_s,
          denoising_duration_s=denoise_s,
          was_overamplified=overamp)
      entry = _compute_stats(ns, path, mel, wav_norm, timing, seed,
                             checkpoint.iteration, mel_op, wav_out.parent,
                             out_stem)
      entries.append(entry)
      stem_logger.info("Stats: MCD-DTW %.4f, cosine %.4f, SSIM %.4f",
                       entry.mcd_dtw, entry.cosine_similarity,
                       entry.structural_similarity)

  if ns.batch > 1 and not ns.chunk_frames:
    # fused micro-batched dispatches (Synthesizer.infer_serving_many):
    # same-bucket files synthesize together at MXU batch parallelism; each
    # row draws the identical seed-derived noise a solo call would, so
    # outputs match --batch 1 up to compilation-dependent float rounding.
    # Only one slice of mels is resident at a time.
    import time as _time
    slice_size = 8 * ns.batch
    for s in range(0, len(work), slice_size):
      chunk = work[s:s + slice_size]
      mels = [load_mel(item[0]) for item in chunk]
      t0 = _time.perf_counter()
      results = synth.infer_serving_many(
          mels, sigma=ns.sigma,
          denoiser_strength=ns.denoiser_strength,
          seeds=[seed] * len(chunk),
          bucket_frames=ns.bucket_frames or None, max_batch=ns.batch)
      # per-file time is the slice wall AMORTIZED over its files (the
      # fused program has no separate denoise phase, so denoise_s=0);
      # logged/CSV durations are explicitly marked as amortized
      per_file_s = (_time.perf_counter() - t0) / len(chunk)
      note = f" amortized over {len(chunk)}-file batch"
      for item, mel, r in zip(chunk, mels, results):
        handle_output(item, mel, r.samples, per_file_s, 0.0,
                      r.was_overamplified, batch_note=note)
  else:
    for item in work:
      mel = load_mel(item[0])
      result = synth.infer(mel, sigma=ns.sigma,
                           denoiser_strength=ns.denoiser_strength, seed=seed,
                           chunk_frames=ns.chunk_frames,
                           bucket_frames=ns.bucket_frames or None)
      handle_output(item, mel, result.wav_denoised,
                    result.inference_duration_s,
                    result.denoising_duration_s, result.was_overamplified)

  flush_file_stem_loggers(stem_queues)
  if ns.include_stats and entries:
    _write_stats_csv(entries, output_directory)
  return True


def _compute_stats(ns, mel_path, mel_orig, wav_norm, result, seed, iteration,
                   mel_op, dest_dir, out_stem) -> InferenceEntry:
  from waveglow_tpu.eval.metrics import (MCD_NO_OF_COEFFS_PER_FRAME,
                                         calculate_structural_similarity_np,
                                         cosine_dist_mels, get_metrics_mels)
  from waveglow_tpu.eval.plots import (make_same_width_by_filling_white,
                                       plot_melspec_np, save_image,
                                       stack_images_vertically)

  mel_inferred = np.asarray(mel_op.get_mel(wav_norm))

  mcd_dtw, pen_dtw, frames_dtw = get_metrics_mels(
      mel_orig, mel_inferred, n_mfcc=MCD_NO_OF_COEFFS_PER_FRAME,
      take_log=False, use_dtw=True)
  mcd, pen, frames = get_metrics_mels(
      mel_orig, mel_inferred, n_mfcc=MCD_NO_OF_COEFFS_PER_FRAME,
      take_log=False, use_dtw=False)
  cosine = cosine_dist_mels(mel_orig, mel_inferred)

  orig_raw, orig_img = plot_melspec_np(mel_orig)
  inf_raw, inf_img = plot_melspec_np(mel_inferred)
  raw_a, raw_b = make_same_width_by_filling_white([orig_raw, inf_raw])
  ssim, diff_img = calculate_structural_similarity_np(raw_a, raw_b)

  save_image(dest_dir / f"{out_stem}.orig.png", orig_img)
  save_image(dest_dir / f"{out_stem}.inferred.png", inf_img)
  comparison = stack_images_vertically([orig_img, inf_img, diff_img])
  save_image(dest_dir / f"{out_stem}.comparison.png", comparison)

  logger.info("MCD DTW: %.4f | MCD: %.4f | SSIM: %.4f | Cosine: %.4f",
              mcd_dtw, mcd, ssim, cosine)

  return InferenceEntry(
      mel_path=mel_path, seed=seed, iteration=iteration,
      inferred_duration_s=len(wav_norm) / result.sampling_rate,
      inference_duration_s=result.inference_duration_s,
      denoising_duration_s=result.denoising_duration_s,
      was_overamplified=result.was_overamplified,
      mel_original_frames=mel_orig.shape[1],
      mel_inferred_frames=mel_inferred.shape[1],
      mcd_dtw=mcd_dtw, mcd_dtw_penalty=pen_dtw, mcd_dtw_frames=frames_dtw,
      mcd=mcd, mcd_penalty=pen, mcd_frames=frames,
      structural_similarity=ssim, cosine_similarity=cosine,
      denoiser_strength=ns.denoiser_strength, sigma=ns.sigma)


def _write_stats_csv(entries: List[InferenceEntry], output_dir: Path) -> None:
  from dataclasses import asdict

  from pandas import DataFrame

  df = DataFrame([asdict(e) for e in entries])
  csv_path = output_dir / "stats.csv"
  df.to_csv(csv_path, sep="\t", index=False)
  logger.info("Wrote statistics to %s", csv_path)
