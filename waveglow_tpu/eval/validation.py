"""Quality validation: synthesize dataset entries and score against originals.

Behavioral contract follows reference validation.py:23-287: entry selection
(full run / named files / seeded-random single), copy-synthesis through the
Synthesizer, then MCD with and without DTW (16 MFCCs), padded cosine mel
similarity, SSIM over rendered spectrogram images, and a pandas DataFrame
report; per-entry artifacts go through a save callback.
"""

from __future__ import annotations

import datetime
import logging
import random
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional, Set

import numpy as np
from pandas import DataFrame

from waveglow_tpu.checkpointing.store import CheckpointWaveglow
from waveglow_tpu.dsp.audio_io import get_duration_s, normalize_wav, wav_to_float32
from waveglow_tpu.dsp.mel import MelSTFT
from waveglow_tpu.eval.metrics import (MCD_NO_OF_COEFFS_PER_FRAME,
                                       calculate_structural_similarity_np,
                                       cosine_dist_mels, get_metrics_mels)
from waveglow_tpu.eval.plots import (make_same_width_by_filling_white,
                                     plot_melspec_np)
from waveglow_tpu.inference.synthesizer import InferenceResult, Synthesizer
from waveglow_tpu.training.data import Entries, Entry

logger = logging.getLogger(__name__)


@dataclass
class ValidationEntry:
  entry: Entry = None
  inference_result: InferenceResult = None
  seed: int = None
  iteration: int = None
  timepoint: datetime.datetime = None
  inferred_duration_s: float = None
  diff_frames: int = None
  mfcc_no_coeffs: int = None
  mfcc_dtw_mcd: float = None
  mfcc_dtw_penalty: float = None
  mfcc_dtw_frames: int = None
  mcd: float = None
  mcd_penalty: float = None
  mcd_frames: int = None
  structural_similarity: float = None
  cosine_similarity: float = None
  denoiser_strength: float = None
  sigma: float = None


class ValidationEntries(List[ValidationEntry]):
  pass


@dataclass
class ValidationEntryOutput:
  mel_orig: np.ndarray = None
  mel_orig_img: np.ndarray = None
  orig_sr: int = None
  wav_orig: np.ndarray = None
  inferred_sr: int = None
  mel_inferred_denoised: np.ndarray = None
  mel_inferred_denoised_img: np.ndarray = None
  wav_inferred_denoised: np.ndarray = None
  mel_denoised_diff_img: np.ndarray = None
  wav_inferred: np.ndarray = None


def get_df(entries: ValidationEntries) -> DataFrame:
  if len(entries) == 0:
    return DataFrame()
  data = [
      {
          "Name": e.entry.basename,
          "Subpath": e.entry.stem,
          "Timepoint": f"{e.timepoint:%Y/%m/%d %H:%M:%S}",
          "Iteration": e.iteration,
          "Seed": e.seed,
          "Sigma": e.sigma,
          "Denoiser strength": e.denoiser_strength,
          "Inference duration (s)": e.inference_result.inference_duration_s,
          "Denoising duration (s)": e.inference_result.denoising_duration_s,
          "Overamplified?": e.inference_result.was_overamplified,
          "Inferred wav duration (s)": e.inferred_duration_s,
          "# Difference frames": e.diff_frames,
          "Sampling rate (Hz)": e.inference_result.sampling_rate,
          "# MFCC Coefficients": e.mfcc_no_coeffs,
          "MFCC DTW MCD": e.mfcc_dtw_mcd,
          "MFCC DTW PEN": e.mfcc_dtw_penalty,
          "# MFCC DTW frames": e.mfcc_dtw_frames,
          "MCD": e.mcd,
          "PEN": e.mcd_penalty,
          "# Frames": e.mcd_frames,
          "Cosine Similarity (Padded)": e.cosine_similarity,
          "Structural Similarity (Padded)": e.structural_similarity,
          "Wav path": str(e.entry.wav_absolute_path),
      }
      for e in entries
  ]
  return DataFrame(data=[x.values() for x in data], columns=data[0].keys())


def select_entries(data: Entries, entry_names: Set[str], full_run: bool,
                   seed: int) -> Entries:
  if full_run:
    return list(data)
  if len(entry_names) == 0:
    assert len(data) > 0
    rng = random.Random(seed)
    return [rng.choice(data)]
  entries = [x for x in data if x.basename in entry_names]
  # validate by NAME-set difference, not count: datasets are walked
  # recursively, so duplicate basenames across subdirs are normal — a
  # count check false-passes when a duplicate compensates for a missing
  # name (silently skipping it) and false-errors when one name matches
  # two files
  missing = entry_names - {x.basename for x in entries}
  if missing:
    raise ValueError(
        f"Not all entry names were found! Missing: {sorted(missing)}")
  names = [x.basename for x in entries]
  dupes = sorted({n for n in names if names.count(n) > 1})
  if dupes:
    # two files matching one requested name would both write into
    # out_dir/<stem>/ — the second silently clobbers the first's artifacts
    raise ValueError(
        f"Requested name(s) {dupes} match multiple files across "
        "subfolders; their outputs would collide. Validate with "
        "--full-run or point DATA-FOLDER at a tree without duplicates.")
  return entries


def validate(checkpoint: CheckpointWaveglow, data: Entries,
             custom_hparams: Optional[Dict[str, str]],
             denoiser_strength: float, sigma: float,
             entry_names: Set[str], full_run: bool,
             save_callback: Callable[[Entry, ValidationEntryOutput], None],
             seed: Optional[int]) -> ValidationEntries:
  validation_entries = ValidationEntries()

  if seed is None:
    seed = random.randint(1, 9999)
    logger.info("As no seed was given, using random seed: %d.", seed)

  entries = select_entries(data, entry_names, full_run, seed)
  if len(entries) == 0:
    logger.info("Nothing to synthesize!")
    return validation_entries

  synth = Synthesizer(checkpoint, custom_hparams=custom_hparams)
  mel_op = MelSTFT(synth.hparams)

  for entry in entries:
    # read the wav ONCE: it feeds both the conditioning mel here and the
    # ValidationEntryOutput below (a second full read+convert per entry
    # doubled disk I/O over a full validation run). get_wav_from_file
    # applies the rate + overamplification checks the reference's
    # get_mel_tensor_from_file path enforced.
    wav_orig = np.asarray(mel_op.get_wav_from_file(entry.wav_absolute_path))
    orig_sr = synth.hparams.sampling_rate
    mel = np.asarray(mel_op.get_mel(wav_orig))

    timepoint = datetime.datetime.now()
    inference_result = synth.infer(
        mel, sigma=sigma, denoiser_strength=denoiser_strength, seed=seed)

    wav_denoised_norm = normalize_wav(inference_result.wav_denoised)

    val_entry = ValidationEntry(
        entry=entry, inference_result=inference_result, seed=seed,
        iteration=checkpoint.iteration, timepoint=timepoint,
        inferred_duration_s=get_duration_s(
            inference_result.wav_denoised, inference_result.sampling_rate),
        denoiser_strength=denoiser_strength, sigma=sigma,
        mfcc_no_coeffs=MCD_NO_OF_COEFFS_PER_FRAME)

    mel_orig = mel
    mel_inferred_denoised = np.asarray(mel_op.get_mel(wav_denoised_norm))
    # wav_orig/orig_sr were read once at the top of the loop

    output = ValidationEntryOutput(
        mel_orig=mel_orig, inferred_sr=inference_result.sampling_rate,
        mel_inferred_denoised=mel_inferred_denoised,
        wav_inferred_denoised=wav_denoised_norm, wav_orig=wav_orig,
        orig_sr=orig_sr, wav_inferred=normalize_wav(inference_result.wav))

    mcd_dtw, penalty_dtw, frames_dtw = get_metrics_mels(
        mel_orig, mel_inferred_denoised,
        n_mfcc=MCD_NO_OF_COEFFS_PER_FRAME, take_log=False, use_dtw=True)
    val_entry.diff_frames = mel_inferred_denoised.shape[1] - mel_orig.shape[1]
    val_entry.mfcc_dtw_mcd = mcd_dtw
    val_entry.mfcc_dtw_penalty = penalty_dtw
    val_entry.mfcc_dtw_frames = frames_dtw

    mcd, penalty, frames = get_metrics_mels(
        mel_orig, mel_inferred_denoised,
        n_mfcc=MCD_NO_OF_COEFFS_PER_FRAME, take_log=False, use_dtw=False)
    val_entry.mcd = mcd
    val_entry.mcd_penalty = penalty
    val_entry.mcd_frames = frames

    val_entry.cosine_similarity = cosine_dist_mels(mel_orig,
                                                   mel_inferred_denoised)

    orig_img_raw, orig_img = plot_melspec_np(mel_orig)
    inf_img_raw, inf_img = plot_melspec_np(mel_inferred_denoised)
    output.mel_orig_img = orig_img
    output.mel_inferred_denoised_img = inf_img

    raw_a, raw_b = make_same_width_by_filling_white([orig_img_raw,
                                                     inf_img_raw])
    lab_a, lab_b = make_same_width_by_filling_white([orig_img, inf_img])

    ssim_raw, _ = calculate_structural_similarity_np(raw_a, raw_b)
    val_entry.structural_similarity = ssim_raw
    _, diff_img = calculate_structural_similarity_np(lab_a, lab_b)
    output.mel_denoised_diff_img = diff_img

    logger.info("Current: %s | MCD DTW: %.4f (pen %.4f, %d frames) | "
                "MCD: %.4f | SSIM: %.4f | Cosine: %.4f",
                entry.stem, val_entry.mfcc_dtw_mcd,
                val_entry.mfcc_dtw_penalty, val_entry.mfcc_dtw_frames,
                val_entry.mcd, val_entry.structural_similarity,
                val_entry.cosine_similarity)

    save_callback(entry, output)
    validation_entries.append(val_entry)

  return validation_entries
