"""Run-directory layout + per-stem artifact savers (reference io.py).

Named counterpart of the reference's ``waveglow_cli/io.py`` (the live subset
— roughly half that file is commented out upstream). It owns two things:

  * the on-disk layout of a training run — ``<train_dir>/{logs, checkpoints,
    inference, validation}`` with per-stem subdirectories and the
    ``<stem>.wav`` / ``<stem>.png`` / ``<stem>_orig.png`` / ``<stem>_diff.png``
    / ``<stem>_comp.png`` / ``<stem>_v.png`` naming
    (reference io.py:15-61, 142-205);
  * the save helpers that write those artifacts from waveforms and mels,
    built on the native plotting/metrics stack (eval/plots, eval/metrics,
    dsp/audio_io) instead of imageio/matplotlib-pylab/skimage.

This is the REFERENCE-LAYOUT compatibility library (tested standalone in
tests/test_cli_io.py) for third-party pipelines that consumed the
reference's directory shape. The bundled synthesize/validate commands
write their own (richer) artifact sets inline — `<stem>.comparison.png`
stacks, per-entry folders — rather than routing through these helpers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from waveglow_tpu.dsp.audio_io import float_to_wav
from waveglow_tpu.eval.plots import (plot_melspec_np, save_image,
                                     stack_images_vertically)


def _read_png(path) -> np.ndarray:
  """PNG file -> uint8 RGB array (matplotlib reader; imageio isn't in this
  environment — same convention as eval.metrics.calculate_structural_similarity)."""
  from matplotlib import pyplot as plt
  img = (plt.imread(str(path)) * 255).astype(np.uint8)
  return img[..., :3] if img.shape[-1] == 4 else img

__all__ = [
    "get_train_dir", "get_train_logs_dir", "get_train_log_file",
    "get_train_checkpoints_log_file", "get_checkpoints_dir",
    "get_inference_root_dir", "get_validation_root_dir",
    "save_infer_wav", "save_infer_plot", "save_infer_orig_plot",
    "save_diff_plot", "save_stacked_plot",
    "save_val_wav", "save_val_plot", "save_val_orig_plot",
    "save_val_comparison",
]


# -- directory layout (reference io.py:15-16, 47-60, 142-143, 163-164) --------

def get_train_dir(base_dir: Path, train_name: str) -> Path:
  return Path(base_dir) / train_name


def get_train_logs_dir(train_dir: Path) -> Path:
  return Path(train_dir) / "logs"


def get_train_log_file(logs_dir: Path) -> Path:
  return Path(logs_dir) / "log.txt"


def get_train_checkpoints_log_file(logs_dir: Path) -> Path:
  return Path(logs_dir) / "log_checkpoints.txt"


def get_checkpoints_dir(train_dir: Path) -> Path:
  return Path(train_dir) / "checkpoints"


def get_inference_root_dir(train_dir: Path) -> Path:
  return Path(train_dir) / "inference"


def get_validation_root_dir(train_dir: Path) -> Path:
  return Path(train_dir) / "validation"


# -- per-stem artifact savers --------------------------------------------------
# Each entry gets its own directory; files inside are named after the PARENT
# directory (reference io.py:146-156, 172-205: `infer_dir.parent.name`
# because upstream nests one more level; here the stem directory itself
# carries the name, matching the CLI's observable output tree).

def _stem(out_dir: Path) -> str:
  return Path(out_dir).name


def save_infer_wav(out_dir: Path, sampling_rate: int,
                   wav: np.ndarray) -> Path:
  """<dir>/<stem>.wav (reference io.py:146-148)."""
  path = Path(out_dir) / f"{_stem(out_dir)}.wav"
  float_to_wav(np.asarray(wav), path, sample_rate=sampling_rate)
  return path


def save_infer_plot(out_dir: Path, mel: np.ndarray,
                    suffix: str = "") -> Path:
  """<dir>/<stem><suffix>.png mel plot (reference io.py:151-156)."""
  _, labeled = plot_melspec_np(np.asarray(mel),
                               title=f"{_stem(out_dir)}{suffix}")
  path = Path(out_dir) / f"{_stem(out_dir)}{suffix}.png"
  save_image(path, labeled)
  return path


def save_infer_orig_plot(out_dir: Path, mel: np.ndarray) -> Path:
  """<dir>/<stem>_orig.png (reference io.py:180-185)."""
  return save_infer_plot(out_dir, mel, suffix="_orig")


def save_diff_plot(out_dir: Path) -> Tuple[float, Path]:
  """<dir>/<stem>_diff.png + SSIM score of plot vs _orig plot
  (reference io.py:19-28). Plot widths scale with frame count, and an
  inferred mel routinely differs from the original by a frame — pad the
  narrower image with white before SSIM (the same alignment validate()
  applies) instead of crashing on a shape mismatch."""
  from waveglow_tpu.eval.metrics import calculate_structural_similarity_np
  from waveglow_tpu.eval.plots import make_same_width_by_filling_white

  stem = _stem(out_dir)
  img_a = _read_png(Path(out_dir) / f"{stem}.png")
  img_b = _read_png(Path(out_dir) / f"{stem}_orig.png")
  img_a, img_b = make_same_width_by_filling_white([img_a, img_b])
  score, diff = calculate_structural_similarity_np(img_a, img_b)
  path = Path(out_dir) / f"{stem}_diff.png"
  save_image(path, diff)
  return score, path


def save_stacked_plot(out_dir: Path, suffixes=("_orig", "", "_diff"),
                      out_suffix: str = "_v") -> Path:
  """<dir>/<stem>_v.png: existing per-stem PNGs stacked vertically
  (reference io.py:32-37)."""
  stem = _stem(out_dir)
  images = [_read_png(Path(out_dir) / f"{stem}{s}.png") for s in suffixes]
  stacked = stack_images_vertically(images)
  path = Path(out_dir) / f"{stem}{out_suffix}.png"
  save_image(path, stacked)
  return path


# -- validation aliases (reference io.py:172-205 uses the same shapes) --------

save_val_wav = save_infer_wav
save_val_plot = save_infer_plot
save_val_orig_plot = save_infer_orig_plot


def save_val_comparison(out_dir: Path) -> Path:
  """<dir>/<stem>_comp.png: orig over synthesized (reference io.py:188-195)."""
  return save_stacked_plot(out_dir, suffixes=("_orig", ""),
                           out_suffix="_comp")
