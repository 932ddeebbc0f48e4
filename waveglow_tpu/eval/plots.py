"""Mel-spectrogram rendering and image stacking for validation reports.

Same outputs as the reference's plotting helpers (audio_utils.py:168-203
``plot_melspec_np``: a core unlabeled render + a labeled render, both as RGB
arrays; image_utils.py stacking/padding utilities) using matplotlib's Agg
backend.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import matplotlib
matplotlib.use("Agg")
import matplotlib.ticker as ticker  # noqa: E402
import numpy as np  # noqa: E402
from matplotlib import pyplot as plt  # noqa: E402


def figure_to_numpy_rgb(figure) -> np.ndarray:
  figure.canvas.draw()
  buf = np.asarray(figure.canvas.buffer_rgba())
  return buf[..., :3].copy()


def plot_melspec_np(mel: np.ndarray, mel_dim_x: int = 16, mel_dim_y: int = 5,
                    factor: int = 1, title: Optional[str] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
  """[n_mels, frames] -> (unlabeled RGB array, labeled RGB array)."""
  height, width = mel.shape
  width_factor = width / 1000
  fig, axes = plt.subplots(
      nrows=1, ncols=1,
      figsize=(mel_dim_x * factor * width_factor, mel_dim_y * factor))

  img = axes.imshow(mel, aspect="auto", origin="lower", interpolation="none")
  axes.set_yticks(np.arange(0, height, step=5))
  axes.set_xticks(np.arange(0, width, step=50))
  axes.xaxis.set_major_locator(ticker.NullLocator())
  axes.yaxis.set_major_locator(ticker.NullLocator())
  plt.tight_layout()
  fig_core = figure_to_numpy_rgb(fig)

  fig.colorbar(img, ax=axes)
  axes.xaxis.set_major_locator(ticker.AutoLocator())
  axes.yaxis.set_major_locator(ticker.AutoLocator())
  if title is not None:
    axes.set_title(title)
  axes.set_xlabel("Frames")
  axes.set_ylabel("Freq. channel")
  plt.tight_layout()
  fig_labeled = figure_to_numpy_rgb(fig)
  plt.close(fig)

  return fig_core, fig_labeled


def make_same_width_by_filling_white(images: List[np.ndarray]
                                     ) -> List[np.ndarray]:
  """Right-pad RGB images with white so all have the maximum width."""
  max_width = max(img.shape[1] for img in images)
  result = []
  for img in images:
    pad = max_width - img.shape[1]
    if pad > 0:
      img = np.pad(img, ((0, 0), (0, pad), (0, 0)), constant_values=255)
    result.append(img)
  return result


def stack_images_vertically(images: List[np.ndarray]) -> np.ndarray:
  """Stack equal-width RGB images top-to-bottom."""
  return np.concatenate(make_same_width_by_filling_white(images), axis=0)


def save_image(path, image: np.ndarray) -> None:
  plt.imsave(str(path), image)
