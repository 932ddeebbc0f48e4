"""cli/io.py: run-directory layout + per-stem artifact savers
(reference waveglow_cli/io.py live subset)."""

from pathlib import Path

import numpy as np
import pytest

from waveglow_tpu.cli import io as wio


def test_directory_layout():
  base = Path("/tmp/x")
  train = wio.get_train_dir(base, "run1")
  assert train == base / "run1"
  logs = wio.get_train_logs_dir(train)
  assert logs == train / "logs"
  assert wio.get_train_log_file(logs) == logs / "log.txt"
  assert wio.get_train_checkpoints_log_file(logs) == \
      logs / "log_checkpoints.txt"
  assert wio.get_checkpoints_dir(train) == train / "checkpoints"
  assert wio.get_inference_root_dir(train) == train / "inference"
  assert wio.get_validation_root_dir(train) == train / "validation"


def test_per_stem_artifacts_roundtrip(tmp_path):
  out = tmp_path / "LJ001-0001"
  out.mkdir()
  rng = np.random.default_rng(0)
  mel = rng.standard_normal((80, 40)).astype(np.float32)
  wav = (0.3 * rng.standard_normal(2048)).astype(np.float32)

  p = wio.save_infer_wav(out, 22050, wav)
  assert p == out / "LJ001-0001.wav" and p.stat().st_size > 44

  plot = wio.save_infer_plot(out, mel)
  orig = wio.save_infer_orig_plot(out, mel + 0.05 * rng.standard_normal(
      mel.shape).astype(np.float32))
  assert plot == out / "LJ001-0001.png" and plot.exists()
  assert orig == out / "LJ001-0001_orig.png" and orig.exists()

  score, diff = wio.save_diff_plot(out)
  assert diff == out / "LJ001-0001_diff.png" and diff.exists()
  assert -1.0 <= score <= 1.0

  v = wio.save_stacked_plot(out)
  assert v == out / "LJ001-0001_v.png" and v.exists()

  comp = wio.save_val_comparison(out)
  assert comp == out / "LJ001-0001_comp.png" and comp.exists()


def test_val_aliases_share_naming(tmp_path):
  out = tmp_path / "stem"
  out.mkdir()
  wav = np.zeros(512, np.float32)
  assert wio.save_val_wav(out, 22050, wav) == out / "stem.wav"
  mel = np.zeros((80, 10), np.float32)
  assert wio.save_val_plot(out, mel) == out / "stem.png"
  assert wio.save_val_orig_plot(out, mel) == out / "stem_orig.png"
