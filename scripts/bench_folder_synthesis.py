"""Folder-synthesis wall time: per-length compiles vs length bucketing.

Measures the user-facing cost VERDICT round-2 item 3 targeted: a folder of
N distinct-length mels through the real `synthesize` CLI, once with
--bucket-frames 0 (one full-model XLA compile PER DISTINCT LENGTH — the
reference-style path) and once with the default bucketing (one compile per
bucket). Each run is a fresh process, so both pay the same Synthesizer
construction cost; the difference is pure compile count.

Prints one JSON line per mode.
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--workdir", type=Path, default=Path("/tmp/waveglow_folder_bench"))
  ap.add_argument("--frames", type=int, nargs="+", default=[800, 820, 826],
                  help="distinct mel lengths (all land in one 64-frame bucket "
                       "by default: 832)")
  ap.add_argument("--modes", type=int, nargs="+", default=[64, 0],
                  help="--bucket-frames values to time (0 = per-length)")
  args = ap.parse_args()

  from dataclasses import asdict
  from waveglow_tpu.checkpointing.store import CheckpointWaveglow
  from waveglow_tpu.hparams import HParams
  from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params

  args.workdir.mkdir(parents=True, exist_ok=True)
  ckpt_path = args.workdir / "580000.npz"
  if not ckpt_path.exists():
    hp = HParams()  # full size: 12 flows / 256 channels
    params = init_params(WaveGlowConfig.from_hparams(hp), seed=0)
    CheckpointWaveglow(state_dict=params, optimizer=None,
                       learning_rate=hp.learning_rate, iteration=580000,
                       hparams=asdict(hp)).save(ckpt_path)

  mel_dir = args.workdir / "mels"
  mel_dir.mkdir(exist_ok=True)
  rng = np.random.default_rng(0)
  for f in args.frames:
    p = mel_dir / f"len{f}.npy"
    if not p.exists():
      np.save(p, rng.standard_normal((80, f)).astype(np.float32))

  for bucket in args.modes:
    out = args.workdir / f"out_bucket{bucket}"
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "waveglow_tpu", "synthesize", str(ckpt_path),
         str(mel_dir), "--custom-seed", "0", "-out", str(out), "-o",
         "--bucket-frames", str(bucket)],
        capture_output=True, text=True,
        cwd=str(Path(__file__).resolve().parent.parent))
    wall = time.perf_counter() - t0
    row = {
        "bucket_frames": bucket,
        "files": len(args.frames),
        "distinct_lengths": len(set(args.frames)),
        "wall_seconds": round(wall, 1),
        "ok": proc.returncode == 0,
    }
    if proc.returncode != 0:
      row["stderr_tail"] = proc.stderr[-500:]
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
  main()
