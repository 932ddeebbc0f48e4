"""Variable-length serving benchmark: BatchSynthesizer.infer_many throughput.

A production vocoder queue receives utterances of many lengths; this measures
the bucketed batch-serving path (inference/serving.py infer_many) on a
realistic mixed-length workload and prints ONE JSON line like bench.py.

Workload: 64 utterances in 4 length groups (~2/4.6/7.5/10.4 s), bucketed at
128 frames with max_batch=16, so exactly 4 programs compile and every call
runs a full 16-row batch. Throughput counts TRUE (unpadded) audio seconds.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
  parser = argparse.ArgumentParser()
  parser.add_argument("--per-group", type=int, default=16,
                      help="utterances per length group (4 groups)")
  parser.add_argument("--iters", type=int, default=3)
  parser.add_argument("--dtype", default="bfloat16",
                      choices=["bfloat16", "float32"])
  parser.add_argument("--bucket-frames", type=int, default=128)
  args = parser.parse_args()

  import jax

  try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/waveglow_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
  except Exception:
    pass

  from dataclasses import asdict

  from waveglow_tpu.checkpointing.store import CheckpointWaveglow
  from waveglow_tpu.hparams import HParams, overwrite_custom_hparams
  from waveglow_tpu.inference.serving import BatchSynthesizer
  from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params

  hp = overwrite_custom_hparams(HParams(), {"compute_dtype": args.dtype})
  config = WaveGlowConfig.from_hparams(hp)
  ckpt = CheckpointWaveglow(state_dict=init_params(config, seed=0),
                            optimizer=None, learning_rate=hp.learning_rate,
                            iteration=0, hparams=asdict(hp))
  synth = BatchSynthesizer(ckpt)

  # 4 groups just under each bucket boundary (128/256/384/512 padded frames)
  group_frames = [170, 400, 650, 900]
  rng = np.random.default_rng(0)
  mels = []
  for f in group_frames:
    for _ in range(args.per_group):
      mels.append(rng.standard_normal((hp.n_mel_channels, f))
                  .astype(np.float32))
  true_audio_sec = sum(np.shape(m)[-1] * 256 for m in mels) / hp.sampling_rate

  # warmup: compiles one program per (bucket, batch) pair
  outs = synth.infer_many(mels, seed=0, bucket_frames=args.bucket_frames,
                          max_batch=args.per_group)
  assert all(np.isfinite(o).all() for o in outs)

  start = time.perf_counter()
  for i in range(args.iters):
    outs = synth.infer_many(mels, seed=i + 1,
                            bucket_frames=args.bucket_frames,
                            max_batch=args.per_group)
  elapsed = time.perf_counter() - start

  value = true_audio_sec * args.iters / elapsed
  print(json.dumps({
      "metric": "serving_variable_length_audio_sec_per_sec_per_chip",
      "value": round(value, 2),
      "unit": "audio-sec/s/chip",
      "vs_baseline": round(value / 200.0, 3),
      "dtype": args.dtype,
      "utterances": len(mels),
      "length_groups_frames": group_frames,
      "bucket_frames": args.bucket_frames,
      "max_batch": args.per_group,
      "true_audio_seconds_per_pass": round(true_audio_sec, 2),
      "platform": jax.devices()[0].platform,
  }))
  return 0


if __name__ == "__main__":
  sys.exit(main())
