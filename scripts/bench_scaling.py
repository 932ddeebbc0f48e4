"""Scaling-efficiency harness: training samples/sec at 1..N data-parallel devices.

BASELINE.md's scaling target is >=85% training efficiency at 2 hosts, metric
"training samples/sec at 1..N hosts". This harness measures weak scaling
(fixed per-device batch) of the jitted train step over a growing data-parallel
mesh and reports throughput + efficiency vs the 1-device run.

Prints ONE JSON line in the bench.py format:

  {"metric": "training_scaling_efficiency", "value": <eff at largest N>,
   "unit": "ratio", "vs_baseline": <value/0.85>,
   "points": {"1": {...}, "2": {...}}, ...}

Runs anywhere:
  * on a multi-chip TPU slice it measures real ICI scaling;
  * with ``--force-cpu N`` it provisions N virtual CPU devices in-process
    (the way tests/conftest.py builds meshes) — that validates the harness
    and the GSPMD sharding, but CPU "devices" share host cores, so CPU
    efficiency numbers are NOT hardware scaling evidence;
  * on a 1-chip TPU only the mesh=1 point runs (efficiency 1.0 by
    definition) — the harness says so in the output.

Usage:
  python scripts/bench_scaling.py --force-cpu 8 --mesh-sizes 1,2,4,8
  python scripts/bench_scaling.py --mesh-sizes 1,2 --preset full  # on a pod
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PRESETS = {
    # tiny: fast enough for CPU harness validation
    "tiny": {"n_flows": "2", "n_channels": "64", "n_layers": "4",
             "segment_length": "4096"},
    # full: the reference workload (12 flows / 256 channels, 16k segments)
    "full": {},
}


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--mesh-sizes", default="1,2,4,8",
                      help="comma-separated data-parallel sizes to measure")
  parser.add_argument("--per-device-batch", type=int, default=4)
  parser.add_argument("--iters", type=int, default=5)
  parser.add_argument("--dtype", default="bfloat16",
                      choices=["bfloat16", "float32"])
  parser.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
  parser.add_argument("--force-cpu", type=int, default=None, metavar="N",
                      help="run on N virtual CPU devices (harness validation)")
  args = parser.parse_args()
  sizes = sorted({int(s) for s in args.mesh_sizes.split(",")})

  import jax

  if args.force_cpu:
    # Env-var platform selection is ignored where a site override pins the
    # TPU platform; the config call before first backend use always works.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.force_cpu)

  import jax.numpy as jnp
  import numpy as np
  from jax.sharding import NamedSharding, PartitionSpec as P

  from waveglow_tpu.dsp.mel import MelSTFT
  from waveglow_tpu.hparams import HParams, overwrite_custom_hparams
  from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params
  from waveglow_tpu.parallel import mesh as mesh_lib
  from waveglow_tpu.parallel.sharding import shard_params
  from waveglow_tpu.training.step import (init_state, make_optimizer,
                                          make_train_step)

  n_devices = len(jax.devices())
  usable = [n for n in sizes if n <= n_devices]
  skipped = [n for n in sizes if n > n_devices]
  if not usable:
    print(json.dumps({"error": f"no mesh size fits {n_devices} devices"}))
    return 1

  overrides = dict(PRESETS[args.preset])
  overrides["compute_dtype"] = args.dtype
  points = {}
  for n in usable:
    hp = overwrite_custom_hparams(
        HParams(), {**overrides,
                    "batch_size": str(args.per_device_batch * n)})
    config = WaveGlowConfig.from_hparams(hp)
    mesh = mesh_lib.make_mesh(data=n, model=1)
    params = shard_params(init_params(config, seed=0), mesh)
    optimizer = make_optimizer(hp.learning_rate)
    state = init_state(params, optimizer)
    step = make_train_step(config, hp, MelSTFT(hp), optimizer)

    rng = np.random.default_rng(0)
    batch = jax.device_put(
        rng.uniform(-0.5, 0.5,
                    (hp.batch_size, hp.segment_length)).astype(np.float32),
        NamedSharding(mesh, P(mesh_lib.DATA_AXIS)))

    # TWO warmup steps: the first compiles; the second compiles AGAIN on
    # mesh runs (the donated state comes back with jit-chosen output
    # shardings that differ from the explicit shard_params placement of
    # call 1) and only then the program is steady-state.
    state, loss = step(state, batch)
    float(loss)
    state, loss = step(state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.iters):
      state, loss = step(state, batch)
    float(loss)  # force full execution (host fetch)
    elapsed = time.perf_counter() - t0
    points[str(n)] = {
        "devices": n,
        "global_batch": hp.batch_size,
        "samples_per_sec": round(hp.batch_size * args.iters / elapsed, 2),
        "step_seconds": round(elapsed / args.iters, 4),
    }

  # per-device rate of the SMALLEST measured mesh is the normalization base;
  # name the key honestly when that base is not a single device
  base_n = usable[0]
  base = points[str(base_n)]["samples_per_sec"] / base_n
  eff_key = ("efficiency_vs_1dev" if base_n == 1
             else f"efficiency_vs_{base_n}dev")
  for n in usable:
    pt = points[str(n)]
    pt[eff_key] = round(pt["samples_per_sec"] / (base * n), 4)

  largest = str(max(usable))
  value = points[largest][eff_key]
  # Virtual CPU "devices" share host cores, so their ratio measures host
  # saturation, NOT hardware scaling — name the metric so no dashboard can
  # ingest it as a scaling-efficiency number. The load-bearing scaling
  # evidence is the checked compile-time communication structure
  # (tests/test_hlo_scaling.py) plus the grad-bytes/step-time bandwidth
  # argument in docs/PERFORMANCE.md.
  metric = ("scaling_harness_mechanism_check" if args.force_cpu
            else "training_scaling_efficiency")
  result = {
      "metric": metric,
      "efficiency_base_devices": base_n,
      "value": value,
      "unit": "ratio",
      # the 0.85 BASELINE target only applies to real-hardware scaling;
      # a mechanism check "passes" by running every mesh point
      "vs_baseline": (round(value / 0.85, 3) if not args.force_cpu else 1.0),
      "mechanism_check_note": (
          "virtual CPU devices share host cores; the ratio measures host "
          "saturation, not scaling" if args.force_cpu else None),
      "at_devices": max(usable),
      "dtype": args.dtype,
      "preset": args.preset,
      "per_device_batch": args.per_device_batch,
      "platform": jax.devices()[0].platform,
      "cpu_virtual_devices": bool(args.force_cpu),
      "skipped_sizes": skipped,
      "points": points,
  }
  print(json.dumps(result))
  return 0


if __name__ == "__main__":
  sys.exit(main())
