"""True multi-process distributed training test (2 simulated hosts).

Spawns two OS processes that join a jax.distributed process group over
localhost, build a global data-parallel mesh from their per-process CPU
devices, and run synchronized training steps on disjoint data shards —
the real multi-host code path (process groups, global mesh, per-host
sharding), not just the virtual-device simulation.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import os, sys, json
    sys.path.insert(0, {repo!r})
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")

    rank = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4          # 2 local x 2 processes
    assert len(jax.local_devices()) == 2

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from waveglow_tpu.dsp.mel import MelSTFT
    from waveglow_tpu.hparams import HParams, overwrite_custom_hparams
    from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params
    from waveglow_tpu.parallel import mesh as mesh_lib
    from waveglow_tpu.parallel.sharding import shard_params
    from waveglow_tpu.training.step import (init_state, make_optimizer,
                                            make_train_step)

    hp = overwrite_custom_hparams(HParams(), {{
        "n_flows": "2", "n_layers": "2", "n_channels": "32",
        "segment_length": "2048", "batch_size": "4"}})
    config = WaveGlowConfig.from_hparams(hp)
    mesh = mesh_lib.make_mesh(data=4, model=1)

    params = shard_params(init_params(config, seed=0), mesh)
    optimizer = make_optimizer(hp.learning_rate)
    state = init_state(params, optimizer)
    step = make_train_step(config, hp, mel_op := MelSTFT(hp), optimizer)

    # per-host disjoint batch shard: global batch 4, 2 per process
    rng = np.random.default_rng(123)               # same on both ranks
    global_batch = rng.uniform(-0.5, 0.5, (4, 2048)).astype(np.float32)
    sharding = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    local = global_batch[rank * 2:(rank + 1) * 2]
    batch = jax.make_array_from_process_local_data(sharding, local, (4, 2048))

    losses = []
    for _ in range(2):
      state, loss = step(state, batch)
      losses.append(float(loss))
    print("RESULT", json.dumps({{"rank": rank, "losses": losses}}), flush=True)
""")


TRAIN_WORKER = textwrap.dedent("""
    import os, sys, json
    sys.path.insert(0, {repo!r})
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")

    rank = int(sys.argv[1]); port = sys.argv[2]
    data_dir, ckpt_dir, logdir = sys.argv[3], sys.argv[4], sys.argv[5]
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2

    from pathlib import Path
    import numpy as np
    from jax.experimental import multihost_utils

    from waveglow_tpu.checkpointing import (get_last_checkpoint_any,
                                            load_checkpoint_lazy)
    from waveglow_tpu.hparams import parse_custom_hparams
    from waveglow_tpu.training.data import load_dataset
    from waveglow_tpu.training.loop import train

    hp = parse_custom_hparams({hp_str!r})
    trainset = load_dataset(Path(data_dir) / "train")
    valset = load_dataset(Path(data_dir) / "val")

    # phase 1: fresh training for 2 iterations (saves at 1 and 2)
    train(hp, Path(logdir), trainset, valset, Path(ckpt_dir),
          max_iterations=2)
    multihost_utils.sync_global_devices("phase1-saved")

    # phase 2: the real continue-train path from the saved checkpoint —
    # load_checkpoint_lazy is what the CLI uses: orbax checkpoints open by
    # reference and train() restores them straight onto the mesh
    path, it = get_last_checkpoint_any(Path(ckpt_dir))
    assert it == 2, it
    ckpt = load_checkpoint_lazy(path)

    from waveglow_tpu.checkpointing import orbax_store
    if isinstance(ckpt, orbax_store.OrbaxCheckpointRef):
      # prove the resume is gather-free: the host-materializing restore must
      # never run, and the sharded restore must place every leaf with a
      # non-fully-replicated sharding where the template has one
      def _forbidden(*a, **k):
        raise AssertionError("restore_host called during sharded resume")
      orbax_store.restore_host = _forbidden
      # ... and no host materializes a full model either: the placement
      # template must come from the abstract skeleton, not init_params
      import waveglow_tpu.training.loop as loop_mod
      def _forbidden_init(*a, **k):
        raise AssertionError("init_params called during sharded resume")
      loop_mod.init_params = _forbidden_init
      real_restore_sharded = orbax_store.restore_sharded
      def _checked(path_, template, optimizer):
        params, opt_state, meta = real_restore_sharded(path_, template,
                                                       optimizer)
        t_leaves = jax.tree_util.tree_leaves(template)
        p_leaves = jax.tree_util.tree_leaves(params)
        assert len(t_leaves) == len(p_leaves)
        n_sharded = 0
        for t, p in zip(t_leaves, p_leaves):
          assert p.sharding == t.sharding, (p.sharding, t.sharding)
          if not p.sharding.is_fully_replicated:
            # gather-free: no device ever holds the full leaf (the model
            # axis lives inside a process here, so PER-PROCESS bytes can
            # legitimately cover the leaf across two local devices)
            biggest = max(s.data.nbytes for s in p.addressable_shards)
            assert biggest < p.nbytes, (biggest, p.nbytes)
            n_sharded += 1
        assert n_sharded > 0, "TP run restored no actually-sharded leaf"
        return params, opt_state, meta
      orbax_store.restore_sharded = _checked

    state = train(hp, Path(logdir), trainset, valset, Path(ckpt_dir),
                  checkpoint=ckpt, max_iterations=4)

    digest = float(sum(np.abs(np.asarray(x, dtype=np.float64)).sum()
                       for x in jax.tree_util.tree_leaves(state["params"])))
    print("RESULT", json.dumps({{"rank": rank, "digest": digest,
                                 "iteration": int(state["step"])}}),
          flush=True)
""")


FAULT_WORKER = textwrap.dedent("""
    import os, signal, sys
    sys.path.insert(0, {repo!r})
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")

    rank = int(sys.argv[1]); port = sys.argv[2]
    data_dir, ckpt_dir, logdir = sys.argv[3], sys.argv[4], sys.argv[5]
    kill_at = int(sys.argv[6])

    # join the process group before ANY backend-touching import (the fault
    # patch below imports the training modules; in a real pod the CLI's
    # --coordinator-address flags do this inside train_ns before other work)
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=rank)

    if kill_at and rank == 1:
      # fault injection: SIGKILL this rank right before its train-step call
      # number `kill_at` executes — a hard mid-epoch preemption (no atexit,
      # no finally blocks, no checkpoint flush)
      from waveglow_tpu.training import loop as loop_mod
      orig_make = loop_mod.make_train_step
      def make_patched(*a, **k):
        step = orig_make(*a, **k)
        calls = {{"n": 0}}
        def wrapped(state, batch):
          calls["n"] += 1
          if calls["n"] == kill_at:
            os.kill(os.getpid(), signal.SIGKILL)
          return step(state, batch)
        return wrapped
      loop_mod.make_train_step = make_patched

    # the REAL preemption-recovery surface: the same `train --auto-resume`
    # CLI command, re-run verbatim after the kill (training_cmd.py:124-133)
    from waveglow_tpu.cli.main import run
    rc = run(["train", data_dir + "/train", data_dir + "/val", ckpt_dir,
              "--custom-hparams", {hp_str!r}, "--auto-resume",
              "--tl-dir", logdir])
    sys.exit(rc)
""")


def _free_port() -> int:
  s = socket.socket()
  s.bind(("127.0.0.1", 0))
  port = s.getsockname()[1]
  s.close()
  return port


@pytest.mark.slow
def test_two_process_data_parallel_training(tmp_path):
  port = str(_free_port())
  script = tmp_path / "worker.py"
  script.write_text(WORKER.format(repo=str(REPO_ROOT)))

  env = dict(os.environ)
  env.pop("JAX_PLATFORMS", None)
  procs = [
      subprocess.Popen([sys.executable, str(script), str(rank), port],
                       stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                       text=True, env=env)
      for rank in range(2)
  ]
  outs = []
  for p in procs:
    out, err = p.communicate(timeout=600)
    outs.append((p.returncode, out, err))

  for rc, out, err in outs:
    assert rc == 0, f"worker failed:\nstdout:{out}\nstderr:{err[-3000:]}"

  import json
  results = []
  for _, out, _ in outs:
    line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
    results.append(json.loads(line[len("RESULT "):]))

  # both ranks observe the identical global loss (synchronized training)
  assert results[0]["losses"] == pytest.approx(results[1]["losses"], rel=1e-6)
  assert all(np.isfinite(l) for r in results for l in r["losses"])

  # and it matches single-process execution of the same global batch
  import jax
  import jax.numpy as jnp
  from waveglow_tpu.dsp.mel import MelSTFT
  from waveglow_tpu.hparams import HParams, overwrite_custom_hparams
  from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params
  from waveglow_tpu.training.step import (init_state, make_optimizer,
                                          make_train_step)

  hp = overwrite_custom_hparams(HParams(), {
      "n_flows": "2", "n_layers": "2", "n_channels": "32",
      "segment_length": "2048", "batch_size": "4"})
  config = WaveGlowConfig.from_hparams(hp)
  optimizer = make_optimizer(hp.learning_rate)
  state = init_state(init_params(config, seed=0), optimizer)
  step = make_train_step(config, hp, MelSTFT(hp), optimizer)
  rng = np.random.default_rng(123)
  batch = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 2048)).astype(np.float32))
  single_losses = []
  for _ in range(2):
    state, loss = step(state, batch)
    single_losses.append(float(loss))
  assert results[0]["losses"] == pytest.approx(single_losses, rel=1e-4)


# learning_rate is tiny on purpose: Adam normalizes gradients (m/sqrt(v)),
# so at the default lr float-level psum-order noise in near-zero grads (the
# end conv is zero-init) is amplified into full lr-sized param deltas and the
# single- vs multi-process losses drift at ~1e-2 relative within 4 steps.
# With lr=1e-7 the drift is negligible while any ORCHESTRATION bug (wrong
# batch rows, wrong resume point, lost data) still shifts losses by orders
# of magnitude more than the tolerance.
TRAIN_HP = ("n_flows=2,n_channels=32,n_layers=2,segment_length=2048,"
            "iters_per_checkpoint=2,epochs_per_checkpoint=0,epochs=100,"
            "batch_size=4,seed=1234,learning_rate=0.0000001")


@pytest.mark.slow
@pytest.mark.parametrize("extra_hp", [
    "",                 # pure data parallel (params replicated)
    ",mesh_model=2",    # DP x TP: params sharded over the model axis, so
                        # checkpoint saves must all-gather non-addressable
                        # shards (the collective _fetch_leaf branch)
    ",mesh_model=2,checkpoint_backend=orbax",
                        # DP x TP with GATHER-FREE orbax saves: each process
                        # writes only its own shards, resume goes through the
                        # unified load_checkpoint_any path
])
def test_two_process_train_loop_with_resume(tmp_path, extra_hp):
  """Drives training.loop.train() itself across 2 processes: fresh train,
  checkpoint save, and continue-train resume — losses and final params must
  match a single-process run of the identical global configuration."""
  import jax
  from waveglow_tpu.hparams import parse_custom_hparams
  from waveglow_tpu.training.data import load_dataset
  from tests.test_training import write_noise_dataset

  data_dir = tmp_path / "data"
  write_noise_dataset(data_dir / "train", n=8, seconds=0.3)
  write_noise_dataset(data_dir / "val", n=4, seconds=0.3, seed=7)

  port = str(_free_port())
  script = tmp_path / "train_worker.py"
  script.write_text(TRAIN_WORKER.format(repo=str(REPO_ROOT),
                                        hp_str=TRAIN_HP + extra_hp))
  ckpt_dir = tmp_path / "ckpts"
  logdir = tmp_path / "logs"

  env = dict(os.environ)
  env.pop("JAX_PLATFORMS", None)
  procs = [
      subprocess.Popen([sys.executable, str(script), str(rank), port,
                        str(data_dir), str(ckpt_dir), str(logdir)],
                       stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                       text=True, env=env)
      for rank in range(2)
  ]
  outs = []
  for p in procs:
    out, err = p.communicate(timeout=600)
    outs.append((p.returncode, out, err))
  for rc, out, err in outs:
    assert rc == 0, f"worker failed:\nstdout:{out}\nstderr:{err[-4000:]}"

  import json
  results = []
  for _, out, _ in outs:
    line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
    results.append(json.loads(line[len("RESULT "):]))

  # both ranks end with the identical replicated params
  assert results[0]["iteration"] == results[1]["iteration"] == 4
  assert results[0]["digest"] == pytest.approx(results[1]["digest"],
                                               rel=1e-12)

  # multi-process train-step losses (rank 0's metrics.jsonl)
  mh_losses = {}
  with open(logdir / "metrics.jsonl") as f:
    for line in f:
      rec = json.loads(line)
      if rec["event"] == "train_step":
        mh_losses[rec["iteration"]] = rec["loss"]
  assert sorted(mh_losses) == [1, 2, 3, 4]

  # single-process run of the same global config (train 2, resume to 4)
  from waveglow_tpu.checkpointing.store import (CheckpointWaveglow,
                                                get_last_checkpoint)
  from waveglow_tpu.training.loop import train
  import numpy as np

  hp = parse_custom_hparams(TRAIN_HP)
  trainset = load_dataset(data_dir / "train")
  valset = load_dataset(data_dir / "val")
  sp_ckpts = tmp_path / "sp_ckpts"
  sp_logs = tmp_path / "sp_logs"
  train(hp, sp_logs, trainset, valset, sp_ckpts, max_iterations=2)
  path, _ = get_last_checkpoint(sp_ckpts)
  state = train(hp, sp_logs, trainset, valset, sp_ckpts,
                checkpoint=CheckpointWaveglow.load(path), max_iterations=4)
  sp_digest = float(sum(np.abs(np.asarray(x, dtype=np.float64)).sum()
                        for x in jax.tree_util.tree_leaves(state["params"])))
  sp_losses = {}
  with open(sp_logs / "metrics.jsonl") as f:
    for line in f:
      rec = json.loads(line)
      if rec["event"] == "train_step":
        sp_losses[rec["iteration"]] = rec["loss"]

  for it in (1, 2, 3, 4):
    assert mh_losses[it] == pytest.approx(sp_losses[it], rel=1e-4)
  assert results[0]["digest"] == pytest.approx(sp_digest, rel=1e-5)


FAULT_HP = TRAIN_HP.replace("epochs=100", "epochs=3")  # 3 epochs x 2 = 6 its


@pytest.mark.slow
def test_preemption_sigkill_and_auto_resume(tmp_path):
  """Hard-preemption fault injection (SURVEY §5.3): SIGKILL one rank of a
  2-process run mid-epoch, re-run the identical ``train --auto-resume``
  command, and require (a) the rerun resumes at the last checkpoint's next
  iteration, (b) the killed iteration is deterministically replayed, and
  (c) the final params match an uninterrupted single-process run."""
  import json
  import time as _time

  import jax
  from waveglow_tpu.checkpointing.store import (CheckpointWaveglow,
                                                get_last_checkpoint)
  from waveglow_tpu.hparams import parse_custom_hparams
  from waveglow_tpu.training.data import load_dataset
  from waveglow_tpu.training.loop import train
  from tests.test_training import write_noise_dataset

  data_dir = tmp_path / "data"
  write_noise_dataset(data_dir / "train", n=8, seconds=0.3)
  write_noise_dataset(data_dir / "val", n=4, seconds=0.3, seed=7)
  ckpt_dir = tmp_path / "ckpts"
  logdir = tmp_path / "logs"
  script = tmp_path / "fault_worker.py"
  script.write_text(FAULT_WORKER.format(repo=str(REPO_ROOT),
                                        hp_str=FAULT_HP))
  env = dict(os.environ)
  env.pop("JAX_PLATFORMS", None)

  def spawn(port, kill_at):
    return [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), port, str(data_dir),
             str(ckpt_dir), str(logdir), str(kill_at)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for rank in range(2)
    ]

  def read_steps():
    steps = {}
    try:
      with open(logdir / "metrics.jsonl") as f:
        for line in f:
          try:
            rec = json.loads(line)
          except json.JSONDecodeError:
            continue  # torn trailing line from a killed writer
          if rec.get("event") == "train_step":
            steps[rec["iteration"]] = rec["loss"]
    except FileNotFoundError:
      pass
    return steps

  # --- phase 1: train, rank 1 is SIGKILLed before step 4 (epoch 2 of 3,
  # after the iteration-2 checkpoint) ---------------------------------------
  procs = spawn(str(_free_port()), kill_at=4)
  assert procs[1].wait(timeout=600) == -9  # died by SIGKILL, not cleanly
  # rank 0 completed step 3 (rank 1 only reaches its 4th call after the
  # step-3 collective) — wait for its metrics append to land, then the job
  # controller (here: this test) tears the remaining wedged rank down the
  # same hard way
  deadline = _time.time() + 120
  while 3 not in read_steps() and _time.time() < deadline:
    _time.sleep(0.25)
  procs[0].kill()
  procs[0].communicate()
  procs[1].communicate()

  phase1 = read_steps()
  assert sorted(phase1) == [1, 2, 3], phase1  # step 4 never completed
  _, last_it = get_last_checkpoint(ckpt_dir)
  assert last_it == 2  # iteration-3 work after the save is lost, as designed

  # --- phase 2: the SAME command re-run (new coordinator port) -------------
  procs = spawn(str(_free_port()), kill_at=0)
  for p in procs:
    out, err = p.communicate(timeout=600)
    assert p.returncode == 0, f"resume failed:\nstdout:{out}\nstderr:{err[-4000:]}"

  all_steps = read_steps()  # later records win: phase-2 values at 3..6
  # resumed at the checkpoint's next batch: iteration 3 (replayed), 4, 5, 6
  assert sorted(all_steps) == [1, 2, 3, 4, 5, 6], all_steps
  phase2 = {it: all_steps[it] for it in (3, 4, 5, 6)}
  # the lost iteration is REPLAYED deterministically: same batch, same state
  assert phase2[3] == pytest.approx(phase1[3], rel=1e-6)

  # --- uninterrupted single-process oracle ----------------------------------
  hp = parse_custom_hparams(FAULT_HP)
  trainset = load_dataset(data_dir / "train")
  valset = load_dataset(data_dir / "val")
  state = train(hp, tmp_path / "sp_logs", trainset, valset,
                tmp_path / "sp_ckpts")
  assert int(state["step"]) == 6

  def digest(params):
    return float(sum(np.abs(np.asarray(x, dtype=np.float64)).sum()
                     for x in jax.tree_util.tree_leaves(params)))

  path, it = get_last_checkpoint(ckpt_dir)
  assert it == 6
  mh_final = CheckpointWaveglow.load(path)
  assert digest(mh_final.state_dict) == pytest.approx(
      digest(state["params"]), rel=1e-5)


MESH_TOPOLOGY_WORKER = textwrap.dedent("""
    import os, sys, json
    sys.path.insert(0, {repo!r})
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")

    rank = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=rank)
    from waveglow_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(data=2, model=2)
    grid = mesh.devices  # [data, model] of Device
    rows = [[d.process_index for d in row] for row in grid]
    print("RESULT", json.dumps({{"rank": rank, "rows": rows}}), flush=True)
""")


@pytest.mark.slow
def test_mesh_topology_places_model_axis_within_a_process(tmp_path):
  """Topology-aware make_mesh on 2 real processes x 2 local devices: every
  MODEL-parallel group (a mesh row) must sit inside ONE process — its
  per-WN-layer psums need the fast interconnect — while the DATA axis spans
  the process (DCN) boundary, where only the once-per-step bundled gradient
  all-reduce travels. The naive jax.devices()[:n].reshape(data, model) got
  this exactly backwards for (2, 2) over 2 processes: each model pair
  straddled both processes."""
  import json

  port = str(_free_port())
  script = tmp_path / "worker.py"
  script.write_text(MESH_TOPOLOGY_WORKER.format(repo=str(REPO_ROOT)))

  env = dict(os.environ)
  env.pop("JAX_PLATFORMS", None)
  procs = [
      subprocess.Popen([sys.executable, str(script), str(rank), port],
                       stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                       text=True, env=env)
      for rank in range(2)
  ]
  outs = [(p.communicate(timeout=600), p.returncode) for p in procs]
  for (out, err), rc in outs:
    assert rc == 0, f"worker failed:\nstdout:{out}\nstderr:{err[-3000:]}"
  for (out, _), _ in outs:
    line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
    rows = json.loads(line[len("RESULT "):])["rows"]
    # each model group lives inside one process...
    for row in rows:
      assert len(set(row)) == 1, f"model group straddles processes: {rows}"
    # ...and the data axis spans both processes
    assert {row[0] for row in rows} == {0, 1}, rows
