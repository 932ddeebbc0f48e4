"""The training orchestration loop: resume, warm start, save, validate.

Same contract as reference train.py:93-238 — hparams come from the checkpoint
when continuing (overridable via custom hparams), training resumes mid-epoch
at the exact next batch, checkpoints carry model+optimizer+hparams+iteration,
and validation runs at every save — but realized TPU-first:

  * one jitted train step (on-device mel + NLL + Adam) instead of the
    eager zero_grad/forward/backward/step sequence;
  * resume recomputes the (epoch, batch) offset and the deterministic data
    pipeline regenerates the exact remaining segments — no replay-and-skip
    of already-seen batches (reference train.py:170-187);
  * optional (data, model) mesh: params/opt-state sharded once up front,
    batches placed with the data-axis sharding, GSPMD handles collectives.

Training telemetry goes to the console logger and a JSONL metrics file in
``logdir`` (the reference's tensorboard logger is a stubbed no-op,
reference logger.py:13-21 — the JSONL file is the working replacement).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from waveglow_tpu.checkpointing.store import (CheckpointWaveglow, _to_host,
                                              get_checkpoint_filename,
                                              restore_opt_state)
from waveglow_tpu.dsp.mel import MelSTFT
from waveglow_tpu.hparams import HParams, overwrite_custom_hparams
from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params
from waveglow_tpu.parallel import mesh as mesh_lib
from waveglow_tpu.parallel.sharding import shard_params
from waveglow_tpu.training.data import BatchLoader, Entries, SegmentDataset
from waveglow_tpu.training.schedule import (SaveIterationSettings,
                                            check_save_it,
                                            get_continue_batch_iteration,
                                            get_continue_epoch)
from waveglow_tpu.training.step import (init_state, make_eval_loss,
                                        make_optimizer, make_train_step)

logger = logging.getLogger(__name__)


class MetricsLogger:
  """Append-only JSONL metrics log (one record per event)."""

  def __init__(self, logdir: Optional[Path]):
    self.path = None
    if logdir is not None:
      logdir = Path(logdir)
      logdir.mkdir(parents=True, exist_ok=True)
      self.path = logdir / "metrics.jsonl"

  def log(self, **record) -> None:
    if self.path is None:
      return
    record["time"] = time.time()
    with open(self.path, "a") as f:
      f.write(json.dumps(record) + "\n")


def warm_start_params(target: Dict, source: Dict) -> Dict:
  """Copy source leaves into target wherever path and shape match.

  The reference's warm start copies the pretrained state dict into the new
  model (train.py:85-90 via copy_state_dict with an ignore list); this is
  the pytree equivalent, tolerant of architecture differences: mismatched
  or missing leaves keep the target's fresh initialization and are logged.
  """
  import numpy as _np

  skipped = []

  def merge(t, s, path):
    if isinstance(t, dict):
      return {k: merge(t[k], s.get(k) if isinstance(s, dict) else None,
                       f"{path}/{k}")
              for k in t}
    if isinstance(t, list):
      s_list = s if isinstance(s, list) else []
      return [merge(t[i], s_list[i] if i < len(s_list) else None,
                    f"{path}/{i}")
              for i in range(len(t))]
    if s is None or _np.shape(s) != _np.shape(t):
      skipped.append(path)
      return t
    return s

  merged = merge(target, source, "")
  if skipped:
    logger.warning("Warm start skipped %d mismatched leaves (e.g. %s)",
                   len(skipped), skipped[:5])
  return merged


def validate_model(eval_loss, params, val_loader: BatchLoader,
                   put) -> float:
  """Average NLL over the validation set (reference utils.py:337-357)."""
  losses = []
  for batch in val_loader.epoch(0):
    losses.append(float(eval_loss(params, put(batch))))
  return float(np.mean(losses)) if losses else float("nan")


def train(custom_hparams: Optional[Dict[str, str]], logdir: Optional[Path],
          trainset: Entries, valset: Entries, save_checkpoint_dir: Path,
          checkpoint: Optional[CheckpointWaveglow] = None,
          warm_model: Optional[CheckpointWaveglow] = None,
          max_iterations: Optional[int] = None,
          tensorboard_dir: Optional[Path] = None) -> Dict:
  """Train (or continue training) a WaveGlow model.

  ``max_iterations`` bounds this invocation (useful for tests/smoke runs);
  ``None`` trains to ``hparams.epochs`` like the reference.
  ``tensorboard_dir`` additionally writes TensorBoard scalar events there
  (the working version of the reference's stubbed logger.py:13-21).
  Returns the final train state (host pytrees).
  """
  complete_start = time.time()

  if checkpoint is not None:
    hparams = checkpoint.get_hparams()
  else:
    hparams = HParams()
  hparams = overwrite_custom_hparams(hparams, custom_hparams)
  if hparams.checkpoint_backend not in ("npz", "orbax"):
    raise ValueError(
        f"unknown checkpoint_backend {hparams.checkpoint_backend!r} "
        "(expected 'npz' or 'orbax')")
  if hparams.checkpoint_async and hparams.checkpoint_backend != "orbax":
    raise ValueError(
        "checkpoint_async=true requires checkpoint_backend=orbax (the npz "
        "backend writes synchronously)")
  config = WaveGlowConfig.from_hparams(hparams)

  process_index = jax.process_index()
  process_count = jax.process_count()
  # one metrics writer per run, not per host
  metrics = MetricsLogger(logdir if process_index == 0 else None)
  from waveglow_tpu.training.tboard import make_tensorboard_logger
  tboard = make_tensorboard_logger(
      tensorboard_dir if process_index == 0 else None)

  # --- model + optimizer state -------------------------------------------
  optimizer = make_optimizer(hparams.learning_rate)

  use_mesh = hparams.mesh_data * hparams.mesh_model > 1 or process_count > 1
  mesh = None
  if use_mesh:
    mesh_data, mesh_model = hparams.mesh_data, hparams.mesh_model
    if process_count > 1 and mesh_data * mesh_model != len(jax.devices()):
      # multi-process runs need a global mesh covering every device
      mesh_data = len(jax.devices()) // mesh_model
    mesh = mesh_lib.make_mesh(mesh_data, mesh_model)
    batch_sharding = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))

    def put(b):
      # Each process contributes only its local rows; the global array's
      # row space is the concatenation of per-process shards (the sharded
      # equivalent of the reference's single device_put, train.py:190-199).
      global_shape = (b.shape[0] * process_count,) + b.shape[1:]
      return jax.make_array_from_process_local_data(
          batch_sharding, np.ascontiguousarray(b), global_shape)
  else:
    put = jax.numpy.asarray

  from waveglow_tpu.checkpointing.orbax_store import OrbaxCheckpointRef
  if isinstance(checkpoint, OrbaxCheckpointRef) and mesh is None:
    # no mesh to restore onto — resolve the reference through the eager path
    from waveglow_tpu.checkpointing.orbax_store import restore_host
    checkpoint = restore_host(checkpoint.path)

  if isinstance(checkpoint, OrbaxCheckpointRef):
    # Gather-free sharded resume: leaves land straight on the mesh with the
    # training shardings, each process reading only the shard bytes it owns.
    # No host ever materializes a fully-replicated model or Adam state.
    from waveglow_tpu.checkpointing.orbax_store import restore_sharded
    from waveglow_tpu.models.waveglow import abstract_params
    from waveglow_tpu.parallel.sharding import named_shardings, param_pspecs
    iteration = checkpoint.iteration
    # The placement template is sharded on-device zeros built from the
    # abstract skeleton: no host materializes the full model (init_params
    # would allocate ~350 MB of random weights per host at the 12x256
    # config) and each process allocates only its own shard bytes.
    skeleton = abstract_params(config)
    shardings = named_shardings(param_pspecs(skeleton), mesh)
    template = jax.jit(
        lambda: jax.tree_util.tree_map(
            lambda a: jax.numpy.zeros(a.shape, a.dtype), skeleton),
        out_shardings=shardings)()
    params, opt_state, _ = restore_sharded(checkpoint.path, template,
                                           optimizer)
    logger.info("Resumed iteration %d via sharded orbax restore (%s)",
                iteration, checkpoint.path)
  else:
    if checkpoint is not None:
      params = checkpoint.state_dict
      iteration = checkpoint.iteration
    elif warm_model is not None:
      logger.info("Warm-starting from pretrained model state...")
      params = warm_start_params(init_params(config, seed=hparams.seed),
                                 warm_model.state_dict)
      iteration = 0
    else:
      params = init_params(config, seed=hparams.seed)
      iteration = 0
    if mesh is not None:
      # Note: mesh runs compile twice — step 2 recompiles because the
      # donated state returns with jit-chosen output shardings that differ
      # from this explicit placement; from step 3 it is steady-state.
      params = shard_params(params, mesh)
    opt_state = restore_opt_state(
        checkpoint.optimizer if checkpoint is not None else None,
        optimizer, params)

  state = init_state(params, optimizer, iteration, opt_state=opt_state)

  # --- data ---------------------------------------------------------------
  # hparams.batch_size is the GLOBAL batch (reference semantics); each host
  # loads batch_size/process_count rows of its entry shard. batch counts are
  # derived from global sizes so iteration<->epoch arithmetic and the save
  # schedule are process-count-invariant.
  if hparams.batch_size % process_count != 0:
    raise ValueError(
        f"batch_size {hparams.batch_size} must be divisible by the process "
        f"count {process_count}")
  if mesh is not None and hparams.batch_size % mesh.shape[
      mesh_lib.DATA_AXIS] != 0:
    raise ValueError(
        f"batch_size {hparams.batch_size} must be divisible by the data mesh "
        f"axis ({mesh.shape[mesh_lib.DATA_AXIS]})")
  local_batch_size = hparams.batch_size // process_count

  mel_op = MelSTFT(hparams)
  train_ds = SegmentDataset(trainset, hparams, process_index, process_count)
  val_ds = SegmentDataset(valset, hparams, process_index, process_count)
  batch_iterations = (len(trainset) // process_count) // local_batch_size
  if batch_iterations == 0:
    raise RuntimeError("Not enough training data.")
  train_loader = BatchLoader(train_ds, local_batch_size, drop_last=True,
                             num_batches=batch_iterations)
  if use_mesh:
    # sharded batches must be full-size and identical in count on all hosts
    val_batches = (len(valset) // process_count) // local_batch_size
    if val_batches == 0:
      logger.warning(
          "Validation set (%d entries) is smaller than one global batch "
          "(%d) — validation loss will be NaN in mesh mode.",
          len(valset), hparams.batch_size)
    val_loader = BatchLoader(val_ds, local_batch_size, drop_last=True,
                             num_batches=val_batches)
  else:
    val_loader = BatchLoader(val_ds, local_batch_size, drop_last=False)

  train_step = make_train_step(config, hparams, mel_op, optimizer)
  eval_loss = make_eval_loss(config, hparams, mel_op)

  save_settings = SaveIterationSettings(
      epochs=hparams.epochs, batch_iterations=batch_iterations,
      iters_per_checkpoint=hparams.iters_per_checkpoint,
      epochs_per_checkpoint=hparams.epochs_per_checkpoint)

  # --- epoch loop ---------------------------------------------------------
  train_start = time.perf_counter()
  last_t = train_start
  # running sum/count, not a list: a per-step list re-averaged each step is
  # O(n^2) cumulative work and unbounded memory over a pod-scale run
  duration_sum, duration_n = 0.0, 0
  stop = False
  async_saver = None  # created lazily on first async orbax save

  continue_epoch = get_continue_epoch(iteration, batch_iterations)
  try:
    for epoch in range(continue_epoch, hparams.epochs):
      if stop:
        break
      start_batch = get_continue_batch_iteration(iteration, batch_iterations) \
          if epoch == continue_epoch else 0
      for batch in train_loader.epoch(epoch, start_batch):
        state, loss = train_step(state, put(batch))
        loss = float(loss)
        iteration += 1
        if not np.isfinite(loss):
          # Fail loudly instead of training on garbage: the state is already
          # poisoned (NaN grads reached Adam), so the recovery path is
          # continue-train from the last checkpoint, possibly with a lower
          # learning rate.
          metrics.log(event="non_finite_loss", iteration=iteration,
                      epoch=epoch)
          raise FloatingPointError(
              f"Non-finite training loss at iteration {iteration} "
              f"(epoch {epoch + 1}). Restart from the last checkpoint "
              f"with continue-train.")

        now = time.perf_counter()
        step_s = now - last_t
        last_t = now
        duration_sum += step_s
        duration_n += 1
        logger.info(
            "Epoch: %d/%d | Iteration: %d | Train loss: %.6f | "
            "%.2fs/it (avg %.2f) | total %.2fh",
            epoch + 1, hparams.epochs, iteration, loss, step_s,
            duration_sum / duration_n, (now - train_start) / 3600)
        metrics.log(event="train_step", iteration=iteration, epoch=epoch,
                    loss=loss, duration_s=step_s)
        if tboard is not None:
          tboard.log_training(iteration, loss, step_s)

        if check_save_it(epoch, iteration, save_settings):
          if hparams.checkpoint_backend == "orbax":
            # gather-free distributed save: every process writes only its
            # own addressable shards (collective — all processes call this)
            from waveglow_tpu.checkpointing import orbax_store
            if hparams.checkpoint_async:
              # non-blocking: device-to-host fetch now, disk write overlaps
              # the following train steps (barriered before the next save
              # and in the finally below)
              if async_saver is None:
                async_saver = orbax_store.AsyncSaver()
              path = async_saver.save(
                  save_checkpoint_dir, iteration, state["params"],
                  state["opt_state"], hparams)
            else:
              path = orbax_store.save_sharded(
                  save_checkpoint_dir, iteration, state["params"],
                  state["opt_state"], hparams)
            if process_index == 0:
              logger.info("Saved checkpoint %s", path)
          else:
            # from_state gathers any non-addressable shards (a collective
            # in multi-process runs) — every process must build it; only
            # process 0 writes the file.
            ckpt = CheckpointWaveglow.from_state(
                state["params"], state["opt_state"], hparams, iteration)
            if process_index == 0:
              Path(save_checkpoint_dir).mkdir(parents=True, exist_ok=True)
              path = Path(save_checkpoint_dir) / get_checkpoint_filename(
                  iteration)
              ckpt.save(path)
              logger.info("Saved checkpoint %s", path)
          val_loss = validate_model(eval_loss, state["params"], val_loader,
                                    put)
          logger.info("Validation loss %d: %9f", iteration, val_loss)
          metrics.log(event="validation", iteration=iteration, loss=val_loss)
          if tboard is not None:
            tboard.log_validation(iteration, val_loss)
          # don't bill the save+validation wall time to the NEXT step's
          # duration (it corrupted the avg s/it and any derived throughput
          # with a spike after every checkpoint)
          last_t = time.perf_counter()

        if max_iterations is not None and iteration >= max_iterations:
          stop = True
          break
  finally:
    if async_saver is not None:
      # flush the in-flight write so the last checkpoint is complete on
      # disk when train() returns (or when an exception propagates)
      async_saver.close()
    if tboard is not None:
      tboard.close()

  logger.info("Finished training. Total duration: %.2fm",
              (time.time() - complete_start) / 60)
  return _to_host(state)
