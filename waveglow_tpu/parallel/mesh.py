"""Device-mesh construction and multi-host runtime initialization.

The TPU-native replacement for a distributed communication backend (the
reference has none — only commented fossils of NVIDIA's NCCL trainer,
reference train.py:141-146, utils.py:347-350): process groups come from
``jax.distributed.initialize``, collectives from XLA over ICI/DCN, and all
placement is expressed as a ``jax.sharding.Mesh`` with named axes:

  data  - batch (data-parallel gradient all-reduce)
  model - WN hidden-channel tensor parallelism
  time  - sequence/context sharding for long-utterance synthesis

Mesh construction is TOPOLOGY-AWARE (SURVEY §2.9: "mesh over ICI
(intra-slice) / DCN (inter-slice)"): device assignment is delegated to
``jax.experimental.mesh_utils`` so axis locality holds by construction,
not by hoping ``jax.devices()`` order matches the interconnect —

  * single slice: ``create_device_mesh`` maps the (data, model) grid onto
    the physical ICI torus, so a model-parallel group (the minor axis) is
    physically adjacent chips and its per-WN-layer psums ride ICI;
  * multiple slices / hosts without ICI between them:
    ``create_hybrid_device_mesh`` puts the DATA axis across the DCN
    boundary — one bundled gradient all-reduce per step tolerates DCN
    latency (test_hlo_scaling pins that bundling) — and keeps the MODEL
    axis inside a slice where per-layer collectives need ICI;
  * CPU simulations and partial-device subsets fall back to an
    order-preserving reshape (there is no physical topology to exploit;
    the fallback keeps virtual-mesh tests and partial meshes working).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
TIME_AXIS = "time"

logger = logging.getLogger(__name__)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
  """Join the multi-host process group; no-op for single-process runs.

  On Cloud TPU pods the arguments are auto-detected from the metadata server;
  pass them explicitly elsewhere.
  """
  if num_processes is not None and num_processes > 1:
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
  elif coordinator_address is not None:
    jax.distributed.initialize(coordinator_address=coordinator_address)


def _granule(device) -> int:
  """Interconnect island a device belongs to: the TPU slice when the
  runtime reports one (``slice_index``), else the host process — devices
  within a granule share fast interconnect (ICI); crossing granules means
  DCN/host networking."""
  s = getattr(device, "slice_index", None)
  return s if s is not None else device.process_index


def _topology_grid(shape: Tuple[int, ...], devices) -> np.ndarray:
  """Assign ``devices`` to a ``shape`` grid so the LAST axis is the most
  local (physically adjacent chips) and the FIRST axis crosses granule
  (slice/host) boundaries when there are several. Falls back to an
  order-preserving reshape when no topology information applies."""
  from jax.experimental import mesh_utils

  granules = sorted({_granule(d) for d in devices})
  try:
    if len(granules) > 1:
      per_granule = len(devices) // len(granules)
      if (shape[0] % len(granules) != 0
          or len(devices) != per_granule * len(granules)):
        raise ValueError(
            f"axis 0 ({shape[0]}) not divisible by {len(granules)} "
            "slices/hosts")
      # data across DCN, everything else within a granule's ICI
      per = (shape[0] // len(granules),) + tuple(shape[1:])
      dcn = (len(granules),) + (1,) * (len(shape) - 1)
      # granule = slice on multi-slice TPU; host process otherwise (CPU
      # multihost simulations, single-slice-per-host pods)
      by_process = all(getattr(d, "slice_index", None) is None
                       for d in devices)
      return mesh_utils.create_hybrid_device_mesh(
          per, dcn, devices, process_is_granule=by_process)
    return mesh_utils.create_device_mesh(shape, devices)
  except Exception as e:  # noqa: BLE001 — no topology (CPU, device subsets)
    # on a single granule the reshape loses nothing; across granules it may
    # place a model group astride the DCN boundary — tell the operator
    log = logger.warning if len(granules) > 1 else logger.debug
    log("topology-aware mesh unavailable (%s); using order-preserving "
        "reshape over %d slices/hosts", e, len(granules))
    return np.array(devices).reshape(shape)


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """Build a (data, model) mesh over the available devices.

  ``data * model`` must divide the device count; remaining devices are left
  unused. Device assignment is topology-aware (module docstring): the model
  axis is placed on physically adjacent chips (ICI) and, on multi-slice /
  multi-host platforms, the data axis spans the DCN boundary — so
  model-parallel psums ride ICI by construction and only the once-per-step
  bundled gradient all-reduce crosses DCN.
  """
  devices = list(devices if devices is not None else jax.devices())
  n = data * model
  if n > len(devices):
    raise ValueError(f"mesh {data}x{model} needs {n} devices, "
                     f"have {len(devices)}")
  grid = _topology_grid((data, model), devices[:n])
  return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_time_mesh(time: int = 1,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """1-D mesh for time-sharded (context-parallel) synthesis. Topology-aware
  like :func:`make_mesh`: neighboring time shards land on ICI-adjacent
  chips, which is where the conv-halo ``ppermute`` traffic flows."""
  devices = list(devices if devices is not None else jax.devices())
  if time > len(devices):
    raise ValueError(f"time mesh needs {time} devices, have {len(devices)}")
  return Mesh(_topology_grid((time,), devices[:time]), (TIME_AXIS,))
