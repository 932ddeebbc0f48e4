"""Device-mesh construction and multi-host runtime initialization.

The TPU-native replacement for a distributed communication backend (the
reference has none — only commented fossils of NVIDIA's NCCL trainer,
reference train.py:141-146, utils.py:347-350): process groups come from
``jax.distributed.initialize``, collectives from XLA over ICI/DCN, and all
placement is expressed as a ``jax.sharding.Mesh`` with named axes:

  data  - batch (data-parallel gradient all-reduce)
  model - WN hidden-channel tensor parallelism
  time  - sequence/context sharding for long-utterance synthesis
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
TIME_AXIS = "time"


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


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """Build a (data, model) mesh over the available devices.

  ``data * model`` must divide the device count; remaining devices are left
  unused. Device order follows jax's default (ICI-contiguous) ordering so
  model-parallel groups sit on adjacent chips and collectives ride ICI.
  """
  devices = list(devices if devices is not None else jax.devices())
  n = data * model
  if n > len(devices):
    raise ValueError(f"mesh {data}x{model} needs {n} devices, "
                     f"have {len(devices)}")
  grid = np.array(devices[:n]).reshape(data, model)
  return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_time_mesh(time: int = 1,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """1-D mesh for time-sharded (context-parallel) synthesis."""
  devices = list(devices if devices is not None else jax.devices())
  if time > len(devices):
    raise ValueError(f"time mesh needs {time} devices, have {len(devices)}")
  return Mesh(np.array(devices[:time]), (TIME_AXIS,))
