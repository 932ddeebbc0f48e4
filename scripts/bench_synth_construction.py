"""Measure Synthesizer construction cost on the TPU.

Round 1's Denoiser ran an UNJITTED full infer for bias capture — op-by-op
dispatch over the tunnel plus an extra whole-model trace per Synthesizer.
Round 2 jits the capture and caches it per (model config, stft config), so
a second same-config Synthesizer pays neither trace nor compile.

Usage: python scripts/bench_synth_construction.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
  import jax

  from waveglow_tpu.checkpointing.store import CheckpointWaveglow
  from waveglow_tpu.hparams import HParams
  from waveglow_tpu.inference.synthesizer import Synthesizer
  from waveglow_tpu.models.waveglow import WaveGlowConfig, init_params

  hp = HParams()
  config = WaveGlowConfig.from_hparams(hp)
  params = init_params(config, seed=0)
  from dataclasses import asdict
  ckpt = CheckpointWaveglow(state_dict=params, optimizer=None,
                            learning_rate=hp.learning_rate, iteration=0,
                            hparams=asdict(hp))

  t0 = time.perf_counter()
  synth = Synthesizer(ckpt)
  t_first = time.perf_counter() - t0
  print(f"first Synthesizer construction:  {t_first:7.2f} s "
        f"(params upload + jitted bias capture compile)")

  t0 = time.perf_counter()
  synth2 = Synthesizer(ckpt)
  t_second = time.perf_counter() - t0
  print(f"second (same config):            {t_second:7.2f} s "
        f"(capture program cache hit)")
  assert np.allclose(synth.denoiser.bias_spec, synth2.denoiser.bias_spec)


if __name__ == "__main__":
  main()
