"""waveglow_tpu: a TPU-native (JAX/XLA/Pallas) WaveGlow vocoder framework.

A from-scratch re-design of the capabilities of stefantaubert/waveglow
(reference mounted at /root/reference) for TPU hardware: channels-last
MXU-shaped matmul convolutions, pure-function flow model over a params
pytree, jit-compiled training and synthesis, device-mesh data/tensor/time
parallelism, and a CLI with the same six subcommands.

Public API surface (mirrors reference src/waveglow/__init__.py exports):
  CheckpointWaveglow  - checkpoint container with save/load
  Synthesizer         - mel -> waveform inference runtime
  InferenceResult     - per-utterance synthesis result
  MelSTFT             - wav -> mel pipeline (reference: TacotronSTFT)
  HParams             - layered hyperparameters
"""

__version__ = "0.5.0"

from waveglow_tpu.hparams import HParams, TSTFTHParams  # noqa: F401
