"""Test-only harness: import the actual reference implementation as oracle.

The reference at /root/reference is pure torch and runs on CPU; its only
missing dependencies in this environment are librosa and fastdtw, which are
stubbed here (librosa.filters.mel is backed by this framework's own slaney
filterbank — the filterbank itself is validated analytically in test_dsp).

Used exclusively by parity tests; the framework itself never imports this.
"""

import os
import sys
import types

import numpy as np

REFERENCE_SRC = "/root/reference/src"

# The real-speech audio fixture ships with this repo (the reference packages
# the same file via MANIFEST.in, /root/reference/MANIFEST.in:1) so the test
# suite is self-contained; the reference copy is only a fallback.
_HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE_WAV = os.path.join(_HERE, "fixtures", "audio.wav")
if not os.path.isfile(FIXTURE_WAV):  # pragma: no cover - fallback path
  FIXTURE_WAV = "/root/reference/res/audio.wav"


def reference_available() -> bool:
  return os.path.isdir(REFERENCE_SRC)


def skip_unless_reference():
  """Module-level skip for oracle tests when /root/reference is absent."""
  if not reference_available():
    import pytest
    pytest.skip("reference implementation not present at /root/reference",
                allow_module_level=True)


def _install_stubs():
  if "librosa" in sys.modules:
    return

  from waveglow_tpu.dsp.mel_filters import mel_filterbank

  librosa = types.ModuleType("librosa")
  filters = types.ModuleType("librosa.filters")
  util = types.ModuleType("librosa.util")

  def mel(*, sr, n_fft, n_mels, fmin, fmax):
    return mel_filterbank(sr, n_fft, n_mels, fmin, fmax).astype(np.float32)

  def normalize(data, norm=None, **kwargs):
    assert norm is None, "oracle stub only supports norm=None"
    return data

  def pad_center(data, size, **kwargs):
    n = len(data)
    lpad = (size - n) // 2
    return np.pad(data, (lpad, size - n - lpad))

  def tiny(x):
    dtype = np.asarray(x).dtype
    if np.issubdtype(dtype, np.floating):
      return np.finfo(dtype).tiny
    return np.finfo(np.float32).tiny

  filters.mel = mel
  util.normalize = normalize
  util.pad_center = pad_center
  util.tiny = tiny
  librosa.filters = filters
  librosa.util = util
  sys.modules["librosa"] = librosa
  sys.modules["librosa.filters"] = filters
  sys.modules["librosa.util"] = util

  fastdtw_pkg = types.ModuleType("fastdtw")
  fastdtw_mod = types.ModuleType("fastdtw.fastdtw")

  def fastdtw(*args, **kwargs):
    raise NotImplementedError("fastdtw is not available in the test env")

  fastdtw_mod.fastdtw = fastdtw
  fastdtw_pkg.fastdtw = fastdtw_mod
  sys.modules["fastdtw"] = fastdtw_pkg
  sys.modules["fastdtw.fastdtw"] = fastdtw_mod

  def _unavailable(*args, **kwargs):
    raise NotImplementedError("not available in the test env")

  skimage = types.ModuleType("skimage")
  sk_metrics = types.ModuleType("skimage.metrics")
  sk_metrics.structural_similarity = _unavailable
  skimage.metrics = sk_metrics
  sys.modules["skimage"] = skimage
  sys.modules["skimage.metrics"] = sk_metrics

  mcd = types.ModuleType("mel_cepstral_distance")
  mcd.get_metrics_mels = _unavailable
  sys.modules["mel_cepstral_distance"] = mcd

  imageio = types.ModuleType("imageio")
  imageio.imread = _unavailable
  imageio.imsave = _unavailable
  sys.modules.setdefault("imageio", imageio)

  for name in ("wget", "gdown"):
    mod = types.ModuleType(name)
    mod.download = _unavailable
    sys.modules.setdefault(name, mod)


def import_reference():
  """Returns the reference ``waveglow`` package (imported once).

  Skips the calling test module cleanly when the reference checkout is
  absent (the suite must be self-contained apart from oracle tests).
  """
  skip_unless_reference()
  _install_stubs()
  if REFERENCE_SRC not in sys.path:
    sys.path.insert(0, REFERENCE_SRC)
  import waveglow  # noqa: F401
  import waveglow.model
  import waveglow.stft
  import waveglow.taco_stft
  import waveglow.denoiser
  import waveglow.train
  return waveglow


def tiny_ref_hparams(**overrides):
  """A small reference HParams exercising early outputs (5 flows)."""
  ref = import_reference()
  defaults = dict(n_flows=5, n_early_every=2, n_early_size=2,
                  n_layers=2, n_channels=32)
  defaults.update(overrides)
  return ref.model.HParams(**defaults)


def torch_infer_noise(config, batch, n_groups, seed):
  """Replicate the reference's torch-RNG noise draws for injection.

  The reference seeds all global RNGs (utils.py:221-231: random, numpy,
  torch.manual_seed) then draws FloatTensor(...).normal_() in model.infer
  (model.py:239-271). Reproducing the same draw order with the same
  generator yields bit-identical noise; tensors are transposed to the
  native channels-last layout.
  """
  import torch
  torch.manual_seed(seed)
  noise = []
  z = torch.empty(batch, config.n_remaining_channels, n_groups).normal_()
  noise.append(z.numpy().transpose(0, 2, 1).copy())
  for k in reversed(range(config.n_flows)):
    if k % config.n_early_every == 0 and k > 0:
      z = torch.empty(batch, config.n_early_size, n_groups).normal_()
      noise.append(z.numpy().transpose(0, 2, 1).copy())
  return noise
