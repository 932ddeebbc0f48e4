"""WaveGlow normalizing flow: squeeze, 12 coupling steps, early outputs.

Behavioral contract follows reference model.py:141-297:
  * mel is upsampled by a ConvTranspose (K=1024, stride 256), trimmed (to the
    audio length in training, by ``K - stride`` in synthesis), and unfolded
    into groups of ``n_group`` samples;
  * each flow applies an invertible 1x1 channel mix then an affine coupling
    whose (log_s, b) come from a WN stack conditioned on the unfolded mel;
  * every ``n_early_every`` flows, ``n_early_size`` channels are emitted to z;
  * synthesis runs the flows in reverse from Gaussian noise.

TPU-native realization (not a port):
  * all tensors are channels-last ``[B, T_groups, C]``; squeeze/unsqueeze are
    free reshapes instead of ``unfold``/``permute`` chains;
  * the model is a pure function over a params pytree; training params carry
    weight-norm (g, v) leaves, inference params are host-fused
    (:func:`fuse_for_inference`) with precomputed 1x1 inverses;
  * synthesis noise is injectable (``noise=[...]``) so the torch-RNG golden
    oracle can be reproduced exactly, while the production path draws from
    ``jax.random`` (reference samples via torch's global RNG, model.py:243).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveglow_tpu.hparams import HParams
from waveglow_tpu.models import weightnorm
from waveglow_tpu.models.wn import (abstract_wn_params, init_wn_params,
                                    wn_forward)
from waveglow_tpu.ops import inv1x1
from waveglow_tpu.ops.conv import conv_transpose1d

UPSAMPLE_KERNEL = 1024
UPSAMPLE_STRIDE = 256


@dataclass(frozen=True)
class WaveGlowConfig:
  """Static model architecture derived from HParams."""
  n_mel_channels: int = 80
  n_flows: int = 12
  n_group: int = 8
  n_early_every: int = 4
  n_early_size: int = 2
  n_layers: int = 8
  n_channels: int = 256
  kernel_size: int = 3

  @classmethod
  def from_hparams(cls, hp: HParams) -> "WaveGlowConfig":
    return cls(n_mel_channels=hp.n_mel_channels, n_flows=hp.n_flows,
               n_group=hp.n_group, n_early_every=hp.n_early_every,
               n_early_size=hp.n_early_size, n_layers=hp.n_layers,
               n_channels=hp.n_channels, kernel_size=hp.kernel_size)

  def flow_channel_counts(self) -> List[int]:
    """Audio channel count entering each flow (reference model.py:160-176)."""
    counts = []
    n_remaining = self.n_group
    for k in range(self.n_flows):
      if k % self.n_early_every == 0 and k > 0:
        n_remaining -= self.n_early_size
      counts.append(n_remaining)
    return counts

  @property
  def n_remaining_channels(self) -> int:
    return self.flow_channel_counts()[-1]


def init_params(config: WaveGlowConfig, seed: int = 1234,
                weight_norm: bool = True) -> Dict:
  """Random parameter pytree (numpy float32 leaves)."""
  rng = np.random.default_rng(seed)
  cin = config.n_mel_channels

  def uniform(shape, fan_in):
    bound = 1.0 / np.sqrt(fan_in)
    return rng.uniform(-bound, bound, size=shape).astype(np.float32)

  params = {
      "upsample": {
          "w": uniform((cin, UPSAMPLE_KERNEL, cin), cin * UPSAMPLE_KERNEL),
          "b": uniform((cin,), cin * UPSAMPLE_KERNEL),
      },
      "flows": [],
  }
  for channels in config.flow_channel_counts():
    n_half = channels // 2
    flow = {
        "inv1x1": {"w": inv1x1.init_orthonormal(rng, channels)},
        "wn": init_wn_params(
            rng, n_in_channels=n_half,
            n_mel_channels=config.n_mel_channels * config.n_group,
            n_layers=config.n_layers, n_channels=config.n_channels,
            kernel_size=config.kernel_size, weight_norm=weight_norm),
    }
    params["flows"].append(flow)
  return params


def abstract_params(config: WaveGlowConfig,
                    weight_norm: bool = True) -> Dict:
  """Shape/dtype skeleton of :func:`init_params` — no host allocation.

  The sharded-resume path (training/loop.py) builds its placement template
  from this instead of materializing the full model per host (~350 MB of
  random weights for the 12x256 config, plus the RNG work). Kept in lockstep
  with ``init_params`` by
  tests/test_model.py::test_abstract_params_matches_init.
  """
  cin = config.n_mel_channels

  def leaf(*shape):
    return jax.ShapeDtypeStruct(shape, np.float32)

  params = {
      "upsample": {
          "w": leaf(cin, UPSAMPLE_KERNEL, cin),
          "b": leaf(cin),
      },
      "flows": [],
  }
  for channels in config.flow_channel_counts():
    params["flows"].append({
        "inv1x1": {"w": leaf(channels, channels)},
        "wn": abstract_wn_params(
            n_in_channels=channels // 2,
            n_mel_channels=config.n_mel_channels * config.n_group,
            n_layers=config.n_layers, n_channels=config.n_channels,
            kernel_size=config.kernel_size, weight_norm=weight_norm),
    })
  return params


def fuse_for_inference(params: Dict) -> Dict:
  """Host-side weight fusion for synthesis.

  Folds weight-norm (g, v) -> w (reference remove_weightnorm,
  model.py:276-297) and precomputes each 1x1 inverse (the reference caches it
  lazily on first reverse call, model.py:52-58).
  """
  fused = {"upsample": {k: np.asarray(v) for k, v in params["upsample"].items()},
           "flows": []}
  for flow in params["flows"]:
    w = np.asarray(flow["inv1x1"]["w"], dtype=np.float32)
    wn = flow["wn"]
    fused_wn = {
        "start": weightnorm.fuse(wn["start"]),
        "cond": weightnorm.fuse(wn["cond"]),
        "in_layers": [weightnorm.fuse(c) for c in wn["in_layers"]],
        "res_skip": [weightnorm.fuse(c) for c in wn["res_skip"]],
        "end": {k: np.asarray(v) for k, v in wn["end"].items()},
    }
    fused["flows"].append({
        "inv1x1": {"w": w, "w_inv": inv1x1.inverse_matrix(w)},
        "wn": fused_wn,
    })
  return fused


def upsample_mel(params: Dict, spect: jnp.ndarray,
                 compute_dtype=None) -> jnp.ndarray:
  """[B, n_mels, frames] -> [B, T_samples, n_mels] via transposed conv."""
  x = spect.transpose(0, 2, 1)  # channels-last
  return conv_transpose1d(x, params["upsample"]["w"], params["upsample"]["b"],
                          stride=UPSAMPLE_STRIDE, compute_dtype=compute_dtype)


def unfold_groups(upsampled: jnp.ndarray, n_group: int) -> jnp.ndarray:
  """[B, T, n_mels] -> [B, T/n_group, n_mels*n_group].

  Channel ordering matches the reference's unfold/permute chain
  (model.py:191-193): index = mel_channel * n_group + offset_within_group —
  required so imported cond-layer weights line up.
  """
  batch, t, n_mels = upsampled.shape
  grouped = upsampled.reshape(batch, t // n_group, n_group, n_mels)
  return grouped.transpose(0, 1, 3, 2).reshape(batch, t // n_group,
                                               n_mels * n_group)


def flow_groups(config: WaveGlowConfig) -> List[Tuple[int, int, int]]:
  """Consecutive same-shape flow runs: [(start_flow, n_flows, channels)].

  Within a group the audio channel count (and so every WN weight shape) is
  constant, which is what lets a ``lax.scan`` trace one flow body per group
  instead of unrolling all 12 (4x smaller HLO, 3-4x faster compiles).
  Group boundaries coincide with the early-output emissions.
  """
  counts = config.flow_channel_counts()
  groups = []
  start = 0
  for k in range(1, config.n_flows + 1):
    if k == config.n_flows or counts[k] != counts[k - 1] or (
        k % config.n_early_every == 0 and k > 0):
      groups.append((start, k - start, counts[start]))
      start = k
  return groups


def _stack_flows(flows: List[Dict]) -> Dict:
  """Stack per-flow param pytrees leaf-wise for scanning."""
  return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *flows)


def forward(params: Dict, config: WaveGlowConfig, spect: jnp.ndarray,
            audio: jnp.ndarray, compute_dtype=None, remat: bool = False,
            scan_flows: bool = False, use_pallas: bool = False,
            remat_scope: str = "flow"
            ) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
  """Training-direction flow (reference model.py:178-221).

  Args:
    spect: [B, n_mels, frames] mel (reference layout).
    audio: [B, T] waveform; T must be a multiple of n_group.
    scan_flows: trace one flow body per same-shape group via lax.scan
      instead of unrolling all flows (identical numerics, much faster
      compiles).
    use_pallas: run WN layers through the fused Pallas kernel
      (differentiable — wn_layer_trainable carries a custom VJP; the
      kernel wrapper handles ragged segment lengths itself).
    remat_scope: what ``remat=True`` rematerializes — "flow" checkpoints the
      whole flow step (coupling + 1x1 + WN), "wn" only the WN body (the
      coupling/1x1 residuals are cheap to keep and their recompute chains
      through slogdet).
  Returns:
    (z [B, T/n_group, n_group], log_s_list, log_det_w_list).
  """
  if use_pallas and config.kernel_size != 3:
    use_pallas = False  # the kernel only implements the 3-tap conv
  assert remat_scope in ("flow", "wn"), remat_scope
  batch, t_audio = audio.shape
  up = upsample_mel(params, spect, compute_dtype)
  assert up.shape[1] >= t_audio, "upsampled mel shorter than audio"
  up = up[:, :t_audio, :]
  spect_g = unfold_groups(up, config.n_group)          # [B, T', 640]
  audio_g = audio.reshape(batch, t_audio // config.n_group, config.n_group)

  output_chunks = []
  log_s_list: List[jnp.ndarray] = []
  log_det_w_list: List[jnp.ndarray] = []

  def wn_call(wn_params, audio_0):
    return wn_forward(wn_params, audio_0, spect_g, config.n_channels,
                      config.n_layers, config.kernel_size,
                      compute_dtype=compute_dtype, use_pallas=use_pallas)

  if remat and remat_scope == "wn":
    wn_call = jax.checkpoint(wn_call)

  def flow_step(flow, audio_g, channels):
    audio_g, log_det_w = inv1x1.forward(audio_g, flow["inv1x1"]["w"])
    n_half = channels // 2
    audio_0 = audio_g[..., :n_half]
    audio_1 = audio_g[..., n_half:]
    wn_out = wn_call(flow["wn"], audio_0)
    b = wn_out[..., :n_half]
    log_s = wn_out[..., n_half:]
    audio_1 = jnp.exp(log_s) * audio_1 + b
    return jnp.concatenate([audio_0, audio_1], axis=-1), log_s, log_det_w

  if remat and remat_scope == "flow":
    flow_step = jax.checkpoint(flow_step, static_argnums=(2,))

  if scan_flows:
    for start, length, channels in flow_groups(config):
      if start % config.n_early_every == 0 and start > 0:
        output_chunks.append(audio_g[..., :config.n_early_size])
        audio_g = audio_g[..., config.n_early_size:]
      stacked = _stack_flows(params["flows"][start:start + length])

      def body(carry, flow, _channels=channels):
        out, log_s, log_det_w = flow_step(flow, carry, _channels)
        return out, (jnp.sum(log_s), log_s, log_det_w)

      audio_g, (_, log_s_stack, log_det_stack) = jax.lax.scan(
          body, audio_g, stacked)
      log_s_list.extend(log_s_stack[i] for i in range(length))
      log_det_w_list.extend(log_det_stack[i] for i in range(length))
  else:
    channel_counts = config.flow_channel_counts()
    for k in range(config.n_flows):
      if k % config.n_early_every == 0 and k > 0:
        output_chunks.append(audio_g[..., :config.n_early_size])
        audio_g = audio_g[..., config.n_early_size:]
      audio_g, log_s, log_det_w = flow_step(params["flows"][k], audio_g,
                                            channel_counts[k])
      log_s_list.append(log_s)
      log_det_w_list.append(log_det_w)

  output_chunks.append(audio_g)
  z = jnp.concatenate(output_chunks, axis=-1)
  return z, log_s_list, log_det_w_list


def block_noise(key: jax.Array, config: WaveGlowConfig, batch: int,
                start_frame, n_frames: int) -> List[jnp.ndarray]:
  """Position-keyed standard-normal synthesis noise for mel frames
  [start_frame, start_frame + n_frames).

  Each (noise tensor, absolute frame) pair draws from its own
  ``fold_in`` key, so any window covering a frame draws the same values —
  this is what makes chunked synthesis (inference/streaming.py) exactly
  equal to one-call synthesis for the same key. ``start_frame`` may be a
  traced value.
  """
  groups_per_frame = UPSAMPLE_STRIDE // config.n_group
  shapes = infer_noise_shapes(config, batch, n_frames * groups_per_frame)
  frames = start_frame + jnp.arange(n_frames)
  noise = []
  for i, (b, _, ch) in enumerate(shapes):
    key_i = jax.random.fold_in(key, i)

    def per_frame(f, _key_i=key_i, _b=b, _ch=ch):
      return jax.random.normal(jax.random.fold_in(_key_i, f),
                               (_b, groups_per_frame, _ch), dtype=jnp.float32)

    blocks = jax.vmap(per_frame, out_axes=1)(frames)  # [B, W, gpf, ch]
    noise.append(blocks.reshape(b, n_frames * groups_per_frame, ch))
  return noise


def infer_noise_shapes(config: WaveGlowConfig, batch: int,
                       n_groups: int) -> List[Tuple[int, int, int]]:
  """Shapes of the noise tensors consumed by :func:`infer`, in draw order.

  Draw order matches the reference: the main z first (model.py:239-243), then
  one early-noise block per ``k % n_early_every == 0, k > 0`` flow as the
  reversed loop passes it (k descending; model.py:260-271). Shapes are
  channels-last.
  """
  shapes = [(batch, n_groups, config.n_remaining_channels)]
  for k in reversed(range(config.n_flows)):
    if k % config.n_early_every == 0 and k > 0:
      shapes.append((batch, n_groups, config.n_early_size))
  return shapes


def infer(params: Dict, config: WaveGlowConfig, spect: jnp.ndarray,
          sigma: float = 1.0, noise: Optional[Sequence[jnp.ndarray]] = None,
          rng: Optional[jax.Array] = None, compute_dtype=None,
          use_pallas: bool = False, scan_flows: bool = False,
          true_frames=None) -> jnp.ndarray:
  """Synthesis-direction flow (reference model.py:223-274).

  Args:
    params: fused params (from :func:`fuse_for_inference`).
    spect: [B, n_mels, frames] mel.
    noise: optional injected standard-normal tensors (see
      :func:`infer_noise_shapes`) — used for torch-RNG parity.
    rng: jax PRNG key used when ``noise`` is None.
    true_frames: when ``spect`` carries bucket-pad frames beyond the real
      utterance, the count of REAL frames (traced scalar or per-batch [B]
      vector). WN residual rows past it are zero-masked so samples inside
      it come out bit-identical to an unpadded call (position-keyed noise
      already draws identically there) — padded serving is then exact, not
      approximate. None = no masking (the pre-round-4 padding semantics:
      trailing receptive-field samples see silence-pad conditioning).
  Returns:
    waveform [B, T_samples].
  """
  if use_pallas and config.kernel_size != 3:
    # wn_forward only dispatches to the kernel for kernel_size 3; resolve
    # the silent XLA fallback BEFORE the guard below, or a config that
    # never runs the kernel would still be denied bucket-exact serving
    use_pallas = False
  if true_frames is not None and use_pallas:
    raise ValueError("true_frames masking is XLA-path only; the Pallas "
                     "kernel's valid_t must be static (disable use_pallas "
                     "for bucket-exact serving)")
  up = upsample_mel(params, spect, compute_dtype)
  time_cutoff = UPSAMPLE_KERNEL - UPSAMPLE_STRIDE
  up = up[:, :-time_cutoff, :]
  batch = up.shape[0]
  n_groups = up.shape[1] // config.n_group
  spect_g = unfold_groups(up[:, :n_groups * config.n_group, :],
                          config.n_group)

  shapes = infer_noise_shapes(config, batch, n_groups)
  if noise is None:
    if rng is None:
      rng = jax.random.PRNGKey(0)
    # Position-keyed per-frame noise (NOT one normal() per tensor): the same
    # key then yields the same values at the same absolute frame regardless
    # of windowing, so chunked synthesis == one-call synthesis per seed.
    groups_per_frame = UPSAMPLE_STRIDE // config.n_group
    assert n_groups % groups_per_frame == 0, (n_groups, groups_per_frame)
    noise = block_noise(rng, config, batch, 0, n_groups // groups_per_frame)
  else:
    assert len(noise) == len(shapes), (
        f"expected {len(shapes)} noise tensors, got {len(noise)}")
    for n, s in zip(noise, shapes):
      assert tuple(n.shape) == s, f"noise shape {n.shape} != expected {s}"

  valid_t = None
  if true_frames is not None:
    groups_per_frame = UPSAMPLE_STRIDE // config.n_group
    valid_t = jnp.asarray(true_frames) * groups_per_frame
  if use_pallas:
    # The fused WN kernel wants T as a multiple of its tile: pad the time
    # axis ONCE here (per-layer ragged-edge padding costs more than the
    # kernel saves). Pad rows are garbage the kernel masks out of the
    # residual stream (valid_t); they are sliced off before un-squeezing.
    from waveglow_tpu.kernels.wn_layer import DEFAULT_TILE
    t_pad = (-n_groups) % DEFAULT_TILE
    if t_pad:
      valid_t = n_groups
      spect_g = jnp.pad(spect_g, ((0, 0), (0, t_pad), (0, 0)))
      noise = [jnp.pad(z, ((0, 0), (0, t_pad), (0, 0))) for z in noise]

  audio_g = sigma * noise[0]
  noise_idx = 1

  def reverse_flow(flow, audio_g, channels):
    n_half = channels // 2
    audio_0 = audio_g[..., :n_half]
    audio_1 = audio_g[..., n_half:]
    wn_out = wn_forward(flow["wn"], audio_0, spect_g,
                        config.n_channels, config.n_layers,
                        config.kernel_size, compute_dtype=compute_dtype,
                        use_pallas=use_pallas, valid_t=valid_t)
    b = wn_out[..., :n_half]
    s = wn_out[..., n_half:]
    audio_1 = (audio_1 - b) * jnp.exp(-s)
    audio_g = jnp.concatenate([audio_0, audio_1], axis=-1)
    return inv1x1.reverse(audio_g, flow["inv1x1"]["w_inv"])

  if scan_flows:
    for start, length, channels in reversed(flow_groups(config)):
      stacked = _stack_flows(params["flows"][start:start + length])

      def body(carry, flow, _channels=channels):
        return reverse_flow(flow, carry, _channels), None

      audio_g, _ = jax.lax.scan(body, audio_g, stacked, reverse=True)
      if start % config.n_early_every == 0 and start > 0:
        audio_g = jnp.concatenate([sigma * noise[noise_idx], audio_g],
                                  axis=-1)
        noise_idx += 1
  else:
    channel_counts = config.flow_channel_counts()
    for k in reversed(range(config.n_flows)):
      audio_g = reverse_flow(params["flows"][k], audio_g, channel_counts[k])
      if k % config.n_early_every == 0 and k > 0:
        audio_g = jnp.concatenate([sigma * noise[noise_idx], audio_g],
                                  axis=-1)
        noise_idx += 1

  audio_g = audio_g[:, :n_groups, :]  # drop kernel time padding (if any)
  return audio_g.reshape(batch, n_groups * config.n_group)
