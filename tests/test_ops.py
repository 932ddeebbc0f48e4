"""Op-semantics parity tests against torch (CPU) on random weights.

torch here is the ground-truth oracle for conv semantics (padding, dilation,
transposed-conv alignment, weight-norm fusion) — the same semantics the
reference model relies on — NOT reference code.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from waveglow_tpu.models.weightnorm import fuse, init_weightnorm, materialize
from waveglow_tpu.ops import inv1x1
from waveglow_tpu.ops.conv import (conv1x1, conv_transpose1d, dilated_conv,
                                   shift_time)


def _np(x):
  return np.asarray(x)


class TestConv1x1:

  def test_matches_torch_conv1d_k1(self):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 50, 16)).astype(np.float32)   # [B, T, Cin]
    w = rng.standard_normal((16, 32)).astype(np.float32)      # [Cin, Cout]
    b = rng.standard_normal(32).astype(np.float32)

    mine = _np(conv1x1(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))

    xt = torch.from_numpy(x.transpose(0, 2, 1))               # [B, Cin, T]
    wt = torch.from_numpy(w.T[:, :, None])                    # [Cout, Cin, 1]
    ref = torch.nn.functional.conv1d(xt, wt, torch.from_numpy(b))
    np.testing.assert_allclose(mine, ref.numpy().transpose(0, 2, 1), atol=1e-5)


class TestDilatedConv:

  @pytest.mark.parametrize("dilation", [1, 2, 4, 8, 128])
  def test_matches_torch_same_padding(self, dilation):
    rng = np.random.default_rng(dilation)
    t = 300
    x = rng.standard_normal((2, t, 8)).astype(np.float32)
    w = rng.standard_normal((3, 8, 12)).astype(np.float32)    # [K, Cin, Cout]
    b = rng.standard_normal(12).astype(np.float32)

    mine = _np(dilated_conv(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                            dilation=dilation))

    xt = torch.from_numpy(x.transpose(0, 2, 1))
    wt = torch.from_numpy(w.transpose(2, 1, 0).copy())        # [Cout, Cin, K]
    ref = torch.nn.functional.conv1d(
        xt, wt, torch.from_numpy(b), dilation=dilation,
        padding=dilation * (3 - 1) // 2)
    np.testing.assert_allclose(mine, ref.numpy().transpose(0, 2, 1), atol=1e-4)

  def test_shift_time(self):
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 12, 1)
    fwd = _np(shift_time(x, 2))
    assert fwd[0, 0, 0] == 2 and fwd[0, -1, 0] == 0 and fwd[0, -3, 0] == 11
    back = _np(shift_time(x, -2))
    assert back[0, 0, 0] == 0 and back[0, 2, 0] == 0 and back[0, -1, 0] == 9


class TestConvTranspose:

  def test_matches_torch_upsampler_shape(self):
    """The exact mel-upsample config: 80ch, K=1024, stride=256."""
    rng = np.random.default_rng(3)
    t = 11
    x = rng.standard_normal((1, t, 8)).astype(np.float32)
    w = rng.standard_normal((8, 512, 8)).astype(np.float32)   # [Cin, K, Cout]
    b = rng.standard_normal(8).astype(np.float32)

    mine = _np(conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), stride=128))

    xt = torch.from_numpy(x.transpose(0, 2, 1))
    wt = torch.from_numpy(w.transpose(0, 2, 1).copy())        # [Cin, Cout, K]
    ref = torch.nn.functional.conv_transpose1d(
        xt, wt, torch.from_numpy(b), stride=128)
    assert mine.shape == tuple(ref.shape[i] for i in (0, 2, 1))
    np.testing.assert_allclose(mine, ref.numpy().transpose(0, 2, 1), atol=1e-4)


class TestInv1x1:

  def test_orthonormal_init_det_plus_one(self):
    w = inv1x1.init_orthonormal(np.random.default_rng(0), 8)
    assert np.linalg.det(w.astype(np.float64)) == pytest.approx(1.0, abs=1e-5)
    np.testing.assert_allclose(w @ w.T, np.eye(8), atol=1e-5)

  def test_forward_reverse_roundtrip(self):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 8)).astype(np.float32) + 2 * np.eye(8, dtype=np.float32)
    z = rng.standard_normal((2, 20, 8)).astype(np.float32)
    out, log_det = inv1x1.forward(jnp.asarray(z), jnp.asarray(w))
    back = _np(inv1x1.reverse(out, jnp.asarray(inv1x1.inverse_matrix(w))))
    np.testing.assert_allclose(back, z, atol=1e-4)
    expected = 2 * 20 * np.linalg.slogdet(w.astype(np.float64))[1]
    assert float(log_det) == pytest.approx(expected, rel=1e-4)

  def test_forward_matches_torch_conv(self):
    rng = np.random.default_rng(2)
    w = inv1x1.init_orthonormal(rng, 8)
    z = rng.standard_normal((1, 30, 8)).astype(np.float32)
    mine, _ = inv1x1.forward(jnp.asarray(z), jnp.asarray(w))
    zt = torch.from_numpy(z.transpose(0, 2, 1))
    ref = torch.nn.functional.conv1d(zt, torch.from_numpy(w[:, :, None]))
    np.testing.assert_allclose(_np(mine), ref.numpy().transpose(0, 2, 1),
                               atol=1e-5)


class TestWeightNorm:

  def test_materialize_matches_torch_weight_norm(self):
    torch.manual_seed(0)
    conv = torch.nn.Conv1d(16, 32, 3, padding=1)
    wn_conv = torch.nn.utils.parametrizations.weight_norm(conv, name="weight")
    g = wn_conv.parametrizations.weight.original0.detach().numpy()  # [Cout,1,1]
    v = wn_conv.parametrizations.weight.original1.detach().numpy()  # [Cout,Cin,K]
    effective = wn_conv.weight.detach().numpy()

    # my layout: v [K, Cin, Cout], g [Cout]
    mine = {"g": g.reshape(-1), "v": v.transpose(2, 1, 0).copy()}
    w = _np(materialize(mine))
    np.testing.assert_allclose(w, effective.transpose(2, 1, 0), atol=1e-6)
    fused = fuse(mine)["w"]
    np.testing.assert_allclose(fused, effective.transpose(2, 1, 0), atol=1e-6)

  def test_init_weightnorm_identity(self):
    rng = np.random.default_rng(5)
    w = rng.standard_normal((3, 8, 16)).astype(np.float32)
    wn = init_weightnorm(w)
    np.testing.assert_allclose(_np(materialize(wn)), w, atol=1e-6)
