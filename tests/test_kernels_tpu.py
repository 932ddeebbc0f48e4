"""Repeatable hardware gate for the real (Mosaic-compiled) Pallas kernel.

Everything in test_kernels.py runs the kernel in INTERPRET mode on CPU; the
actual Mosaic lowering only executes on a real TPU and costs minutes of
remote compiles, so this gate is opt-in:

    RUN_TPU_TESTS=1 python -m pytest tests/test_kernels_tpu.py -q

It spawns a subprocess (the session conftest pins the test process to the
CPU backend) that runs one fused WN layer per dilation class on hardware and
asserts bit-level agreement with the XLA body — the same claim recorded in
docs/PERFORMANCE.md, now re-checkable with one command. `bench.py --pallas`
is the throughput half of the gate.
"""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform == "tpu", jax.devices()
    from waveglow_tpu.kernels.wn_layer import wn_layer_fused
    from waveglow_tpu.ops.conv import shift_time

    def xla_layer(x, cond_i, w_in, b_in, w_rs, b_rs, dilation):
      c = x.shape[-1]
      pre = None
      for tap in range(3):
        term = jnp.dot(shift_time(x, (tap - 1) * dilation), w_in[tap],
                       preferred_element_type=jnp.float32)
        pre = term if pre is None else pre + term
      pre = pre + b_in.reshape(-1)
      gates = pre + cond_i.reshape(cond_i.shape[0], cond_i.shape[1], -1)
      acts = (jnp.tanh(gates[..., :c])
              * jax.nn.sigmoid(gates[..., c:])).astype(x.dtype)
      rs = jnp.dot(acts, w_rs, preferred_element_type=jnp.float32)
      rs = rs + b_rs.reshape(-1)
      if w_rs.shape[-1] == c:
        return x, rs
      return x + rs[..., :c], rs[..., c:]

    rng = np.random.default_rng(0)
    c, t, batch = 256, 4096, 2
    for dilation in (1, 8, 128):          # pre-shifted + aligned DMA paths
      x = jnp.asarray(rng.standard_normal((batch, t, c)) * 0.1,
                      dtype=jnp.bfloat16)
      cond = jnp.asarray(rng.standard_normal((batch, t, 2, c)) * 0.1,
                         dtype=jnp.bfloat16)
      w_in = jnp.asarray(rng.standard_normal((3, c, 2 * c)) * 0.05,
                         dtype=jnp.bfloat16)
      b_in = jnp.asarray(rng.standard_normal((2, c)) * 0.05,
                         dtype=jnp.float32)
      w_rs = jnp.asarray(rng.standard_normal((c, 2 * c)) * 0.05,
                         dtype=jnp.bfloat16)
      b_rs = jnp.asarray(rng.standard_normal((2, c)) * 0.05,
                         dtype=jnp.float32)
      x_k, skip_k = wn_layer_fused(x, cond, w_in, b_in, w_rs, b_rs,
                                   dilation=dilation, tile=1024,
                                   interpret=False)
      x_r, skip_r = xla_layer(x, cond, w_in, b_in, w_rs, b_rs, dilation)
      # bit-level agreement: identical dot shapes/accumulation, bf16 outputs
      dx = float(jnp.max(jnp.abs(x_k.astype(jnp.float32)
                                 - x_r.astype(jnp.float32))))
      ds = float(jnp.max(jnp.abs(skip_k.astype(jnp.float32)
                                 - skip_r.astype(jnp.float32))))
      print(f"dilation {{dilation}}: max|dx|={{dx:.3e}} max|dskip|={{ds:.3e}}",
            flush=True)
      assert dx <= 2e-3 and ds <= 2e-3, (dilation, dx, ds)
    print("TPU_KERNEL_OK", flush=True)
""")


@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") != "1",
                    reason="real-TPU Mosaic gate; set RUN_TPU_TESTS=1 "
                           "(remote kernel compiles take minutes)")
def test_wn_layer_kernel_on_hardware(tmp_path):
  script = tmp_path / "tpu_kernel_check.py"
  script.write_text(WORKER.format(repo=str(REPO_ROOT)))
  env = dict(os.environ)
  env.pop("JAX_PLATFORMS", None)  # let the platform default to the TPU
  proc = subprocess.run([sys.executable, str(script)], capture_output=True,
                        text=True, timeout=1800, env=env)
  assert proc.returncode == 0, proc.stderr[-4000:]
  assert "TPU_KERNEL_OK" in proc.stdout
