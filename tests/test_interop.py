"""Checkpoint interop round-trip: native -> torch export -> reference model.

The ultimate interop test: weights exported by this framework load into the
ACTUAL reference WaveGlow via ``load_state_dict`` and synthesize the same
waveform the native path produces.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from waveglow_tpu.checkpointing.export_torch import (export_torch_checkpoint,
                                                     params_to_state_dict)
from waveglow_tpu.checkpointing.import_torch import (load_torch_checkpoint,
                                                     state_dict_to_params)
from waveglow_tpu.checkpointing.store import CheckpointWaveglow
from waveglow_tpu.hparams import HParams
from waveglow_tpu.models.waveglow import (WaveGlowConfig, fuse_for_inference,
                                          infer, init_params)

from reference_oracle import import_reference, torch_infer_noise

ref = import_reference()


def native_checkpoint(seed=0):
  from dataclasses import asdict
  hp = HParams(n_flows=5, n_early_every=2, n_early_size=2, n_layers=2,
               n_channels=32)
  config = WaveGlowConfig.from_hparams(hp)
  params = init_params(config, seed=seed)
  ckpt = CheckpointWaveglow(state_dict=params, optimizer=None,
                            learning_rate=hp.learning_rate, iteration=7,
                            hparams=asdict(hp))
  return ckpt, config, hp


class TestExportImportRoundtrip:

  def test_state_dict_roundtrip_identical(self):
    ckpt, config, hp = native_checkpoint()
    sd = params_to_state_dict(ckpt.state_dict)
    back = state_dict_to_params({k: v for k, v in sd.items()}, hp)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(ckpt.state_dict),
                    jax.tree_util.tree_leaves(back)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_reference_loads_exported_checkpoint(self, tmp_path):
    ckpt, config, hp = native_checkpoint(seed=3)
    path = tmp_path / "exported.pt"
    export_torch_checkpoint(ckpt, path)

    # reference-side load: Checkpoint dict -> model.load_state_dict
    payload = torch.load(str(path), map_location="cpu", weights_only=False)
    ref_hp = ref.model.HParams(**{
        k: v for k, v in payload["hparams"].items()
        if k in ref.model.HParams.__dataclass_fields__})
    torch.manual_seed(99)
    model = ref.model.WaveGlow(ref_hp)
    model.load_state_dict(payload["state_dict"])  # raises on any mismatch
    model = ref.model.WaveGlow.remove_weightnorm(model).eval()

    # synthesis parity: reference with exported weights == native
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 80, 5)).astype(np.float32)
    torch.manual_seed(0)
    with torch.no_grad():
      ref_wav = model.infer(torch.from_numpy(mel), sigma=1.0).numpy()

    n_groups = ((5 - 1) * 256 + 256) // 8
    noise = torch_infer_noise(config, 1, n_groups, seed=0)
    my_wav = np.asarray(infer(fuse_for_inference(ckpt.state_dict), config,
                              jnp.asarray(mel), sigma=1.0,
                              noise=[jnp.asarray(n) for n in noise]))
    np.testing.assert_allclose(my_wav, ref_wav, atol=1e-4)

  def test_reimport_of_export(self, tmp_path):
    ckpt, config, hp = native_checkpoint(seed=4)
    path = tmp_path / "exported.pt"
    export_torch_checkpoint(ckpt, path)
    back = load_torch_checkpoint(path)
    assert back.iteration == 7
    assert back.get_hparams().n_flows == 5
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(ckpt.state_dict),
                    jax.tree_util.tree_leaves(back.state_dict)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestNvidiaRawFormat:

  def test_raw_module_checkpoint_import(self, tmp_path):
    """Simulate NVIDIA's pickled-full-module checkpoint and import it."""
    torch.manual_seed(5)
    ref_hp = ref.model.HParams(n_flows=2, n_layers=2, n_channels=32)
    model = ref.model.WaveGlow(ref_hp)
    # modern torch modules are unpicklable (parametrization hooks), so the
    # "model" slot carries the state dict here; the importer accepts either
    # (real NVIDIA files unpickle a 2018-era module via the glow shim)
    path = tmp_path / "nvidia_raw.pt"
    torch.save({"model": model.state_dict(), "iteration": 12345,
                "optimizer": {}, "learning_rate": 1e-4}, str(path))

    ckpt = load_torch_checkpoint(path)
    assert ckpt.iteration == 12345
    # architecture is derived from the state dict shapes
    hp_derived = ckpt.get_hparams()
    assert hp_derived.n_flows == 2
    assert hp_derived.n_layers == 2
    assert hp_derived.n_channels == 32
    assert hp_derived.n_group == 8
    # training constants fall back to the paper values
    assert hp_derived.batch_size == 24

    hp = HParams(n_flows=2, n_layers=2, n_channels=32)
    expected = state_dict_to_params(model.state_dict(), hp)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(ckpt.state_dict)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGDriveInterstitialParsing:
  """The network itself is unreachable here (docs/PARITY.md), but the
  confirm-token HTML parsing — the part gdown does for the reference
  (dl_pretrained.py:28-35) — is testable offline."""

  def test_modern_form(self):
    from waveglow_tpu.checkpointing.download import parse_gdrive_interstitial
    html = """
    <html><body>
    <form id="download-form" action="https://drive.usercontent.google.com/download" method="get">
      <input type="submit" value="Download anyway"/>
      <input type="hidden" name="id" value="1rpK8CzAAirq9sWZhe9nlfvxMF1dRgFbF"/>
      <input type="hidden" name="export" value="download"/>
      <input type="hidden" name="confirm" value="t"/>
      <input type="hidden" name="uuid" value="abc-123"/>
    </form></body></html>"""
    action, fields = parse_gdrive_interstitial(html)
    assert action == "https://drive.usercontent.google.com/download"
    assert fields == {"id": "1rpK8CzAAirq9sWZhe9nlfvxMF1dRgFbF",
                      "export": "download", "confirm": "t",
                      "uuid": "abc-123"}

  def test_legacy_confirm_link(self):
    from waveglow_tpu.checkpointing.download import parse_gdrive_interstitial
    html = ('<a href="/uc?export=download&amp;confirm=AbCd&amp;id=XYZ">'
            'Download anyway</a>')
    action, fields = parse_gdrive_interstitial(html)
    assert action == "https://drive.google.com/uc?export=download&confirm=AbCd&id=XYZ"
    assert fields == {}

  def test_no_form_returns_none(self):
    from waveglow_tpu.checkpointing.download import parse_gdrive_interstitial
    assert parse_gdrive_interstitial("<html>quota exceeded</html>") is None


class TestDownloadCommand:
  """End-to-end `download` subcommand against a localhost HTTP server —
  everything but the real NGC/Drive endpoints (unreachable, docs/PARITY.md)
  is exercised: fetch, atomic write, in-place convert to native npz."""

  @staticmethod
  def _serve(directory):
    import functools
    import http.server
    import threading
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(directory))
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, httpd.server_address[1]

  def test_download_cli_fetches_and_converts(self, tmp_path, monkeypatch):
    from waveglow_tpu.checkpointing import download as dl_mod
    from waveglow_tpu.checkpointing.store import \
        CheckpointWaveglow as NativeCkpt
    from waveglow_tpu.cli.main import run

    ckpt, config, hp = native_checkpoint(seed=5)
    serve_dir = tmp_path / "srv"
    serve_dir.mkdir()
    export_torch_checkpoint(ckpt, serve_dir / "waveglow_v3.pt")

    httpd, port = self._serve(serve_dir)
    try:
      monkeypatch.setitem(dl_mod._NGC_URLS, 3,
                          f"http://127.0.0.1:{port}/waveglow_v3.pt")
      dest = tmp_path / "dl" / "checkpoint.pt"
      rc = run(["download", str(dest), "--ver", "3",
                "--log", str(tmp_path / "cli.log")])
      assert rc == 0
      back = NativeCkpt.load(dest)  # in-place converted to native npz
      assert back.iteration == 7
      assert back.get_hparams().n_flows == 5
    finally:
      httpd.shutdown()

  def test_gdrive_confirm_flow_over_localhost(self, tmp_path, monkeypatch):
    """v1 path: interstitial HTML -> parsed form -> confirmed fetch."""
    from waveglow_tpu.checkpointing import download as dl_mod

    serve_dir = tmp_path / "srv"
    serve_dir.mkdir()
    payload = b"FAKE-CHECKPOINT-BYTES" * 100
    (serve_dir / "payload.pt").write_bytes(payload)

    httpd, port = self._serve(serve_dir)
    try:
      (serve_dir / "inter.html").write_text(f"""
        <html><body><form id="download-form"
          action="http://127.0.0.1:{port}/payload.pt" method="get">
          <input type="hidden" name="confirm" value="t"/>
          <input type="hidden" name="uuid" value="u-1"/>
        </form></body></html>""")
      dest = tmp_path / "v1.pt"
      dl_mod._download_gdrive(f"http://127.0.0.1:{port}/inter.html", dest)
      assert dest.read_bytes() == payload
    finally:
      httpd.shutdown()

  def test_gdrive_relative_escaped_action_with_query(self, tmp_path):
    """A relative, HTML-escaped form action that already carries a query
    string must be absolutized against the interstitial URL and have its
    hidden fields appended with '&' (a blind '?' would make Drive drop the
    confirm token)."""
    from waveglow_tpu.checkpointing import download as dl_mod
    from waveglow_tpu.checkpointing.download import parse_gdrive_interstitial

    html = """
      <html><body><form id="download-form"
        action="/payload.pt?export=download&amp;id=XYZ" method="get">
        <input type="hidden" name="confirm" value="t"/>
      </form></body></html>"""
    action, fields = parse_gdrive_interstitial(html)
    assert action == "/payload.pt?export=download&id=XYZ"
    assert fields == {"confirm": "t"}

    serve_dir = tmp_path / "srv"
    serve_dir.mkdir()
    payload = b"PAYLOAD-BYTES" * 50
    (serve_dir / "payload.pt").write_bytes(payload)
    httpd, port = self._serve(serve_dir)
    try:
      (serve_dir / "inter.html").write_text(html)
      dest = tmp_path / "v1.pt"
      dl_mod._download_gdrive(f"http://127.0.0.1:{port}/inter.html", dest)
      assert dest.read_bytes() == payload
    finally:
      httpd.shutdown()


class TestAdamStateImport:
  """torch_adam_to_opt_leaves: elementwise moments ride the exact weight
  layout transform, land on optax.ScaleByAdamState, and degrade to a fresh
  optimizer (None) on any structural mismatch."""

  def _fake_adam_sd(self, sd, step=7):
    # exp_avg := the parameter itself, exp_avg_sq := its square — after the
    # layout mapping, mu must equal params and nu their squares leafwise.
    # Indices follow the canonical parameters() order, like a real torch
    # optimizer's would.
    from waveglow_tpu.checkpointing.export_torch import \
        reference_parameter_order
    names = reference_parameter_order(dict(sd))
    state = {i: {"step": torch.tensor(float(step)),
                 "exp_avg": sd[name].clone().float(),
                 "exp_avg_sq": (sd[name].clone().float() ** 2)}
             for i, name in enumerate(names)}
    return {"state": state,
            "param_groups": [{"params": list(range(len(sd)))}]}

  def test_moments_ride_the_weight_mapping(self):
    import jax

    from waveglow_tpu.checkpointing.import_torch import \
        torch_adam_to_opt_leaves
    from waveglow_tpu.checkpointing.store import restore_opt_state
    from waveglow_tpu.training.step import make_optimizer

    ckpt, config, hp = native_checkpoint(seed=5)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(ckpt.state_dict).items()}
    leaves = torch_adam_to_opt_leaves(self._fake_adam_sd(sd, step=7), sd, hp)
    assert leaves is not None

    opt_state = restore_opt_state(leaves, make_optimizer(1e-4),
                                  ckpt.state_dict)
    adam = opt_state[0]  # ScaleByAdamState(count, mu, nu)
    assert int(adam.count) == 7
    p_leaves = jax.tree_util.tree_leaves(ckpt.state_dict)
    for p, m, v in zip(p_leaves, jax.tree_util.tree_leaves(adam.mu),
                       jax.tree_util.tree_leaves(adam.nu)):
      np.testing.assert_array_equal(np.asarray(m), np.asarray(p))
      np.testing.assert_allclose(np.asarray(v), np.asarray(p) ** 2,
                                 rtol=1e-6)

  def test_missing_state_falls_back_to_none(self):
    from waveglow_tpu.checkpointing.import_torch import \
        torch_adam_to_opt_leaves

    ckpt, config, hp = native_checkpoint(seed=6)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(ckpt.state_dict).items()}
    full = self._fake_adam_sd(sd)

    assert torch_adam_to_opt_leaves({}, sd, hp) is None
    assert torch_adam_to_opt_leaves({"state": {}, "param_groups": []},
                                    sd, hp) is None
    partial = {"state": dict(list(full["state"].items())[:-1]),
               "param_groups": full["param_groups"]}
    assert torch_adam_to_opt_leaves(partial, sd, hp) is None
    # count mismatch (an extra torch param the state dict doesn't know)
    extra = {"state": full["state"],
             "param_groups": [{"params": list(range(len(sd) + 1))}]}
    assert torch_adam_to_opt_leaves(extra, sd, hp) is None

  def test_shape_mismatch_falls_back_to_none(self):
    from waveglow_tpu.checkpointing.import_torch import \
        torch_adam_to_opt_leaves

    ckpt, config, hp = native_checkpoint(seed=7)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(ckpt.state_dict).items()}
    bad = self._fake_adam_sd(sd)
    first = next(iter(bad["state"]))
    bad["state"][first]["exp_avg"] = torch.zeros(3, 3)
    assert torch_adam_to_opt_leaves(bad, sd, hp) is None

  def test_roundtrip_through_checkpoint_file(self, tmp_path):
    """A reference-format .pt with Adam state imports with optimizer leaves
    and survives the native npz save/load roundtrip."""
    from dataclasses import asdict

    from waveglow_tpu.checkpointing import load_checkpoint_any

    ckpt, config, hp = native_checkpoint(seed=8)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(ckpt.state_dict).items()}
    path = tmp_path / "with_adam.pt"
    torch.save({"state_dict": sd, "optimizer": self._fake_adam_sd(sd, 11),
                "learning_rate": 1e-4, "iteration": 11,
                "hparams": asdict(hp)}, str(path))
    imported = load_torch_checkpoint(path)
    assert imported.optimizer is not None
    native_path = tmp_path / "native.npz"
    imported.save(native_path)
    back = load_checkpoint_any(native_path)
    assert back.optimizer is not None
    assert len(back.optimizer) == len(imported.optimizer)
    for a, b in zip(imported.optimizer, back.optimizer):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_export_import_adam_roundtrip(self):
    """Native optax Adam state -> torch optimizer dict -> import: identical
    leaves (the export/import layout transforms are mutual inverses on the
    moment tensors, like they are on the weights)."""
    from waveglow_tpu.checkpointing.export_torch import opt_leaves_to_torch_adam
    from waveglow_tpu.checkpointing.import_torch import \
        torch_adam_to_opt_leaves
    import jax
    import jax.numpy as jnp
    import optax

    from waveglow_tpu.training.step import make_optimizer

    ckpt, config, hp = native_checkpoint(seed=9)
    params = ckpt.state_dict
    # a real optax state with nonzero moments: two update() steps on fake
    # grads (the params themselves)
    opt = make_optimizer(1e-4)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.asarray, params)
    for _ in range(2):
      _, state = opt.update(grads, state, params)
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state)]

    torch_sd = opt_leaves_to_torch_adam(leaves, params, 1e-4)
    sd = {k: v for k, v in params_to_state_dict(params).items()}
    back = torch_adam_to_opt_leaves(torch_sd, sd, hp)
    assert back is not None
    assert len(back) == len(leaves)
    for a, b in zip(leaves, back):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSniffCheckpointFormat:
  """Content-based format detection: npz and modern torch .pt are BOTH zip
  archives (PK magic — torch defaults to zipfile serialization since 1.6),
  so detection must look inside the archive, not just at the magic."""

  def test_sniffs_all_three_formats(self, tmp_path):
    from waveglow_tpu.checkpointing import sniff_checkpoint_format

    ckpt, _, _ = native_checkpoint(seed=3)
    npz = tmp_path / "c.npz"
    ckpt.save(npz)
    assert sniff_checkpoint_format(npz) == "npz"

    zip_pt = tmp_path / "zip.pt"  # torch default: zip serialization
    torch.save({"a": torch.zeros(2)}, str(zip_pt))
    assert sniff_checkpoint_format(zip_pt) == "torch"

    old_pt = tmp_path / "old.pt"  # pre-1.6 plain pickle stream
    torch.save({"a": torch.zeros(2)}, str(old_pt),
               _use_new_zipfile_serialization=False)
    assert sniff_checkpoint_format(old_pt) == "torch"

    assert sniff_checkpoint_format(tmp_path) == "orbax"  # directories

  def test_load_checkpoint_any_routes_torch_zip_to_importer(self, tmp_path):
    """Regression: a reference-format .pt saved with torch's DEFAULT (zip)
    serialization starts with the npz 'PK' magic; magic-only sniffing
    routed it into np.load, which died with an opaque KeyError. Content
    sniffing must hand it to the torch importer."""
    from dataclasses import asdict

    from waveglow_tpu.checkpointing import load_checkpoint_any

    ckpt, config, hp = native_checkpoint(seed=4)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(ckpt.state_dict).items()}
    path = tmp_path / "reference_format.pt"
    torch.save({"state_dict": sd, "optimizer": None, "learning_rate": 1e-4,
                "iteration": 11, "hparams": asdict(hp)}, str(path))
    assert path.read_bytes()[:2] == b"PK"  # the ambiguous magic

    back = load_checkpoint_any(path)
    assert back.iteration == 11
    ref_order = sorted(params_to_state_dict(back.state_dict))
    assert ref_order == sorted(params_to_state_dict(ckpt.state_dict))
