"""CLI end-to-end tests: train -> continue-train -> synthesize-wav ->
synthesize -> validate, all through the argparse dispatcher on a tiny model.
"""

import sys
import wave
from pathlib import Path

import numpy as np
import pytest

from waveglow_tpu.cli.main import build_parser, run

TINY = ("n_flows=2,n_channels=32,n_layers=2,segment_length=4096,"
        "iters_per_checkpoint=1,epochs_per_checkpoint=0,epochs=1,"
        "batch_size=2,seed=1")


def write_noise_dataset(folder: Path, n=4, seconds=0.4, sr=22050, seed=0):
  folder.mkdir(parents=True, exist_ok=True)
  rng = np.random.default_rng(seed)
  for i in range(n):
    samples = (rng.uniform(-0.3, 0.3, int(sr * seconds))
               * 32767).astype(np.int16)
    with wave.open(str(folder / f"utt{i}.wav"), "wb") as f:
      f.setnchannels(1)
      f.setsampwidth(2)
      f.setframerate(sr)
      f.writeframes(samples.tobytes())


class TestParser:

  def test_help_and_version(self, capsys):
    parser = build_parser()
    with pytest.raises(SystemExit) as e:
      parser.parse_args(["--version"])
    assert e.value.code == 0

  def test_all_subcommands_registered(self):
    parser = build_parser()
    text = parser.format_help()
    for cmd in ("download", "train", "continue-train", "validate",
                "synthesize", "synthesize-wav", "benchmark", "serve"):
      assert cmd in text

  def test_bare_invocation_prints_help_and_succeeds(self, capsys):
    """Reference parity: `waveglow-cli` with no command prints help and
    exits 0 (reference cli.py:143-144; its tox smoke-runs exactly this)."""
    from waveglow_tpu.cli.main import run
    assert run([]) == 0
    assert "usage:" in capsys.readouterr().out

  def test_unknown_command_fails(self):
    parser = build_parser()
    with pytest.raises(SystemExit):
      parser.parse_args(["frobnicate"])


class TestEndToEnd:

  @pytest.fixture(scope="class")
  def workspace(self, tmp_path_factory):
    ws = tmp_path_factory.mktemp("cli_ws")
    write_noise_dataset(ws / "train")
    write_noise_dataset(ws / "val", n=2, seed=1)
    return ws

  def test_01_train(self, workspace):
    rc = run(["train", str(workspace / "train"), str(workspace / "val"),
              str(workspace / "ckpts"), "--custom-hparams", TINY,
              "--tl-dir", str(workspace / "logs"),
              "--log", str(workspace / "cli.log")])
    assert rc == 0
    ckpts = list((workspace / "ckpts").glob("*.npz"))
    assert len(ckpts) >= 1

  def test_02_continue_train(self, workspace):
    from waveglow_tpu.checkpointing.store import get_last_checkpoint
    _, before = get_last_checkpoint(workspace / "ckpts")
    # bump epochs so there is something left to train
    custom = TINY.replace("epochs=1", "epochs=2")
    rc = run(["continue-train", str(workspace / "train"),
              str(workspace / "val"), str(workspace / "ckpts"),
              "--custom-hparams", custom,
              "--tl-dir", str(workspace / "logs"),
              "--log", str(workspace / "cli.log")])
    assert rc == 0
    _, after = get_last_checkpoint(workspace / "ckpts")
    assert after > before

  def test_02b_train_auto_resume(self, workspace):
    """Re-running the SAME train command with --auto-resume continues from
    the latest checkpoint instead of restarting (preemption recovery)."""
    from waveglow_tpu.checkpointing.store import get_last_checkpoint
    _, before = get_last_checkpoint(workspace / "ckpts")
    custom = TINY.replace("epochs=1", "epochs=3")
    rc = run(["train", str(workspace / "train"), str(workspace / "val"),
              str(workspace / "ckpts"), "--custom-hparams", custom,
              "--auto-resume",
              "--tl-dir", str(workspace / "logs"),
              "--log", str(workspace / "cli.log")])
    assert rc == 0
    _, after = get_last_checkpoint(workspace / "ckpts")
    assert after > before  # resumed and advanced, not restarted at 1

  def test_02c_train_profile_trace(self, workspace, tmp_path):
    """--profile-dir captures a jax.profiler trace of the run."""
    trace_dir = tmp_path / "trace"
    custom = TINY.replace("epochs=1", "epochs=4")
    rc = run(["train", str(workspace / "train"), str(workspace / "val"),
              str(workspace / "ckpts"), "--custom-hparams", custom,
              "--auto-resume", "--profile-dir", str(trace_dir),
              "--tl-dir", str(workspace / "logs"),
              "--log", str(workspace / "cli.log")])
    assert rc == 0
    # jax writes plugins/profile/<ts>/*.trace.json.gz (or .pb) under the dir
    captured = list(trace_dir.rglob("*"))
    assert any(p.is_file() for p in captured), captured

  def test_03_synthesize_wav(self, workspace):
    from waveglow_tpu.checkpointing.store import get_last_checkpoint
    ckpt, _ = get_last_checkpoint(workspace / "ckpts")
    out = workspace / "synth_wav_out"
    log_path = workspace / "cli_synth.log"
    rc = run(["synthesize-wav", str(ckpt), str(workspace / "val"),
              "--custom-seed", "0", "-out", str(out),
              "--log", str(log_path)])
    assert rc == 0
    wavs = list(out.rglob("*.wav"))
    assert len(wavs) == 2
    # per-file-stem queue loggers: the file log groups messages per input
    # (reference logging_configuration.py:90-130)
    log_text = log_path.read_text()
    assert "Log messages for file: utt0.wav" in log_text
    assert "Log messages for file: utt1.wav" in log_text
    assert "Synthesized utt0.wav" in log_text

  def test_04_synthesize_npy(self, workspace):
    from waveglow_tpu.checkpointing.store import get_last_checkpoint
    from waveglow_tpu.dsp.mel import MelSTFT
    from waveglow_tpu.hparams import TSTFTHParams

    mel_dir = workspace / "mels" / "sub"
    mel_dir.mkdir(parents=True, exist_ok=True)
    mel_op = MelSTFT(TSTFTHParams())
    mel = np.asarray(mel_op.get_mel_from_file(
        workspace / "val" / "utt0.wav"))
    np.save(mel_dir / "a.npy", mel.astype(np.float32))

    ckpt, _ = get_last_checkpoint(workspace / "ckpts")
    out = workspace / "synth_npy_out"
    rc = run(["synthesize", str(ckpt), str(workspace / "mels"),
              "--custom-seed", "0", "-out", str(out), "--include-stats",
              "--log", str(workspace / "cli.log")])
    assert rc == 0
    assert (out / "sub" / "a.wav").is_file()
    assert (out / "stats.csv").is_file()
    assert (out / "sub" / "a.comparison.png").is_file()

  def test_04b_synthesize_bucketed_distinct_lengths(self, workspace):
    """The default --bucket-frames pads distinct-length mels onto shared
    compiled programs; every output must still carry its true sample count
    (VERDICT round-2 item 3)."""
    from waveglow_tpu.checkpointing.store import get_last_checkpoint
    from waveglow_tpu.dsp.audio_io import wav_to_float32

    mel_dir = workspace / "mels_lengths"
    mel_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    lengths = [10, 23, 37]
    for f in lengths:
      np.save(mel_dir / f"len{f}.npy",
              rng.standard_normal((80, f)).astype(np.float32))

    ckpt, _ = get_last_checkpoint(workspace / "ckpts")
    out = workspace / "synth_bucketed_out"
    rc = run(["synthesize", str(ckpt), str(mel_dir), "--custom-seed", "0",
              "-out", str(out), "--log", str(workspace / "cli.log")])
    assert rc == 0
    for f in lengths:
      wav, sr = wav_to_float32(out / f"len{f}.wav")
      assert len(wav) == f * 256, (f, len(wav))

  def test_04c_synthesize_batched_matches_solo(self, workspace):
    """--batch N fuses same-bucket files into batched device dispatches;
    outputs must match the reference-exact --batch 1 path up to float
    rounding (identical seed-derived noise per file)."""
    from waveglow_tpu.checkpointing.store import get_last_checkpoint
    from waveglow_tpu.dsp.audio_io import wav_to_float32

    mel_dir = workspace / "mels_batched"
    mel_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(3)
    lengths = [10, 12, 23, 14, 9]  # 10/12/14/9 co-batch in bucket 16
                                   # (4-row fused dispatch); 23 -> bucket 32
                                   # solo — exercises batch + remainder
    for i, f in enumerate(lengths):
      np.save(mel_dir / f"m{i}_len{f}.npy",
              rng.standard_normal((80, f)).astype(np.float32))

    ckpt, _ = get_last_checkpoint(workspace / "ckpts")
    solo_out = workspace / "synth_solo_out"
    rc = run(["synthesize", str(ckpt), str(mel_dir), "--custom-seed", "7",
              "-out", str(solo_out), "--bucket-frames", "16",
              "--log", str(workspace / "cli.log")])
    assert rc == 0
    batch_out = workspace / "synth_batch_out"
    rc = run(["synthesize", str(ckpt), str(mel_dir), "--custom-seed", "7",
              "-out", str(batch_out), "--bucket-frames", "16",
              "--batch", "4", "--log", str(workspace / "cli.log")])
    assert rc == 0
    for i, f in enumerate(lengths):
      solo, sr = wav_to_float32(solo_out / f"m{i}_len{f}.wav")
      batched, _ = wav_to_float32(batch_out / f"m{i}_len{f}.wav")
      assert len(solo) == len(batched) == f * 256
      np.testing.assert_allclose(batched, solo, atol=2e-4,
                                 err_msg=f"file {i} (len {f})")

  def test_05_validate(self, workspace):
    out = workspace / "validation"
    rc = run(["validate", str(workspace / "ckpts"), str(out),
              str(workspace / "val"), "--custom-seed", "5",
              "--log", str(workspace / "cli.log")])
    assert rc == 0
    total = out / "total.csv"
    assert total.is_file()
    import pandas as pd
    df = pd.read_csv(total, sep="\t")
    assert len(df) == 1  # random single entry
    assert "MFCC DTW MCD" in df.columns
    # per-entry artifacts
    subdirs = [p for p in out.iterdir() if p.is_dir()]
    entry_dirs = [p for it_dir in subdirs for p in it_dir.iterdir()
                  if p.is_dir()]
    assert any((d / "comparison.png").is_file() for d in entry_dirs)

  def test_06_validate_full_run(self, workspace):
    out = workspace / "validation_full"
    rc = run(["validate", str(workspace / "ckpts"), str(out),
              str(workspace / "val"), "--full-run", "--custom-seed", "5",
              "--log", str(workspace / "cli.log")])
    assert rc == 0
    import pandas as pd
    df = pd.read_csv(out / "total.csv", sep="\t")
    assert len(df) == 2

  def test_07_validate_filtered_checkpoints(self, workspace):
    # after train+continue-train the dir holds iterations 1..4
    # (iters_per_checkpoint=1); min/max select the middle two
    out = workspace / "validation_filtered"
    rc = run(["validate", str(workspace / "ckpts"), str(out),
              str(workspace / "val"), "--custom-seed", "5",
              "--min-iteration", "2", "--max-iteration", "3",
              "--log", str(workspace / "cli.log")])
    assert rc == 0
    assert sorted(p.name for p in out.iterdir() if p.is_dir()) == ["2", "3"]
    import pandas as pd
    assert len(pd.read_csv(out / "total.csv", sep="\t")) == 2

  def test_08_validate_select_stride(self, workspace):
    from waveglow_tpu.checkpointing.store import get_all_checkpoint_iterations
    its = get_all_checkpoint_iterations(workspace / "ckpts")
    expected = sorted((str(i) for i in its if i % 4 == 0), key=int)
    assert expected, its  # earlier tests trained past iteration 4

    out = workspace / "validation_select"
    rc = run(["validate", str(workspace / "ckpts"), str(out),
              str(workspace / "val"), "--custom-seed", "5",
              "--select", "4",
              "--log", str(workspace / "cli.log")])
    assert rc == 0
    got = sorted((p.name for p in out.iterdir() if p.is_dir()), key=int)
    assert got == expected


class TestDebugMarker:

  def test_marker_file_forces_debug_logging(self, tmp_path, monkeypatch):
    """$TMP/waveglow-tpu-debug turns on debug logging without --debug
    (reference cli.py:156-161)."""
    import tempfile
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    from waveglow_tpu.cli.main import debug_file_exists
    assert not debug_file_exists()
    (tmp_path / "waveglow-tpu-debug").write_text("")
    assert debug_file_exists()

    # a real command run picks it up: DEBUG records land in the log file
    import logging
    log_path = tmp_path / "dbg.log"
    rc = run(["validate", str(tmp_path), str(tmp_path / "out"),
              str(tmp_path), "--log", str(log_path)])
    # no wavs -> command fails cleanly, but the file logger is DEBUG-level
    assert rc == 1
    assert logging.getLogger("file-logger").level == logging.DEBUG


class TestStemLoggerGuards:

  def test_flush_without_file_logger_does_not_hit_console(self):
    """Without a configured --log file, flushing the per-file queues must
    NOT propagate the buffered records to the root console handler (that
    would re-print every per-file line already logged live)."""
    import logging

    from waveglow_tpu.cli.logging_config import (flush_file_stem_loggers,
                                                 get_file_stem_logger,
                                                 init_file_stem_loggers)

    flogger = logging.getLogger("file-logger")
    saved_handlers, saved_prop = list(flogger.handlers), flogger.propagate
    flogger.handlers.clear()
    flogger.propagate = True  # the never-configured default

    root = logging.getLogger()
    records = []

    class Capture(logging.Handler):
      def emit(self, record):
        records.append(record)

    cap = Capture()
    root.addHandler(cap)
    try:
      queues = init_file_stem_loggers(["x.wav"])
      get_file_stem_logger("x.wav").info("buffered line")
      flush_file_stem_loggers(queues)
      assert records == []
      assert all(q.empty() for q in queues.values())
    finally:
      root.removeHandler(cap)
      flogger.handlers[:] = saved_handlers
      flogger.propagate = saved_prop

  def test_stem_loggers_do_not_grow_global_registry(self):
    """Batch jobs must not intern one logger per input file forever in
    logging.Logger.manager.loggerDict."""
    import logging

    from waveglow_tpu.cli.logging_config import init_file_stem_loggers

    before = len(logging.Logger.manager.loggerDict)
    init_file_stem_loggers([f"f{i}.wav" for i in range(500)])
    assert len(logging.Logger.manager.loggerDict) == before


class TestCompileCache:
  """serve/benchmark --compile-cache: persistent XLA program cache so a
  daemon restart re-loads warmed programs from disk instead of recompiling
  (~37 s/program over a tunneled TPU, docs/PERFORMANCE.md)."""

  def test_disabled_without_flag_or_env(self, monkeypatch):
    from waveglow_tpu.compile_cache import ENV_VAR, enable_compile_cache
    monkeypatch.delenv(ENV_VAR, raising=False)
    assert enable_compile_cache(None) is None

  def test_flag_creates_dir_and_configures_jax(self, tmp_path):
    import jax

    from waveglow_tpu.compile_cache import enable_compile_cache
    target = tmp_path / "xla_cache"
    assert enable_compile_cache(target) == target
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)

  def test_env_var_is_the_default(self, monkeypatch, tmp_path):
    from waveglow_tpu.compile_cache import ENV_VAR, enable_compile_cache
    env_dir = tmp_path / "from_env"
    monkeypatch.setenv(ENV_VAR, str(env_dir))
    assert enable_compile_cache(None) == env_dir
    # an explicit directory wins over the env var
    flag_dir = tmp_path / "from_flag"
    assert enable_compile_cache(flag_dir) == flag_dir
