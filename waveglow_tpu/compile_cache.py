"""Persistent XLA compilation cache for long-lived entrypoints.

Full-model serving programs cost ~37 s of XLA compile time EACH over a
tunneled TPU (docs/PERFORMANCE.md), and a warmed daemon holds 8+ of them
(solo + every power-of-two micro-batch, raw + denoised, per warm bucket).
Without a persistent cache a rolling restart re-pays every one of those
compiles; with one, a restarted daemon re-loads each program from disk in
~1 s. The reference has no analogue (its torch CPU model loads instantly);
this is the production equivalent for a compiled-runtime vocoder.

Enable with ``serve --compile-cache DIR`` / ``benchmark --compile-cache
DIR`` or the ``WAVEGLOW_TPU_COMPILE_CACHE`` environment variable (the flag
wins). Must be configured BEFORE the first jit compilation — the CLI
handlers call this before constructing any Synthesizer.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional, Union

ENV_VAR = "WAVEGLOW_TPU_COMPILE_CACHE"

logger = logging.getLogger(__name__)


def enable_compile_cache(
    cache_dir: Optional[Union[str, Path]] = None) -> Optional[Path]:
  """Point jax's persistent compilation cache at ``cache_dir``.

  ``None`` falls back to ``$WAVEGLOW_TPU_COMPILE_CACHE``; if that is unset
  too, this is a no-op (returns None). The directory is created if missing.
  Only compiles over 1 s are persisted — tiny host programs would churn the
  cache for no win. Returns the resolved cache path, or None when disabled.
  """
  if cache_dir is None:
    cache_dir = os.environ.get(ENV_VAR) or None
  if cache_dir is None:
    return None
  cache_dir = Path(cache_dir)
  cache_dir.mkdir(parents=True, exist_ok=True)

  import jax

  jax.config.update("jax_compilation_cache_dir", str(cache_dir))
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
  logger.info("Persistent XLA compile cache: %s", cache_dir)
  return cache_dir
