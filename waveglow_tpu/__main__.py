"""``python -m waveglow_tpu`` -> the CLI dispatcher."""

from waveglow_tpu.cli.main import run_prod

run_prod()
