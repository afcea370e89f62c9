"""Command-line entry points: python -m fitv2_tpu.cli.{train,sample}."""
