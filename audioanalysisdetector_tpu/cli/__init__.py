"""CLI entry points (L7)."""

from audioanalysisdetector_tpu.cli.main import build_parser, main

__all__ = ["build_parser", "main"]
