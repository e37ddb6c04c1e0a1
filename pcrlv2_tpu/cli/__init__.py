"""CLI entry point with reference ``main.py`` flag parity."""

from pcrlv2_tpu.cli.main import main, build_parser, DataGenerator  # noqa: F401
