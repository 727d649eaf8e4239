#!/usr/bin/env python
"""Drop-in entry point matching the reference layout: ``python eval.py
data_dir=... res_name=...`` — forwards to :mod:`himo_tpu.cli.eval`."""

from himo_tpu.cli.eval import main
from himo_tpu.utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main)
