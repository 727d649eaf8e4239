#!/usr/bin/env python
"""Drop-in entry point matching the reference layout: ``python save_zip.py
data_dir=... res_name=...`` — forwards to :mod:`himo_tpu.cli.save_zip`."""

from himo_tpu.cli.save_zip import main
from himo_tpu.utils.cli import run_cli

if __name__ == "__main__":
    run_cli(main)
