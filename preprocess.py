#!/usr/bin/env python
"""Root entry point: delegates to mixgantts_tpu.cli.preprocess (drop-in CLI
compatible with the reference's preprocess.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mixgantts_tpu.cli.preprocess import cli

if __name__ == "__main__":
    cli()
