#!/usr/bin/env python
"""Root entry point: delegates to mixgantts_tpu.cli.prepare_align (drop-in CLI
compatible with the reference's prepare_align.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mixgantts_tpu.cli.prepare_align import cli

if __name__ == "__main__":
    cli()
