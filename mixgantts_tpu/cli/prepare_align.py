"""Corpus -> raw_data preparation CLI (parity: `prepare_align.py:7-25`)."""

import argparse

from ..config import get_configs_of
from ..data import aishell3, ljspeech


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True,
                        help="name of dataset")
    args = parser.parse_args()
    config, _, _ = get_configs_of(args.dataset)
    if args.dataset == "LJSpeech":
        ljspeech.prepare_align(config)
    elif args.dataset == "AISHELL3":
        aishell3.prepare_align(config)
    else:
        raise ValueError(f"unknown dataset {args.dataset!r}")


if __name__ == "__main__":
    cli()
