"""Preprocess CLI (parity: `preprocess.py:8-19`)."""

import argparse

from ..config import get_configs_of
from ..data.preprocessor import Preprocessor


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True,
                        help="name of dataset")
    args = parser.parse_args()
    preprocess_config, model_config, train_config = get_configs_of(
        args.dataset)
    Preprocessor(preprocess_config, model_config, train_config) \
        .build_from_path()


if __name__ == "__main__":
    cli()
