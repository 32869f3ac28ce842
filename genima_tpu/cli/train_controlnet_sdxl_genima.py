"""SDXL ControlNet fine-tune CLI — signature-compatible with the reference
``diffusion/train_controlnet_sdxl_genima.py``."""

from __future__ import annotations

import sys

from genima_tpu.cli._diffusion_args import build_parser
from genima_tpu.diffusion.driver import run_training


def parse_args(argv=None):
    return build_parser("sdxl").parse_args(argv)


def main(args=None):
    if args is None:
        args = parse_args(sys.argv[1:])
    return run_training(args, variant="sdxl")


if __name__ == "__main__":
    main()
