"""ACT-only evaluation CLI (no diffusion stage) — the reference
``controller/eval_act.py`` baseline harness."""

from __future__ import annotations

import sys
from pathlib import Path

from genima_tpu.cli.eval_genima import main as eval_main

DEFAULT_CFG = Path(__file__).parent.parent / "cfgs" / "eval_act.yaml"


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if not any(a.startswith("--config-name") for a in argv):
        argv = ["--config-name", str(DEFAULT_CFG)] + argv
    return eval_main(argv, with_diffusion=False)


if __name__ == "__main__":
    main()
