"""Dataset rendering CLI — hydra-style usage preserved:

    python -m genima_tpu.cli.render_data dataset_root=/data/rlbench \
        task=take_lid_off_saucepan episodes=100

(reference ``render/render_data.py:436-453``).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

from genima_tpu.core.config import load_config, parse_cli

DEFAULT_CFG = Path(__file__).parent.parent / "cfgs" / "render.yaml"


def main(argv=None):
    overrides, flags = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = load_config(flags.get("config_name", DEFAULT_CFG), overrides)
    from genima_tpu.rendering.render_data import RenderData

    t0 = time.time()
    RenderData(cfg.to_dict()).generate()
    print(f"Total time: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
