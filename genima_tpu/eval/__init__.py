from genima_tpu.eval.agents import (  # noqa: F401
    DiffusionAgent,
    SDControlNetAgent,
    SDPix2PixAgent,
    SDXLControlNetAgent,
)
from genima_tpu.eval.harness import GenimaEvalWorkspace  # noqa: F401
