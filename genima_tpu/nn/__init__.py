from genima_tpu.nn.unet import UNet2DConditionModel, UNetConfig  # noqa: F401
from genima_tpu.nn.controlnet import (  # noqa: F401
    ControlNetModel,
    controlnet_params_from_unet,
)
from genima_tpu.nn.vae import AutoencoderKL, VAEConfig  # noqa: F401
from genima_tpu.nn.clip_text import CLIPTextModel, CLIPTextConfig  # noqa: F401
