"""Load pretrained base-model weights (SD-turbo / SDXL-turbo) into a
pipeline's params.

Supports two on-disk layouts for each submodel:

* native: ``<dir>/<submodel>/params.msgpack`` (our checkpoint format),
* diffusers: ``<dir>/<submodel>/diffusion_pytorch_model.safetensors`` (or
  ``model.safetensors`` / ``pytorch_model.bin`` for text encoders), ported
  through ``genima_tpu.weights.torch_port``.

Submodel dirs follow the HF hub layout: unet/, vae/, text_encoder/,
text_encoder_2/ (the reference loads ``stabilityai/sd-turbo`` subfolders at
``train_controlnet_genima.py:1042-1064``). Missing submodels keep their
current (random) params — callers that need full fidelity should check the
returned report.
"""

from __future__ import annotations

from pathlib import Path

from genima_tpu.core import checkpoint as ckpt
from genima_tpu.weights.torch_port import load_torch_file, port_torch_state_dict

_FAMILIES = {
    "unet": "diffusers_unet",
    "controlnet": "diffusers_controlnet",
    "vae": "diffusers_vae",
    "text_encoder": "hf_clip",
    "text_encoder_2": "hf_clip",
}

_WEIGHT_FILES = (
    "diffusion_pytorch_model.safetensors",
    "model.safetensors",
    "diffusion_pytorch_model.bin",
    "pytorch_model.bin",
)


def load_submodel(path: Path, target_params, family: str):
    native = path / "params.msgpack"
    if native.exists():
        return ckpt.load_pytree(native, target=target_params), "native"
    for fname in _WEIGHT_FILES:
        f = path / fname
        if f.exists():
            sd = load_torch_file(f)
            prefix = ""
            return (
                port_torch_state_dict(sd, target_params, family, prefix=prefix),
                "diffusers",
            )
    return None, None


def load_pretrained_pipeline(base_dir: str | Path, params: dict) -> dict:
    """Fill ``params`` submodels from ``base_dir``; returns a report dict."""
    base_dir = Path(base_dir)
    report = {}
    for name in params:
        family = _FAMILIES.get(name)
        if family is None:
            continue
        sub = base_dir / name
        if not sub.is_dir():
            report[name] = "missing"
            continue
        loaded, kind = load_submodel(sub, params[name], family)
        if loaded is not None:
            params[name] = loaded
            report[name] = kind
        else:
            report[name] = "no-weights-file"
    return report
