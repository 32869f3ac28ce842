"""Bidirectional torch<->flax weight porting.

The released Genima checkpoints (SURVEY.md §6) and the SD-turbo / SDXL-turbo
base models are diffusers/transformers/torchvision/OpenAI-CLIP torch weights.
This module maps those state dicts onto the flax parameter trees of
``genima_tpu.nn`` (and back, so a TPU-trained ControlNet can be exported in
the diffusers layout for interop).

The mapping is *derived from the target tree*: every flax parameter path is
converted to its torch name by per-family naming rules, giving a complete
bijection; import then verifies full coverage and shape agreement — a
missing or misshapen tensor is a hard error, not a silent skip (weight-port
fidelity is a north-star risk, SURVEY.md §7 "hard parts").

Array transforms: conv OIHW -> HWIO; linear (O,I) -> (I,O); embeddings and
norm vectors pass through; OpenAI CLIP's fused in_proj splits into q/k/v.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Callable

import jax
import numpy as np

# ---------------------------------------------------------------------------
# per-family token naming rules: flax path token -> torch name fragment
# ---------------------------------------------------------------------------

# tokens whose trailing _<int> becomes .<int> in diffusers names
_DIFFUSERS_INDEXED = (
    "down_blocks", "up_blocks", "resnets", "attentions", "transformer_blocks",
    "downsamplers", "upsamplers", "to_out", "net", "controlnet_down_blocks",
    "blocks", "layers",
)

_IDX_RE = re.compile(r"^(.*)_(\d+)$")


def _split_indexed(token: str, indexed_prefixes) -> str:
    m = _IDX_RE.match(token)
    if m and m.group(1) in indexed_prefixes:
        return f"{m.group(1)}.{m.group(2)}"
    return token


def _diffusers_token(token: str) -> str:
    return _split_indexed(token, _DIFFUSERS_INDEXED)


_VAE_FLAT_RE = re.compile(
    r"^(down|up)_blocks_(\d+)_(resnets)_(\d+)$"
)
_VAE_SAMPLE_RE = re.compile(r"^(down|up)_blocks_(\d+)_(down|up)sample$")


def _vae_token(token: str) -> str:
    m = _VAE_FLAT_RE.match(token)
    if m:
        return f"{m.group(1)}_blocks.{m.group(2)}.resnets.{m.group(4)}"
    m = _VAE_SAMPLE_RE.match(token)
    if m:
        return f"{m.group(1)}_blocks.{m.group(2)}.{m.group(3)}samplers.0.conv"
    return _diffusers_token(token)


def _hf_clip_token(token: str) -> str:
    token = {
        "token_embedding": "text_model.embeddings.token_embedding",
        "position_embedding": "text_model.embeddings.position_embedding",
        "final_layer_norm": "text_model.final_layer_norm",
        "mlp_fc1": "mlp.fc1",
        "mlp_fc2": "mlp.fc2",
    }.get(token, token)
    m = _IDX_RE.match(token)
    if m and m.group(1) == "layers":
        return f"text_model.encoder.layers.{m.group(2)}"
    return token


def _torchvision_token(token: str) -> str:
    m = re.match(r"^(layer\d)_(\d)$", token)
    if m:
        return f"{m.group(1)}.{m.group(2)}"
    m = re.match(r"^downsample_(\d)$", token)
    if m:
        return f"downsample.{m.group(1)}"
    return token


_TOKEN_FNS: dict[str, Callable[[str], str]] = {
    "diffusers_unet": _diffusers_token,
    "diffusers_controlnet": _diffusers_token,
    "diffusers_vae": _vae_token,
    "hf_clip": _hf_clip_token,
    "torchvision_resnet": _torchvision_token,
}

# leaf-name translation (flax leaf -> torch suffix); family-specific extras
_LEAF_TO_TORCH = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "embedding": "weight",
    "mean": "running_mean",
    "var": "running_var",
}


def flax_path_to_torch_name(path: tuple[str, ...], family: str) -> str:
    """Torch state-dict key for a flax parameter path."""
    token_fn = _TOKEN_FNS[family]
    *mods, leaf = path
    parts = [token_fn(t) for t in mods]
    if leaf in ("position_embedding",):  # raw flax param, torch has .weight
        parts.append(token_fn(leaf))
        leaf_name = "weight"
    else:
        leaf_name = _LEAF_TO_TORCH.get(leaf, leaf)
    name = ".".join([*parts, leaf_name]) if parts else leaf_name
    return name


def _to_flax_array(torch_arr: np.ndarray, flax_leaf_name: str,
                   flax_shape: tuple) -> np.ndarray:
    arr = np.asarray(torch_arr)
    if flax_leaf_name == "kernel":
        if arr.ndim == 4:  # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:  # linear (O, I) -> (I, O)
            arr = arr.T
    if arr.shape != tuple(flax_shape):
        raise ValueError(
            f"shape mismatch: torch {arr.shape} vs flax {tuple(flax_shape)}"
        )
    return arr


def _from_flax_array(flax_arr: np.ndarray, flax_leaf_name: str) -> np.ndarray:
    arr = np.asarray(flax_arr)
    if flax_leaf_name == "kernel":
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2:
            arr = arr.T
    # safetensors.numpy.save_file writes the RAW buffer, silently ignoring
    # strides — a transposed view exports as garbage. Materialize C-order.
    return np.ascontiguousarray(arr)


def _flatten(params: Any) -> list[tuple[tuple[str, ...], Any]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        names = tuple(str(getattr(p, "key", p)) for p in path)
        out.append((names, leaf))
    return out


def port_torch_state_dict(
    state_dict: dict[str, Any],
    target_params: Any,
    family: str,
    strict: bool = True,
    prefix: str = "",
) -> Any:
    """Map a torch state dict onto a flax params tree (import direction)."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}

    # OpenAI CLIP fused qkv -> split before mapping
    if family == "openai_clip":
        sd = _expand_openai_clip(sd)
        family = "hf_clip"
        sd = {_openai_to_hf_name(k): v for k, v in sd.items()}

    flat = _flatten(target_params)
    used = set()
    leaves = []
    for path, leaf in flat:
        tname = flax_path_to_torch_name(path, family)
        if tname not in sd:
            if strict:
                raise KeyError(
                    f"missing torch tensor {tname!r} for flax param "
                    f"{'.'.join(path)}"
                )
            leaves.append(leaf)
            continue
        leaves.append(_to_flax_array(sd[tname], path[-1], leaf.shape))
        used.add(tname)
    if strict:
        unused = set(sd) - used
        unused = {u for u in unused if not u.endswith("num_batches_tracked")}
        unused = {u for u in unused if "position_ids" not in u}
        if unused:
            raise KeyError(f"unconsumed torch tensors: {sorted(unused)[:8]}...")
    treedef = jax.tree_util.tree_structure(target_params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def export_torch_state_dict(params: Any, family: str) -> dict[str, np.ndarray]:
    """flax params -> torch-layout state dict (diffusers interop export)."""
    out = {}
    for path, leaf in _flatten(params):
        out[flax_path_to_torch_name(path, family)] = _from_flax_array(
            leaf, path[-1]
        )
    return out


# ---------------------------------------------------------------------------
# OpenAI CLIP (ViT-B/32 text tower) specifics
# ---------------------------------------------------------------------------


def _expand_openai_clip(sd: dict) -> dict:
    """Split fused attn in_proj into q/k/v."""
    out = {}
    for k, v in sd.items():
        if k.endswith("attn.in_proj_weight"):
            base = k[: -len("in_proj_weight")]
            q, kk, vv = np.split(np.asarray(v), 3, axis=0)
            out[base + "q_proj.weight"] = q
            out[base + "k_proj.weight"] = kk
            out[base + "v_proj.weight"] = vv
        elif k.endswith("attn.in_proj_bias"):
            base = k[: -len("in_proj_bias")]
            q, kk, vv = np.split(np.asarray(v), 3, axis=0)
            out[base + "q_proj.bias"] = q
            out[base + "k_proj.bias"] = kk
            out[base + "v_proj.bias"] = vv
        else:
            out[k] = v
    return out


def _openai_to_hf_name(k: str) -> str:
    """OpenAI clip text-tower names -> HF CLIPText names."""
    k = k.replace("transformer.resblocks.", "text_model.encoder.layers.")
    k = k.replace(".attn.", ".self_attn.")
    k = k.replace(".ln_1.", ".layer_norm1.")
    k = k.replace(".ln_2.", ".layer_norm2.")
    k = k.replace(".mlp.c_fc.", ".mlp.fc1.")
    k = k.replace(".mlp.c_proj.", ".mlp.fc2.")
    k = k.replace("ln_final.", "text_model.final_layer_norm.")
    if k == "token_embedding.weight":
        return "text_model.embeddings.token_embedding.weight"
    if k == "positional_embedding":
        return "text_model.embeddings.position_embedding.weight"
    if k == "text_projection":
        # OpenAI stores (D, P) used as x @ W; HF Linear stores (P, D)
        return "text_projection.weight"
    return k


def load_openai_clip_text(state_dict: dict, target_params: Any) -> Any:
    """Import the text tower from an OpenAI CLIP checkpoint (visual tower
    dropped, like the reference ``genima_act.py:314-346``)."""
    sd = {
        k: v
        for k, v in state_dict.items()
        if not k.startswith("visual.") and k != "logit_scale"
    }
    if "text_projection" in sd:
        # pre-transpose so the generic linear T lands back at (D, P)
        sd["text_projection"] = np.asarray(sd["text_projection"]).T
    return port_torch_state_dict(sd, target_params, "openai_clip")


# ---------------------------------------------------------------------------
# file loading
# ---------------------------------------------------------------------------


def load_torch_file(path: str | Path) -> dict[str, np.ndarray]:
    """Load .safetensors or torch .bin/.pt into numpy arrays."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


# ---------------------------------------------------------------------------
# taesd (AutoencoderTiny) — upstream Sequential-index layout
# ---------------------------------------------------------------------------


def _taesd_seq_name(tower: str, path: tuple[str, ...], n_levels: int,
                    blocks_per_level: int) -> str:
    """flax path inside one taesd tower -> upstream Sequential key.

    Upstream (madebyollin/taesd ``taesd.py``; diffusers ``AutoencoderTiny``
    uses the same order under ``encoder.layers.N`` / ``decoder.layers.N``):

    * encoder: ``[conv, Block, (conv_s2, Block*b)*L, conv]``
    * decoder: ``[Clamp, conv, ReLU, (Block*b, Upsample, conv)*L, Block, conv]``
    * Block:   ``conv = Sequential(conv, ReLU, conv, ReLU, conv)`` +
      optional ``skip`` 1x1 — parameter keys ``conv.0/2/4`` and ``skip``.
    """
    name, *rest = path
    if tower == "encoder":
        if name == "conv_in":
            idx = 0
        elif name == "block_in":
            idx = 1
        elif name.startswith("down_"):
            idx = 2 + int(name[5:]) * (blocks_per_level + 1)
        elif name.startswith("block_"):
            lvl, b = map(int, name[6:].split("_"))
            idx = 2 + lvl * (blocks_per_level + 1) + 1 + b
        elif name == "conv_out":
            idx = 2 + n_levels * (blocks_per_level + 1)
        else:  # pragma: no cover
            raise KeyError(name)
    else:
        if name == "conv_in":
            idx = 1  # 0 is the parameterless Clamp
        elif name.startswith("block_") and name != "block_out":
            lvl, b = map(int, name[6:].split("_"))
            idx = 3 + lvl * (blocks_per_level + 2) + b
        elif name.startswith("up_"):
            idx = 3 + int(name[3:]) * (blocks_per_level + 2) + blocks_per_level + 1
        elif name == "block_out":
            idx = 3 + n_levels * (blocks_per_level + 2)
        elif name == "conv_out":
            idx = 3 + n_levels * (blocks_per_level + 2) + 1
        else:  # pragma: no cover
            raise KeyError(name)
    parts = [str(idx)]
    for token in rest[:-1]:
        if token.startswith("conv_"):
            parts += ["conv", token[5:]]  # Block's inner Sequential index
        else:
            parts.append(token)  # 'skip'
    leaf = "weight" if rest[-1] == "kernel" else rest[-1]
    return ".".join([*parts, leaf])


def load_taesd(state_dict: dict, target_params: Any,
               n_levels: int = 3, blocks_per_level: int = 3) -> Any:
    """Import upstream taesd weights (raw ``taesd_*.pth`` Sequential dicts,
    a merged ``encoder./decoder.`` dict, or diffusers ``AutoencoderTiny``
    ``encoder.layers.``/``decoder.layers.`` names) onto the flax
    AutoencoderTiny tree. Full coverage is a hard requirement."""
    towers: dict[str, dict[str, np.ndarray]] = {"encoder": {}, "decoder": {}}
    for k, v in state_dict.items():
        for tower in towers:
            for pref in (f"{tower}.layers.", f"{tower}."):
                if k.startswith(pref):
                    towers[tower][k[len(pref):]] = v
                    break
            else:
                continue
            break
    flat = _flatten(target_params)
    leaves = []
    for path, leaf in flat:
        tower, *rest = path
        key = _taesd_seq_name(tower, tuple(rest), n_levels, blocks_per_level)
        if key not in towers[tower]:
            raise KeyError(
                f"missing taesd tensor {tower}.{key} for flax param "
                f"{'.'.join(path)}"
            )
        leaves.append(_to_flax_array(towers[tower][key], path[-1], leaf.shape))
    treedef = jax.tree_util.tree_structure(target_params)
    return jax.tree_util.tree_unflatten(treedef, leaves)
