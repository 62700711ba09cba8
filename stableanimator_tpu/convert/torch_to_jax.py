"""torch/diffusers checkpoint -> Flax parameter-tree conversion.

Maps the four released checkpoint families onto this framework's modules:

  * the SVD tree's `unet` + StableAnimator `unet.pth` (diffusers
    UNetSpatioTemporalConditionModel naming, including the ID-adapter
    processor weights `...attn2.processor.id_to_{k,v}.weight` installed by
    the reference's attention surgery, inference_basic.py:348-445),
  * the SVD tree's `vae` (AutoencoderKLTemporalDecoder naming),
  * StableAnimator `pose_net.pth` and `face_encoder.pth`
    (reference pose_net.py / id_encoder.py naming),
  * the SVD tree's `image_encoder` (HF CLIPVisionModelWithProjection).

Inputs are flat state dicts mapping torch parameter names to numpy arrays
(use tools/dump_torch_checkpoint.py to produce them from .pth/.safetensors
without needing torch at conversion time). Outputs are `{"params": ...}`
pytrees matching the Flax modules in stableanimator_tpu.models.

Layout rules:
  Linear  [out, in]        -> kernel [in, out]            (transpose)
  Conv2d  [O, I, kh, kw]   -> kernel [kh, kw, I, O]       (2,3,1,0)
  Conv3d  [O, I, kt, kh, kw] -> kernel [kt, kh, kw, I, O] (2,3,4,1,0)
  norm .weight             -> scale
"""

from __future__ import annotations

import re
from typing import Callable, Mapping

import numpy as np


def _t_linear(w):
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _t_conv2d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _t_conv3d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _leaf(torch_key: str, value: np.ndarray):
    """Map a torch parameter to (flax leaf name, converted array)."""
    value = np.asarray(value)
    if torch_key.endswith(".bias"):
        return "bias", value
    if torch_key.endswith(".weight"):
        if value.ndim == 5:
            return "kernel", _t_conv3d(value)
        if value.ndim == 4:
            return "kernel", _t_conv2d(value)
        if value.ndim == 2:
            return "kernel", _t_linear(value)
        if value.ndim == 1:  # GroupNorm / LayerNorm
            return "scale", value
    # bare parameters: mix_factor, scale, class_embedding, ...
    return None, value


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert(sd: Mapping[str, np.ndarray],
             key_map: Callable[[str], tuple[str, ...] | None]) -> dict:
    params: dict = {}
    unmapped = []
    for k, v in sd.items():
        path = key_map(k)
        if path is None:
            unmapped.append(k)
            continue
        leaf, arr = _leaf(k, v)
        if leaf is not None:
            path = path + (leaf,)
        _set(params, path, arr)
    if unmapped:
        raise ValueError(f"unmapped torch keys ({len(unmapped)}): {unmapped[:10]} ...")
    return {"params": params}


def _strip_param_suffix(key: str) -> str:
    return re.sub(r"\.(weight|bias)$", "", key)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

_UNET_LISTS = ("down_blocks", "up_blocks", "resnets", "attentions",
               "transformer_blocks", "temporal_transformer_blocks",
               "downsamplers", "upsamplers")


_UNET_TOPS = ("conv_in", "time_embedding", "add_embedding", "down_blocks",
              "mid_block", "up_blocks", "conv_norm_out", "conv_out")


def _unet_key(torch_key: str):
    if not torch_key.startswith(_UNET_TOPS):
        return None
    k = _strip_param_suffix(torch_key)
    # attention output projection is a ModuleList [Linear, Dropout]
    k = k.replace(".to_out.0", ".to_out")
    # GEGLU feed-forward: net.0 = GEGLU(proj), net.2 = Linear
    k = k.replace(".net.0.proj", ".act.proj")
    k = k.replace(".net.2", ".proj_out")
    # the ID-adapter processor's projections live on our attn2 module
    k = k.replace(".processor.id_to_k", ".id_to_k")
    k = k.replace(".processor.id_to_v", ".id_to_v")
    # fold list indices into flax child names: down_blocks.0 -> down_blocks_0
    for lst in _UNET_LISTS:
        k = re.sub(rf"\b{lst}\.(\d+)", rf"{lst}_\1", k)
    return tuple(k.split("."))


def convert_unet(sd: Mapping[str, np.ndarray]) -> dict:
    return _convert(sd, _unet_key)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _vae_key(torch_key: str):
    k = _strip_param_suffix(torch_key)
    k = k.replace(".to_out.0", ".to_out")
    top, _, rest = k.partition(".")
    if top == "quant_conv":
        return ("quant_conv",)
    if top not in ("encoder", "decoder"):
        return None
    if rest in ("conv_in", "conv_norm_out", "conv_out", "time_conv_out"):
        return (top, rest)
    # everything else flattens into single-level names:
    #   down_blocks.0.resnets.1.norm1 -> down_blocks_0_resnets_1 / norm1
    #   mid_block.attentions.0.to_q   -> mid_block_attentions_0 / to_q
    parts = rest.split(".")
    # split into (block path ending in an index) + (module-local path)
    flat = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("down_blocks", "up_blocks", "resnets", "attentions",
                 "downsamplers", "upsamplers") and i + 1 < len(parts):
            flat.append(f"{p}_{parts[i + 1]}")
            i += 2
        elif p == "mid_block":
            flat.append(p)
            i += 1
        else:
            break
    block = "_".join(flat)
    local = parts[i:]
    return (top, block, *local) if block else (top, *local)


def convert_vae(sd: Mapping[str, np.ndarray]) -> dict:
    return _convert(sd, _vae_key)


# ---------------------------------------------------------------------------
# PoseNet
# ---------------------------------------------------------------------------

def _pose_net_key(torch_key: str):
    k = _strip_param_suffix(torch_key)
    if k == "scale":
        return ("scale",)
    if not k.startswith(("conv_layers", "final_proj")):
        return None
    k = re.sub(r"\bconv_layers\.(\d+)", r"conv_layers_\1", k)
    return tuple(k.split("."))


def convert_pose_net(sd: Mapping[str, np.ndarray]) -> dict:
    return _convert(sd, _pose_net_key)


# ---------------------------------------------------------------------------
# FusionFaceId
# ---------------------------------------------------------------------------

def _face_encoder_key(torch_key: str):
    if not torch_key.startswith(("proj", "norm", "fusion_model")):
        return None
    k = _strip_param_suffix(torch_key)
    k = re.sub(r"\bproj\.(\d+)", r"proj_\1", k)  # proj.0 / proj.2 MLP
    # fusion_model.layers.{i}.0 = PerceiverAttention, .1 = FeedForward
    k = re.sub(r"\blayers\.(\d+)\.0", r"layers_\1_attn", k)
    # FeedForward Sequential: 0=LayerNorm, 1=Linear, 3=Linear
    k = re.sub(r"\blayers\.(\d+)\.1\.0", r"layers_\1_ff.norm", k)
    k = re.sub(r"\blayers\.(\d+)\.1\.1", r"layers_\1_ff.fc1", k)
    k = re.sub(r"\blayers\.(\d+)\.1\.3", r"layers_\1_ff.fc2", k)
    return tuple(k.split("."))


def convert_face_encoder(sd: Mapping[str, np.ndarray]) -> dict:
    return _convert(sd, _face_encoder_key)


# ---------------------------------------------------------------------------
# CLIP vision tower (HF naming)
# ---------------------------------------------------------------------------

def _clip_key(torch_key: str):
    k = _strip_param_suffix(torch_key)
    if k == "visual_projection":
        return ("visual_projection",)
    prefix = "vision_model."
    if not k.startswith(prefix):
        return None
    k = k[len(prefix):]
    k = k.replace("embeddings.patch_embedding", "patch_embedding")
    k = k.replace("embeddings.position_embedding", "position_embedding")
    k = k.replace("embeddings.class_embedding", "class_embedding")
    k = k.replace("encoder.layers.", "layers_").replace("self_attn.", "")
    k = k.replace("mlp.", "")
    # layers_0.q_proj -> layers_0/q_proj
    k = re.sub(r"^(layers_\d+)\.", r"\1/", k).replace("/", ".")
    return tuple(k.split("."))


def convert_clip_vision(sd: Mapping[str, np.ndarray]) -> dict:
    params = {}
    for k, v in sd.items():
        path = _clip_key(k)
        if path is None:
            continue  # text tower keys etc.
        v = np.asarray(v)
        if k == "vision_model.embeddings.position_embedding.weight":
            _set(params, path, v)  # [num_pos, dim] used as-is
            continue
        leaf, arr = _leaf(k, v)
        if leaf is not None:
            path = path + (leaf,)
        _set(params, path, arr)
    return {"params": params}


# ---------------------------------------------------------------------------
# SVD -> StableAnimator initialisation detail
# ---------------------------------------------------------------------------

def init_id_adapter_from_svd(unet_params: dict) -> dict:
    """For a vanilla SVD unet (no id_to_k/id_to_v), initialise the ID
    adapter from the corresponding cross-attention to_k/to_v, as the
    reference does at load time (inference_basic.py:372-377)."""

    params = unet_params["params"]

    def visit(node, parent_name=""):
        if not isinstance(node, dict):
            return
        for name, child in list(node.items()):
            # only the *spatial* transformer blocks carry the ID adapter
            # (the reference's surgery matches "transformer_blocks...attn2"
            # and routes temporal blocks to plain attention)
            if (name == "attn2" and parent_name.startswith("transformer_blocks")
                    and isinstance(child, dict) and "to_k" in child
                    and "id_to_k" not in child):
                child["id_to_k"] = {"kernel": np.array(child["to_k"]["kernel"])}
                child["id_to_v"] = {"kernel": np.array(child["to_v"]["kernel"])}
            visit(child, name)

    visit(params)
    return unet_params
