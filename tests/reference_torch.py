"""Import the REAL reference torch modules from /root/reference for parity
testing (VERDICT round-2 item #2: parity against the actual reference code,
not just self-authored oracles).

The reference modules need `diffusers`, `xformers`, and delldu's `todos`
debug package, none of which are installed. None of their functionality is
load-bearing for a forward pass:

  * diffusers supplies base-class mixins (ModelMixin ~= nn.Module,
    ConfigMixin/register_to_config = kwargs recording) and two helpers
    (randn_tensor, logging.get_logger)
  * xformers supplies memory_efficient_attention, which is plain
    softmax(q k^T / sqrt(d)) v — reimplemented here in torch (the reference
    itself documents this equivalence in its non-xformers fallback branch,
    reference unet.py:812-815 / F.scaled_dot_product_attention calls)
  * todos is a debug-print package; every call site in the forward paths is
    commented out

So we install minimal stand-ins into sys.modules, then import the reference
modules unmodified. This gives tests the REAL checkpoint key space: the
released .pth files load into these modules with strict=True
(reference inference_basic.py:449-471), so `state_dict()` of these modules
IS the released key space.
"""

from __future__ import annotations

import functools
import importlib
import inspect
import sys
import types

import torch


def _make_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _install_stubs() -> None:
    if "diffusers" in sys.modules and getattr(
            sys.modules["diffusers"], "__sa_stub__", False):
        return

    # ---- xformers: exact-math memory_efficient_attention ------------------
    def memory_efficient_attention(q, k, v, attn_bias=None, op=None,
                                   scale=None):
        assert attn_bias is None
        if scale is None:
            scale = q.shape[-1] ** -0.5
        attn = (q.float() @ k.float().transpose(-2, -1)) * scale
        attn = attn.softmax(dim=-1)
        return (attn @ v.float()).to(q.dtype)

    xformers = _make_module("xformers")
    xformers_ops = _make_module("xformers.ops")
    xformers_ops.memory_efficient_attention = memory_efficient_attention
    xformers.ops = xformers_ops

    # ---- todos: delldu's debug-print package (all call sites commented) ---
    todos = _make_module("todos")
    todos.debug = types.SimpleNamespace(
        output_var=lambda *a, **k: None,
        output_dict=lambda *a, **k: None,
    )

    # ---- diffusers ---------------------------------------------------------
    diffusers = _make_module("diffusers")
    diffusers.__sa_stub__ = True

    class FrozenConfig(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            init(self, *args, **kwargs)
            self._sa_config = FrozenConfig(cfg)
        return wrapper

    class ConfigMixin:
        @property
        def config(self):
            return getattr(self, "_sa_config", FrozenConfig())

    class ModelMixin(torch.nn.Module):
        pass

    cfg_utils = _make_module("diffusers.configuration_utils")
    cfg_utils.ConfigMixin = ConfigMixin
    cfg_utils.register_to_config = register_to_config

    loaders = _make_module("diffusers.loaders")
    loaders.UNet2DConditionLoadersMixin = type(
        "UNet2DConditionLoadersMixin", (), {})

    models = _make_module("diffusers.models")
    modeling_utils = _make_module("diffusers.models.modeling_utils")
    modeling_utils.ModelMixin = ModelMixin
    models.modeling_utils = modeling_utils

    utils = _make_module("diffusers.utils")

    import logging as _logging

    utils.logging = types.SimpleNamespace(get_logger=_logging.getLogger)

    torch_utils = _make_module("diffusers.utils.torch_utils")

    def randn_tensor(shape, generator=None, device=None, dtype=None,
                     layout=None):
        return torch.randn(shape, generator=generator, device=device,
                           dtype=dtype)

    torch_utils.randn_tensor = randn_tensor
    utils.torch_utils = torch_utils

    import_utils = _make_module("diffusers.utils.import_utils")
    import_utils.is_xformers_available = lambda: True
    utils.import_utils = import_utils

    diffusers.configuration_utils = cfg_utils
    diffusers.loaders = loaders
    diffusers.models = models
    diffusers.utils = utils


def load_reference_module(name: str):
    """Import `animation.modules.<name>` from /root/reference (read-only),
    installing the dependency stand-ins first."""
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module(f"animation.modules.{name}")


def state_dict_numpy(model: torch.nn.Module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def state_dict_shapes(model: torch.nn.Module) -> dict:
    """Key -> shape tuple, works for meta-device models (no data)."""
    return {k: tuple(v.shape) for k, v in model.state_dict().items()}


def install_reference_processors(unet, unet_module, svd_sd=None,
                                 cross_attention_dim=1024):
    """Replicate the reference's attention-processor surgery
    (inference_basic.py:348-445): temporal blocks get XFormersAttnProcessor,
    spatial attn1 gets AnimationAttnProcessor, spatial attn2 gets
    AnimationIDAttnNormalizedProcessor (whose id_to_k/id_to_v appear in the
    released unet.pth key space as `...attn2.processor.id_to_{k,v}.weight`).
    """
    attn_procs = {}
    block_out = unet.config.block_out_channels
    for name in unet.attn_processors.keys():
        if "temporal_transformer_blocks" in name:
            attn_procs[name] = unet_module.XFormersAttnProcessor()
        elif "transformer_blocks" in name:
            cad = (None if name.endswith("attn1.processor")
                   else cross_attention_dim)
            if name.startswith("mid_block"):
                hidden_size = block_out[-1]
            elif name.startswith("up_blocks"):
                block_id = int(name[len("up_blocks.")])
                hidden_size = list(reversed(block_out))[block_id]
            else:
                block_id = int(name[len("down_blocks.")])
                hidden_size = block_out[block_id]
            if cad is None:
                attn_procs[name] = unet_module.AnimationAttnProcessor(
                    hidden_size=hidden_size)
            else:
                proc = unet_module.AnimationIDAttnNormalizedProcessor(
                    hidden_size=hidden_size, cross_attention_dim=cad)
                if svd_sd is not None:
                    layer = name.split(".processor")[0]
                    # the reference initialises id_to_k/v from the SVD
                    # to_k/to_v weights (inference_basic.py:372-377; its
                    # `to_k_ip` naming silently no-ops under strict=False,
                    # but the released unet.pth carries the trained values)
                    with torch.no_grad():
                        proc.id_to_k.weight.copy_(
                            torch.as_tensor(svd_sd[layer + ".to_k.weight"]))
                        proc.id_to_v.weight.copy_(
                            torch.as_tensor(svd_sd[layer + ".to_v.weight"]))
                attn_procs[name] = proc
    unet.set_attn_processor(attn_procs)
    return unet
