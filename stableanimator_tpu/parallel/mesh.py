"""Device mesh + sharding rules.

Two mesh axes:
  * "data":  data parallelism — training batch, and at inference the
    CFG x temporal-tile batch of the UNet call,
  * "frame": sequence parallelism over the video frame axis — VAE decode
    chunks and (optionally) UNet frames. Cross-frame ops (temporal conv
    k=3, temporal attention over F<=16, temporal GroupNorm stats) lower to
    GSPMD halo exchanges / all-gathers over ICI; everything spatial is
    embarrassingly parallel along this axis.

The reference's only parallelism is accelerate/NCCL DDP for training
(SURVEY.md §2.2); inference there is single-GPU. Here both paths are
mesh-native: pjit emits the collectives.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FRAME_AXIS = "frame"


def make_mesh(data: int = 1, frame: int = 1, devices=None) -> Mesh:
    """Build a (data, frame) mesh. With defaults (1,1) and multiple devices,
    puts everything on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data * frame == 1 and n > 1:
        data = n
    if data * frame > n:
        raise ValueError(f"mesh {data}x{frame} needs {data*frame} devices, have {n}")
    dev = np.asarray(devices[: data * frame]).reshape(data, frame)
    return Mesh(dev, (DATA_AXIS, FRAME_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Leading axis over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def video_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    """[B, F, ...] tensors: batch over data, frames over frame axis."""
    return NamedSharding(mesh, P(DATA_AXIS, FRAME_AXIS, *([None] * (ndim - 2))))


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh (the 1.5B-param UNet
    fits per chip — SURVEY.md §2.2; FSDP sharding of optimizer state is a
    training-side option, see train/train_step.py)."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), params)


def zero_sharding_for(x, mesh: Mesh, axis=DATA_AXIS) -> NamedSharding:
    """ZeRO-1 style sharding for one optimizer-state leaf: split the first
    axis divisible by the mesh-axis size; replicate scalars/odd shapes.

    axis may be one mesh axis name or a tuple of axis names — a tuple
    shards the leaf over their COMBINED device count (e.g.
    ("data", "frame") on a 4x2 mesh splits moments 8 ways; on the
    full-unet finetune the fp32 Adam moments are ~11.4 GB replicated, so
    the 8-way split is what brings the step under a v5e's 16 GB — see
    tools/aot_v5e8.py's compiler-verified numbers)."""
    if isinstance(axis, str):
        n = mesh.shape[axis]
    else:
        axis = tuple(axis)
        n = 1
        for a in axis:
            n *= mesh.shape[a]
    spec = [None] * getattr(x, "ndim", 0)
    for i, dim in enumerate(getattr(x, "shape", ())):
        if dim % n == 0 and dim >= n:
            spec[i] = axis
            break
    return NamedSharding(mesh, P(*spec))


def shard_optimizer_state(opt_state, mesh: Mesh, axis: str = DATA_AXIS):
    """Shard Adam moments (and any other param-shaped optimizer leaves)
    across the mesh so optimizer memory scales 1/n_devices (ZeRO-1).
    Training at the reference's 512^2 x 16-frame config needs ~36 GB with
    replicated fp32 Adam state — more than one v5e chip; sharded over 8
    chips it fits. GSPMD inserts the gather/scatter collectives."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, zero_sharding_for(x, mesh, axis)), opt_state)
