"""Trace-level gate for the optional Pallas TPU kernels.

GSPMD cannot partition Mosaic custom calls, so mesh-sharded traces
(pipeline.generate(mesh=...), dp/sp training) must keep the plain-XLA
formulations of every op that also has a Pallas fast path (temporal
attention, fused int8 matmul). Pipeline code sets this context var around
sharded traces; each kernel's use_* predicate consults it first.
"""

from __future__ import annotations

import contextvars

PALLAS_KERNELS_BLOCKED: contextvars.ContextVar = contextvars.ContextVar(
    "sa_pallas_kernels_blocked", default=False)


def block_pallas_kernels():
    """Returns a context token; call PALLAS_KERNELS_BLOCKED.reset(tok) when
    the sharded trace is done."""
    return PALLAS_KERNELS_BLOCKED.set(True)


def pallas_blocked() -> bool:
    return PALLAS_KERNELS_BLOCKED.get()


# Active mesh for sharded traces: modules deep inside the UNet (temporal
# attention) need to place with_sharding_constraint hints, but threading a
# mesh through Flax module attributes would change every signature. The
# pipeline sets this contextvar around mesh-sharded traces instead (same
# pattern as the kernel gate above).
ACTIVE_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "sa_active_mesh", default=None)


def set_active_mesh(mesh):
    """Returns a token; ACTIVE_MESH.reset(token) when the trace is done."""
    return ACTIVE_MESH.set(mesh)


def active_mesh():
    return ACTIVE_MESH.get()
