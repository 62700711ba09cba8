"""Trace-level context for mesh-sharded graphs.

Active mesh for sharded traces: modules deep inside the UNet (temporal
attention) need to place with_sharding_constraint hints, but threading a
mesh through Flax module attributes would change every signature. The
pipeline sets this contextvar around mesh-sharded traces instead.
"""

from __future__ import annotations

import contextvars

ACTIVE_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "sa_active_mesh", default=None)


def set_active_mesh(mesh):
    """Returns a token; ACTIVE_MESH.reset(token) when the trace is done."""
    return ACTIVE_MESH.set(mesh)


def active_mesh():
    return ACTIVE_MESH.get()
