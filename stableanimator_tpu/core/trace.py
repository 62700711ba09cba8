"""Debug tracing + profiling utilities.

The reference's only observability is the `todos.debug` shape/stat dump
idiom scattered through its modules (SURVEY.md §5.1). This keeps that idiom
as a first-class, flag-gated tool and adds the TPU-native profiler hook.

Usage:
    from stableanimator_tpu.core import trace
    trace.enable()                      # or STABLEANIMATOR_TRACE=1
    trace.dump("latents", latents)      # prints shape/min/max/mean like the
                                        # reference's todos.debug.output_var

    with trace.profile("denoise", logdir="/tmp/trace"):
        frames = generate(...)          # writes a jax.profiler trace viewable
                                        # in tensorboard / xprof
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import numpy as np

_enabled = os.environ.get("STABLEANIMATOR_TRACE", "0") == "1"


def enable(value: bool = True):
    global _enabled
    _enabled = value


def enabled() -> bool:
    return _enabled


def dump(name: str, x, force: bool = False):
    """Shape/stat dump matching the reference trace format, e.g.
    `tensor [latents] size: [1, 16, 4, 64, 64], min: -6.613, max: 7.504,
    mean: -0.161`. Works on jax arrays, numpy arrays and pytrees."""
    if not (_enabled or force):
        return x
    import jax

    def one(prefix, arr):
        try:
            a = np.asarray(arr, dtype=np.float32)
            print(f"tensor [{prefix}] size: {list(arr.shape)}, "
                  f"min: {a.min():.6f}, max: {a.max():.6f}, mean: {a.mean():.6f}")
        except Exception:
            print(f"[{prefix}] type: {type(arr)}")

    leaves, treedef = jax.tree_util.tree_flatten(x)
    if len(leaves) == 1:
        one(name, leaves[0])
    else:
        for i, leaf in enumerate(leaves):
            one(f"{name}.{i}", leaf)
    return x


@contextlib.contextmanager
def profile(name: str, logdir: Optional[str] = None):
    """jax.profiler trace around a block, plus wall-time print."""
    import jax

    t0 = time.time()
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
    print(f"[trace] {name}: {time.time() - t0:.3f}s"
          + (f" (profile in {logdir})" if logdir else ""))


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in xprof timelines."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
