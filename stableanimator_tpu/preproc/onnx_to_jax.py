"""ONNX graph -> jittable JAX function.

Executes the Graph IR from onnx_reader.py with jax.numpy, covering the op
set used by the reference's preprocessing models (YOLOX-L person detector,
RTMPose dw-ll_ucoco_384, SCRFD face detector, ArcFace glintr100 recogniser,
BiSeNet parser — SURVEY.md §2.3). This replaces onnxruntime's C++ CPU/CUDA
execution providers with XLA: the conv backbones compile straight onto the
TPU MXU, and whole frame batches run in one program.

Notes:
  * shapes are static per compilation (standard XLA contract). Shape-
    manipulation chains (Shape/Gather/Unsqueeze/Concat -> Reshape) are
    constant-folded at trace time by keeping "host" values for small
    integer tensors.
  * layout follows ONNX (NCHW); XLA re-layouts internally for TPU.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from stableanimator_tpu.preproc.onnx_reader import Graph, Node, load_onnx


def _auto_pad(node, x_shape, k_shape, strides, dilations):
    ap = node.attrs.get("auto_pad", "NOTSET")
    if isinstance(ap, bytes):
        ap = ap.decode()
    spatial = len(k_shape)
    if ap in ("NOTSET", ""):
        pads = node.attrs.get("pads", [0] * (2 * spatial))
        return [(int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]
    if ap == "VALID":
        return [(0, 0)] * spatial
    # SAME_UPPER / SAME_LOWER
    out = []
    for i in range(spatial):
        in_dim = x_shape[2 + i]
        eff_k = (k_shape[i] - 1) * dilations[i] + 1
        out_dim = -(-in_dim // strides[i])
        total = max(0, (out_dim - 1) * strides[i] + eff_k - in_dim)
        lo = total // 2
        hi = total - lo
        out.append((lo, hi) if ap == "SAME_UPPER" else (hi, lo))
    return out


def _op_conv(node, x, w, b=None):
    spatial = w.ndim - 2
    strides = [int(s) for s in node.attrs.get("strides", [1] * spatial)]
    dilations = [int(d) for d in node.attrs.get("dilations", [1] * spatial)]
    groups = int(node.attrs.get("group", 1))
    pads = _auto_pad(node, x.shape, w.shape[2:], strides, dilations)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NCHW", "OIHW", "NCHW") if spatial == 2
                                        else ("NCDHW", "OIDHW", "NCDHW"))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads, rhs_dilation=dilations,
        dimension_numbers=dn, feature_group_count=groups)
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * spatial)
    return out


def _op_maxpool(node, x):
    k = [int(v) for v in node.attrs["kernel_shape"]]
    spatial = len(k)
    strides = [int(s) for s in node.attrs.get("strides", [1] * spatial)]
    pads = _auto_pad(node, x.shape, k, strides, [1] * spatial)
    ceil_mode = int(node.attrs.get("ceil_mode", 0))
    if ceil_mode:
        new_pads = []
        for i in range(spatial):
            in_dim = x.shape[2 + i] + pads[i][0] + pads[i][1]
            rem = (in_dim - k[i]) % strides[i]
            extra = (strides[i] - rem) % strides[i] if rem else 0
            new_pads.append((pads[i][0], pads[i][1] + extra))
        pads = new_pads
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, *k), window_strides=(1, 1, *strides),
        padding=((0, 0), (0, 0), *pads))


def _op_avgpool(node, x):
    k = [int(v) for v in node.attrs["kernel_shape"]]
    spatial = len(k)
    strides = [int(s) for s in node.attrs.get("strides", [1] * spatial)]
    pads = _auto_pad(node, x.shape, k, strides, [1] * spatial)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, *k), (1, 1, *strides),
        ((0, 0), (0, 0), *pads))
    count_include_pad = int(node.attrs.get("count_include_pad", 0))
    if count_include_pad:
        return summed / np.prod(k)
    ones = jnp.ones(x.shape[2:], x.dtype)[None, None]
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, *k), (1, 1, *strides),
        ((0, 0), (0, 0), *pads))
    return summed / counts


def _resize_1d_indices(in_dim, out_dim, scale, coord_mode):
    """x_original coordinate for each output index (ONNX Resize spec)."""
    i = np.arange(out_dim, dtype=np.float64)
    if coord_mode == "align_corners":
        if out_dim == 1:
            return np.zeros(1)
        return i * (in_dim - 1) / (out_dim - 1)
    if coord_mode == "asymmetric":
        return i / scale
    if coord_mode == "pytorch_half_pixel":
        return (i + 0.5) / scale - 0.5 if out_dim > 1 else np.zeros(out_dim)
    # default: half_pixel
    return (i + 0.5) / scale - 0.5


def _resize_axis(x, axis, out_dim, scale, mode, coord_mode, nearest_mode):
    in_dim = x.shape[axis]
    if in_dim == out_dim:
        return x
    coords = _resize_1d_indices(in_dim, out_dim, scale, coord_mode)
    if mode == "nearest":
        if nearest_mode == "floor":
            idx = np.floor(coords)
        elif nearest_mode == "ceil":
            idx = np.ceil(coords)
        elif nearest_mode == "round_prefer_ceil":
            idx = np.floor(coords + 0.5)
        else:  # round_prefer_floor (default)
            idx = np.ceil(coords - 0.5)
        idx = np.clip(idx, 0, in_dim - 1).astype(np.int32)
        return jnp.take(x, jnp.asarray(idx), axis=axis)
    # linear: gather the two neighbours and lerp
    lo = np.clip(np.floor(coords), 0, in_dim - 1).astype(np.int32)
    hi = np.clip(lo + 1, 0, in_dim - 1)
    w = np.clip(coords - lo, 0.0, 1.0).astype(np.float32)
    shape = [1] * x.ndim
    shape[axis] = out_dim
    wj = jnp.asarray(w).reshape(shape)
    xlo = jnp.take(x, jnp.asarray(lo), axis=axis)
    xhi = jnp.take(x, jnp.asarray(hi), axis=axis)
    return xlo * (1.0 - wj) + xhi * wj


def _op_resize(node, x, *rest):
    # inputs: X, roi?, scales?, sizes?
    def dec(v, default):
        v = node.attrs.get(v, default)
        return v.decode() if isinstance(v, bytes) else v

    mode = dec("mode", "nearest")
    coord_mode = dec("coordinate_transformation_mode", "half_pixel")
    nearest_mode = dec("nearest_mode", "round_prefer_floor")
    scales = sizes = None
    rest = list(rest)
    if len(rest) >= 1 and rest[0] is not None and np.size(rest[0]):
        pass  # roi ignored (only used by tf_crop_and_resize)
    if len(rest) >= 2 and rest[1] is not None and np.size(rest[1]):
        scales = np.asarray(rest[1]).astype(np.float64)
    if len(rest) >= 3 and rest[2] is not None and np.size(rest[2]):
        sizes = [int(v) for v in np.asarray(rest[2])]
    if sizes is None:
        sizes = [int(np.floor(d * s)) for d, s in zip(x.shape, scales)]
    if scales is None:
        scales = [o / d for o, d in zip(sizes, x.shape)]
    if mode == "cubic":
        # bicubic only appears with half_pixel in the wild; jax matches
        return jax.image.resize(x, tuple(sizes), method="bicubic")
    out = x
    for axis, (out_dim, scale) in enumerate(zip(sizes, scales)):
        out = _resize_axis(out, axis, out_dim, scale, mode, coord_mode,
                           nearest_mode)
    return out


def _op_batchnorm(node, x, scale, bias, mean, var):
    eps = float(node.attrs.get("epsilon", 1e-5))
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(var.reshape(shape) + eps)
    return (x - mean.reshape(shape)) * inv * scale.reshape(shape) + bias.reshape(shape)


def _op_gemm(node, a, b, c=None):
    if int(node.attrs.get("transA", 0)):
        a = a.T
    if int(node.attrs.get("transB", 0)):
        b = b.T
    out = jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype)
    out = out * float(node.attrs.get("alpha", 1.0))
    if c is not None:
        out = out + float(node.attrs.get("beta", 1.0)) * c
    return out


def _op_slice(node, x, *rest):
    if rest:  # opset >= 10: starts/ends/axes/steps as inputs
        starts = [int(v) for v in np.asarray(rest[0])]
        ends = [int(v) for v in np.asarray(rest[1])]
        axes = ([int(v) for v in np.asarray(rest[2])] if len(rest) > 2 and rest[2] is not None
                else list(range(len(starts))))
        steps = ([int(v) for v in np.asarray(rest[3])] if len(rest) > 3 and rest[3] is not None
                 else [1] * len(starts))
    else:
        starts = [int(v) for v in node.attrs["starts"]]
        ends = [int(v) for v in node.attrs["ends"]]
        axes = [int(v) for v in node.attrs.get("axes", range(len(starts)))]
        steps = [1] * len(starts)
    idx = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        dim = x.shape[a]
        # ONNX clamps INT64_MAX/MIN style sentinels
        s2 = max(-dim, min(s, dim))
        e2 = max(-dim - 1, min(e, dim)) if st > 0 else max(-dim - 1, min(e, dim))
        idx[a] = slice(s2, e2, st)
    return x[tuple(idx)]


_ELEMENTWISE = {
    "Relu": jax.nn.relu,
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "Exp": jnp.exp,
    "Log": jnp.log,
    "Sqrt": jnp.sqrt,
    "Neg": jnp.negative,
    "Abs": jnp.abs,
    "Floor": jnp.floor,
    "Ceil": jnp.ceil,
    "Erf": jax.scipy.special.erf,
    "Identity": lambda x: x,
    "Softplus": jax.nn.softplus,
    "Round": jnp.round,
}


class OnnxFunction:
    """Callable wrapper: fn(*inputs) -> list of outputs (jit-compatible).

    Initializers split two ways: small / integer tensors (reshape targets,
    resize scales, TopK k, ...) stay host-side numpy so shape-affecting ops
    can fold them at trace time; everything else is a WEIGHT, exposed in
    `self.weights` so `jitted()` can pass it as a function argument — a
    plain `jax.jit(fn)` would bake every weight into the HLO as a literal
    constant, and 100 MB+ constant blobs make (remote) compiles explode."""

    def __init__(self, graph: Graph):
        self.graph = graph
        self.input_names = [n for n, _ in graph.inputs]
        self.static_params = {
            k: v for k, v in graph.initializers.items()
            if v.dtype in (np.int64, np.int32, np.bool_) or v.size <= 64}
        self.weights = {k: v for k, v in graph.initializers.items()
                        if k not in self.static_params}

    def __call__(self, *inputs, _weights=None):
        env: Dict[str, Any] = {}
        env.update(self.static_params)  # host numpy: foldable at trace time
        env.update(self.weights if _weights is None else _weights)
        for name, x in zip(self.input_names, inputs):
            env[name] = x
        for node in self.graph.nodes:
            args = [env[i] if i else None for i in node.inputs]
            outs = self._exec(node, args, env)
            if not isinstance(outs, (list, tuple)):
                outs = [outs]
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        return [env[o] for o in self.graph.outputs]

    def jitted(self, pre=None):
        """jit-compiled callable with weights passed as device-resident
        ARGUMENTS (transferred once) instead of trace-time constants.

        pre: optional input-preprocessing fn applied INSIDE the jit (e.g.
        uint8 -> fp32 cast + normalisation), so callers can ship compact
        dtypes across the host->device boundary; returns one array or a
        tuple matching the graph inputs."""
        import jax as _jax

        def call(weights, *inputs):
            if pre is not None:
                inputs = pre(*inputs)
                if not isinstance(inputs, tuple):
                    inputs = (inputs,)
            return self(*inputs, _weights=weights)

        fn = _jax.jit(call)
        state = {}

        def wrapper(*inputs):
            if "w" not in state:
                state["w"] = _jax.device_put(self.weights)
            return fn(state["w"], *inputs)

        return wrapper

    # -- single-node dispatch ------------------------------------------------

    def _exec(self, node: Node, args: list, env: dict):
        op = node.op_type
        if op in _ELEMENTWISE:
            return _ELEMENTWISE[op](args[0])
        if op == "Conv":
            return _op_conv(node, *args)
        if op == "ConvTranspose":
            return self._conv_transpose(node, *args)
        if op == "Add":
            return args[0] + args[1]
        if op == "Sub":
            return args[0] - args[1]
        if op == "Mul":
            return args[0] * args[1]
        if op == "Div":
            return args[0] / args[1]
        if op == "Pow":
            return args[0] ** args[1]
        if op == "Min":
            return functools.reduce(jnp.minimum, args)
        if op == "Max":
            return functools.reduce(jnp.maximum, args)
        if op == "MatMul":
            return jnp.matmul(args[0], args[1],
                              preferred_element_type=jnp.float32).astype(args[0].dtype)
        if op == "Gemm":
            return _op_gemm(node, *args)
        if op == "MaxPool":
            return _op_maxpool(node, args[0])
        if op in ("AveragePool",):
            return _op_avgpool(node, args[0])
        if op == "GlobalAveragePool":
            return jnp.mean(args[0], axis=tuple(range(2, args[0].ndim)), keepdims=True)
        if op == "BatchNormalization":
            return _op_batchnorm(node, *args[:5])
        if op == "LayerNormalization":
            axis = int(node.attrs.get("axis", -1))
            eps = float(node.attrs.get("epsilon", 1e-5))
            x = args[0]
            mean = jnp.mean(x, axis=axis, keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=axis, keepdims=True)
            out = (x - mean) * jax.lax.rsqrt(var + eps)
            if len(args) > 1 and args[1] is not None:
                out = out * args[1]
            if len(args) > 2 and args[2] is not None:
                out = out + args[2]
            return out
        if op == "Softmax":
            return jax.nn.softmax(args[0], axis=int(node.attrs.get("axis", -1)))
        if op == "LeakyRelu":
            return jax.nn.leaky_relu(args[0], float(node.attrs.get("alpha", 0.01)))
        if op == "HardSigmoid":
            a = float(node.attrs.get("alpha", 0.2))
            b = float(node.attrs.get("beta", 0.5))
            return jnp.clip(a * args[0] + b, 0, 1)
        if op == "HardSwish":
            return args[0] * jnp.clip(args[0] / 6.0 + 0.5, 0, 1)
        if op == "Clip":
            lo = args[1] if len(args) > 1 and args[1] is not None else node.attrs.get("min")
            hi = args[2] if len(args) > 2 and args[2] is not None else node.attrs.get("max")
            return jnp.clip(args[0], lo, hi)
        if op == "PRelu":
            slope = args[1]
            if slope.ndim == 1 and args[0].ndim > 1:
                slope = slope.reshape((1, -1) + (1,) * (args[0].ndim - 2))
            return jnp.where(args[0] >= 0, args[0], args[0] * slope)
        if op == "Concat":
            axis = int(node.attrs["axis"])
            if all(isinstance(a, np.ndarray) for a in args):
                return np.concatenate(args, axis=axis)
            return jnp.concatenate([jnp.asarray(a) for a in args], axis=axis)
        if op == "Reshape":
            shape = [int(v) for v in np.asarray(args[1])]
            if int(node.attrs.get("allowzero", 0)) == 0:
                shape = [args[0].shape[i] if s == 0 else s for i, s in enumerate(shape)]
            return args[0].reshape(shape)
        if op == "Transpose":
            perm = node.attrs.get("perm")
            perm = perm if perm is not None else list(range(args[0].ndim))[::-1]
            return jnp.transpose(args[0], [int(p) for p in perm])
        if op == "Flatten":
            axis = int(node.attrs.get("axis", 1))
            lead = int(np.prod(args[0].shape[:axis])) if axis else 1
            return args[0].reshape(lead, -1)
        if op == "Shape":
            return np.asarray(args[0].shape, dtype=np.int64)
        if op == "Size":
            return np.asarray(int(np.prod(args[0].shape)), dtype=np.int64)
        if op == "Gather":
            axis = int(node.attrs.get("axis", 0))
            indices = args[1]
            if isinstance(args[0], np.ndarray) and isinstance(indices, np.ndarray):
                return np.take(args[0], indices.astype(np.int64), axis=axis)
            return jnp.take(args[0], jnp.asarray(indices), axis=axis)
        if op == "Unsqueeze":
            axes = (node.attrs.get("axes") if "axes" in node.attrs
                    else [int(v) for v in np.asarray(args[1])])
            x = args[0]
            for a in sorted(int(v) for v in axes):
                x = np.expand_dims(x, a) if isinstance(x, np.ndarray) else jnp.expand_dims(x, a)
            return x
        if op == "Squeeze":
            axes = (node.attrs.get("axes") if "axes" in node.attrs
                    else ([int(v) for v in np.asarray(args[1])]
                          if len(args) > 1 and args[1] is not None else None))
            if axes is None:
                return jnp.squeeze(args[0])
            x = args[0]
            for a in sorted((int(v) for v in axes), reverse=True):
                x = np.squeeze(x, a) if isinstance(x, np.ndarray) else jnp.squeeze(x, a)
            return x
        if op == "Cast":
            to = _ONNX_TO_NP[int(node.attrs["to"])]
            if isinstance(args[0], np.ndarray):
                return args[0].astype(to)
            return args[0].astype(to)
        if op == "Constant":
            for key in ("value", "value_float", "value_int", "value_ints", "value_floats"):
                if key in node.attrs:
                    return np.asarray(node.attrs[key])
            raise ValueError("Constant node without value")
        if op == "ConstantOfShape":
            shape = [int(v) for v in np.asarray(args[0])]
            value = node.attrs.get("value", np.zeros((1,), np.float32))
            return np.full(shape, np.asarray(value).reshape(-1)[0],
                           dtype=np.asarray(value).dtype)
        if op == "Range":
            return np.arange(int(np.asarray(args[0])), int(np.asarray(args[1])),
                             int(np.asarray(args[2])), dtype=np.int64)
        if op == "Slice":
            return _op_slice(node, *args)
        if op == "Split":
            axis = int(node.attrs.get("axis", 0))
            if "split" in node.attrs:
                sizes = [int(v) for v in node.attrs["split"]]
            elif len(args) > 1 and args[1] is not None:
                sizes = [int(v) for v in np.asarray(args[1])]
            else:
                n_out = len(node.outputs)
                sizes = [args[0].shape[axis] // n_out] * n_out
            bounds = np.cumsum(sizes)[:-1].tolist()
            return jnp.split(args[0], bounds, axis=axis)
        if op == "Resize":
            return _op_resize(node, *args)
        if op == "Upsample":
            scales = (np.asarray(args[1]) if len(args) > 1
                      else np.asarray(node.attrs["scales"]))
            sizes = [int(round(d * s)) for d, s in zip(args[0].shape, scales)]
            mode = node.attrs.get("mode", "nearest")
            method = "nearest" if "nearest" in str(mode) else "bilinear"
            return jax.image.resize(args[0], tuple(sizes), method=method)
        if op == "Pad":
            return self._pad(node, args)
        if op == "ReduceMean":
            return self._reduce(jnp.mean, node, args)
        if op == "ReduceSum":
            return self._reduce(jnp.sum, node, args)
        if op == "ReduceMax":
            return self._reduce(jnp.max, node, args)
        if op == "ArgMax":
            axis = int(node.attrs.get("axis", 0))
            keep = int(node.attrs.get("keepdims", 1))
            out = jnp.argmax(args[0], axis=axis)
            return jnp.expand_dims(out, axis) if keep else out
        if op == "Expand":
            shape = [int(v) for v in np.asarray(args[1])]
            target = list(jnp.broadcast_shapes(tuple(args[0].shape), tuple(shape)))
            return jnp.broadcast_to(args[0], target)
        if op == "Tile":
            return jnp.tile(args[0], [int(v) for v in np.asarray(args[1])])
        if op == "Where":
            return jnp.where(args[0], args[1], args[2])
        if op == "Equal":
            return args[0] == args[1]
        if op == "Greater":
            return args[0] > args[1]
        if op == "Less":
            return args[0] < args[1]
        if op == "Not":
            return jnp.logical_not(args[0])
        if op == "And":
            return jnp.logical_and(args[0], args[1])
        if op == "Or":
            return jnp.logical_or(args[0], args[1])
        if op == "ReduceL2":
            return self._reduce(
                lambda x, axis, keepdims: jnp.sqrt(jnp.sum(x * x, axis=axis,
                                                           keepdims=keepdims)),
                node, args)
        if op == "Einsum":
            eq = node.attrs["equation"]
            eq = eq.decode() if isinstance(eq, bytes) else eq
            return jnp.einsum(eq, *args)
        if op == "Gelu":
            approx = node.attrs.get("approximate", "none")
            approx = approx.decode() if isinstance(approx, bytes) else approx
            return jax.nn.gelu(args[0], approximate=approx == "tanh")
        if op == "Mod":
            if int(node.attrs.get("fmod", 0)):
                return jnp.fmod(args[0], args[1])
            return jnp.mod(args[0], args[1])
        if op == "Reciprocal":
            return 1.0 / args[0]
        if op == "Sign":
            return jnp.sign(args[0])
        if op == "Sin":
            return jnp.sin(args[0])
        if op == "Cos":
            return jnp.cos(args[0])
        if op == "ReduceMin":
            return self._reduce(jnp.min, node, args)
        if op == "ReduceProd":
            return self._reduce(jnp.prod, node, args)
        if op == "ArgMin":
            axis = int(node.attrs.get("axis", 0))
            keep = bool(int(node.attrs.get("keepdims", 1)))
            out = jnp.argmin(args[0], axis=axis).astype(jnp.int64)
            return jnp.expand_dims(out, axis) if keep else out
        if op == "TopK":
            # k must be a host value (standard in detector graphs)
            k = int(np.asarray(args[1]).reshape(-1)[0])
            axis = int(node.attrs.get("axis", -1))
            largest = int(node.attrs.get("largest", 1))
            x = jnp.asarray(args[0])
            x_m = jnp.moveaxis(x, axis, -1)
            vals, idx = jax.lax.top_k(x_m if largest else -x_m, k)
            if not largest:
                vals = -vals
            return (jnp.moveaxis(vals, -1, axis),
                    jnp.moveaxis(idx.astype(jnp.int64), -1, axis))
        if op == "InstanceNormalization":
            eps = float(node.attrs.get("epsilon", 1e-5))
            x = args[0]
            axes = tuple(range(2, x.ndim))
            mean = jnp.mean(x, axis=axes, keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            return ((x - mean) * jax.lax.rsqrt(var + eps) * args[1].reshape(shape)
                    + args[2].reshape(shape))
        raise NotImplementedError(f"ONNX op '{op}' (node {node.name})")

    def _reduce(self, fn, node, args):
        if "axes" in node.attrs:
            axes = tuple(int(v) for v in node.attrs["axes"])
        elif len(args) > 1 and args[1] is not None:
            axes = tuple(int(v) for v in np.asarray(args[1]))
        else:
            axes = None
        keep = bool(int(node.attrs.get("keepdims", 1)))
        return fn(args[0], axis=axes, keepdims=keep)

    def _pad(self, node, args):
        mode = node.attrs.get("mode", "constant")
        mode = mode.decode() if isinstance(mode, bytes) else mode
        if "pads" in node.attrs:
            pads = [int(v) for v in node.attrs["pads"]]
        else:
            pads = [int(v) for v in np.asarray(args[1])]
        n = args[0].ndim
        pairs = [(pads[i], pads[i + n]) for i in range(n)]
        value = 0.0
        if len(args) > 2 and args[2] is not None:
            value = float(np.asarray(args[2]).reshape(-1)[0])
        jmode = {"constant": "constant", "reflect": "reflect", "edge": "edge"}[mode]
        if jmode == "constant":
            return jnp.pad(args[0], pairs, mode="constant", constant_values=value)
        return jnp.pad(args[0], pairs, mode=jmode)

    def _conv_transpose(self, node, x, w, b=None):
        spatial = w.ndim - 2
        strides = [int(s) for s in node.attrs.get("strides", [1] * spatial)]
        pads = node.attrs.get("pads", [0] * (2 * spatial))
        pairs = [(int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]
        groups = int(node.attrs.get("group", 1))
        if groups != 1:
            raise NotImplementedError("grouped ConvTranspose")
        # ONNX ConvTranspose weight is [in, out, *k]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, np.transpose(w, (1, 0, *range(2, w.ndim))).shape,
            ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCDHW", "OIDHW", "NCDHW"))
        k = w.shape[2:]
        tpads = [(k[i] - 1 - pairs[i][0], k[i] - 1 - pairs[i][1]) for i in range(spatial)]
        w_flip = jnp.flip(jnp.transpose(w, (1, 0, *range(2, w.ndim))),
                          axis=tuple(range(2, w.ndim)))
        out = jax.lax.conv_general_dilated(
            x, w_flip, window_strides=[1] * spatial, padding=tpads,
            lhs_dilation=strides, dimension_numbers=dn)
        if b is not None:
            out = out + b.reshape((1, -1) + (1,) * spatial)
        return out


_ONNX_TO_NP = {
    1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32, 7: np.int64,
    9: np.bool_, 10: np.float16, 11: np.float64,
}


def load_onnx_function(path: str) -> OnnxFunction:
    return OnnxFunction(load_onnx(path))
