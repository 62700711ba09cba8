"""ONNX reader + JAX executor tests.

torch.onnx.export generates real ONNX files (YOLOX/RTMPose-style conv nets
and odd op mixes); the executor's output is compared against torch's own
forward. This validates the protobuf parser and every op on the models'
paths without needing onnxruntime.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from stableanimator_tpu.preproc.onnx_reader import load_onnx
from stableanimator_tpu.preproc.onnx_to_jax import load_onnx_function


# torch's legacy exporter only needs the `onnx` package for onnxscript
# custom-function injection, which these plain models never use; bypass it
# so export works without the (absent) onnx package.
from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes


def _export(tmp_path, model, inputs, name="m.onnx", opset=17):
    path = str(tmp_path / name)
    model = model.eval()
    with torch.no_grad():
        torch.onnx.export(model, inputs, path, opset_version=opset,
                          dynamo=False)
    return path


def _check(tmp_path, model, np_inputs, atol=1e-4, opset=17):
    t_inputs = tuple(torch.from_numpy(x) for x in np_inputs)
    path = _export(tmp_path, model, t_inputs, opset=opset)
    fn = load_onnx_function(path)
    outs = fn(*np_inputs)
    with torch.no_grad():
        ref = model(*t_inputs)
    refs = ref if isinstance(ref, (tuple, list)) else (ref,)
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-4, atol=atol)


class TestReader:
    def test_parse_structure(self, tmp_path):
        model = nn.Sequential(nn.Conv2d(3, 8, 3, padding=1), nn.SiLU(),
                              nn.Conv2d(8, 4, 1))
        x = torch.randn(1, 3, 16, 16)
        path = _export(tmp_path, model, (x,))
        g = load_onnx(path)
        assert len(g.nodes) >= 3
        assert len(g.inputs) == 1
        assert len(g.outputs) == 1
        assert any(v.ndim == 4 for v in g.initializers.values())


class TestExecutor:
    def test_conv_silu_stack(self, tmp_path):
        torch.manual_seed(0)
        model = nn.Sequential(
            nn.Conv2d(3, 8, 3, stride=2, padding=1), nn.SiLU(),
            nn.Conv2d(8, 8, 3, padding=1, groups=2), nn.BatchNorm2d(8), nn.ReLU(),
            nn.Conv2d(8, 4, 1),
        )
        x = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
        _check(tmp_path, model, (x,))

    def test_yolox_style_block(self, tmp_path):
        """CSP-ish block: focus slice+concat, maxpool SPP, upsample, concat."""
        torch.manual_seed(1)

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(12, 16, 1)
                self.conv2 = nn.Conv2d(64, 16, 1)
                self.head = nn.Conv2d(19, 6, 1)

            def forward(self, x):
                # Focus: space-to-depth via strided slices (YOLOX stem)
                p = torch.cat([x[..., ::2, ::2], x[..., 1::2, ::2],
                               x[..., ::2, 1::2], x[..., 1::2, 1::2]], dim=1)
                y = F.silu(self.conv1(p))
                spp = torch.cat([y,
                                 F.max_pool2d(y, 5, 1, 2),
                                 F.max_pool2d(y, 9, 1, 4),
                                 F.max_pool2d(y, 13, 1, 6)], dim=1)
                y = F.silu(self.conv2(spp))
                up = F.interpolate(y, scale_factor=2.0, mode="nearest")
                out = torch.cat([up, x], dim=1)
                return self.head(out).sigmoid()

        x = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
        _check(tmp_path, Block(), (x,))

    def test_rtmpose_style_head(self, tmp_path):
        """GAP + fc + simcc-style reshape/split + softmax."""
        torch.manual_seed(2)

        class Head(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(3, 8, 7, stride=4, padding=3)
                self.fc = nn.Linear(8 * 8 * 8, 12 * 16)

            def forward(self, x):
                y = F.gelu(self.conv(x))
                y = y.flatten(1)
                y = self.fc(y).reshape(-1, 12, 16)
                sx, sy = y.split([8, 8], dim=2)
                return sx.softmax(-1), sy.softmax(-1)

        x = np.random.default_rng(2).normal(size=(2, 3, 32, 32)).astype(np.float32)
        _check(tmp_path, Head(), (x,))

    def test_arcface_style_net(self, tmp_path):
        """PReLU resnet-ish blocks + BN + flatten + linear + l2 norm."""
        torch.manual_seed(3)

        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, 8, 3, padding=1)
                self.prelu = nn.PReLU(8)
                self.conv2 = nn.Conv2d(8, 8, 3, stride=2, padding=1)
                self.bn = nn.BatchNorm2d(8)
                self.fc = nn.Linear(8 * 16 * 16, 16)

            def forward(self, x):
                y = self.prelu(self.conv1(x))
                y = self.bn(self.conv2(y))
                emb = self.fc(y.flatten(1))
                return emb / emb.norm(dim=1, keepdim=True)

        x = np.random.default_rng(3).normal(size=(1, 3, 32, 32)).astype(np.float32)
        _check(tmp_path, Net(), (x,))

    def test_misc_ops(self, tmp_path):
        torch.manual_seed(4)

        class Misc(nn.Module):
            def forward(self, x):
                y = x.permute(0, 2, 3, 1)
                y = torch.clamp(y, -0.5, 0.5)
                y = F.avg_pool2d(x, 2)
                z = torch.exp(-y.abs())
                w = torch.where(y > 0, y, z)
                return w.mean(dim=(2, 3)), w.max(dim=1).values

        x = np.random.default_rng(4).normal(size=(2, 4, 8, 8)).astype(np.float32)
        _check(tmp_path, Misc(), (x,))

    def test_transpose_matmul_reshape_chain(self, tmp_path):
        torch.manual_seed(5)

        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.q = nn.Linear(16, 16)
                self.k = nn.Linear(16, 16)

            def forward(self, x):
                b, s, d = x.shape
                q = self.q(x).reshape(b, s, 2, 8).transpose(1, 2)
                k = self.k(x).reshape(b, s, 2, 8).transpose(1, 2)
                att = (q @ k.transpose(-1, -2)).softmax(-1)
                return att.reshape(b, -1)

        x = np.random.default_rng(5).normal(size=(2, 4, 16)).astype(np.float32)
        _check(tmp_path, Net(), (x,))
