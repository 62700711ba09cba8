"""Op-set pre-coverage for the real preprocessing ONNX graphs.

The released model files (yolox_l.onnx, dw-ll_ucoco_384.onnx,
scrfd_10g_bnkps.onnx, glintr100.onnx, BiSeNet parsing, I3D for FVD) are
external artifacts this environment cannot fetch, but their architectures
are published. Each test exports a torch subgraph exercising that family's
characteristic ops and checks the executor against torch's forward — so
first contact with the real files cannot crash on an unimplemented op
(VERDICT.md missing #7 / weak #5).

Model -> characteristic ops covered here:
  yolox_l           Focus (strided Slice), SiLU, SPP MaxPool 5/9/13,
                    nearest Upsample (asymmetric/floor), Concat, head
                    Sigmoid/Exp/Split
  dw-ll_ucoco_384   CSPNeXt: channel Split, SE w/ HardSigmoid, GAP, SimCC
                    head Conv->Flatten->Gemm, large-kernel depthwise conv
  scrfd_10g_bnkps   resnet blocks, Shape/Gather/Unsqueeze/Concat->Reshape
                    chains, Transpose heads, BatchNorm
  glintr100         iresnet: PRelu, BN before FC (BatchNorm1d on 2D),
                    Flatten->Gemm
  BiSeNet           bilinear interpolation (half_pixel AND align_corners),
                    attention Mul broadcast, AveragePool
  I3D (FVD metric)  Conv3d stem, MaxPool3d, AvgPool3d, inception Concat
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.test_onnx import _check


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


class TestYoloxOps:
    def test_focus_layer(self, tmp_path):
        class Focus(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(12, 16, 3, padding=1)

            def forward(self, x):
                # strided Slice x4 (yolox Focus): needs Slice with steps=2
                tl = x[..., ::2, ::2]
                bl = x[..., 1::2, ::2]
                tr = x[..., ::2, 1::2]
                br = x[..., 1::2, 1::2]
                return self.conv(torch.cat([tl, bl, tr, br], dim=1))

        _check(tmp_path, Focus(), (_rand(1, 3, 32, 32),))

    def test_spp_and_head(self, tmp_path):
        class SPPHead(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(8, 8, 1)
                self.cls = nn.Conv2d(32, 4, 1)

            def forward(self, x):
                x = F.silu(self.conv(x))
                p5 = F.max_pool2d(x, 5, stride=1, padding=2)
                p9 = F.max_pool2d(x, 9, stride=1, padding=4)
                p13 = F.max_pool2d(x, 13, stride=1, padding=6)
                x = torch.cat([x, p5, p9, p13], dim=1)
                out = self.cls(x)
                obj, rest = out[:, :1], out[:, 1:]
                return torch.sigmoid(obj), torch.exp(rest.clamp(max=4.0))

        _check(tmp_path, SPPHead(), (_rand(1, 8, 20, 20, seed=1),))

    def test_fpn_nearest_upsample(self, tmp_path):
        class FPN(nn.Module):
            def forward(self, hi, lo):
                up = F.interpolate(hi, scale_factor=2, mode="nearest")
                return torch.cat([up, lo], dim=1)

        _check(tmp_path, FPN(),
               (_rand(1, 4, 10, 10, seed=2), _rand(1, 4, 20, 20, seed=3)))


class TestRTMPoseOps:
    def test_cspnext_block_with_se(self, tmp_path):
        class CSPSE(nn.Module):
            def __init__(self):
                super().__init__()
                self.main = nn.Conv2d(8, 8, 3, padding=1)
                self.short = nn.Conv2d(8, 8, 1)
                self.fc = nn.Conv2d(16, 16, 1)

            def forward(self, x):
                a, b = torch.split(x, 8, dim=1)  # channel Split
                a = F.silu(self.main(a))
                b = self.short(b)
                y = torch.cat([a, b], dim=1)
                # channel attention: GAP -> 1x1 -> hardsigmoid -> mul
                w = F.adaptive_avg_pool2d(y, 1)
                w = F.hardsigmoid(self.fc(w))
                return y * w

        _check(tmp_path, CSPSE(), (_rand(1, 16, 12, 12, seed=4),))

    def test_simcc_head(self, tmp_path):
        class SimCC(nn.Module):
            def __init__(self):
                super().__init__()
                self.final = nn.Conv2d(8, 133, 1)
                # large-kernel depthwise conv (RTMCC gau path analog)
                self.dw = nn.Conv2d(8, 8, 7, padding=3, groups=8)
                self.mlp_x = nn.Linear(48, 96)
                self.mlp_y = nn.Linear(48, 128)

            def forward(self, x):
                x = self.dw(x)
                feats = self.final(x).flatten(2)  # [B, K, H*W]
                return self.mlp_x(feats), self.mlp_y(feats)

        _check(tmp_path, SimCC(), (_rand(1, 8, 6, 8, seed=5),))


class TestSCRFDOps:
    def test_resnet_block_and_anchor_head(self, tmp_path):
        class Head(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(8, 8, 3, padding=1)
                self.bn1 = nn.BatchNorm2d(8)
                self.cls = nn.Conv2d(8, 2, 3, padding=1)
                self.box = nn.Conv2d(8, 8, 3, padding=1)
                self.kps = nn.Conv2d(8, 20, 3, padding=1)

            def forward(self, x):
                h = F.relu(self.bn1(self.conv1(x)) + x)
                # dynamic-shape reshape chain: Shape/Gather/Concat -> Reshape
                b = h.shape[0]
                cls = self.cls(h).permute(0, 2, 3, 1).reshape(b, -1, 1)
                box = self.box(h).permute(0, 2, 3, 1).reshape(b, -1, 4)
                kps = self.kps(h).permute(0, 2, 3, 1).reshape(b, -1, 10)
                return torch.sigmoid(cls), box, kps

        _check(tmp_path, Head(), (_rand(1, 8, 16, 16, seed=6),))


class TestArcFaceOps:
    def test_iresnet_tail(self, tmp_path):
        class Tail(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(4, 8, 3, padding=1)
                self.prelu = nn.PReLU(8)
                self.bn2 = nn.BatchNorm2d(8)
                self.fc = nn.Linear(8 * 7 * 7, 32)
                self.features = nn.BatchNorm1d(32)  # BN on 2D input

            def forward(self, x):
                h = self.prelu(self.conv(x))
                h = self.bn2(h).flatten(1)
                return self.features(self.fc(h))

        _check(tmp_path, Tail(), (_rand(2, 4, 7, 7, seed=7),))


class TestBiSeNetOps:
    def test_bilinear_modes(self, tmp_path):
        class Up(nn.Module):
            def forward(self, x):
                a = F.interpolate(x, scale_factor=2, mode="bilinear",
                                  align_corners=False)
                b = F.interpolate(x, size=(15, 17), mode="bilinear",
                                  align_corners=True)
                return a, b

        _check(tmp_path, Up(), (_rand(1, 3, 8, 8, seed=8),))

    def test_attention_refine(self, tmp_path):
        class ARM(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(8, 8, 1)
                self.bn = nn.BatchNorm2d(8)

            def forward(self, x):
                w = F.adaptive_avg_pool2d(x, 1)
                w = torch.sigmoid(self.bn(self.conv(w)))
                return x * w

        _check(tmp_path, ARM(), (_rand(1, 8, 10, 10, seed=9),))

    def test_avgpool(self, tmp_path):
        class P(nn.Module):
            def forward(self, x):
                return F.avg_pool2d(x, 3, stride=2, padding=1)

        _check(tmp_path, P(), (_rand(1, 4, 9, 9, seed=10),))


class TestI3DOps:
    def test_conv3d_inception_stem(self, tmp_path):
        class Stem(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv3d(3, 8, (7, 7, 7), stride=2, padding=3)
                self.b1 = nn.Conv3d(8, 4, 1)
                self.b2 = nn.Conv3d(8, 4, 3, padding=1)

            def forward(self, x):
                x = F.relu(self.conv(x))
                x = F.max_pool3d(x, (1, 3, 3), stride=(1, 2, 2),
                                 padding=(0, 1, 1))
                y = torch.cat([self.b1(x), self.b2(x)], dim=1)
                return F.avg_pool3d(y, (2, 2, 2), stride=2)

        _check(tmp_path, Stem(), (_rand(1, 3, 8, 32, 32, seed=11),),
               atol=3e-4)


class TestExtraOps:
    def test_topk_and_mod(self, tmp_path):
        class M(nn.Module):
            def forward(self, x):
                vals, idx = torch.topk(x, 3, dim=-1)
                return vals, idx.to(torch.int64), torch.remainder(x, 2.5)

        _check(tmp_path, M(), (_rand(2, 4, 16, seed=12),))

    def test_reduce_min_argmin(self, tmp_path):
        class M(nn.Module):
            def forward(self, x):
                return (x.min(dim=1, keepdim=True).values,
                        torch.argmin(x, dim=-1))

        _check(tmp_path, M(), (_rand(2, 5, 7, seed=13),))
