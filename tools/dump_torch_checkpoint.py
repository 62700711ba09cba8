#!/usr/bin/env python
"""Dump torch / safetensors checkpoints to numpy .npz for the converter.

Run this once, wherever torch is available, on the released artifacts:

  python tools/dump_torch_checkpoint.py \\
      --input checkpoints/Animation/pose_net.pth --output pose_net.npz
  python tools/dump_torch_checkpoint.py \\
      --input checkpoints/SVD/.../unet/diffusion_pytorch_model.safetensors \\
      --output svd_unet.npz

Then build Flax params (no torch needed):

  from stableanimator_tpu.convert import convert_unet
  params = convert_unet(dict(np.load("svd_unet.npz")))
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def load_state_dict(path: str):
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if v.dtype in (torch.float16, torch.bfloat16)
            else v.numpy() for k, v in sd.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    sd = load_state_dict(args.input)
    np.savez(args.output, **sd)
    print(f"wrote {len(sd)} tensors to {args.output}")


if __name__ == "__main__":
    main()
