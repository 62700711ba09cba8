#!/usr/bin/env python
"""Training-step benchmark on the real chip: full-size models, one device,
512^2 x 16 frames, remat on — the reference trains this config at ~40 GB on
A100s (README.md:350); remat + bf16 fits it in a v5e's 16 GB.

Reports seconds/step and an estimated tokens... clips/hour/chip.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--encode_chunk", type=int, default=4)
    ap.add_argument("--trainable", type=str,
                    default="unet,pose_net,face_encoder",
                    help="comma list; 'pose_net,face_encoder' = adapter-only "
                         "finetune that fits one 16GB chip")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from stableanimator_tpu.core.config import PipelineConfig, TrainConfig
    from stableanimator_tpu.pipeline import build_models, init_params
    from stableanimator_tpu.train import create_train_state, make_train_step

    models = build_models(dtype=jnp.bfloat16, remat=True)
    params = jax.jit(lambda k: init_params(models, k, height=args.height,
                                           width=args.width, num_frames=2))(
        jax.random.PRNGKey(0))

    cfg = TrainConfig(lr_warmup_steps=1, gradient_checkpointing=True)
    pipe = PipelineConfig(height=args.height, width=args.width,
                          num_frames=args.frames)
    trainable_keys = tuple(args.trainable.split(","))
    state, tx = create_train_state(params, cfg, trainable_keys=trainable_keys)
    # frozen weights carry no optimizer state and may live in bf16 (the
    # fp32-island modules upcast per-op, like the reference's fp16 weights)
    state = state._replace(frozen=jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        state.frozen))
    # free the fp32 originals — keeping them alive doubles param HBM
    del params
    import gc

    gc.collect()
    step = make_train_step(models, tx, cfg, pipe, donate=False)

    b, f, h, w = args.batch, args.frames, args.height, args.width
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.uniform(-1, 1, (b, f, h, w, 3)), jnp.float32),
        "ref_image": jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32),
        "pose_pixels": jnp.asarray(rng.uniform(-1, 1, (b, f, h, w, 3)), jnp.float32),
        "face_embed": jnp.asarray(rng.normal(size=(b, 512)), jnp.float32),
        "face_mask": jnp.asarray(rng.integers(0, 2, (b, f, h, w, 1)), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    state, metrics = step(state, batch, key)
    loss = float(metrics["loss"])  # host fetch = true sync
    print(f"compile+first step: {time.time() - t0:.1f}s, loss={loss:.4f}")

    ts = []
    for _ in range(3):
        t0 = time.time()
        state, metrics = step(state, batch, key)
        float(metrics["loss"])
        ts.append(time.time() - t0)
    sec = min(ts)
    print(f"train step ({b}x{f}f @ {h}x{w}, remat, bf16, "
          f"trainable={args.trainable}): {sec:.2f}s/step "
          f"-> {3600 / sec * b:.0f} clips/hour/chip")


if __name__ == "__main__":
    main()
