#!/usr/bin/env python
"""Training-step benchmark on the real chip: full-size models, one device,
512^2 x 16 frames, remat on — the reference trains this config at ~40 GB on
A100s (README.md:349-350); remat + bf16 fits the adapter-only finetune
(pose_net + face_encoder trainable, UNet/VAE frozen) in a v5e's 16 GB.

Prints ONE JSON line:
  {"metric": "train_step_seconds", "value": ..., "detail": {...}}
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
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
    # donate the state: aliasing the 4.9 GB output state onto the argument
    # buffers is what fits the full-size step in a 16 GB chip (without it
    # the program needs args 5.0G + out 4.9G + temps 12.5G = 17.5G > HBM)
    step = make_train_step(models, tx, cfg, pipe, donate=True)

    b, f, h, w = args.batch, args.frames, args.height, args.width
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.uniform(-1, 1, (b, f, h, w, 3)), jnp.float32),
        "ref_image": jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32),
        "pose_pixels": jnp.asarray(rng.uniform(-1, 1, (b, f, h, w, 3)), jnp.float32),
        "face_embed": jnp.asarray(rng.normal(size=(b, 512)), jnp.float32),
        "face_mask": jnp.asarray(rng.integers(0, 2, (b, f, h, w, 1)), jnp.float32),
    }
    def log(msg):
        print(f"[bench_train] {msg}", file=sys.stderr, flush=True)

    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])  # host fetch = true sync
    compile_s = time.time() - t0
    log(f"compile+first step: {compile_s:.1f}s, loss={loss:.4f}")

    ts = []
    for i in range(3):
        # vary the PRNG key each run: the remote platform memoizes identical
        # program+input executions (NOTES_ROUND3 tunnel cost model)
        t0 = time.time()
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
        float(metrics["loss"])
        ts.append(time.time() - t0)
        log(f"run {i}: {ts[-1]:.2f}s")
    sec = min(ts)

    detail = {
        "height": h, "width": w, "frames": f, "batch": b,
        "trainable": args.trainable, "remat": True, "dtype": "bf16",
        "device": str(jax.devices()[0]),
        "compile_plus_first_step_s": round(compile_s, 1),
        "all_runs_s": [round(t, 2) for t in ts],
        "clips_per_hour_per_chip": round(3600 / sec * b, 1),
    }
    try:
        ms = jax.devices()[0].memory_stats() or {}
        detail["hbm_peak_bytes"] = ms.get("peak_bytes_in_use")
        detail["hbm_limit_bytes"] = ms.get("bytes_limit")
    except Exception:
        pass
    print(json.dumps({"metric": "train_step_seconds", "value": round(sec, 2),
                      "unit": "seconds", "detail": detail}), flush=True)


if __name__ == "__main__":
    main()
