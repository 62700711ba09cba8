"""Training CLI — the reference's `train.py` contract
(command_train.sh:1-21, command_finetune.sh, README.md:285-363), TPU-native:
data-parallel pjit over the device mesh instead of accelerate/NCCL DDP,
orbax checkpoints with `latest` resume, bf16 mixed precision.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description="StableAnimator-TPU training")
    p.add_argument("--checkpoint_dir", type=str, required=True,
                   help="converted .npz checkpoints (see cli/animate.py)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--data_root_path", type=str, required=True)
    p.add_argument("--rec_data_path", type=str, default=None)
    p.add_argument("--vec_data_path", type=str, default=None)
    p.add_argument("--data_path", type=str, default=None,
                   help="single path-list file at dataset_width/height (the "
                        "reference train_single.py flag; alias for "
                        "--rec_data_path)")
    p.add_argument("--validation_image_folder", type=str, default=None)
    p.add_argument("--validation_control_folder", type=str, default=None)
    p.add_argument("--validation_image", type=str, default=None)
    p.add_argument("--dataset_width", type=int, default=512)
    p.add_argument("--dataset_height", type=int, default=512)
    p.add_argument("--sample_n_frames", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--per_device_batch_size", type=int, default=1)
    p.add_argument("--num_train_epochs", type=int, default=6000)
    p.add_argument("--max_train_steps", type=int, default=0)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--checkpointing_steps", type=int, default=2000)
    p.add_argument("--checkpoints_total_limit", type=int, default=5000)
    p.add_argument("--validation_steps", type=int, default=500)
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--mixed_precision", type=str, default="bf16")
    p.add_argument("--conditioning_dropout_prob", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=23123134)
    p.add_argument("--finetune_mode", type=bool, default=False)
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help='"latest" or a step number')
    p.add_argument("--num_workers", type=int, default=8)  # parity flag
    p.add_argument("--report_to", type=str, default="jsonl",
                   choices=["jsonl", "tensorboard", "none"],
                   help="persistent metrics stream (reference --report_to "
                        "intent): metrics.jsonl, + TensorBoard mirror, or "
                        "stdout only")
    p.add_argument("--allow_random_init", action="store_true")
    p.add_argument("--trainable_modules", type=str,
                   default="unet,pose_net,face_encoder",
                   help="what the optimizer updates (reference trains all "
                        "three; 'pose_net,face_encoder' fits one 16GB chip)")
    p.add_argument("--model_scale", type=str, default="full",
                   choices=["full", "micro"],
                   help="'micro' = depth-1 tiny model zoo for smoke-testing "
                        "the full training loop (data, sharding, step, "
                        "metrics, checkpoint/resume) in seconds")
    return p.parse_args()


def main():
    args = parse_args()

    from stableanimator_tpu.cli.animate import load_params
    from stableanimator_tpu.core.checkpoint import CheckpointManager
    from stableanimator_tpu.core.config import PipelineConfig, TrainConfig
    from stableanimator_tpu.parallel import (
        make_mesh, shard_optimizer_state, shard_params)
    from stableanimator_tpu.pipeline import build_models
    from stableanimator_tpu.train import TrainState, create_train_state, make_train_step
    from stableanimator_tpu.train.data import (
        AnimationDataset,
        MixedResolutionSampler,
        PrefetchLoader,
        read_path_list,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = TrainConfig(
        sample_n_frames=args.sample_n_frames,
        per_device_batch_size=args.per_device_batch_size,
        learning_rate=args.learning_rate,
        lr_warmup_steps=args.lr_warmup_steps,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        num_train_epochs=args.num_train_epochs,
        max_train_steps=args.max_train_steps,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        validation_steps=args.validation_steps,
        gradient_checkpointing=args.gradient_checkpointing,
        mixed_precision=args.mixed_precision,
        seed=args.seed,
    )
    pipe = PipelineConfig(height=args.dataset_height, width=args.dataset_width,
                          num_frames=args.sample_n_frames)

    model_kwargs = dict(
        dtype=jnp.bfloat16 if args.mixed_precision == "bf16" else None,
        remat=args.gradient_checkpointing)
    if args.model_scale == "micro":
        import dataclasses as _dc

        from stableanimator_tpu.core.config import micro_model_kwargs

        model_kwargs.update(micro_model_kwargs())
        # real datasets carry 512-d ArcFace embeddings
        model_kwargs["face_cfg"] = _dc.replace(
            model_kwargs["face_cfg"], id_embeddings_dim=512)
    models = build_models(**model_kwargs)
    params = load_params(args.checkpoint_dir, models, args.allow_random_init,
                         init_id_adapter=not args.finetune_mode,
                         height=args.dataset_height, width=args.dataset_width)

    mesh = make_mesh()  # all devices on the data axis
    n_dev = mesh.devices.size
    global_batch = args.per_device_batch_size * n_dev
    print(f"mesh: {n_dev} devices, global batch {global_batch}")

    state, tx = create_train_state(
        params, cfg, trainable_keys=tuple(args.trainable_modules.split(",")))
    state = TrainState(state.step, shard_params(state.params, mesh),
                       shard_params(state.frozen, mesh),
                       shard_optimizer_state(state.opt_state, mesh))

    mgr = CheckpointManager(args.output_dir, total_limit=args.checkpoints_total_limit)
    if args.resume_from_checkpoint:
        step = (None if args.resume_from_checkpoint == "latest"
                else int(args.resume_from_checkpoint))
        restored = mgr.restore({"params": state.params,
                                "opt_state": state.opt_state,
                                "step": state.step}, step=step)
        # the restored step scalar comes back COMMITTED to a single device;
        # rebuild it uncommitted (and re-pin the tree shardings) so the
        # jitted step sees consistent devices
        state = TrainState(jnp.asarray(int(restored["step"]), jnp.int32),
                           shard_params(restored["params"], mesh),
                           state.frozen,
                           shard_optimizer_state(restored["opt_state"], mesh))
        print(f"resumed from step {int(state.step)}")

    rec = vec = None
    rec_path = args.rec_data_path or args.data_path
    if rec_path:
        rec = AnimationDataset(read_path_list(rec_path),
                               cfg.sample_n_frames, args.dataset_width,
                               args.dataset_height, seed=args.seed)
    if args.vec_data_path:
        vec = AnimationDataset(read_path_list(args.vec_data_path),
                               cfg.sample_n_frames, 576, 1024, seed=args.seed)
    sampler = MixedResolutionSampler(rec, vec, seed=args.seed)
    loader = PrefetchLoader(sampler, global_batch,
                            num_workers=max(1, args.num_workers // 2))

    step_fn = make_train_step(models, tx, cfg, pipe,
                              conditioning_dropout_prob=args.conditioning_dropout_prob)
    batch_sharding = NamedSharding(mesh, P("data"))
    rng = jax.random.PRNGKey(args.seed)

    def run_validation(step: int):
        """Generate a validation clip with the current weights (the
        reference's --validation_steps hook; command_train.sh:7-9,20)."""
        if not (args.validation_image and args.validation_control_folder):
            return
        from PIL import Image

        from stableanimator_tpu.pipeline import generate
        from stableanimator_tpu.core.config import PipelineConfig as PC
        from stableanimator_tpu.utils.image import (
            export_to_gif, frames_to_uint8, load_images_from_folder,
            pil_to_unit_array, poses_to_array)

        ref = Image.open(args.validation_image).convert("RGB").resize(
            (args.dataset_width, args.dataset_height))
        poses = load_images_from_folder(args.validation_control_folder,
                                        args.dataset_width, args.dataset_height)
        val_cfg = PC(height=args.dataset_height, width=args.dataset_width,
                     num_frames=len(poses),
                     tile_size=min(16, len(poses)), tile_overlap=4)
        val_params = {**{k: state.params[k] for k in state.params},
                      **{k: state.frozen[k] for k in state.frozen}}
        frames = generate(models, val_params,
                          jnp.asarray(pil_to_unit_array(ref)),
                          jnp.asarray(poses_to_array(poses)),
                          jnp.zeros((1, 512), jnp.float32),
                          val_cfg, rng=jax.random.PRNGKey(cfg.seed))
        out = os.path.join(args.output_dir, f"validation_step_{step}.gif")
        export_to_gif(frames_to_uint8(np.asarray(frames, np.float32)), out)
        print(f"validation clip -> {out}")

    from stableanimator_tpu.core.metrics import MetricsLogger

    metrics_log = MetricsLogger(args.output_dir, report_to=args.report_to)
    max_steps = args.max_train_steps or args.num_train_epochs * 1000
    t0 = time.time()
    while int(state.step) < max_steps:
        batch = loader.next()
        batch = {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}
        state, metrics = step_fn(state, batch, rng)
        step = int(state.step)
        if step % 10 == 0:
            loss = float(metrics["loss"])
            gn = float(metrics["grad_norm"])
            dt = time.time() - t0
            print(f"step {step}: loss={loss:.4f} grad_norm={gn:.3f} "
                  f"({dt / max(step, 1):.2f}s/step)")
            metrics_log.log(step, {"loss": loss, "grad_norm": gn,
                                   "sec_per_step": dt / max(step, 1)})
        if step % cfg.validation_steps == 0:
            run_validation(step)
        if step % cfg.checkpointing_steps == 0:
            mgr.save(step, {"params": state.params,
                            "opt_state": state.opt_state, "step": state.step})
            print(f"checkpointed step {step}")
    mgr.save(int(state.step), {"params": state.params,
                               "opt_state": state.opt_state, "step": state.step})
    metrics_log.close()


if __name__ == "__main__":
    main()
