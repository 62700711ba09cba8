#!/usr/bin/env bash
# Single-host training preset (reference command_train_single.sh /
# train_single.py: one path-list at one resolution instead of the mixed
# rec/vec buckets). On TPU this is the one-chip (or one-host pjit) run;
# adapter-only --trainable_modules fits a single 16 GB v5e chip.
python -m stableanimator_tpu.cli.train \
 --checkpoint_dir="checkpoints/animation_npz" \
 --output_dir="checkpoints/Animation" \
 --data_root_path="animation_data" \
 --data_path="animation_data/video_path.txt" \
 --dataset_width=512 \
 --dataset_height=512 \
 --validation_image_folder="validation/ground_truth" \
 --validation_control_folder="validation/poses" \
 --validation_image="validation/reference.png" \
 --num_workers=8 \
 --lr_warmup_steps=500 \
 --sample_n_frames=16 \
 --learning_rate=1e-5 \
 --per_device_batch_size=1 \
 --num_train_epochs=6000 \
 --mixed_precision="bf16" \
 --gradient_accumulation_steps=1 \
 --checkpointing_steps=2000 \
 --validation_steps=500 \
 --gradient_checkpointing \
 --checkpoints_total_limit=5000 \
 --resume_from_checkpoint="latest"
