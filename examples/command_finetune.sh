#!/usr/bin/env bash
# Finetune preset (reference command_finetune.sh): starts from the released
# StableAnimator weights instead of vanilla SVD (--finetune_mode skips the
# id-adapter re-initialisation).
python -m stableanimator_tpu.cli.train \
 --checkpoint_dir="checkpoints/animation_npz" \
 --finetune_mode=True \
 --output_dir="checkpoints/Animation" \
 --data_root_path="animation_data" \
 --rec_data_path="animation_data/video_rec_path.txt" \
 --vec_data_path="animation_data/video_vec_path.txt" \
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
