#!/usr/bin/env bash
# Basic 512x512 inference preset (reference command_basic_infer.sh:22-39).
# Checkpoints: converted .npz files (tools/dump_torch_checkpoint.py).
python -m stableanimator_tpu.cli.animate \
 --checkpoint_dir="checkpoints/animation_npz" \
 --output_dir="basic_infer" \
 --pose_control_folder="inference/case-1/poses" \
 --reference_image="inference/case-1/reference.png" \
 --width=512 \
 --height=512 \
 --guidance_scale=3.0 \
 --num_inference_steps=25 \
 --tile_size=16 \
 --frames_overlap=4 \
 --noise_aug_strength=0.02 \
 --decode_chunk_size=4
