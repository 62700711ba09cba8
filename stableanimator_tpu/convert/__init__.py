from stableanimator_tpu.convert.torch_to_jax import (
    convert_unet,
    convert_vae,
    convert_pose_net,
    convert_face_encoder,
    convert_clip_vision,
)
