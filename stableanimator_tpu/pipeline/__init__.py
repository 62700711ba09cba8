from stableanimator_tpu.pipeline.animation import (
    AnimationModels,
    build_models,
    init_params,
    fast_init_params,
    device_fill_params,
    encode_conditioning,
    denoise,
    decode_frames,
    generate,
    resolve_steps_per_dispatch,
    warm_generate,
)
from stableanimator_tpu.pipeline.face_opt import (
    FaceOptConfig,
    FaceOptimizer,
    face_boxes_from_pose,
)
