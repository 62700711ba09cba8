from stableanimator_tpu.pipeline.animation import (
    AnimationModels,
    build_models,
    init_params,
    encode_conditioning,
    denoise,
    decode_frames,
    generate,
)
