from stableanimator_tpu.ops.norms import group_norm, layer_norm
from stableanimator_tpu.ops.attention import dot_product_attention
from stableanimator_tpu.ops.resize import (
    resize_bicubic_align_corners,
    upsample_nearest_2x,
    gaussian_blur,
    resize_antialias,
)
