from stableanimator_tpu.diffusion.scheduler import (
    EulerEDMSchedule,
    make_schedule,
    scale_model_input,
    step_euler,
    timestep_of_sigma,
    add_noise,
    v_target,
    edm_loss_weight,
)
from stableanimator_tpu.diffusion.tiling import (
    tile_indices,
    tile_blend_weight,
)
