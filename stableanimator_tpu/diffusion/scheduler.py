"""EDM / Euler-discrete diffusion schedule as pure JAX functions.

Reproduces the SVD scheduler semantics used by the reference
(EulerDiscreteScheduler with `timestep_type="continuous"`,
`prediction_type="v_prediction"`, `use_karras_sigmas=True`,
sigma range [0.002, 700]):

  * Karras rho-7 sigma grid over `num_inference_steps` points
    (verified against the 25 traced continuous timesteps at reference
    inference_pipeline_animation.py:634-639),
  * continuous timestep  t = 0.25 * ln(sigma),
  * init_noise_sigma = sqrt(sigma_max^2 + 1) ~= 700.000732
    (reference inference_pipeline_animation.py:404-405),
  * model-input scaling  x / sqrt(sigma^2 + 1),
  * v-prediction Euler step:
        x0_hat = -sigma/sqrt(sigma^2+1) * v + x/(sigma^2+1)
        x_next = x + (x - x0_hat)/sigma * (sigma_next - sigma).

Everything is computed in float32; the scheduler never touches bf16.
Unlike the reference (a stateful diffusers object driven by a Python loop),
the schedule here is a static pytree scanned over inside one jitted program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from stableanimator_tpu.core.config import SchedulerConfig


class EulerEDMSchedule(NamedTuple):
    """Static (host-computed) schedule tables.

    sigmas has num_steps + 1 entries; the final entry is 0.0 so that the last
    Euler step integrates all the way to the clean sample.
    """

    sigmas: jnp.ndarray      # [num_steps + 1] float32
    timesteps: jnp.ndarray   # [num_steps]     float32, 0.25*ln(sigma)
    init_noise_sigma: float


def karras_sigmas(num_steps: int, cfg: SchedulerConfig) -> np.ndarray:
    """Karras et al. (2022) rho-spaced sigma grid, sigma_max -> sigma_min."""
    ramp = np.linspace(0.0, 1.0, num_steps, dtype=np.float64)
    min_inv_rho = cfg.sigma_min ** (1.0 / cfg.rho)
    max_inv_rho = cfg.sigma_max ** (1.0 / cfg.rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** cfg.rho
    return sigmas.astype(np.float32)


def make_schedule(num_steps: int, cfg: SchedulerConfig | None = None) -> EulerEDMSchedule:
    cfg = cfg or SchedulerConfig()
    sigmas = karras_sigmas(num_steps, cfg)
    timesteps = 0.25 * np.log(sigmas)
    sigmas = np.concatenate([sigmas, np.zeros((1,), dtype=np.float32)])
    init_noise_sigma = float(np.sqrt(cfg.sigma_max**2 + 1.0))
    return EulerEDMSchedule(
        sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
        timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
        init_noise_sigma=init_noise_sigma,
    )


def timestep_of_sigma(sigma):
    """Continuous timestep fed to the UNet: c_noise = 0.25 * ln(sigma)."""
    return 0.25 * jnp.log(sigma)


def scale_model_input(sample, sigma):
    """EDM c_in scaling: x / sqrt(sigma^2 + 1) (sigma_data = 1)."""
    sigma = jnp.asarray(sigma, dtype=jnp.float32)
    return (sample / jnp.sqrt(sigma**2 + 1.0).astype(sample.dtype)).astype(sample.dtype)


def pred_original_sample(model_output, sample, sigma):
    """x0_hat from a v-prediction model output (fp32 math)."""
    sigma = jnp.asarray(sigma, dtype=jnp.float32)
    mo = model_output.astype(jnp.float32)
    s = sample.astype(jnp.float32)
    return mo * (-sigma / jnp.sqrt(sigma**2 + 1.0)) + s / (sigma**2 + 1.0)


def step_euler(model_output, sample, sigma, sigma_next):
    """One Euler step x_t -> x_{t-1}; returns same dtype as `sample`."""
    x0 = pred_original_sample(model_output, sample, sigma)
    return step_euler_from_x0(x0, sample, sigma, sigma_next)


def step_euler_from_x0(x0, sample, sigma, sigma_next):
    """Euler step expressed via the predicted clean sample (used by the HJB
    face-optimisation path, which edits x0_hat before integrating)."""
    s = sample.astype(jnp.float32)
    derivative = (s - x0.astype(jnp.float32)) / sigma
    dt = sigma_next - sigma
    return (s + derivative * dt).astype(sample.dtype)


# ---------------------------------------------------------------------------
# Training-side EDM math (train.py is absent from the reference; this follows
# the SVD/EDM formulation its flags imply — see SURVEY.md §3.5).
# ---------------------------------------------------------------------------

def sample_sigmas_lognormal(rng, shape, cfg: SchedulerConfig | None = None):
    """sigma ~ exp(N(p_mean, p_std)) as in EDM/SVD finetuning."""
    import jax

    cfg = cfg or SchedulerConfig()
    z = jax.random.normal(rng, shape, dtype=jnp.float32)
    return jnp.exp(cfg.p_mean + cfg.p_std * z)


def add_noise(x0, noise, sigma):
    """EDM forward process: x_t = x0 + sigma * eps (sigma broadcast over x0)."""
    sigma = jnp.asarray(sigma, dtype=jnp.float32)
    while sigma.ndim < x0.ndim:
        sigma = sigma[..., None]
    return (x0.astype(jnp.float32) + sigma * noise.astype(jnp.float32)).astype(x0.dtype)


def v_target(x0, noise, sigma):
    """The v the network must output so that pred_original_sample == x0:
    v = (eps - sigma * x0) / sqrt(sigma^2 + 1)."""
    sigma = jnp.asarray(sigma, dtype=jnp.float32)
    while sigma.ndim < x0.ndim:
        sigma = sigma[..., None]
    return (noise.astype(jnp.float32) - sigma * x0.astype(jnp.float32)) / jnp.sqrt(sigma**2 + 1.0)


def edm_loss_weight(sigma):
    """lambda(sigma) = (1 + sigma^2) / sigma^2 (EDM, sigma_data = 1) for a
    loss expressed on x0_hat; equals 1 for a loss expressed on v."""
    sigma = jnp.asarray(sigma, dtype=jnp.float32)
    return (1.0 + sigma**2) / sigma**2
