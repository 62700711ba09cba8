"""Scheduler parity against the traced golden values in the reference.

Golden sources:
  * the 25 continuous timesteps printed at reference
    inference_pipeline_animation.py:634-639,
  * init_noise_sigma = 700.000732 at :404-405.
"""

import numpy as np

from stableanimator_tpu.core.config import SchedulerConfig
from stableanimator_tpu.diffusion import (
    add_noise,
    make_schedule,
    scale_model_input,
    step_euler,
    v_target,
)
from stableanimator_tpu.diffusion.scheduler import pred_original_sample

GOLDEN_TIMESTEPS = np.array([
    1.637770, 1.575531, 1.510996, 1.443990, 1.374316, 1.301752,
    1.226049, 1.146922, 1.064048, 0.977053, 0.885506, 0.788904,
    0.686657, 0.578063, 0.462282, 0.338294, 0.204848, 0.060379,
    -0.097098, -0.270160, -0.462234, -0.678018, -0.924202, -1.210778,
    -1.553652,
], dtype=np.float32)


def test_timesteps_match_reference_trace():
    sched = make_schedule(25)
    np.testing.assert_allclose(np.asarray(sched.timesteps), GOLDEN_TIMESTEPS, atol=2e-5)


def test_init_noise_sigma():
    sched = make_schedule(25)
    assert abs(sched.init_noise_sigma - 700.000732) < 1e-3


def test_sigma_endpoints_and_terminal_zero():
    cfg = SchedulerConfig()
    sched = make_schedule(25, cfg)
    s = np.asarray(sched.sigmas)
    assert abs(s[0] - cfg.sigma_max) < 1e-3
    assert abs(s[24] - cfg.sigma_min) < 1e-6
    assert s[25] == 0.0
    assert (np.diff(s) < 0).all()


def test_scale_model_input():
    x = np.ones((2, 3), dtype=np.float32)
    out = np.asarray(scale_model_input(x, 700.0))
    np.testing.assert_allclose(out, x / np.sqrt(700.0**2 + 1.0), rtol=1e-6)


def test_euler_step_perfect_model_denoises():
    """If the model outputs the exact v-target, x0_hat == x0, and a full
    schedule of Euler steps recovers x0 exactly from x0 + sigma*eps."""
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 8)).astype(np.float32)
    eps = rng.normal(size=(4, 8)).astype(np.float32)
    sigma = 7.3
    xt = np.asarray(add_noise(x0, eps, sigma))
    v = np.asarray(v_target(x0, eps, sigma))
    x0_hat = np.asarray(pred_original_sample(v, xt, sigma))
    np.testing.assert_allclose(x0_hat, x0, rtol=1e-4, atol=1e-5)

    # a single Euler step with sigma_next=0 lands exactly on x0
    out = np.asarray(step_euler(v, xt, sigma, 0.0))
    np.testing.assert_allclose(out, x0, rtol=1e-4, atol=1e-5)


def test_model_input_scaling_consistency():
    """scale_model_input o add_noise == EDM c_in preconditioning."""
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(2, 4)).astype(np.float32)
    eps = rng.normal(size=(2, 4)).astype(np.float32)
    sigma = 0.5
    xt = add_noise(x0, eps, sigma)
    scaled = np.asarray(scale_model_input(xt, sigma))
    expected = (np.asarray(xt)) / np.sqrt(sigma**2 + 1.0)
    np.testing.assert_allclose(scaled, expected, rtol=1e-6)
