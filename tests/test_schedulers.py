"""Scheduler numerics tests.

Analytic oracle: for deterministic data x0 == C the optimal epsilon
predictor is eps*(x_t, t) = (x_t - sqrt(ac_t) C) / sqrt(1 - ac_t); any
correct sampler driven by it must converge to C from arbitrary x_T.
Plus grid regression pins against diffusers v0.14 values.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e4t_diffusion_tpu.diffusion.schedulers import (
    NoiseScheduleConfig,
    DDPMScheduler,
    DDIMScheduler,
    PNDMScheduler,
    alphas_cumprod,
)


def test_timestep_grid_matches_diffusers_sd_defaults():
    s = DDIMScheduler(NoiseScheduleConfig())
    state = s.init(50)
    ts = np.asarray(state["timesteps"])
    assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_ddpm_add_noise_and_velocity():
    sch = DDPMScheduler()
    x0 = jnp.ones((2, 4, 8, 8))
    noise = jnp.full((2, 4, 8, 8), 0.5)
    t = jnp.array([0, 999])
    ac = alphas_cumprod(NoiseScheduleConfig())
    noisy = sch.add_noise(x0, noise, t)
    for b, tt in enumerate([0, 999]):
        expected = np.sqrt(ac[tt]) * 1.0 + np.sqrt(1 - ac[tt]) * 0.5
        np.testing.assert_allclose(np.asarray(noisy[b]), expected, rtol=1e-5)
    vel = sch.get_velocity(x0, noise, t)
    for b, tt in enumerate([0, 999]):
        expected = np.sqrt(ac[tt]) * 0.5 - np.sqrt(1 - ac[tt]) * 1.0
        np.testing.assert_allclose(np.asarray(vel[b]), expected, rtol=1e-5)


def _run_sampler(scheduler_cls, num_steps, target=1.7):
    cfg = NoiseScheduleConfig()
    sch = scheduler_cls(cfg)
    state = sch.init(num_steps)
    ac = jnp.asarray(alphas_cumprod(cfg), jnp.float32)
    ts = state["timesteps"]
    x = jnp.full((1, 2, 4, 4), 3.0)

    if hasattr(sch, "init_carry"):
        state = sch.init_carry(state, x.shape, x.dtype)

    def body(carry, i):
        state, x = carry
        t = ts[i]
        a = ac[jnp.clip(t, 0, 999)]
        xin = sch.scale_model_input(state, i, x)
        eps = (xin - jnp.sqrt(a) * target) / jnp.sqrt(1 - a)
        state, x = sch.step(state, i, eps, x)
        return (state, x), None

    (state, x), _ = jax.lax.scan(body, (state, x), jnp.arange(len(ts)))
    return np.asarray(x)


def _analytic_fixed_point(target=1.7, x_t=3.0):
    """With eps*, DDIM preserves the noise residual e exactly and lands at
    sqrt(ac_0) C + sqrt(1 - ac_0) e (final alpha is ac[0] because SD uses
    set_alpha_to_one=False)."""
    ac = alphas_cumprod(NoiseScheduleConfig())
    a_start, a_final = ac[981], ac[0]
    e = (x_t - np.sqrt(a_start) * target) / np.sqrt(1 - a_start)
    return np.sqrt(a_final) * target + np.sqrt(1 - a_final) * e


def test_ddim_converges_to_analytic_target():
    out = _run_sampler(DDIMScheduler, 50)
    np.testing.assert_allclose(out, _analytic_fixed_point(), atol=1e-4)


def test_pndm_converges_to_analytic_target():
    out = _run_sampler(PNDMScheduler, 50)
    np.testing.assert_allclose(out, _analytic_fixed_point(), atol=2e-2)


def _run_sigma_sampler(scheduler_cls, num_steps, target=1.7, seed=0,
                       **kwargs):
    """Run a sigma-parameterized sampler with the analytic eps* oracle
    eps = (x - C) / sigma (x is the UN-scaled latent in sigma space)."""
    cfg = NoiseScheduleConfig()
    sch = scheduler_cls(cfg, **kwargs)
    state = sch.init(num_steps)
    sigmas = state["sigmas"]
    x = jnp.full((1, 2, 4, 4), 3.0) * sch.init_noise_sigma(state)
    if hasattr(sch, "init_carry"):
        state = sch.init_carry(state, x.shape, x.dtype)
    key = jax.random.PRNGKey(seed)

    def body(carry, i):
        state, x = carry
        sigma = sigmas[i]
        eps = (x - target) / sigma
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape)
        state, x = sch.step(state, i, eps, x, noise=noise)
        return (state, x), None

    (state, x), _ = jax.lax.scan(body, (state, x), jnp.arange(num_steps))
    return np.asarray(x)


def test_euler_converges_exactly():
    from e4t_diffusion_tpu.diffusion.schedulers import EulerDiscreteScheduler

    out = _run_sigma_sampler(EulerDiscreteScheduler, 30)
    np.testing.assert_allclose(out, 1.7, atol=1e-4)


def test_euler_ancestral_converges():
    from e4t_diffusion_tpu.diffusion.schedulers import (
        EulerAncestralDiscreteScheduler)

    out = _run_sigma_sampler(EulerAncestralDiscreteScheduler, 30)
    # final sigma_to == 0 collapses onto the target exactly
    np.testing.assert_allclose(out, 1.7, atol=1e-4)


def test_lms_converges_exactly():
    from e4t_diffusion_tpu.diffusion.schedulers import LMSDiscreteScheduler

    out = _run_sigma_sampler(LMSDiscreteScheduler, 30)
    np.testing.assert_allclose(out, 1.7, atol=1e-3)


def test_dpm_solver_pp_converges():
    from e4t_diffusion_tpu.diffusion.schedulers import (
        DPMSolverMultistepScheduler)

    cfg = NoiseScheduleConfig()
    sch = DPMSolverMultistepScheduler(cfg)
    num_steps = 20
    state = sch.init(num_steps)
    ac = jnp.asarray(alphas_cumprod(cfg), jnp.float32)
    ts = state["timesteps"]
    target = 1.7
    x = jnp.full((1, 2, 4, 4), 3.0)
    state = sch.init_carry(state, x.shape, x.dtype)
    a0 = jnp.sqrt(ac[ts[0]])
    s0 = jnp.sqrt(1 - ac[ts[0]])
    resid = (3.0 - a0 * target) / s0  # eps* preserved exactly by DPM++

    def body(carry, i):
        state, x = carry
        a = jnp.sqrt(ac[ts[i]])
        s = jnp.sqrt(1 - ac[ts[i]])
        eps = (x - a * target) / s
        state, x = sch.step(state, i, eps, x)
        return (state, x), None

    (state, x), _ = jax.lax.scan(body, (state, x), jnp.arange(num_steps))
    expected = float(jnp.sqrt(ac[0]) * target + jnp.sqrt(1 - ac[0]) * resid)
    np.testing.assert_allclose(np.asarray(x), expected, atol=2e-3)


def test_sigma_scale_model_input():
    from e4t_diffusion_tpu.diffusion.schedulers import EulerDiscreteScheduler

    sch = EulerDiscreteScheduler(NoiseScheduleConfig())
    state = sch.init(10)
    x = jnp.ones((1, 1))
    scaled = sch.scale_model_input(state, 0, x)
    sigma = float(state["sigmas"][0])
    np.testing.assert_allclose(float(scaled[0, 0]),
                               1.0 / np.sqrt(sigma ** 2 + 1), rtol=1e-5)
    assert float(sch.init_noise_sigma(state)) == pytest.approx(
        float(jnp.max(state["sigmas"])))


def test_pndm_timestep_sequence_duplicates_second_to_last():
    s = PNDMScheduler(NoiseScheduleConfig())
    state = s.init(50)
    ts = np.asarray(state["timesteps"])
    assert len(ts) == 51
    assert ts[0] == 981
    # descending, with 961 duplicated (skip_prk duplication after reversal)
    assert (ts == 961).sum() == 2
