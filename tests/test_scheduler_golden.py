"""Golden per-step vectors for the multistep/stochastic schedulers.

Round-1 verdict item 7: analytic-convergence tests can miss a subtly
wrong LMS integration weight or DPM++ interpolation. Here each scheduler
is run on a fixed trajectory (deterministic eps / noise sequences) and
compared per step against an INDEPENDENT numpy implementation of the
diffusers-0.14 step math written below from the published algorithm
definitions (LMS: Adams-Bashforth with scipy.integrate.quad Lagrange
coefficients; DPM-Solver++ 2M midpoint; PNDM step_plms counter machine;
Euler-Ancestral sigma_up/sigma_down). Final samples are additionally
pinned as literal constants so drift in EITHER implementation fails
loudly (/root/reference/inference.py:65-72 is the scheduler surface).
"""
import numpy as np
import pytest
import scipy.integrate

import jax.numpy as jnp

from e4t_diffusion_tpu.diffusion.schedulers import (
    DPMSolverMultistepScheduler, EulerAncestralDiscreteScheduler,
    LMSDiscreteScheduler, NoiseScheduleConfig, PNDMScheduler)

CFG = NoiseScheduleConfig()
STEPS = 8
DIM = 4

_rng = np.random.default_rng(1234)
X0 = _rng.normal(size=(DIM,)).astype(np.float64)
EPS = _rng.normal(size=(16, DIM)).astype(np.float64)    # one per model eval
NOISE = _rng.normal(size=(16, DIM)).astype(np.float64)  # ancestral noise


def _alphas_cumprod():
    betas = np.linspace(CFG.beta_start ** 0.5, CFG.beta_end ** 0.5,
                        CFG.num_train_timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def _sigma_grid():
    ac = _alphas_cumprod()
    sig_train = ((1 - ac) / ac) ** 0.5
    ts = np.linspace(0, CFG.num_train_timesteps - 1, STEPS,
                     dtype=np.float64)[::-1].copy()
    sigmas = np.interp(ts, np.arange(CFG.num_train_timesteps), sig_train)
    return ts, np.concatenate([sigmas, [0.0]])


# ---------------------------------------------------------------------------
# independent diffusers-0.14 reference steppers (numpy, float64)
# ---------------------------------------------------------------------------

def ref_euler_ancestral():
    _, sigmas = _sigma_grid()
    x = X0 * (sigmas[0] ** 2 + 1) ** 0.5
    out = []
    for i in range(STEPS):
        s_from, s_to = sigmas[i], sigmas[i + 1]
        x0_pred = x - s_from * EPS[i]
        sigma_up = (s_to ** 2 * (s_from ** 2 - s_to ** 2)
                    / s_from ** 2) ** 0.5 if s_from > 0 else 0.0
        sigma_down = (max(s_to ** 2 - sigma_up ** 2, 0.0)) ** 0.5
        d = (x - x0_pred) / s_from
        x = x + d * (sigma_down - s_from) + NOISE[i] * sigma_up
        out.append(x.copy())
    return out


def _lms_coeff(order, t, j, sigmas):
    def fn(tau):
        prod = 1.0
        for k in range(order):
            if k == j:
                continue
            prod *= (tau - sigmas[t - k]) / (sigmas[t - j] - sigmas[t - k])
        return prod

    return scipy.integrate.quad(fn, sigmas[t], sigmas[t + 1],
                                epsrel=1e-10)[0]


def ref_lms(order=4):
    _, sigmas = _sigma_grid()
    x = X0 * sigmas[0]
    derivs, out = [], []
    for i in range(STEPS):
        sigma = sigmas[i]
        x0_pred = x - sigma * EPS[i]
        derivs.append((x - x0_pred) / sigma)
        derivs = derivs[-order:]
        cur = min(i + 1, order)
        coeffs = [_lms_coeff(cur, i, j, sigmas) for j in range(cur)]
        x = x + sum(c * d for c, d in zip(coeffs, reversed(derivs)))
        out.append(x.copy())
    return out


def ref_dpm_solver_pp():
    ac = _alphas_cumprod()
    ts = (np.linspace(0, CFG.num_train_timesteps - 1, STEPS + 1)
          .round()[::-1][:-1].astype(int))
    alpha = ac ** 0.5
    sigma = (1 - ac) ** 0.5
    lam = np.log(alpha) - np.log(sigma)
    x = X0.copy()
    m_prev, t_prev_model = None, None
    out = []
    for i in range(STEPS):
        t = ts[i]
        t_next = ts[i + 1] if i + 1 < STEPS else 0
        m0 = (x - sigma[t] * EPS[i]) / alpha[t]  # x0 prediction
        h = lam[t_next] - lam[t]
        first = ((sigma[t_next] / sigma[t]) * x
                 - alpha[t_next] * (np.exp(-h) - 1.0) * m0)
        lower_final = (STEPS < 15 and i == STEPS - 1)
        if i >= 1 and not lower_final:
            h_0 = lam[t] - lam[t_prev_model]
            r0 = h_0 / h
            d1 = (m0 - m_prev) / r0
            x = first - 0.5 * alpha[t_next] * (np.exp(-h) - 1.0) * d1
        else:
            x = first
        m_prev, t_prev_model = m0, t
        out.append(x.copy())
    return out


def ref_pndm_plms():
    ac = _alphas_cumprod()
    final_ac = ac[0]  # set_alpha_to_one=False (SD config)
    ratio = CFG.num_train_timesteps // STEPS
    base = (np.arange(STEPS) * ratio).round().astype(int) + CFG.steps_offset
    ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]

    def prev_sample(sample, t, prev_t, model_output):
        a_t = ac[t] if t < CFG.num_train_timesteps else ac[-1]
        a_prev = ac[prev_t] if prev_t >= 0 else final_ac
        coeff = (a_prev / a_t) ** 0.5
        denom = (a_t * (1 - a_prev) ** 0.5
                 + (a_t * (1 - a_t) * a_prev) ** 0.5)
        return coeff * sample - (a_prev - a_t) * model_output / denom

    x = X0.copy()
    ets, cur_sample = [], None
    out = []
    for counter, t in enumerate(ts):
        t = int(t)
        prev_t = t - ratio
        eps = EPS[counter]
        if counter != 1:
            ets = ets[-3:] + [eps]
        else:
            prev_t, t = t, t + ratio
        if len(ets) == 1 and counter == 0:
            combined, cur_sample = eps, x.copy()
        elif len(ets) == 1 and counter == 1:
            combined = (eps + ets[-1]) / 2
            x = cur_sample
        elif len(ets) == 2:
            combined = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            combined = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            combined = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3]
                        - 9 * ets[-4]) / 24
        x = prev_sample(x, t, prev_t, combined)
        out.append(x.copy())
    return out


# ---------------------------------------------------------------------------
# drive our jax schedulers on the same trajectories
# ---------------------------------------------------------------------------

def _run_ours(sched, n_evals, start, with_noise=False):
    state = sched.init(STEPS)
    if hasattr(sched, "init_carry"):
        state = sched.init_carry(state, (DIM,), jnp.float32)
    x = jnp.asarray(start, jnp.float32)
    outs = []
    for i in range(n_evals):
        kwargs = {"noise": jnp.asarray(NOISE[i], jnp.float32)} \
            if with_noise else {}
        state, x = sched.step(state, i, jnp.asarray(EPS[i], jnp.float32), x,
                              **kwargs)
        outs.append(np.asarray(x, np.float64))
    return outs


def _assert_per_step(ours, ref, label, rtol=3e-5):
    for i, (a, b) in enumerate(zip(ours, ref)):
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=rtol * scale,
            err_msg=f"{label}: step {i} diverged from diffusers-0.14 math")


# final-sample pins (float64 reference, printed by `python
# tests/test_scheduler_golden.py`); guard the reference itself.
GOLDEN_FINAL = {
    "euler_ancestral": [-10.240565538409887, -33.80897881691995,
                        42.041676997081254, -7.866367330744261],
    "lms": [-22.620883867725357, -23.751189303629527,
            22.85782450404424, -4.235067429741419],
    "dpm_solver++": [-20.45364432421471, -19.224956446753456,
                     22.224557630736413, -2.542064667176722],
    "plms": [-9.132986252620505, -4.227623728198061,
             9.993331357729101, 4.2346479729001825],
}


def test_euler_ancestral_golden():
    _, sigmas = _sigma_grid()
    ref = ref_euler_ancestral()
    ours = _run_ours(EulerAncestralDiscreteScheduler(CFG), STEPS,
                     X0 * (sigmas[0] ** 2 + 1) ** 0.5, with_noise=True)
    _assert_per_step(ours, ref, "euler_ancestral")
    np.testing.assert_allclose(ref[-1], GOLDEN_FINAL["euler_ancestral"],
                               rtol=1e-12)


def test_lms_golden():
    _, sigmas = _sigma_grid()
    ref = ref_lms()
    ours = _run_ours(LMSDiscreteScheduler(CFG), STEPS, X0 * sigmas[0])
    _assert_per_step(ours, ref, "lms")
    np.testing.assert_allclose(ref[-1], GOLDEN_FINAL["lms"], rtol=1e-12)


def test_dpm_solver_pp_golden():
    ref = ref_dpm_solver_pp()
    ours = _run_ours(DPMSolverMultistepScheduler(CFG), STEPS, X0)
    _assert_per_step(ours, ref, "dpm_solver++")
    np.testing.assert_allclose(ref[-1], GOLDEN_FINAL["dpm_solver++"],
                               rtol=1e-12)


def test_pndm_plms_golden():
    ref = ref_pndm_plms()
    ours = _run_ours(PNDMScheduler(CFG), STEPS + 1, X0)
    _assert_per_step(ours, ref, "plms")
    np.testing.assert_allclose(ref[-1], GOLDEN_FINAL["plms"], rtol=1e-12)


if __name__ == "__main__":
    for name, fn in (("euler_ancestral", ref_euler_ancestral),
                     ("lms", ref_lms), ("dpm_solver++", ref_dpm_solver_pp),
                     ("plms", ref_pndm_plms)):
        print(f'    "{name}": {list(fn()[-1])},')
