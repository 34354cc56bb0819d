"""Diffusion noise schedulers as pure, lax.scan-compatible functions.

Numerics match diffusers v0.14.0 semantics (the version the reference pins,
/root/reference/requirements.txt:1): scaled_linear betas, rounded timestep
grids with steps_offset, final_alpha_cumprod handling, and the
scale_model_input contract for the sigma-based families
(SCHEDULER_MAPPING parity: /root/reference/inference.py:65-72).

Design: a scheduler is (config) -> ``init(num_steps)`` producing a state
pytree of *static-shape tables + history carry*, plus pure
``step(state, i, model_output, sample) -> (state, prev_sample)`` where
``i`` is the scan induction variable. Multistep history (PNDM/LMS/DPM)
lives in fixed-size carry buffers; per-step branch selection is
precomputed into static weight tables at init time so the whole denoise
loop stays a single traced XLA program with no recompiles (SURVEY.md
§7.3.1).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NoiseScheduleConfig:
    """SD v1 defaults (CompVis/stable-diffusion-v1-4 scheduler config)."""
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    clip_sample: bool = False


def make_betas(cfg: NoiseScheduleConfig) -> np.ndarray:
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end,
                           cfg.num_train_timesteps, dtype=np.float64)
    if cfg.beta_schedule == "scaled_linear":
        return np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                           cfg.num_train_timesteps, dtype=np.float64) ** 2
    if cfg.beta_schedule == "squaredcos_cap_v2":
        t = np.arange(cfg.num_train_timesteps, dtype=np.float64)
        f = lambda x: np.cos((x / cfg.num_train_timesteps + 0.008) / 1.008 * np.pi / 2) ** 2
        return np.clip(1.0 - f(t + 1) / f(t), 0, 0.999)
    raise ValueError(cfg.beta_schedule)


def alphas_cumprod(cfg: NoiseScheduleConfig) -> np.ndarray:
    return np.cumprod(1.0 - make_betas(cfg))


# ---------------------------------------------------------------------------
# DDPM — the training-side scheduler (add_noise / velocity targets)
# ---------------------------------------------------------------------------

class DDPMScheduler:
    """Training-time forward process, matching diffusers DDPMScheduler
    add_noise/get_velocity (used in the reference train loops:
    /root/reference/pretrain_e4t.py:621,641)."""

    def __init__(self, config: NoiseScheduleConfig = NoiseScheduleConfig()):
        self.config = config
        self._ac = jnp.asarray(alphas_cumprod(config), dtype=jnp.float32)

    def add_noise(self, original: jax.Array, noise: jax.Array,
                  timesteps: jax.Array) -> jax.Array:
        ac = self._ac[timesteps].astype(original.dtype)
        shape = (-1,) + (1,) * (original.ndim - 1)
        sqrt_ac = jnp.sqrt(ac).reshape(shape)
        sqrt_1m = jnp.sqrt(1.0 - ac).reshape(shape)
        return sqrt_ac * original + sqrt_1m * noise

    def get_velocity(self, sample: jax.Array, noise: jax.Array,
                     timesteps: jax.Array) -> jax.Array:
        ac = self._ac[timesteps].astype(sample.dtype)
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sqrt_ac = jnp.sqrt(ac).reshape(shape)
        sqrt_1m = jnp.sqrt(1.0 - ac).reshape(shape)
        return sqrt_ac * noise - sqrt_1m * sample

    def target(self, latents: jax.Array, noise: jax.Array,
               timesteps: jax.Array) -> jax.Array:
        """epsilon or v target (/root/reference/pretrain_e4t.py:638-643)."""
        if self.config.prediction_type == "epsilon":
            return noise
        if self.config.prediction_type == "v_prediction":
            return self.get_velocity(latents, noise, timesteps)
        raise ValueError(
            f"Unknown prediction type {self.config.prediction_type}")


# ---------------------------------------------------------------------------
# Inference schedulers
# ---------------------------------------------------------------------------

def _timestep_grid(cfg: NoiseScheduleConfig, num_steps: int) -> np.ndarray:
    """diffusers v0.14 grid: descending rounded multiples + steps_offset."""
    ratio = cfg.num_train_timesteps // num_steps
    ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64)
    return ts + cfg.steps_offset


def _pred_x0_eps(cfg, sample, model_output, alpha_t):
    """(pred_x0, eps) from a model output under the configured
    prediction_type, at cumulative alpha ``alpha_t``."""
    beta_t = 1.0 - alpha_t
    if cfg.prediction_type == "epsilon":
        x0 = (sample - beta_t ** 0.5 * model_output) / alpha_t ** 0.5
        eps = model_output
    elif cfg.prediction_type == "v_prediction":
        x0 = alpha_t ** 0.5 * sample - beta_t ** 0.5 * model_output
        eps = alpha_t ** 0.5 * model_output + beta_t ** 0.5 * sample
    elif cfg.prediction_type == "sample":
        x0 = model_output
        eps = (sample - alpha_t ** 0.5 * x0) / beta_t ** 0.5
    else:
        raise ValueError(cfg.prediction_type)
    return x0, eps


class DDIMScheduler:
    """DDIM sampling (eta=0 deterministic path), diffusers v0.14 numerics."""

    order = 1

    def __init__(self, config: NoiseScheduleConfig = NoiseScheduleConfig()):
        self.config = config

    def init(self, num_steps: int) -> Dict[str, jax.Array]:
        cfg = self.config
        ac = alphas_cumprod(cfg)
        ts = _timestep_grid(cfg, num_steps)
        prev_ts = ts - cfg.num_train_timesteps // num_steps
        final_ac = 1.0 if cfg.set_alpha_to_one else ac[0]
        alpha_t = ac[np.clip(ts, 0, cfg.num_train_timesteps - 1)]
        alpha_prev = np.where(prev_ts >= 0,
                              ac[np.clip(prev_ts, 0, None)], final_ac)
        return {
            "timesteps": jnp.asarray(ts, jnp.int32),
            "alpha_t": jnp.asarray(alpha_t, jnp.float32),
            "alpha_prev": jnp.asarray(alpha_prev, jnp.float32),
        }

    def scale_model_input(self, state, i, sample):
        return sample

    def step(self, state, i, model_output, sample,
             eta: float = 0.0, noise: Optional[jax.Array] = None):
        cfg = self.config
        a_t = state["alpha_t"][i].astype(sample.dtype)
        a_prev = state["alpha_prev"][i].astype(sample.dtype)
        x0, eps = _pred_x0_eps(cfg, sample.astype(jnp.float32),
                               model_output.astype(jnp.float32),
                               a_t.astype(jnp.float32))
        if cfg.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        if eta > 0.0:
            var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
            std = eta * jnp.sqrt(var)
            dir_coeff = jnp.sqrt(1.0 - a_prev - std ** 2)
            prev = jnp.sqrt(a_prev) * x0 + dir_coeff * eps
            if noise is None:
                raise ValueError("eta > 0 requires noise")
            prev = prev + std * noise
        else:
            prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return state, prev.astype(sample.dtype)


class PNDMScheduler:
    """PLMS (PNDM with skip_prk_steps=True, the SD default — the reference
    maps scheduler_type 'plms' to this: /root/reference/inference.py:65-72).

    The counter-dependent branching of diffusers' step_plms is precomputed
    into static per-step tables (linear-multistep weights, timestep pairs,
    carry flags), so the scan body is branch-free.
    """

    order = 1

    def __init__(self, config: NoiseScheduleConfig = NoiseScheduleConfig()):
        self.config = config

    def init(self, num_steps: int) -> Dict[str, jax.Array]:
        cfg = self.config
        ac = alphas_cumprod(cfg)
        ratio = cfg.num_train_timesteps // num_steps
        base = (np.arange(num_steps) * ratio).round().astype(np.int64) + cfg.steps_offset
        # skip_prk: duplicate the second-to-last timestep
        ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        n = len(ts)  # num_steps + 1 model evaluations

        # Recreate diffusers' counter logic statically per step index.
        weights = np.zeros((n, 5), dtype=np.float64)  # [w_eps, w_e1..w_e4]
        t_pairs = np.zeros((n, 2), dtype=np.int64)    # (timestep, prev)
        use_cur = np.zeros(n, dtype=bool)
        store_cur = np.zeros(n, dtype=bool)
        append_et = np.zeros(n, dtype=bool)
        ets_len = 0
        for counter, t in enumerate(ts):
            prev_t = t - ratio
            if counter != 1:
                ets_len = min(ets_len, 3) + 1
                append_et[counter] = True
            else:
                prev_t = t
                t = t + ratio
            if ets_len == 1 and counter == 0:
                weights[counter] = [1, 0, 0, 0, 0]
                store_cur[counter] = True
            elif ets_len == 1 and counter == 1:
                weights[counter] = [0.5, 0.5, 0, 0, 0]
                use_cur[counter] = True
            elif ets_len == 2:
                weights[counter] = [0, 3 / 2, -1 / 2, 0, 0]
            elif ets_len == 3:
                weights[counter] = [0, 23 / 12, -16 / 12, 5 / 12, 0]
            else:
                weights[counter] = [0, 55 / 24, -59 / 24, 37 / 24, -9 / 24]
            t_pairs[counter] = (t, prev_t)

        final_ac = 1.0 if cfg.set_alpha_to_one else ac[0]
        alpha_t = ac[np.clip(t_pairs[:, 0], 0, cfg.num_train_timesteps - 1)]
        alpha_prev = np.where(t_pairs[:, 1] >= 0,
                              ac[np.clip(t_pairs[:, 1], 0, None)], final_ac)
        return {
            "timesteps": jnp.asarray(ts, jnp.int32),
            "alpha_t": jnp.asarray(alpha_t, jnp.float32),
            "alpha_prev": jnp.asarray(alpha_prev, jnp.float32),
            "weights": jnp.asarray(weights, jnp.float32),
            "use_cur": jnp.asarray(use_cur),
            "store_cur": jnp.asarray(store_cur),
            "append_et": jnp.asarray(append_et),
            # carries
            "ets": None,         # lazily shaped on first step
            "cur_sample": None,
        }

    def init_carry(self, state, sample_shape, dtype):
        state = dict(state)
        state["ets"] = jnp.zeros((4, *sample_shape), dtype)
        state["cur_sample"] = jnp.zeros(sample_shape, dtype)
        return state

    def scale_model_input(self, state, i, sample):
        return sample

    def step(self, state, i, model_output, sample, noise=None):
        cfg = self.config
        ets = state["ets"]
        # shift history when appending (newest at index 0)
        new_ets = jnp.where(state["append_et"][i],
                            jnp.concatenate([model_output[None], ets[:-1]], axis=0),
                            ets)
        cur_sample = jnp.where(state["store_cur"][i], sample,
                               state["cur_sample"])
        sample_eff = jnp.where(state["use_cur"][i], cur_sample, sample)

        w = state["weights"][i]
        combined = (w[0] * model_output
                    + w[1] * new_ets[0] + w[2] * new_ets[1]
                    + w[3] * new_ets[2] + w[4] * new_ets[3])

        a_t = state["alpha_t"][i].astype(jnp.float32)
        a_prev = state["alpha_prev"][i].astype(jnp.float32)
        if cfg.prediction_type == "v_prediction":
            combined = (a_t ** 0.5) * combined + ((1 - a_t) ** 0.5) * sample_eff

        s = sample_eff.astype(jnp.float32)
        c = combined.astype(jnp.float32)
        sample_coeff = (a_prev / a_t) ** 0.5
        denom = a_t * (1 - a_prev) ** 0.5 + (a_t * (1 - a_t) * a_prev) ** 0.5
        prev = sample_coeff * s - (a_prev - a_t) * c / denom

        out_state = dict(state)
        out_state["ets"] = new_ets
        out_state["cur_sample"] = cur_sample
        return out_state, prev.astype(sample.dtype)


# ---------------------------------------------------------------------------
# Sigma-parameterized samplers (Euler / EulerAncestral / LMS)
# ---------------------------------------------------------------------------

def _sigma_grid(cfg: NoiseScheduleConfig, num_steps: int):
    """diffusers v0.14 *Discrete grids: float linspace timesteps descending,
    sigmas interpolated from ((1-ac)/ac)^0.5, 0 appended."""
    ac = alphas_cumprod(cfg)
    sigmas_train = ((1 - ac) / ac) ** 0.5
    ts = np.linspace(0, cfg.num_train_timesteps - 1, num_steps,
                     dtype=np.float64)[::-1].copy()
    sigmas = np.interp(ts, np.arange(cfg.num_train_timesteps), sigmas_train)
    sigmas = np.concatenate([sigmas, [0.0]])
    return ts, sigmas


class _SigmaScheduler:
    order = 1

    def __init__(self, config: NoiseScheduleConfig = NoiseScheduleConfig()):
        self.config = config

    def init(self, num_steps: int) -> Dict[str, jax.Array]:
        ts, sigmas = _sigma_grid(self.config, num_steps)
        return {
            "timesteps": jnp.asarray(np.round(ts), jnp.int32),
            "timesteps_f": jnp.asarray(ts, jnp.float32),
            "sigmas": jnp.asarray(sigmas, jnp.float32),
        }

    def init_noise_sigma(self, state) -> jax.Array:
        return jnp.max(state["sigmas"])

    def scale_model_input(self, state, i, sample):
        sigma = state["sigmas"][i].astype(sample.dtype)
        return sample / jnp.sqrt(sigma ** 2 + 1.0)

    def _pred_x0(self, state, i, model_output, sample):
        """sample here is the UN-scaled latent (sigma-space)."""
        cfg = self.config
        sigma = state["sigmas"][i].astype(jnp.float32)
        s = sample.astype(jnp.float32)
        m = model_output.astype(jnp.float32)
        if cfg.prediction_type == "epsilon":
            return s - sigma * m
        if cfg.prediction_type == "v_prediction":
            return m * (-sigma / jnp.sqrt(sigma ** 2 + 1)) + s / (sigma ** 2 + 1)
        if cfg.prediction_type == "sample":
            return m
        raise ValueError(cfg.prediction_type)


class EulerDiscreteScheduler(_SigmaScheduler):
    """diffusers EulerDiscreteScheduler (deterministic, s_churn=0 path)."""

    def step(self, state, i, model_output, sample, noise=None):
        sigma = state["sigmas"][i].astype(jnp.float32)
        sigma_next = state["sigmas"][i + 1].astype(jnp.float32)
        x0 = self._pred_x0(state, i, model_output, sample)
        d = (sample.astype(jnp.float32) - x0) / sigma
        prev = sample.astype(jnp.float32) + (sigma_next - sigma) * d
        return state, prev.astype(sample.dtype)


class EulerAncestralDiscreteScheduler(_SigmaScheduler):
    """diffusers EulerAncestralDiscreteScheduler (stochastic)."""

    stochastic = True

    def step(self, state, i, model_output, sample, noise=None):
        if noise is None:
            raise ValueError("euler_ancestral requires per-step noise")
        sigma = state["sigmas"][i].astype(jnp.float32)
        sigma_to = state["sigmas"][i + 1].astype(jnp.float32)
        x0 = self._pred_x0(state, i, model_output, sample)
        var = sigma_to ** 2 * (sigma ** 2 - sigma_to ** 2) / sigma ** 2
        sigma_up = jnp.sqrt(jnp.maximum(var, 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sigma_to ** 2 - sigma_up ** 2, 0.0))
        d = (sample.astype(jnp.float32) - x0) / sigma
        prev = (sample.astype(jnp.float32) + (sigma_down - sigma) * d
                + noise.astype(jnp.float32) * sigma_up)
        return state, prev.astype(sample.dtype)


class LMSDiscreteScheduler(_SigmaScheduler):
    """diffusers LMSDiscreteScheduler (order 4): Adams-Bashforth over the
    sigma grid. The per-step LMS coefficients are integrals of Lagrange
    basis polynomials — precomputed numerically at init into a static
    (n, 4) table, so the scan body is a weighted sum over a fixed-size
    derivative history."""

    lms_order = 4

    def init(self, num_steps: int) -> Dict[str, jax.Array]:
        state = super().init(num_steps)
        sigmas = np.asarray(state["sigmas"], np.float64)
        n = num_steps
        coeffs = np.zeros((n, self.lms_order), np.float64)
        for t in range(n):
            order = min(t + 1, self.lms_order)
            for j in range(order):
                # integrate prod_{k!=j} (s - sig[t-k]) / (sig[t-j] - sig[t-k])
                # over s in [sig[t], sig[t+1]]  (diffusers lms_derivative)
                lo, hi = sigmas[t], sigmas[t + 1]
                xs = np.linspace(lo, hi, 2049)
                prod = np.ones_like(xs)
                for k in range(order):
                    if k == j:
                        continue
                    prod *= (xs - sigmas[t - k]) / (sigmas[t - j] - sigmas[t - k])
                coeffs[t, j] = np.trapezoid(prod, xs)
        state["lms_coeffs"] = jnp.asarray(coeffs, jnp.float32)
        state["derivs"] = None  # carry, shaped lazily
        return state

    def init_carry(self, state, sample_shape, dtype):
        state = dict(state)
        state["derivs"] = jnp.zeros((self.lms_order, *sample_shape),
                                    jnp.float32)
        return state

    def step(self, state, i, model_output, sample, noise=None):
        sigma = state["sigmas"][i].astype(jnp.float32)
        x0 = self._pred_x0(state, i, model_output, sample)
        d = (sample.astype(jnp.float32) - x0) / sigma
        derivs = jnp.concatenate([d[None], state["derivs"][:-1]], axis=0)
        w = state["lms_coeffs"][i]  # (4,), newest first
        delta = sum(w[k] * derivs[k] for k in range(self.lms_order))
        prev = sample.astype(jnp.float32) + delta
        out = dict(state)
        out["derivs"] = derivs
        return out, prev.astype(sample.dtype)


class DPMSolverMultistepScheduler:
    """DPM-Solver++ (2M), diffusers v0.14 defaults: solver_order=2,
    algorithm_type='dpmsolver++', lower_order_final=True, no thresholding.

    Order selection per step is static (first step -> 1st order; final
    steps lowered when num_steps < 15), so the scan body is branch-free
    with an x0-prediction history carry.
    """

    order = 1

    def __init__(self, config: NoiseScheduleConfig = NoiseScheduleConfig(),
                 solver_order: int = 2, lower_order_final: bool = True):
        self.config = config
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final

    def init(self, num_steps: int) -> Dict[str, jax.Array]:
        cfg = self.config
        ac = alphas_cumprod(cfg)
        # diffusers dpm set_timesteps: linspace(0, T-1, n+1).round()[::-1][:-1]
        ts = (np.linspace(0, cfg.num_train_timesteps - 1, num_steps + 1)
              .round()[::-1][:-1].astype(np.int64).copy())
        alpha_t = np.sqrt(ac)          # VP alpha
        sigma_t = np.sqrt(1 - ac)      # VP sigma
        lam = np.log(alpha_t) - np.log(sigma_t)

        # per-step (t, s0, s1) timesteps for up-to-2nd-order updates
        n = num_steps
        use_order2 = np.zeros(n, dtype=bool)
        for i in range(n):
            lower = (self.lower_order_final and n < 15 and i == n - 1)
            use_order2[i] = (i >= 1 and self.solver_order >= 2 and not lower)

        t_prev = np.concatenate([[0], ts[:-1]])  # s0 at step i is ts[i-1]
        # "prev_timestep" in diffusers = ts[i+1] (0 at the end)
        t_next = np.concatenate([ts[1:], [0]])

        def gather(arr, idx):
            return arr[np.clip(idx, 0, len(arr) - 1)]

        return {
            "timesteps": jnp.asarray(ts, jnp.int32),
            "lam_t": jnp.asarray(gather(lam, t_next), jnp.float32),
            "lam_s0": jnp.asarray(gather(lam, ts), jnp.float32),
            "lam_s1": jnp.asarray(gather(lam, t_prev), jnp.float32),
            "alpha_T": jnp.asarray(gather(alpha_t, t_next), jnp.float32),
            "sigma_T": jnp.asarray(gather(sigma_t, t_next), jnp.float32),
            "alpha_s0": jnp.asarray(gather(alpha_t, ts), jnp.float32),
            "sigma_s0": jnp.asarray(gather(sigma_t, ts), jnp.float32),
            "use_order2": jnp.asarray(use_order2),
            "m_hist": None,
        }

    def init_carry(self, state, sample_shape, dtype):
        state = dict(state)
        state["m_hist"] = jnp.zeros((2, *sample_shape), jnp.float32)
        return state

    def init_noise_sigma(self, state):
        return jnp.asarray(1.0, jnp.float32)

    def scale_model_input(self, state, i, sample):
        return sample

    def _to_x0(self, state, i, model_output, sample):
        cfg = self.config
        a = state["alpha_s0"][i]
        s = state["sigma_s0"][i]
        mo = model_output.astype(jnp.float32)
        x = sample.astype(jnp.float32)
        if cfg.prediction_type == "epsilon":
            return (x - s * mo) / a
        if cfg.prediction_type == "v_prediction":
            return a * x - s * mo
        if cfg.prediction_type == "sample":
            return mo
        raise ValueError(cfg.prediction_type)

    def step(self, state, i, model_output, sample, noise=None):
        x = sample.astype(jnp.float32)
        m0 = self._to_x0(state, i, model_output, sample)
        m1 = state["m_hist"][0]  # previous step's x0 pred

        lam_t, lam_s0, lam_s1 = state["lam_t"][i], state["lam_s0"][i], state["lam_s1"][i]
        h = lam_t - lam_s0
        alpha_T, sigma_T, sigma_s0 = (state["alpha_T"][i], state["sigma_T"][i],
                                      state["sigma_s0"][i])

        # 1st order (dpmsolver++): x = (sigma_t/sigma_s0) x - alpha_t (e^-h - 1) m0
        first = (sigma_T / sigma_s0) * x - alpha_T * (jnp.exp(-h) - 1.0) * m0
        # 2nd order multistep: + correction with D1 = (m0 - m1)/r0
        h_0 = lam_s0 - lam_s1
        r0 = h_0 / jnp.where(h == 0, 1.0, h)
        d1 = (m0 - m1) / jnp.where(r0 == 0, 1.0, r0)
        second = first - 0.5 * alpha_T * (jnp.exp(-h) - 1.0) * d1

        prev = jnp.where(state["use_order2"][i], second, first)
        out = dict(state)
        out["m_hist"] = jnp.stack([m0, state["m_hist"][0]])
        return out, prev.astype(sample.dtype)


SCHEDULER_MAPPING: Dict[str, Any] = {
    "ddim": DDIMScheduler,
    "plms": PNDMScheduler,
    "lms": LMSDiscreteScheduler,
    "euler": EulerDiscreteScheduler,
    "euler_ancestral": EulerAncestralDiscreteScheduler,
    "dpm_solver++": DPMSolverMultistepScheduler,
}
