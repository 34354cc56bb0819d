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

    def step(self, state, i, model_output, sample):
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


SCHEDULER_MAPPING: Dict[str, Any] = {
    "ddim": DDIMScheduler,
    "plms": PNDMScheduler,
}
