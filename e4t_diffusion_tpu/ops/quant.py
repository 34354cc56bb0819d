"""int8 serving quantization for the UNet matmul/conv path (beyond
reference parity — the reference has no quantized serving story).

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 MAC rate, and the
SD-v1 UNet's non-attention time is MXU-bound (~74% of peak in bf16,
docs/ARCHITECTURE.md), so weight+activation int8 is the one remaining
large inference lever. Scheme (standard symmetric PTQ):

- weights: static per-output-channel int8, scale = max|w| / 127,
  quantized ONCE per sampling run on the offset-FOLDED effective kernels
  (after ``fold_offset_bank`` — personalization offsets are preserved
  exactly; only the final matmul operands are quantized);
- activations: dynamic per-tensor int8 (scale from the live max), so no
  calibration data is needed; OR calibrated static per-site scales
  (``--int8_static_act``): a short bf16 trajectory records each site's
  activation abs-max (the ``calib`` collection sown below), the scale is
  baked next to the int8 kernel (``"sa"``), and serving skips the
  per-call abs-max reduction entirely (~3 ms/UNet-fwd measured);
  OR calibrated static PER-CHANNEL scales (``act_pc=True`` /
  ``--int8_pc_act`` / ``int8="static_pc"``): each input channel gets its
  own calibrated scale vector ``"sac"``, FOLDED into the weight along
  the contraction axis before weight quantization — so serving pays the
  same zero-reduction cost as per-tensor static (one fusable broadcast
  divide), but outlier channels no longer force a shared range
  (per-tensor static loses resolution to the largest channel and clips
  where trajectories outgrow the calibration; both effects are
  per-channel under ``sac``). Exactness: ``x @ W = (x/s_c) @ (W*s_c)``
  — the fold is algebraic, only the two roundings differ. The fold
  exponent is SmoothQuant-style ``E4T_INT8_PC_ALPHA`` (default 0.75:
  the divisor is ``a_c^0.75 * max_c(a_c^0.25)/127``) — on a synthetic
  50x-outlier channel a full fold (alpha=1) pushes the outlier into
  the weight where per-output scales can't absorb it and 0.5 wins
  (tests/test_quant.py::test_static_pc_fold...), but on the real
  SD-v1 net the round-5 alpha sweep measured 0.75 best under DDIM-50
  and alpha monotone-improving under DPM++-20 (docs/KERNELS.md);
- GroupNorm/LayerNorm/SiLU/softmax and the flash-attention inner math
  stay bf16/f32.

The mechanism is param-driven, not config-driven: ``quantize_params``
rewrites every ``kernel`` leaf to ``{"q": int8, "s": f32}``, and the
``Dense``/``Conv`` drop-ins below (used by models/unet.py in place of
``nn.Dense``/``nn.Conv``) switch to the int8 kernel when they find a
quantized leaf. The same module code therefore serves both paths, the
param tree layout (``<name>/kernel``) is unchanged for checkpoints /
offset folding / TP specs, and the quantization runs OUTSIDE the
denoise scan (no per-step requantization — XLA is not reliable about
hoisting big loop-invariant elementwise work, see the E4T_FUSED_QKV
negative result in CLAUDE.md).

Enable per call site: ``make_sample_fn(..., int8=True)``,
``inference.py --int8``, ``E4T_BENCH_INT8=1 python bench.py``.
Composes with --data_parallel_serving and --tensor_parallel: the
quantization runs inside the jit on the already-sharded folded kernels
(tensor_parallel_specs only ever addresses the plain input kernels),
and XLA partitions the scale reductions exactly
(tests/test_dp_serving.py).
Accuracy: see tests/test_quant.py for the error bounds asserted on
random nets; real-checkpoint quality validation needs staged weights.
Measured on v5e-1 (512px DDIM-50, batch 8): 1.581 img/s/chip vs 1.422
bf16 (+11.2%) — docs/KERNELS.md discusses the gap to the naive 2x.
"""
from __future__ import annotations

import contextlib
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 1e-8

# Trace-time flag: while True, the Dense/Conv drop-ins sow each site's
# activation abs-max into a "calib" collection. Read at TRACE time (like
# the E4T_* env knobs elsewhere), so programs traced outside
# calibration_trace() are byte-identical to before — the persistent
# compile cache (utils/runtime.py) is not invalidated by this feature.
_CALIBRATING = False


def env_truthy(name: str, default: str = "0") -> bool:
    """Shared truthiness parse for the int8 env knobs (one definition —
    pipeline._serving_int8_mode and quantize_params must agree on what
    counts as enabled; round-5 review finding)."""
    import os

    return os.environ.get(name, default).lower() not in ("0", "false", "")


@contextlib.contextmanager
def calibration_trace():
    """Enable activation-range recording for code traced inside the
    context (pipeline.make_calibration_fn wraps every call of its jitted
    fn in this, so retraces see the flag too)."""
    global _CALIBRATING
    prev = _CALIBRATING
    _CALIBRATING = True
    try:
        yield
    finally:
        _CALIBRATING = prev


def calibrating() -> bool:
    return _CALIBRATING


def quantize_kernel(w: jax.Array) -> dict:
    """Symmetric per-output-channel int8. Dense kernels are (in, out);
    conv kernels (kh, kw, in, out) — the output channel is the last axis
    in both."""
    reduce_axes = tuple(range(w.ndim - 1))
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes)
    s = jnp.maximum(s, _EPS) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return {"q": q.astype(jnp.int8), "s": s}


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf) in (
        {"q", "s"}, {"q", "s", "sa"}, {"q", "s", "sac"})


# Module subtrees kept in full precision by default (advisor r2):
# standard diffusion PTQ keeps the first/last convs and the timestep
# embedding MLP out of int8 — they are <0.5% of the FLOPs but touch the
# eps head / raw-latent statistics directly. Override with
# E4T_INT8_EXCLUDE (comma list of module names; empty = quantize all).
DEFAULT_EXCLUDE = ("conv_in", "conv_out", "time_embedding")

# UNet sites kept on DYNAMIC activation scales under static-act serving
# (kernels still int8). Attribution at SD-v1 geometry (round 4,
# scripts/int8_quality.py calib_gap): the residual-carrying convs'
# live activation ranges exceed an 8-step calibration by up to 1.8x
# over the 50-step trajectory (218/282 sites clip, worst all
# conv_shortcut / downsampler / upsampler convs), and excluding them
# recovers near-dynamic quality (final-latent rel-L2 vs bf16: 0.0566
# vs 0.052 full-dynamic / 0.105 all-static) at NO measured cost
# (unet_fwd 48.6 vs 48.8 ms @ batch 8 — these sites are few and their
# abs-max reductions are cheap relative to the savings elsewhere).
# Calibrating longer instead is WORSE (50-step calib -> 0.170: wider
# amax costs more resolution than the clipping it prevents). conv_in
# needs no row here — DEFAULT_EXCLUDE keeps it full precision.
# E4T_INT8_STATIC_EXCLUDE (set, possibly empty) overrides.
UNET_STATIC_EXCLUDE = ("conv_shortcut", "downsamplers", "upsamplers")


def quantize_params(tree: dict, act_amax: Optional[dict] = None,
                    act_headroom: Optional[float] = None,
                    exclude: Optional[tuple] = None,
                    static_exclude: Optional[tuple] = None,
                    act_pc: Optional[bool] = None) -> dict:
    """Rewrite every matmul/conv ``kernel`` leaf (ndim 2 or 4) to its
    int8 form. Norm scales (1-D) and biases are untouched. Subtrees
    whose module name is in ``exclude`` (default ``DEFAULT_EXCLUDE``)
    stay full precision.

    ``act_amax``: a ``"calib"`` collection from a calibration run
    (pipeline.make_calibration_fn) — a tree mirroring ``tree`` whose
    sites hold ``{"amax": scalar}``. When given, each quantized kernel
    also gets a static activation scale ``"sa" = amax*headroom/127`` and
    the drop-ins skip the per-call abs-max (activations beyond the
    calibrated range clip; headroom > 1 trades resolution for margin).
    ``act_headroom`` defaults to ``E4T_INT8_CALIB_HEADROOM`` (1.0) —
    read at trace time, so serving callers (pipeline._sample_body) get
    the knob without plumbing.
    ``static_exclude``: module-path substrings whose sites stay on
    DYNAMIC activation scales even when ``act_amax`` is given (the
    kernel is still int8; only the per-call abs-max is kept). Defaults
    to ``E4T_INT8_STATIC_EXCLUDE`` (comma list, trace-time). This is
    the static-int8 quality attribution knob (scripts/int8_quality.py
    sweep): excluded sites pay the ~abs-max cost but track live ranges.
    ``act_pc``: use PER-CHANNEL static activation scales (the
    ``"amax_c"`` vectors the calibration sows next to ``"amax"``): the
    per-channel scale is folded into the kernel's contraction axis
    before weight quantization (``x @ W = (x/s_c) @ (W*s_c)``), so
    serving quantizes the activation with a broadcast divide — same
    zero-reduction cost as per-tensor static, but channel outliers keep
    their own range (module docstring). Sites whose calibration lacks
    ``"amax_c"`` (e.g. a pre-round-4 --act_scales file) fall back to
    the per-tensor ``"sa"``. Defaults to ``E4T_INT8_ACT_PC`` (0).
    """
    import os

    if act_headroom is None:
        act_headroom = float(os.environ.get("E4T_INT8_CALIB_HEADROOM",
                                            "1.0"))
    if act_pc is None:
        act_pc = env_truthy("E4T_INT8_ACT_PC")
    # E4T_INT8_PC_ALPHA: 0 = per-tensor static, 1 = full per-channel
    # fold. Default 0.75 — the round-5 SD-v1 sweep measured quality
    # near-monotone in alpha (DDIM-50 rel-L2 0.0970/0.0765/0.0812 and
    # DPM++-20 0.1827/0.1565/0.1405 at 0.5/0.75/1.0): 0.75 is the DDIM
    # optimum and second-best under DPM++ (docs/KERNELS.md alpha table)
    pc_alpha = float(os.environ.get("E4T_INT8_PC_ALPHA", "0.75"))
    if exclude is None:
        env = os.environ.get("E4T_INT8_EXCLUDE")
        exclude = (tuple(x for x in env.split(",") if x)
                   if env is not None else DEFAULT_EXCLUDE)
    if static_exclude is None:
        env = os.environ.get("E4T_INT8_STATIC_EXCLUDE", "")
        static_exclude = tuple(x for x in env.split(",") if x)

    def walk(node, calib, path):
        out = {}
        for k, v in node.items():
            sub = f"{path}/{k}" if path else k
            if k in exclude:
                out[k] = v  # whole subtree stays full precision
            elif isinstance(v, dict):
                out[k] = walk(v, calib.get(k, {}) if calib else {}, sub)
            elif k == "kernel" and hasattr(v, "ndim") and v.ndim in (2, 4):
                static_here = (calib and "amax" in calib
                               and not any(p in sub for p in static_exclude))
                if static_here and act_pc and "amax_c" in calib:
                    # per-channel static: fold the activation scale into
                    # the contraction axis (dense (in, out) axis 0; conv
                    # (kh, kw, I, O) axis 2 — both ndim-2), THEN quantize.
                    # alpha balances the fold SmoothQuant-style: act
                    # divisor a_c^alpha * max_c(a_c^(1-alpha))/127 — the
                    # full fold (alpha=1) transfers the outlier channel
                    # into the weight, where the per-OUTPUT-channel
                    # weight scale can't absorb it (measured 2.3x worse
                    # than alpha=0.5 on a synthetic 50x-outlier;
                    # alpha=0 is plain per-tensor — but the real SD-v1
                    # net favors heavy folds, see the default's
                    # rationale above). Serving cost is
                    # alpha-independent: only the sac values change.
                    amax_c = jnp.maximum(
                        jnp.asarray(calib["amax_c"], jnp.float32)
                        * act_headroom, _EPS)
                    sac = (amax_c ** pc_alpha
                           * jnp.max(amax_c ** (1.0 - pc_alpha)) / 127.0)
                    shape = (1,) * (v.ndim - 2) + (sac.shape[0], 1)
                    out[k] = quantize_kernel(
                        v.astype(jnp.float32) * sac.reshape(shape))
                    out[k]["sac"] = sac
                    continue
                out[k] = quantize_kernel(v)
                if static_here:
                    amax = jnp.asarray(calib["amax"], jnp.float32)
                    out[k]["sa"] = (jnp.maximum(amax * act_headroom, _EPS)
                                    / 127.0)
            else:
                out[k] = v
        return out

    return walk(tree, act_amax or {}, "")


def _quantize_activation(x: jax.Array, kdict: dict,
                         ) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 activation: dynamic per-tensor abs-max scale, the
    calibrated per-tensor static scale ``"sa"``, or the calibrated
    per-channel vector ``"sac"`` (whose magnitude is already folded into
    the int8 kernel, so the returned dequant factor is 1)."""
    sac = kdict.get("sac")
    if sac is not None:
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / sac), -127, 127)
        return q.astype(jnp.int8), jnp.ones((), jnp.float32)
    s = kdict.get("sa")
    if s is None:
        s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def int8_dense(x: jax.Array, kdict: dict, dtype) -> jax.Array:
    xq, sx = _quantize_activation(x, kdict)
    y = jax.lax.dot_general(
        xq, kdict["q"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * kdict["s"])).astype(dtype)


def int8_conv(x: jax.Array, kdict: dict, strides, padding, dtype):
    """NHWC x HWIO int8 conv -> int32 -> rescale."""
    xq, sx = _quantize_activation(x, kdict)
    y = jax.lax.conv_general_dilated(
        xq, kdict["q"], window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * kdict["s"])).astype(dtype)


def _maybe_quantized_kernel(module: nn.Module) -> Optional[dict]:
    if module.is_initializing():
        return None
    leaf = module.get_variable("params", "kernel")
    return leaf if is_quantized(leaf) else None


def _sow_act_amax(module: nn.Module, x: jax.Array) -> None:
    """Under calibration_trace(), record this site's activation abs-max
    (running max across calls within one apply; callers running several
    applies max-reduce the returned collections). Sows both the
    per-tensor scalar ``"amax"`` and the per-input-channel (last-axis)
    vector ``"amax_c"`` so one calibration serves per-tensor static
    (``"sa"``) AND per-channel static (``"sac"``) quantization."""
    if calibrating() and not module.is_initializing():
        ax = jnp.abs(x.astype(jnp.float32))
        module.sow("calib", "amax", jnp.max(ax),
                   init_fn=lambda: jnp.zeros((), jnp.float32),
                   reduce_fn=jnp.maximum)
        module.sow("calib", "amax_c",
                   jnp.max(ax, axis=tuple(range(x.ndim - 1))),
                   init_fn=lambda: jnp.zeros((x.shape[-1],), jnp.float32),
                   reduce_fn=jnp.maximum)


class Dense(nn.Module):
    """nn.Dense drop-in (same param layout/init) that runs the int8 MXU
    path when its kernel leaf was rewritten by ``quantize_params``."""
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kdict = _maybe_quantized_kernel(self)
        if kdict is not None:
            y = int8_dense(x, kdict, self.dtype)
        else:
            _sow_act_amax(self, x)
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (x.shape[-1], self.features), jnp.float32)
            # same dot as nn.Dense (contract last/first, no batch dims) so
            # the lowered HLO — and thus cache keys and layouts — match
            y = jax.lax.dot_general(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (((x.ndim - 1,), (0,)), ((), ())))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Conv(nn.Module):
    """nn.Conv drop-in (NHWC, HWIO kernels, same param layout/init) with
    the int8 path; supports the UNet's square kernels / int padding."""
    features: int
    kernel_size: Sequence[int]
    strides: Union[None, int, Sequence[int]] = None
    padding: Union[int, str, Sequence[Tuple[int, int]]] = 0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        strides = self.strides or (1, 1)
        if isinstance(strides, int):
            strides = (strides, strides)
        padding = self.padding
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))

        kdict = _maybe_quantized_kernel(self)
        if kdict is not None:
            y = int8_conv(x, kdict, strides, padding, self.dtype)
        else:
            _sow_act_amax(self, x)
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (kh, kw, x.shape[-1], self.features),
                                jnp.float32)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=strides, padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


# ---- calibration-scale persistence -------------------------------------

def save_act_scales(act_amax: dict, path: str) -> None:
    """Write a calibration amax tree (pipeline.make_calibration_fn) as
    JSON, so a checkpoint's activation ranges ship as a deployment
    artifact: every serving process then quantizes identically instead
    of re-calibrating (two independent calibrations differ by compounded
    trajectory ulps, which shifts static rounding boundaries — see
    tests/test_dp_serving.py)."""
    import json

    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict) or hasattr(v, "items"):
                walk(v, prefix + (k,))
            else:
                import numpy as np

                arr = np.asarray(v, np.float32)
                # scalars stay floats (v1 files); per-channel "amax_c"
                # vectors (round 4) serialize as lists — load_act_scales
                # round-trips both
                flat["/".join(prefix + (k,))] = (arr.tolist() if arr.ndim
                                                 else float(arr))

    walk(act_amax, ())
    with open(path, "w") as f:
        json.dump({"format": "e4t-act-amax-v1", "scales": flat}, f,
                  indent=0, sort_keys=True)


def load_act_scales(path: str) -> dict:
    """Inverse of save_act_scales -> the nested amax tree (f32 jnp
    scalars), ready for quantize_params(act_amax=...) or the
    int8="static" sample fn's trailing argument."""
    import json

    with open(path) as f:
        payload = json.load(f)
    if payload.get("format") != "e4t-act-amax-v1":
        raise ValueError(f"{path}: not an e4t-act-amax-v1 file")
    tree: dict = {}
    for key, v in payload["scales"].items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v, jnp.float32)
    return tree
