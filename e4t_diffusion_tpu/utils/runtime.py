"""Runtime setup shared by the CLIs."""
from __future__ import annotations

import os

import jax


def apply_platform_override() -> None:
    """Honor E4T_PLATFORM / E4T_NUM_CPU_DEVICES at CLI startup.

    Some TPU images pin the PJRT plugin via sitecustomize at interpreter
    start, so the standard JAX_PLATFORMS env prefix is silently ignored;
    jax.config still wins as long as no backend has been initialized.
    E4T_PLATFORM=cpu E4T_NUM_CPU_DEVICES=8 runs a CLI on a virtual
    8-device CPU mesh (how the test suite exercises dp/tp shardings
    without hardware).
    """
    plat = os.environ.get("E4T_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
        n = os.environ.get("E4T_NUM_CPU_DEVICES")
        if n:
            jax.config.update("jax_num_cpu_devices", int(n))


def setup_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache: the phase-2 tuning step and the
    50-step sampling scan compile in minutes; with the cache, repeat CLI
    invocations skip straight to execution. Disable with
    E4T_COMPILE_CACHE=0."""
    env = os.environ.get("E4T_COMPILE_CACHE", "")
    if env == "0":
        return
    path = path or env or os.path.expanduser("~/.cache/e4t_jax")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        if os.environ.get("E4T_FULL_TRACEBACK_LOCS", "0") != "1":
            # Without this, ANY source-line shift anywhere in the Python
            # call stack invalidates every cached executable containing a
            # Pallas kernel: Mosaic serializes its kernel module with
            # per-op locations that embed the FULL user traceback
            # (attention.py AND its callers), and that payload sits inside
            # the custom-call backend_config where the cache key's
            # strip-debuginfo pass cannot reach (jax cache_key.py). With
            # the limit at 0, measured payload hashes are identical under
            # line shifts in both the kernel module and its callers, so
            # the 8-17 min full-size recompiles only happen when the
            # traced computation actually changes. Costs per-op Python
            # source attribution in XLA dumps; set
            # E4T_FULL_TRACEBACK_LOCS=1 when debugging Mosaic failures.
            jax.config.update("jax_traceback_in_locations_limit", 0)
    except Exception as e:  # cache is best-effort
        print(f"[runtime] compilation cache disabled: {e}")


def device_memory_stats(device=None) -> dict:
    """Best-effort device memory stats (bytes). Returns {} when the
    backend doesn't expose them (CPU, some PJRT plugins). Keys of
    interest: peak_bytes_in_use, bytes_in_use, bytes_limit."""
    try:
        device = device or jax.local_devices()[0]
        stats = device.memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


def peak_hbm_gb(device=None) -> float | None:
    """Peak HBM in GiB since process start, or None if unavailable."""
    stats = device_memory_stats(device)
    peak = stats.get("peak_bytes_in_use")
    return round(peak / 2**30, 3) if peak else None


class GracefulShutdown:
    """Preemption-aware shutdown: SIGTERM -> checkpoint at the next step
    boundary.

    TPU pod preemptions (and most cluster schedulers) deliver SIGTERM
    with a grace window; the reference only handles Ctrl-C
    (KeyboardInterrupt -> "Summoning checkpoint...",
    /root/reference/pretrain_e4t.py:682-684). The handler just sets a
    flag — the training loop polls ``requested`` after each optimization
    step and exits through its normal save path, so the checkpoint is
    always a consistent step boundary, never a mid-step core dump.
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self.requested = False
        self._received = None
        self._prev = {}
        for s in signals or (_signal.SIGTERM,):
            self._prev[s] = _signal.signal(s, self._handle)

    def _handle(self, signum, frame):
        self.requested = True
        self._received = signum

    def restore(self) -> None:
        for s, prev in self._prev.items():
            self._signal.signal(s, prev)

    def describe(self) -> str:
        try:
            name = self._signal.Signals(self._received).name
        except Exception:
            name = str(self._received)
        return f"received {name}"
