"""Warm the persistent compile cache for the standard programs.

Full-size cold compiles are expensive on this class of hardware
(inference 50-step scan ~8 min, phase-2 train step ~15-17 min;
CLAUDE.md), and the cache (utils/runtime.setup_compilation_cache) is
keyed so only real computation changes invalidate it. This utility
front-loads the compiles — run it once after deploying a code change
(or after a relay outage wiped nothing but you want compiles off the
serving path), and every later CLI/bench invocation starts at full
speed.

Programs warmed (each is compile-only: dummy zero weights, one
dispatch, result discarded):
  serve_bf16     512px DDIM-50 sampler, batch 8 (the headline config)
  serve_int8     same, dynamic-int8 UNet
  serve_int8s    same, calibrated-static int8 (+ its calibration run)
  serve_int8spc  same, per-channel static act scales (--int8_pc_act)
  serve_int8s_aux same, plus int8 ViT tower + VAE decode (--int8_aux)
  serve_dpmpp20  512px DPM++ 2M 20-step fast-sampler, int8-static
                 (the E4T_BENCH_SCHEDULER=dpmpp serving row)
  tune_step      phase-2 train step at the bench_tuning config
  pretrain_step  phase-1 train step at the bench_pretrain config

Select a subset: E4T_PRECOMPILE=serve_bf16,serve_int8s. Batch/res via
the usual E4T_BENCH_* knobs. Training-step warms import the bench
scripts' builders so the compiled programs are byte-identical to what
the benches/CLIs run.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _want(name: str) -> bool:
    only = os.environ.get("E4T_PRECOMPILE", "")
    return (not only) or name in only.split(",")


def _serve(kind: str) -> None:
    os.environ["E4T_BENCH_INT8"] = {
        "serve_bf16": "0", "serve_int8": "1", "serve_int8s": "static",
        "serve_int8spc": "static_pc",
        "serve_int8s_aux": "static", "serve_dpmpp20": "static"}[kind]
    os.environ["E4T_BENCH_INT8_AUX"] = (
        "1" if kind == "serve_int8s_aux" else "0")
    if kind == "serve_dpmpp20":
        os.environ["E4T_BENCH_SCHEDULER"] = "dpmpp"
        os.environ.setdefault("E4T_BENCH_STEPS", "20")
    else:
        os.environ.pop("E4T_BENCH_SCHEDULER", None)
    os.environ["E4T_BENCH_REPEATS"] = "0"  # compile + one warmup dispatch
    import bench

    bench.run_bench(int(os.environ.get("E4T_BENCH_BATCH", "8")))


def _tune_step() -> None:
    import scripts.bench_tuning as bt

    bt.main()


def _pretrain_step() -> None:
    import scripts.bench_pretrain as bp

    bp.main()


def main():
    import argparse

    argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter).parse_args()
    from e4t_diffusion_tpu.utils.runtime import (apply_platform_override,
                                                 setup_compilation_cache)

    apply_platform_override()  # honor E4T_PLATFORM before backend init
    setup_compilation_cache()
    jobs = [("serve_bf16", lambda: _serve("serve_bf16")),
            ("serve_int8", lambda: _serve("serve_int8")),
            ("serve_int8s", lambda: _serve("serve_int8s")),
            ("serve_int8spc", lambda: _serve("serve_int8spc")),
            ("serve_int8s_aux", lambda: _serve("serve_int8s_aux")),
            # last of the serve warms: it retargets E4T_BENCH_STEPS
            ("serve_dpmpp20", lambda: _serve("serve_dpmpp20")),
            ("tune_step", _tune_step),
            ("pretrain_step", _pretrain_step)]
    failures = 0
    for name, job in jobs:
        if not _want(name):
            continue
        t0 = time.perf_counter()
        try:
            job()
            print(f"[precompile] {name}: ok "
                  f"({time.perf_counter() - t0:.0f}s)")
        except Exception as e:
            # a runtime failure (e.g. the degraded-relay training OOM
            # mode) still leaves the compiled executable in the cache —
            # report and keep warming the rest
            failures += 1
            print(f"[precompile] {name}: compile done, run failed "
                  f"({time.perf_counter() - t0:.0f}s): "
                  f"{str(e)[:200]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
