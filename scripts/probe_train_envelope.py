"""Degraded-mode training-envelope probe (VERDICT r4 #3).

The axon relay's recurring degradation mode fails every TRAINING-size
program at runtime with a detail-less RESOURCE_EXHAUSTED while
inference-size programs run fine (CLAUDE.md "Environment degradation
mode"; the 2026-08-17 bisect showed a fresh-process 15 GB raw alloc
SUCCEEDS while ~11 GB train programs fail — the failure tracks program
shape, not free HBM). Instead of only waiting for recovery
(scripts/tpu_recovery_watch.sh), this probe walks a LADDER of training
configs from small to large and records, per rung, whether the program
executes and its measured s/step — so even in degraded mode the repo
carries a measured training lower bound and a mapped execution envelope.

Rungs (ascending program size; all 512px unless noted):
  pre_b1_r256    phase-1 pretrain, batch 1, 256px   (smallest)
  pre_b1         phase-1 pretrain, batch 1
  pre_b2         phase-1 pretrain, batch 2          (0.32 s/step healthy)
  tune_b1_bf16g  phase-2 tuning, batch 1, bf16 grads
  tune_b1        phase-2 tuning, batch 1
  tune_b2        phase-2 tuning, batch 2
  tune_b4        phase-2 tuning, batch 4            (the 5.27 s canary)

Each rung is a fresh subprocess of the existing bench scripts (their
executables persist in the compile cache, so re-probes are cheap).
First run pays one compile per rung (~15-25 min full-size) — set
E4T_PROBE_TIMEOUT accordingly. Stops after E4T_PROBE_MAX_FAILS
consecutive failures (default 2 — everything larger will also fail).

Output: one JSON line per rung + a summary line. Run on the real TPU:
  python scripts/probe_train_envelope.py
Env: E4T_PROBE_TIMEOUT (3600 s/rung), E4T_PROBE_MAX_FAILS (2),
E4T_PROBE_RUNGS (comma list to subset).
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# rung -> (script, env overrides)
RUNGS = [
    ("pre_b1_r256", "bench_pretrain.py",
     {"E4T_PRE_BATCH": "1", "E4T_PRE_RES": "256"}),
    ("pre_b1", "bench_pretrain.py", {"E4T_PRE_BATCH": "1"}),
    ("pre_b2", "bench_pretrain.py", {"E4T_PRE_BATCH": "2"}),
    ("tune_b1_bf16g", "bench_tuning.py",
     {"E4T_TUNE_BATCH": "1", "E4T_TUNE_BF16_GRADS": "1"}),
    ("tune_b1", "bench_tuning.py", {"E4T_TUNE_BATCH": "1"}),
    ("tune_b2", "bench_tuning.py", {"E4T_TUNE_BATCH": "2"}),
    ("tune_b4", "bench_tuning.py", {"E4T_TUNE_BATCH": "4"}),
]


def main():
    timeout = float(os.environ.get("E4T_PROBE_TIMEOUT", "3600"))
    max_fails = int(os.environ.get("E4T_PROBE_MAX_FAILS", "2"))
    subset = os.environ.get("E4T_PROBE_RUNGS")
    rungs = [r for r in RUNGS if not subset or r[0] in subset.split(",")]

    results = []
    fails = 0
    for name, script, env_over in rungs:
        env = dict(os.environ)
        env.update(env_over)
        t0 = time.time()
        row = {"rung": name, "script": script, "env": env_over}
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(HERE, script)],
                env=env, cwd=REPO, timeout=timeout,
                capture_output=True, text=True)
            wall = time.time() - t0
            metric = None
            for line in p.stdout.splitlines():
                if line.startswith("{") and '"metric"' in line:
                    metric = json.loads(line)
            row.update(ok=(p.returncode == 0 and metric is not None),
                       rc=p.returncode, wall_s=round(wall, 1),
                       metric=metric)
            if not row["ok"]:
                tail = (p.stderr or p.stdout).strip().splitlines()[-8:]
                row["tail"] = tail
                row["resource_exhausted"] = any(
                    "RESOURCE_EXHAUSTED" in t for t in tail)
        except subprocess.TimeoutExpired:
            row.update(ok=False, rc=None, wall_s=round(time.time() - t0, 1),
                       metric=None, tail=["timeout (likely compile-slow "
                                          "relay; executable may still have "
                                          "been cached server-side)"])
        print(json.dumps(row), flush=True)
        results.append(row)
        fails = 0 if row["ok"] else fails + 1
        if fails >= max_fails:
            print(f"[probe] {fails} consecutive failures; larger rungs "
                  f"will not execute — stopping", file=sys.stderr)
            break

    passed = [r for r in results if r["ok"]]
    print(json.dumps({
        "metric": "train_envelope_probe",
        "largest_ok": passed[-1]["rung"] if passed else None,
        "first_fail": next((r["rung"] for r in results if not r["ok"]),
                           None),
        "n_probed": len(results),
    }))
    return results


if __name__ == "__main__":
    main()
