"""Pod-shaped mesh dry runs beyond the driver's 8-device check.

The driver validates ``__graft_entry__.dryrun_multichip(8)`` (dp x tp);
here the CPU suite additionally exercises a 16-device dp x tp x ZeRO-1
composed configuration (SURVEY.md §2.4 pod-scale DP / BASELINE config 5)
so pod-shaped sharding compiles + executes before hardware ever appears.
Each dry run spawns its own subprocess (jax_num_cpu_devices must be set
before backend init; conftest pins this process at 8 devices).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_dryrun_16dev_tp_zero1():
    graft.dryrun_multichip(16, zero1=True)


@pytest.mark.skipif(os.environ.get("E4T_TEST_POD32") != "1",
                    reason="~8 min on a 1-vCPU host; run explicitly with "
                           "E4T_TEST_POD32=1 (verified green 2026-08-20)")
def test_dryrun_32dev_tp_zero1():
    graft.dryrun_multichip(32, zero1=True)
