"""Versioned hardware-evidence artifacts: schema + producer plumbing.

Round-4 verdict item 5: the tube-gate, lap, and ensemble evidence from
hardware sessions must land as committed ``GATE_r*.json`` /
``LAPS_r*.json`` / ``ENSEMBLE_r*.json`` artifacts (the ``BENCH_r*.json``
pattern) so round-over-round regressions diff mechanically.  These tests
(a) validate every committed artifact against its schema and (b) run the
producers end-to-end at smoke scale so a schema drift fails CI before a
hardware session wastes a tunnel window on malformed output.
"""

import glob
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _is_num(x):
    return isinstance(x, (int, float)) and not isinstance(x, bool)


def validate_laps(d: dict) -> None:
    assert d["artifact"] == "laps"
    assert isinstance(d["round"], int)
    assert isinstance(d["rows"], list) and d["rows"]
    for row in d["rows"]:
        assert isinstance(row["name"], str)
        assert row["track"] in ("ccrf", "marietta", "oval")
        assert isinstance(row["K"], int) and isinstance(row["T"], int)
        assert _is_num(row["desired_speed"])
        assert isinstance(row["runs"], list) and row["runs"]
        for r in row["runs"]:
            assert isinstance(r["laps"], int)
            assert isinstance(r["lap_times_s"], list)
            assert r["best_lap_s"] is None or _is_num(r["best_lap_s"])
            for k in ("mean_speed", "max_speed", "max_slip",
                      "offtrack_frac", "rollout_crash_frac", "mean_ess"):
                assert _is_num(r[k]), k
            assert 0.0 <= r["offtrack_frac"] <= 1.0


def validate_gate(d: dict) -> None:
    assert d["artifact"] == "gate"
    assert isinstance(d["round"], int)
    assert isinstance(d["gates"], list) and d["gates"]
    for g in d["gates"]:
        assert isinstance(g["name"], str)
        assert isinstance(g["result"], dict)
        res = g["result"]
        for k in ("p50_ms", "p99_ms", "missed", "missed_raw",
                  "valid_ticks", "budget_ms", "p99_all_ms"):
            assert _is_num(res[k]), k


def validate_ensemble(d: dict) -> None:
    assert isinstance(d["config"], dict)
    for arm in ("single", "ensemble"):
        assert isinstance(d[arm], list) and d[arm]
        for r in d[arm]:
            for k in ("laps", "offtrack_frac", "mean_speed", "mean_ess"):
                assert _is_num(r[k]), k
        assert isinstance(d[f"{arm}_summary"], dict)


def validate_scaling(d: dict) -> None:
    assert d["artifact"] == "scaling_forecast"
    assert _is_num(d["payload_bytes"])
    assert _is_num(d["fit"]["chain_floor_ms"])
    assert _is_num(d["fit"]["ms_per_rollout"])
    assert isinstance(d["forecast"], dict) and d["forecast"]
    for per_k in d["forecast"].values():
        for fab in ("ici", "dcn"):
            assert isinstance(per_k[fab], list) and per_k[fab]
            for r in per_k[fab]:
                assert _is_num(r["efficiency"]) and _is_num(r["t_n_ms"])
    v = d["validation"]
    assert isinstance(v["measured_per_iter_us"], dict)
    assert _is_num(v["max_shape_rel_err"])


VALIDATORS = {"LAPS": validate_laps, "GATE": validate_gate,
              "ENSEMBLE": validate_ensemble, "SCALING": validate_scaling}


@pytest.mark.parametrize("kind", sorted(VALIDATORS))
def test_committed_artifacts_validate(kind):
    paths = sorted(glob.glob(os.path.join(ROOT, f"{kind}_r*.json")))
    if not paths:
        pytest.skip(f"no committed {kind}_r*.json yet")
    for p in paths:
        with open(p) as f:
            VALIDATORS[kind](json.load(f))


def test_lap_suite_produces_valid_artifact(tmp_path):
    """The producer itself, end-to-end at smoke scale on CPU: one config,
    one seed, tiny K/T — the emitted JSON must pass the same validator
    the committed artifacts do."""
    out = tmp_path / "laps.json"
    boot = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "from autorally_tpu.tools.lap_suite import main; "
            f"main(['--smoke','--ticks','60','--seeds','1',"
            f"'--only','ccrf_nn_gaussian,marietta_bf_gaussian',"
            f"'--out',{str(out)!r}])")
    r = subprocess.run([sys.executable, "-c", boot], capture_output=True,
                       text=True, timeout=570, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    d = json.loads(out.read_text())
    assert d["smoke"] is True
    validate_laps(d)
    names = [row["name"] for row in d["rows"]]
    assert names == ["ccrf_nn_gaussian", "marietta_bf_gaussian"]
    # the bf row really ran the basis-function family
    assert d["rows"][1]["model"] == "bf"


def test_ensemble_ab_produces_valid_artifact():
    """tools/ensemble_ab.py end-to-end at smoke scale on CPU."""
    boot = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "from autorally_tpu.tools.ensemble_ab import main; "
            "main(['--ticks','60','--rollouts','64','--timesteps','16',"
            "'--members','4','--seeds','1','--track','oval'])")
    r = subprocess.run([sys.executable, "-c", boot], capture_output=True,
                       text=True, timeout=570, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    validate_ensemble(json.loads(r.stdout.strip().splitlines()[-1]))
