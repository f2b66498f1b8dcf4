"""Multi-host scaling forecast with a validated communication model.

BASELINE.md targets >=85% multi-host scaling efficiency; real multi-chip
hardware is not reachable from this rig, so the claim is carried by a
MODEL built from measured parts (round-4 verdict item 3):

1. **Device compute**, measured on the real chip (BENCH ladder, exact
   fused kernel at T=100): ``t_dev(K) = a + b*K`` — ``a`` is the
   sequential horizon-chain floor, ``b`` the per-rollout throughput.
   Defaults from BENCH_r04 (K=1920 -> 0.512 ms, K=65536 -> 16.03 ms,
   K=262144 -> 71.0 ms); override with ``--ladder K=ms,...``.
2. **Collectives**: one MPPI iteration joins shards with a pmin scalar,
   a psum over the (T, C)=(100, 2) numerator, and three scalar psums
   (``parallel/sharded.py:110-127``) — an allreduce of ~820 B + 4
   scalars.  Cost model ``t_coll(n) = L(n) + bytes * 2(n-1)/(n*BW)``
   (ring allreduce), with the latency term L(n) = l0 * ceil(log2(n)).
3. **Validation**: the bytes term is validated against a REAL
   multi-process transport by ``tests/scaling_probe_worker.py`` — the
   2-process gloo rig runs the exact collective pattern with an
   injected extra allreduce payload swept 0 -> 4 MB (the "artificial
   DCN delay" knob); the measured slope is the transport's effective
   allreduce bandwidth and the zero-pad intercept its latency floor.
   The tool reports predicted-vs-measured per-iteration times for the
   probe's own transport parameters: if the model form fits gloo/TCP,
   the same form with ICI/DCN constants is a defensible forecast.

Fabric assumptions (stated, not measured — no multi-chip here):
ICI ~1 us/hop latency, ~45 GB/s/link; DCN ~25 us latency, ~6 GB/s.

Prints one JSON document; ``--table`` adds a human-readable summary.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import tempfile

# measured device ladder: exact fused kernel, T=100 (BENCH_r04 extra)
DEFAULT_LADDER = {1920: 0.512, 65536: 16.03, 262144: 71.0}

# per-iteration collective payload (parallel/sharded.py): (T*C) numerator
# + baseline + eta + sum_w2 + mean + crash scalars, f32
PAYLOAD_BYTES = (100 * 2 + 5) * 4

FABRICS = {
    "ici": {"l0_us": 1.0, "bw_gbps": 45.0},
    "dcn": {"l0_us": 25.0, "bw_gbps": 6.0},
}


def fit_ladder(ladder: dict) -> tuple:
    """Least-squares t_dev(K) = a + b*K (ms)."""
    import numpy as np

    ks = np.array(sorted(ladder), dtype=float)
    ts = np.array([ladder[int(k)] for k in ks])
    A = np.stack([np.ones_like(ks), ks], axis=1)
    (a, b), *_ = np.linalg.lstsq(A, ts, rcond=None)
    return max(float(a), 0.0), float(b)


def t_coll_ms(n: int, fabric: dict, bytes_=PAYLOAD_BYTES) -> float:
    lat_ms = fabric["l0_us"] * math.ceil(math.log2(max(n, 2))) / 1000.0
    bw_ms = (bytes_ * 2 * (n - 1) / n) / (fabric["bw_gbps"] * 1e9) * 1e3
    return lat_ms + bw_ms


def forecast(K: int, a: float, b: float, fabric: dict, ns) -> list:
    """Strong-scaling efficiency for global K over n workers."""
    t1 = a + b * K
    rows = []
    for n in ns:
        tn = a + b * K / n + t_coll_ms(n, fabric)
        rows.append({"n": n, "t_n_ms": round(tn, 4),
                     "solves_per_sec": round(1000.0 / tn, 1),
                     "speedup": round(t1 / tn, 2),
                     "efficiency": round(t1 / (n * tn), 4)})
    return rows


def run_probe(nproc: int = 2, iters: int = 300, timeout: float = 480.0
              ) -> dict:
    """Launch the gloo probe workers; -> merged per-payload timings."""
    import socket

    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    worker = os.path.join(repo, "tests", "scaling_probe_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    outdir = tempfile.mkdtemp(prefix="scaling_probe_")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(nproc),
         f"127.0.0.1:{port}", outdir, str(iters)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=repo) for pid in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"probe worker {pid} failed:\n{out[-2000:]}")
    with open(os.path.join(outdir, "probe_0.json")) as f:
        return json.load(f)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--Ks", default="1920,65536,262144",
                    help="global rollout counts to forecast (the "
                         "reference point, config #4, config #5)")
    ap.add_argument("--ladder", default=None,
                    help="override device ladder, e.g. 1920=0.51,65536=16")
    ap.add_argument("--ns", default="2,4,8,16,32")
    ap.add_argument("--skip-probe", action="store_true",
                    help="forecast only (no 2-process gloo validation run)")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--table", action="store_true")
    args = ap.parse_args(argv)

    ladder = DEFAULT_LADDER
    if args.ladder:
        ladder = {int(k): float(v) for k, v in
                  (kv.split("=") for kv in args.ladder.split(","))}
    a, b = fit_ladder(ladder)
    ns = [int(n) for n in args.ns.split(",")]

    doc = {
        "artifact": "scaling_forecast",
        "payload_bytes": PAYLOAD_BYTES,
        "ladder_ms": {str(k): v for k, v in sorted(ladder.items())},
        "fit": {"chain_floor_ms": round(a, 4),
                "ms_per_rollout": b},
        "assumptions": FABRICS,
        "forecast": {},
    }
    for K in (int(k) for k in args.Ks.split(",")):
        per_k = {}
        for name, fab in FABRICS.items():
            rows = forecast(K, a, b, fab, ns)
            per_k[name] = rows
            ok = [r["n"] for r in rows if r["efficiency"] >= 0.85]
            per_k[f"{name}_max_n_at_85pct"] = max(ok, default=0)
        doc["forecast"][f"K{K}"] = per_k

    if not args.skip_probe:
        probe = run_probe(iters=args.iters)
        per_iter = {int(k): v for k, v in probe["per_iter_s"].items()}
        xs = sorted(per_iter)
        import numpy as np

        A = np.stack([np.ones(len(xs)), np.array(xs, float)], axis=1)
        (lat_s, inv_bw), *_ = np.linalg.lstsq(
            A, np.array([per_iter[x] for x in xs]), rcond=None)
        bw_gbps = (2 * (2 - 1) / 2) / (inv_bw * 1e9) if inv_bw > 0 else None
        measured = {str(x): round(per_iter[x] * 1e6, 2) for x in xs}
        gloo = {"l0_us": max(lat_s, 0.0) * 1e6,
                "bw_gbps": bw_gbps if bw_gbps else 1.0}
        # shape validation: the latency + bytes/BW model, fitted to the
        # sweep, evaluated back at each payload — the residual is how
        # linear the real transport's response actually is (congestion
        # or per-message overheads would show up here).  bytes_=x only:
        # the fitted intercept already absorbs the base collective
        # pattern's ~824 B (the probe sweeps the injected pad, so adding
        # PAYLOAD_BYTES here would double-count it — round-5 review).
        predicted = {str(x): round(
            (t_coll_ms(2, gloo, bytes_=x)) * 1e3, 2) for x in xs}
        doc["validation"] = {
            "transport": "gloo/TCP-loopback, 2 processes",
            "measured_per_iter_us": measured,
            "fitted_latency_us": round(float(lat_s) * 1e6, 2),
            "fitted_allreduce_bw_gbps":
                round(bw_gbps, 3) if bw_gbps else None,
            "model_predicted_per_iter_us": predicted,
            "max_shape_rel_err": round(max(
                abs(predicted[s] - measured[s]) / max(measured[s], 1e-9)
                for s in map(str, xs)), 3) if xs else 0.0,
        }

    print(json.dumps(doc))
    if args.table:
        print(f"\nfit: t_dev(K) = {a:.4f} ms + {b*1e3:.4f} us/rollout; "
              f"payload {PAYLOAD_BYTES} B/iter", file=sys.stderr)
        for kname, per_k in doc["forecast"].items():
            for name in FABRICS:
                print(f"-- {kname} {name} --", file=sys.stderr)
                for r in per_k[name]:
                    print(f"  n={r['n']:>3}  t={r['t_n_ms']:7.3f} ms  "
                          f"{r['solves_per_sec']:8.1f}/s  "
                          f"eff={r['efficiency']:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
