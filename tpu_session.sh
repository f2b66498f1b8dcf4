#!/usr/bin/env bash
# Staged TPU validation — run the moment the accelerator tunnel is up.
#
# The axon tunnel to the real chip can drop for hours (observed twice in
# round 2); everything hardware-bound is staged here so a single command
# captures it all when a chip is reachable:
#   1. probe     — device init in a subprocess (a hung tunnel cannot hang us)
#   2. tests_tpu — kernel parity suite on the real chip
#   3. bench     — headline + scale configs (writes the driver JSON line)
#   4. breakdown — per-stage device timing for the sharded-1dev gap
#
# Usage: bash tpu_session.sh [outdir]      (default /tmp/tpu_session_<ts>)
# Each stage is wrapped in `timeout`; a mid-session tunnel drop fails the
# stage instead of wedging the shell.  Logs land in $OUT for EVAL.md.
set -u
cd "$(dirname "$0")"
OUT=${1:-/tmp/tpu_session_$(date -u +%Y%m%dT%H%M%S)}
mkdir -p "$OUT"
echo "logs -> $OUT"

echo "== 1/8 probe =="
if ! timeout 180 python -c "import jax; print(jax.devices())" \
      > "$OUT/probe.log" 2>&1; then
  echo "tunnel DOWN (probe timed out / failed) — see $OUT/probe.log"
  exit 1
fi
cat "$OUT/probe.log"

echo "== 2/8 tests_tpu =="
timeout 5400 python -m pytest tests_tpu/ -q 2>&1 | tee "$OUT/tests_tpu.log" \
  | tail -15

echo "== 3/8 bench =="
timeout 5400 python bench.py 2>"$OUT/bench.err" | tee "$OUT/bench.json" | tail -3

echo "== 4/8 solve breakdown (sharded-gap forensics) =="
for flags in "" "--kernel-rng" "--bf"; do
  timeout 1200 python -m autorally_tpu.tools.solve_breakdown $flags \
    2>&1 | tee -a "$OUT/breakdown.log"
done
timeout 1800 python -m autorally_tpu.tools.scaling_bench \
  2>&1 | tee "$OUT/scaling.log" | tail -5 || true

ROUND=${ROUND:-05}

echo "== 5/8 tube realtime gates -> GATE_r$ROUND.json =="
# three deployment gates through the adaptive-depth async loop against
# the real chip: the K=32768 gaussian tube (the round-4 50 Hz proof),
# the same K with COLORED noise (BASELINE config #4's sampling at the
# largest tube-feasible K — a tube is TWO 8 ms solves per tick, so
# K=65536's 2x16 ms device work cannot sustain the 20 ms period on one
# chip), and the K=65536 colored tube anyway, recording the honest
# boundary (expected: deadline misses / elevated solution age).
timeout 7200 python -c "
import json
from autorally_tpu.io.compile_cache import enable_persistent_cache
enable_persistent_cache()
from autorally_tpu.runtime.realtime_gate import run_realtime_gate_async
gates = []
res = run_realtime_gate_async(pose_port=48040, control_port=48041,
                              seconds=3.0, num_rollouts=32768,
                              num_timesteps=100, depth=4,
                              adaptive_depth=True, warmup_iters=20)
gates.append({'name': 'tube_k32768_gaussian', 'result': res})
res = run_realtime_gate_async(pose_port=48050, control_port=48051,
                              seconds=3.0, num_rollouts=32768,
                              num_timesteps=100, depth=4,
                              adaptive_depth=True, warmup_iters=20,
                              noise_sampler='colored', noise_param=1.0)
gates.append({'name': 'tube_k32768_colored', 'result': res})
res = run_realtime_gate_async(pose_port=48060, control_port=48061,
                              seconds=3.0, num_rollouts=65536,
                              num_timesteps=100, depth=4,
                              adaptive_depth=True, warmup_iters=20,
                              noise_sampler='colored', noise_param=1.0)
gates.append({'name': 'tube_k65536_colored_boundary', 'result': res})
# ASYMMETRIC tube (round 5): K_a=65,536 actual + K_p=16,384 predicted
# is ~16+4 ms of device work per tick vs the symmetric 2x16 ms above —
# the design that makes a 65K-class tube a 50 Hz operating point on
# ONE chip (runtime/async_loop.py::AsyncTubeController).
res = run_realtime_gate_async(pose_port=48070, control_port=48071,
                              seconds=3.0, num_rollouts=65536,
                              num_rollouts_predicted=16384,
                              num_timesteps=100, depth=4,
                              adaptive_depth=True, warmup_iters=20,
                              noise_sampler='colored', noise_param=1.0)
gates.append({'name': 'tube_k65536_asym16384_colored', 'result': res})
# sustained soak of the same asymmetric config: 2x15 s windows (the
# short gates can ride pipeline slack; a 750-tick window cannot)
res = run_realtime_gate_async(pose_port=48080, control_port=48081,
                              seconds=15.0, attempts=2,
                              num_rollouts=65536,
                              num_rollouts_predicted=16384,
                              num_timesteps=100, depth=4,
                              adaptive_depth=True, warmup_iters=20,
                              noise_sampler='colored', noise_param=1.0)
gates.append({'name': 'tube_k65536_asym16384_colored_soak',
              'result': res})
print(json.dumps({'artifact': 'gate', 'round': int('$ROUND'),
                  'gates': gates}))
" 2>"$OUT/gate.err" | tee "$OUT/gate.json" | tail -1 || true
tail -1 "$OUT/gate.json" | grep -q '"artifact": "gate"' \
  && tail -1 "$OUT/gate.json" > "GATE_r$ROUND.json"

echo "== 6/8 lap suite -> LAPS_r$ROUND.json =="
timeout 5400 python -m autorally_tpu.tools.lap_suite \
  --round "${ROUND#0}" --out "$OUT/laps.json" \
  > /dev/null 2>"$OUT/laps.err" || true
[ -s "$OUT/laps.json" ] && cp "$OUT/laps.json" "LAPS_r$ROUND.json"

echo "== 7/8 ensemble A/B -> ENSEMBLE_r$ROUND.json =="
timeout 3600 python -m autorally_tpu.tools.ensemble_ab \
  --ticks 3000 --rollouts 4096 --members 8 --seeds 3 --track ccrf \
  --desired-speed 11 --true-gain 0.5 --gain-lo 0.4 --gain-hi 1.2 \
  2>"$OUT/ensemble.err" | tee "$OUT/ensemble.json" | tail -1 || true
tail -1 "$OUT/ensemble.json" | grep -q '"config"' \
  && tail -1 "$OUT/ensemble.json" > "ENSEMBLE_r$ROUND.json"

echo "== 8/8 ESS-tuner demo (live temperature, host + on-device) =="
timeout 1800 python -m autorally_tpu.tools.ess_demo --mode host \
  --ticks 150 2>"$OUT/ess_host.err" | tee "$OUT/ess_host.json" | tail -1 || true
timeout 1800 python -m autorally_tpu.tools.ess_demo --mode episode \
  --ticks 1000 2>"$OUT/ess_episode.err" \
  | tee "$OUT/ess_episode.json" | tail -1 || true

echo "== done — logs in $OUT; versioned artifacts GATE_r$ROUND.json" \
     "LAPS_r$ROUND.json ENSEMBLE_r$ROUND.json (validate via" \
     "tests/test_artifacts.py) =="
