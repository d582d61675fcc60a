#!/bin/bash
# Unattended TPU bench battery for the block-CG work (fire once the axon
# tunnel is back). Appends everything to $LOG. Each stage is bounded so a
# hung tunnel can't wedge the battery.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_bench_battery.log}
echo "=== battery start $(date -u +%FT%TZ) ===" >> "$LOG"

probe() {
  timeout 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1
}

if ! probe; then
  echo "TPU probe failed - aborting battery" >> "$LOG"
  exit 1
fi

run() {
  echo "--- $* ($(date -u +%TZ))" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- exit $? " >> "$LOG"
}

# 1. block-CG wall-time A/B at the north-star beta (estimator + convolution)
run python scripts/bench_block.py --beta 4 --L 8 --chains 32 --nv 10 --steps 10
# 2. same at deep beta (the regime block CG targets)
run python scripts/bench_block.py --beta 16 --L 8 --chains 16 --nv 10 --steps 10 --equil 20
# 3. deep-beta trajectory A/B: beta-scaling rows with and without block
run python scripts/bench_beta.py --model holstein --L 8 --betas 8,16 --lowfreq 0 --steps 4
run python scripts/bench_beta.py --model holstein --L 8 --betas 8,16 --lowfreq 0 --steps 4 --block
# 4. dt-targeting at the north-star size: fewer solves per trajectory is a
#    direct latency win at 8x8 (CPU study: acc stays 1.0 well past dt=0.05)
run python scripts/bench_beta.py --model holstein --L 8 --betas 4 --lowfreq 0 --steps 6 --dt 0.1
run python scripts/bench_beta.py --model holstein --L 8 --betas 4 --lowfreq 0 --steps 6 --dt 0.143
# 4b. the full deep-beta recipe: block CG + dt targeting together
run python scripts/bench_beta.py --model holstein --L 8 --betas 16 --lowfreq 0 --steps 4 --dt 0.1 --block
# 5. headline bench must not regress
run python bench.py
echo "=== battery done $(date -u +%FT%TZ) ===" >> "$LOG"

# 6. production-example wall-time regression (BASELINE "full production run"
#    row: ~95 s at --chains 8 on one chip, round 2): the round-3 driver work
#    (sharded specials, multihost fetch paths, auto chains) must not tax it
run python - << 'PYEOF'
import copy, tempfile, time
from elphdynamics_tpu.io.config import load_toml
from elphdynamics_tpu.simulation import simulate
cfg = load_toml("examples/holstein_hmc_square.toml")
with tempfile.TemporaryDirectory() as tmp:
    cfg["simulation"]["filepath"] = tmp
    t0 = time.time()
    stats = simulate(cfg, n_chains=8)
    wall = time.time() - t0
    print({"production_example_wall_s": round(wall, 1),
           "sim_s": round(stats["simulation_time"], 1),
           "meas_s": round(stats["measurement_time"], 1),
           "write_s": round(stats["write_time"], 1),
           "acceptance": round(stats["acceptance_rate"], 4)})
PYEOF
echo "=== battery stage 6 done $(date -u +%FT%TZ) ===" >> "$LOG"

# 7. tune_dt on-chip proof at deep beta: the tuner must land near the
#    hand-measured dt=0.1/acc~0.8 recipe that the deep-beta example ships
#    (BASELINE integrator study) without being told
run python - << 'PYEOF'
import tempfile, time
from elphdynamics_tpu.io.config import load_toml
from elphdynamics_tpu.simulation import simulate
cfg = load_toml("examples/holstein_hmc_deep_beta.toml")
cfg["hmc"].update({"burnin_updates": 150, "simulation_updates": 40,
                   # start from the naive default dt: the tuner must
                   # rediscover the example's hand-measured dt~0.1
                   "dt": 0.05,
                   "tune_dt": True, "target_acceptance": 0.8})
cfg["simulation"]["num_bins"] = 2
with tempfile.TemporaryDirectory() as tmp:
    cfg["simulation"]["filepath"] = tmp
    t0 = time.time()
    stats = simulate(cfg, n_chains=16)
    print({"tuned_dt": round(stats.get("tuned_dt", -1.0), 4),
           "acceptance": round(stats["acceptance_rate"], 3),
           "iters": round(stats["iters"], 1),
           "wall_s": round(time.time() - t0, 1)})
PYEOF
echo "=== battery stage 7 done $(date -u +%FT%TZ) ===" >> "$LOG"
