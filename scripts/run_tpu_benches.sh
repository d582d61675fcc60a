#!/bin/bash
# Unattended TPU bench battery (round 4). Appends everything to $LOG.
# Each stage is bounded so a hung tunnel can't wedge the battery.
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
  echo "--- $* ($(date -u +%FT%TZ))" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- exit $? " >> "$LOG"
}

# 1. headline bench (8x8 + 32x32 companion, frozen denominator)
run python bench.py
# 2. split-precision + block arms at the four corners of (size, beta)
run python scripts/bench_deep.py --L 8 --beta 4 --chains 128 --steps 20 --arms base,high
run python scripts/bench_deep.py --L 8 --beta 16 --chains 32 --steps 10 --arms base,high,high@0.06
run python scripts/bench_deep.py --L 32 --beta 4 --chains 32 --steps 10 --arms base,high
run python scripts/bench_deep.py --L 32 --beta 16 --chains 8 --steps 5 --equil 20 --dt 0.025 --arms base,high
# 3. checkerboard strategy table incl. the Pallas fold at N=4096
run python scripts/bench_ckb.py
# 4. estimator-solve A/B (block CG wall time; honest-negative regression)
run python scripts/bench_block.py --beta 16 --L 8 --chains 32 --nv 10 --steps 10
# 5. SSH rows at scale
run python scripts/bench_ssh.py
run python scripts/bench_beta.py --model ssh --L 16 --betas 4,8,16 --lowfreq 0 --steps 6
# 6. Langevin refresh
run python scripts/bench_langevin.py --L 8 --chains 128
echo "=== battery benches done $(date -u +%FT%TZ) ===" >> "$LOG"

# 7. production-example wall-time regression (BASELINE "full production run"
#    row: ~95 s at --chains 8 on one chip, round 2)
run python - << 'PYEOF'
import tempfile, time
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
echo "=== battery stage 7 done $(date -u +%FT%TZ) ===" >> "$LOG"

# 8. tune_dt on-chip proof at deep beta: starting from dt=0.05 the tuner
#    must land near the scanned optimum dt~0.06 (BASELINE dt-scan table)
run python - << 'PYEOF'
import tempfile, time
from elphdynamics_tpu.io.config import load_toml
from elphdynamics_tpu.simulation import simulate
cfg = load_toml("examples/holstein_hmc_deep_beta.toml")
cfg["hmc"].update({"burnin_updates": 150, "simulation_updates": 40})
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
echo "=== battery done $(date -u +%FT%TZ) ===" >> "$LOG"
