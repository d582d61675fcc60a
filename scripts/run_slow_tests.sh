#!/usr/bin/env bash
# Run the slow test tier in bounded chunks (VERDICT r3 item 7: 70+ slow
# tests cannot run as one pytest invocation on a 1-core host without
# exceeding any sane timeout — chunk by file group instead).
#
#   scripts/run_slow_tests.sh          # run all chunks sequentially; on full
#                                      # success record the run in SLOWTIER.json
#   scripts/run_slow_tests.sh 2        # run chunk 2 only
#   scripts/run_slow_tests.sh --check  # manifest audit only: every test file
#                                      # containing @pytest.mark.slow tests must
#                                      # appear in exactly one chunk (fails on
#                                      # unassigned or duplicated files). Also
#                                      # enforced by the fast tier
#                                      # (tests/test_slow_manifest.py).
#
# Chunk wall times measured on a 1-core CPU host with the 8-device
# virtual mesh (compile-dominated; a multi-core host is much faster).
set -u
cd "$(dirname "$0")/.."

declare -a CHUNKS=(
  # 1: solvers / kpm / samplers statistics (~10 min)
  "tests/test_solvers.py tests/test_kpm.py tests/test_samplers.py tests/test_hmc_solver_kinds.py tests/test_deflation.py tests/test_nearnull.py"
  # 2: measurement + physics statistics (~12 min)
  "tests/test_measurements.py tests/test_intersite_corr.py tests/test_physics_integration.py tests/test_free_fermion_anchor.py"
  # 3: lattice sharding unit + parity (~15 min)
  "tests/test_lattice_shard.py"
  # 4: driver integration: simulation / tempering / dt tuner (~15 min)
  "tests/test_simulation_driver.py tests/test_tempering.py tests/test_dt_tuner.py tests/test_example_configs.py"
  # 5: multichip + multihost (~8 min)
  "tests/test_multichip.py tests/test_multihost.py"
  # 6: everything else marked slow (checkerboard/holstein/ssh/... tails)
  "tests/test_checkerboard.py tests/test_holstein.py tests/test_ssh.py tests/test_lattice.py tests/test_accum.py tests/test_native.py tests/test_solver_dispatch.py tests/test_complex_hopping.py"
  # 7: complex-hopping measurement surface (~10 min)
  "tests/test_complex_measurements.py"
)

check_manifest() {
  # Every test file that contains collected slow tests must be assigned to
  # exactly one chunk. New slow tests in new files fail this until assigned.
  local slow_files chunk_files f count fail=0
  slow_files=$(python -m pytest tests/ --collect-only -q -m slow 2>/dev/null \
    | sed -n 's/::.*//p' | sort -u)
  chunk_files=$(printf '%s\n' "${CHUNKS[@]}" | tr ' ' '\n' | sed '/^$/d')
  for f in $slow_files; do
    count=$(printf '%s\n' "$chunk_files" | grep -cx "$f" || true)
    if [[ "$count" -eq 0 ]]; then
      echo "MANIFEST FAIL: $f has slow tests but is in no chunk" >&2; fail=1
    elif [[ "$count" -gt 1 ]]; then
      echo "MANIFEST FAIL: $f appears in $count chunks" >&2; fail=1
    fi
  done
  for f in $chunk_files; do
    if [[ ! -e "$f" ]]; then
      echo "MANIFEST FAIL: chunk entry $f does not exist" >&2; fail=1
    fi
  done
  if [[ $fail -eq 0 ]]; then
    echo "manifest ok: $(printf '%s\n' "$slow_files" | sed '/^$/d' | wc -l) slow-test files, all assigned exactly once"
  fi
  return $fail
}

run_chunk() {
  local i=$1
  echo "=== slow chunk $i: ${CHUNKS[$((i-1))]}"
  python -m pytest ${CHUNKS[$((i-1))]} -q -m slow || return 1
}

if [[ $# -ge 1 && "$1" == "--check" ]]; then
  check_manifest
  exit $?
fi

if [[ $# -ge 1 ]]; then
  run_chunk "$1"
else
  check_manifest || exit 1
  fail=0
  t0=$(date +%s)
  for i in $(seq 1 ${#CHUNKS[@]}); do
    run_chunk "$i" || fail=1
  done
  t1=$(date +%s)
  if [[ $fail -eq 0 ]]; then
    # Record the last full-tier green run (VERDICT r4 item 6): one-command
    # answer to "when did all slow tests last pass?"
    ntests=$(python -m pytest tests/ --collect-only -q -m slow 2>/dev/null \
      | sed -n 's/::.*//p' | wc -l)
    printf '{"date": "%s", "host": "%s", "duration_s": %d, "slow_tests": %d}\n' \
      "$(date -u +%Y-%m-%dT%H:%M:%SZ)" "$(hostname)" "$((t1 - t0))" "$ntests" \
      > SLOWTIER.json
    echo "full slow tier green in $((t1 - t0)) s — recorded in SLOWTIER.json"
  fi
  exit $fail
fi
