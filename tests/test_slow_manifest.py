"""Slow-tier chunk-manifest audit (VERDICT r4 item 6).

The slow tier only ever runs through ``scripts/run_slow_tests.sh`` chunks, so
a slow test in a file no chunk names silently stops being run (it happened:
``test_complex_measurements.py`` carried 4 slow tests in no chunk for a full
round). This fast test collects the slow tier and asserts every file holding
slow tests is assigned to exactly one chunk, failing the fast tier the moment
a new slow-test file lands unassigned.
"""

import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _chunk_files():
    text = (ROOT / "scripts" / "run_slow_tests.sh").read_text()
    m = re.search(r"declare -a CHUNKS=\((.*?)\n\)", text, re.S)
    assert m, "CHUNKS array not found in run_slow_tests.sh"
    files = []
    for quoted in re.findall(r'"([^"]*)"', m.group(1)):
        files.extend(quoted.split())
    return files


def test_every_slow_test_file_in_exactly_one_chunk():
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-m", "slow", "-p", "no:cacheprovider"],
        cwd=ROOT, capture_output=True, text=True, timeout=300)
    slow_files = sorted({line.split("::")[0] for line in out.stdout.splitlines()
                         if "::" in line})
    assert slow_files, f"slow-test collection failed:\n{out.stdout}\n{out.stderr}"

    chunk_files = _chunk_files()
    problems = []
    for f in slow_files:
        n = chunk_files.count(f)
        if n != 1:
            problems.append(f"{f}: in {n} chunks (want exactly 1)")
    for f in chunk_files:
        if not (ROOT / f).exists():
            problems.append(f"{f}: chunk entry does not exist")
    assert not problems, "slow-tier manifest violations:\n" + "\n".join(problems)
