"""scripts/run_supervised.sh semantics: restart-on-crash, watchdog-on-wedge.

The tunneled TPU fails two ways (docs/ROUND4.md §2): process death and a
silent device wedge where the host blocks forever while the log goes
quiet. The supervisor must (a) restart a crashing command until it exits
0, (b) SIGKILL a child whose heartbeat file goes stale (a TERM-trapping
child must still die — train.py's preemption handler traps SIGTERM), and
(c) stop retrying after exit 0.
"""

import os
import subprocess
import time
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parents[1] / "scripts" / "run_supervised.sh"


def _run(tmp_path, stale, inner, timeout=120):
    log = tmp_path / "run.log"
    hb = tmp_path / "heartbeat"
    child = tmp_path / "child.sh"
    child.write_text("#!/bin/bash\n" + inner)
    child.chmod(0o755)
    proc = subprocess.run(
        ["bash", str(SCRIPT), str(log), str(hb), str(stale), str(child)],
        timeout=timeout,
        capture_output=True,
        text=True,
        cwd=tmp_path,
    )
    return proc, log.read_text() if log.exists() else ""


@pytest.mark.slow
def test_restarts_crash_until_success(tmp_path):
    # child crashes twice (>=60s-dur rule not hit: fast-fail counter allows
    # MAX_RETRIES), then succeeds via a state file
    inner = """
state="$PWD/count"
n=$(cat "$state" 2>/dev/null || echo 0)
echo $((n+1)) > "$state"
[ "$n" -ge 2 ] && { echo done; exit 0; }
echo "attempt $n crashing"
exit 1
"""
    proc, log = _run(tmp_path, stale=600, inner=inner)
    assert proc.returncode == 0
    assert log.count("[supervisor] exit rc=1") == 2
    assert "exit rc=0" in log
    assert (tmp_path / "count").read_text().strip() == "3"


@pytest.mark.slow
def test_watchdog_kills_stale_term_trapping_child(tmp_path):
    # First attempt: trap TERM (like train.py's preemption handler), write
    # one heartbeat, then wedge forever. The watchdog must SIGKILL it.
    # Second attempt: exit 0 immediately.
    inner = """
state="$PWD/count"
n=$(cat "$state" 2>/dev/null || echo 0)
echo $((n+1)) > "$state"
if [ "$n" -ge 1 ]; then echo recovered; exit 0; fi
trap '' TERM
echo heartbeat > "$PWD/heartbeat"
echo "wedging now"
while true; do sleep 1; done
"""
    # stale=2s, startup grace 2*2=4s -> kill within ~35s (watchdog polls 30s)
    proc, log = _run(tmp_path, stale=2, inner=inner, timeout=180)
    assert proc.returncode == 0
    assert "heartbeat stale" in log
    assert "recovered" in log
    assert "exit rc=0" in log


@pytest.mark.slow
def test_exit_zero_stops_immediately(tmp_path):
    t0 = time.time()
    proc, log = _run(tmp_path, stale=600, inner="echo ok; exit 0\n")
    assert proc.returncode == 0
    assert log.count("[supervisor]") == 1
    assert time.time() - t0 < 60
