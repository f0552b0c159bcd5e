"""Bench <-> background-study quiesce protocol (bench.py
_pause_registered_background_work / tools/parity_study coop handlers).

SIGSTOP on a tunneled-TPU client wedges the relay (round-4 PERF_NOTES), so
studies register with the 'coop' flag and park their main thread on
SIGUSR1 (ack file) until SIGUSR2. This test drives the real bench pause
function against a real subprocess running the real study handlers.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os, sys, time
sys.path.insert(0, {repo!r})
os.environ["BDVC_BENCH_PAUSE_PIDS"] = {pids!r}
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from tools.parity_study import _register_for_bench_pause
_register_for_bench_pause()
out = open({out!r}, "w", buffering=1)
while True:
    out.write(f"{{time.time()}}\\n")
    time.sleep(0.05)
"""


@pytest.fixture()
def study_child(tmp_path):
    pids_file = str(tmp_path / "pause.pids")
    out_file = str(tmp_path / "ticks.txt")
    code = CHILD.format(repo=REPO, pids=pids_file, out=out_file)
    proc = subprocess.Popen([sys.executable, "-c", code])
    deadline = time.monotonic() + 15
    while time.monotonic() < deadline and not (
        os.path.exists(pids_file) and os.path.exists(out_file)
    ):
        time.sleep(0.05)
    assert os.path.exists(pids_file), "child never registered"
    yield proc, pids_file, out_file
    proc.kill()
    proc.wait()


def _ticks(out_file):
    with open(out_file) as f:
        return [float(x) for x in f.read().split()]


def test_coop_pause_parks_and_resumes(study_child, monkeypatch):
    proc, pids_file, out_file = study_child
    monkeypatch.setenv("BDVC_BENCH_PAUSE_PIDS", pids_file)
    import importlib

    import bench

    importlib.reload(bench)  # pick up the env override for PAUSE_PIDS_FILE

    with open(pids_file) as f:
        line = f.read().split()
    assert line[0] == str(proc.pid) and "coop" in line, line

    resume = bench._pause_registered_background_work()
    ack = f"/tmp/bdvc_pause_ack_{proc.pid}"
    assert os.path.exists(ack), "study did not ack the quiesce request"
    # main thread is parked: tick stream stops
    n0 = len(_ticks(out_file))
    time.sleep(0.6)
    assert len(_ticks(out_file)) == n0, "study kept running while paused"
    # process is NOT SIGSTOPped (state must not be T) — its IO threads live
    with open(f"/proc/{proc.pid}/stat") as f:
        state = f.read().split(")")[-1].split()[0]
    assert state != "T", "coop study must not be SIGSTOPped"

    resume()
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline and len(_ticks(out_file)) == n0:
        time.sleep(0.05)
    assert len(_ticks(out_file)) > n0, "study did not resume after SIGUSR2"
    assert not os.path.exists(ack), "ack file must be removed on resume"


def test_stale_pid_entries_ignored(tmp_path, monkeypatch):
    pids_file = str(tmp_path / "pause.pids")
    with open(pids_file, "w") as f:
        f.write("1 parity_study coop\n")  # PID 1 cmdline won't match the tag
        f.write("999999 parity_study coop\n")  # dead pid
    monkeypatch.setenv("BDVC_BENCH_PAUSE_PIDS", pids_file)
    import importlib

    import bench

    importlib.reload(bench)
    resume = bench._pause_registered_background_work()
    resume()  # no-op, and crucially no signal was sent to pid 1
