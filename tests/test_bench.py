"""bench.py hardening (VERDICT r3 item 3): backend-init retry with backoff
and a structured JSON error line on persistent failure — the headline
evidence must never be zeroed into an unparseable traceback by a transient
tunnel outage."""
import json
import sys

import pytest

sys.path.insert(0, ".")
import bench


def test_wait_for_backend_retries_then_raises():
    calls = []

    def failing_probe(timeout_s):
        calls.append(timeout_s)
        return False, "UNAVAILABLE: socket closed"

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench.wait_for_backend(attempts=3, base_delay=0.0,
                               probe=failing_probe)
    assert len(calls) == 3


def test_wait_for_backend_recovers_mid_retry():
    state = {"n": 0}

    def flaky_probe(timeout_s):
        state["n"] += 1
        if state["n"] < 3:
            return False, "UNAVAILABLE"
        return True, "PROBE_OK axon"

    bench.wait_for_backend(attempts=5, base_delay=0.0, probe=flaky_probe)
    assert state["n"] == 3


def test_forced_failure_emits_structured_json(monkeypatch, capsys):
    """Full CLI path: probe always fails -> rc=1 but stdout is ONE
    parseable JSON line with metric + error (never a bare traceback)."""
    monkeypatch.setattr(bench, "_probe_backend_once",
                        lambda t: (False, "UNAVAILABLE: tunnel down"))
    # never touch a real live run's PAUSE file from the test suite
    monkeypatch.setattr(bench, "pause_local_training", lambda **kw: [])
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--probe-attempts", "2",
                         "--probe-base-delay", "0"])
    with pytest.raises(SystemExit) as ex:
        bench.main()
    assert ex.value.code == 1
    line = capsys.readouterr().out.strip()
    parsed = json.loads(line)
    assert parsed["metric"] == "wv3_dpmsolver20_sampling_throughput"
    assert parsed["value"] is None
    assert "UNAVAILABLE" in parsed["error"]


def test_pause_local_training_roundtrip(tmp_path, monkeypatch):
    """The chip is exclusive: bench must drop a PAUSE file next to every
    LIVE train.pid (the run_400k/run_cave_ext drivers honor it), wait for
    the pid, and remove the file afterwards. Dead/garbage pids are
    ignored."""
    import os
    monkeypatch.chdir(tmp_path)
    live = tmp_path / "runs" / "wald"
    dead = tmp_path / "runs" / "stale"
    for d in (live, dead):
        d.mkdir(parents=True)
    (live / "train.pid").write_text(str(os.getpid()))  # alive (us)
    (dead / "train.pid").write_text("999999999")       # not a real pid

    paused = bench.pause_local_training(wait_s=0.0)
    assert [os.path.abspath(p) for p in paused] == [str(live / "PAUSE")]
    assert (live / "PAUSE").exists()
    assert not (dead / "PAUSE").exists()

    bench.resume_local_training(paused)
    assert not (live / "PAUSE").exists()
