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
    """The chip is exclusive: bench must drop a PAUSE file next to EVERY
    train.pid — live or dead (the pidfile goes stale between a driver's
    restart attempts, and the driver spins on PAUSE right before
    relaunching; skipping dead pids left that window unprotected, ADVICE
    r4) — wait for the live pids, and remove the files afterwards."""
    import os
    monkeypatch.chdir(tmp_path)
    live = tmp_path / "runs" / "wald"
    dead = tmp_path / "runs" / "stale"
    for d in (live, dead):
        d.mkdir(parents=True)
    (live / "train.pid").write_text(str(os.getpid()))  # alive (us)
    (dead / "train.pid").write_text("999999999")       # not a real pid

    paused = bench.pause_local_training(wait_s=0.0)
    assert sorted(os.path.abspath(p) for p in paused) == sorted(
        [str(live / "PAUSE"), str(dead / "PAUSE")])
    assert (live / "PAUSE").exists()
    assert (dead / "PAUSE").exists()   # guards the relaunch window

    bench.resume_local_training(paused)
    assert not (live / "PAUSE").exists()
    assert not (dead / "PAUSE").exists()


def test_bench_emits_mfu_context_fields(capsys):
    """The parsed JSON line must carry tflops_effective / tflops_ceiling /
    frac_of_ceiling (VERDICT r4 item 7: a flat MP/s headline must be
    legible as ceiling saturation, not stagnation)."""
    import argparse

    args = argparse.Namespace(
        batch=1, size=64, steps=2, iters=1, channels=4, dtype="f32",
        pallas=False, fp8_attn=False, fp8_conv=False, dpm_grid=False,
        cond_evict_res=None, sampler="dpm", skip_probe=True,
        probe_attempts=1, probe_base_delay=0.0, probe_timeout=1.0)
    result = bench._run(args, "test_metric")
    assert result["value"] > 0
    assert result["tflops_effective"] > 0
    assert result["tflops_ceiling"] == bench.TUNNEL_CEILING_TFLOPS
    assert 0 < result["frac_of_ceiling"] < 1.5
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["tflops_effective"] == result["tflops_effective"]
