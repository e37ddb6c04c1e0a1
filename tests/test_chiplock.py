"""The single-chip contention guard (pcrlv2_tpu/utils/chiplock.py).

Round-3 lesson: a background soak overlapping the benchmark capture window
serialized the single tunneled chip and put a fake -24% in the official
record.  These tests pin that bench.py-style consumers REFUSE a held chip
and trainer-style consumers warn-but-run.
"""

import json
import os

import pytest

from pcrlv2_tpu.utils import chiplock


def test_acquire_release_roundtrip(tmp_path):
    path = str(tmp_path / "chip.lock")
    lock = chiplock.acquire("first", path)
    assert lock is not None
    info = chiplock.holder_info(path)
    assert info["pid"] == os.getpid()
    assert info["label"] == "first"
    assert info["held_for_s"] >= 0
    lock.release()
    # released -> a fresh acquire succeeds
    with chiplock.acquire("second", path) as again:
        assert again is not None


def test_second_acquire_fails_while_held(tmp_path):
    # flock conflicts across open-file-descriptions, so two acquire() calls
    # in one process model two processes exactly
    path = str(tmp_path / "chip.lock")
    with chiplock.acquire("holder", path):
        assert chiplock.acquire("contender", path) is None


def test_guard_exclusive_refuses_held_chip(tmp_path):
    path = str(tmp_path / "chip.lock")
    with chiplock.acquire("soak-run", path):
        with pytest.raises(SystemExit) as e:
            chiplock.guard_exclusive("bench.py", path)
        msg = str(e.value)
        assert "REFUSING" in msg and "soak-run" in msg


def test_guard_exclusive_override(tmp_path, monkeypatch):
    path = str(tmp_path / "chip.lock")
    monkeypatch.setenv("PCRL_IGNORE_CHIP_LOCK", "1")
    with chiplock.acquire("soak-run", path):
        lock = chiplock.guard_exclusive("bench.py", path)  # no raise
        lock.release()


def test_guard_warn_runs_anyway(tmp_path, capsys):
    path = str(tmp_path / "chip.lock")
    with chiplock.acquire("other", path):
        assert chiplock.guard_warn("trainer", path) is None
        assert "WARNING" in capsys.readouterr().out
    lock = chiplock.guard_warn("trainer", path)
    assert lock is not None
    lock.release()


def test_bench_py_uses_the_guard(tmp_path):
    # bench.py must consult the shared lock before timing anything: run it
    # with the lock held by this process and assert the refusal exit path
    # (this drives bench.py's real import-and-guard prologue, not a copy)
    import subprocess
    import sys

    path = str(tmp_path / "chip.lock")
    env = dict(os.environ, PCRL_CHIP_LOCK=path, JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    with chiplock.acquire("pytest-holder", path):
        r = subprocess.run([sys.executable, "bench.py"], env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))),
                           capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    assert "REFUSING" in r.stderr
    assert "pytest-holder" in r.stderr


def test_holder_info_survives_garbage(tmp_path):
    path = str(tmp_path / "chip.lock")
    with open(path, "w") as f:
        f.write("not json")
    assert chiplock.holder_info(path) == {}
    assert chiplock.holder_info(str(tmp_path / "absent.lock")) == {}
