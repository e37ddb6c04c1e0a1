"""Single-chip contention guard (advisory flock).

This environment exposes ONE tunneled TPU chip; two processes training or
timing on it serialize and both numbers become garbage.  That exact failure
contaminated the round-3 official benchmark (a background soak overlapped
the capture window and shaved a fake 24% off the headline).  Every
TPU-bound entry point therefore takes an exclusive ``flock`` on a
well-known path: benchmarks REFUSE to run while another holder is live,
trainers warn loudly and record the holder.

The lock is advisory and crash-safe (flock drops with the fd on process
death — no stale-lock cleanup needed).  Holder metadata (pid/label/time)
is written into the file for diagnostics; it may be stale after a crash,
but the flock itself never is.
"""

from __future__ import annotations

import fcntl
import json
import os
import time
from typing import Optional

LOCK_PATH = os.environ.get("PCRL_CHIP_LOCK", "/tmp/pcrl_tpu.lock")


class ChipLock:
    """Held exclusive lock; release explicitly or let process exit drop it."""

    def __init__(self, fd: int, path: str, label: str):
        self._fd = fd
        self.path = path
        self.label = label

    def release(self) -> None:
        if self._fd is not None:
            try:
                fcntl.flock(self._fd, fcntl.LOCK_UN)
            finally:
                os.close(self._fd)
                self._fd = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()


def acquire(label: str, path: Optional[str] = None) -> Optional[ChipLock]:
    """Try to take the chip lock. Returns a ``ChipLock`` or ``None`` if it
    cannot be taken (use :func:`acquire_ex` to learn why)."""
    return acquire_ex(label, path)[0]


def acquire_ex(label: str, path: Optional[str] = None
               ) -> tuple[Optional[ChipLock], str]:
    """Like :func:`acquire` but also reports WHY acquisition failed:
    ``"contended"`` (another live process holds the flock — the chip really
    is busy) vs ``"open-failed: …"`` (the lock FILE could not be opened,
    e.g. an existing 0o644 file owned by another user in sticky /tmp — the
    chip may well be free; fix/remove the file).  Conflating the two sends
    the operator hunting for a phantom job."""
    path = path or LOCK_PATH
    try:
        # 0o666 (pre-umask) so a lock file created by one user doesn't turn
        # another user's guard into a PermissionError crash; if the open
        # still fails (e.g. an existing 0o644 file owned by someone else in
        # sticky /tmp), report "open-failed" and let the callers do their
        # designed refuse/warn instead of dying on a raw traceback
        fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o666)
    except OSError as e:
        return None, f"open-failed: {e}"
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        os.close(fd)
        return None, "contended"
    meta = json.dumps({"pid": os.getpid(), "label": label,
                       "since": time.time()}) + "\n"
    try:
        os.ftruncate(fd, 0)
        os.pwrite(fd, meta.encode(), 0)
    except OSError:
        pass  # metadata is diagnostics only; the flock itself is held
    return ChipLock(fd, path, label), ""


def holder_info(path: Optional[str] = None) -> dict:
    """Best-effort metadata about the current/most-recent holder."""
    path = path or LOCK_PATH
    try:
        with open(path) as f:
            info = json.loads(f.read() or "{}")
    except (OSError, ValueError):
        return {}
    if "since" in info:
        info["held_for_s"] = round(time.time() - float(info["since"]), 1)
    return info


def guard_exclusive(label: str, path: Optional[str] = None) -> ChipLock:
    """Acquire or die: for benchmarks, where a contended chip means the
    measurement is garbage.  Raises ``SystemExit`` naming the holder.
    Override with ``PCRL_IGNORE_CHIP_LOCK=1`` (the number will be garbage)."""
    if os.environ.get("PCRL_IGNORE_CHIP_LOCK") == "1":
        return ChipLock(os.open(os.devnull, os.O_RDONLY), path or LOCK_PATH,
                        label)
    lock, why = acquire_ex(label, path)
    if lock is None:
        if why.startswith("open-failed"):
            raise SystemExit(
                f"REFUSING to run '{label}': could not open the TPU chip "
                f"lock file {path or LOCK_PATH} ({why}) — the chip may be "
                "free; fix or remove that file (likely owned by another "
                "user with restrictive permissions), or point "
                "PCRL_CHIP_LOCK at a writable path. To skip the guard "
                "entirely set PCRL_IGNORE_CHIP_LOCK=1.")
        info = holder_info(path)
        raise SystemExit(
            f"REFUSING to run '{label}': the TPU chip lock "
            f"{path or LOCK_PATH} is held by {info or 'another process'} — "
            "two jobs on the single tunneled chip serialize and both "
            "numbers become garbage. Stop the other job (kill $(cat "
            "/tmp/soak3d.pid)-style) or, to knowingly produce a garbage "
            "number, set PCRL_IGNORE_CHIP_LOCK=1.")
    return lock


def guard_warn(label: str, path: Optional[str] = None) -> Optional[ChipLock]:
    """Acquire or warn: for trainers, where contention is a user decision.
    Returns the lock when acquired, ``None`` (plus a loud warning) when
    another process holds the chip."""
    lock, why = acquire_ex(label, path)
    if lock is None:
        if why.startswith("open-failed"):
            print(f"WARNING: could not open the TPU chip lock file "
                  f"{path or LOCK_PATH} ({why}) — running UNGUARDED; the "
                  "chip may be free, but fix/remove that file so the "
                  "contention guard works again.", flush=True)
        else:
            info = holder_info(path)
            print(f"WARNING: TPU chip lock {path or LOCK_PATH} is held by "
                  f"{info or 'another process'} — this run will serialize "
                  "with it on the single chip and BOTH jobs' timings will "
                  "be garbage.", flush=True)
    return lock
