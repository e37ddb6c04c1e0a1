"""The driver's multi-chip dryrun gate, run as a test.

Round 4 shipped a red ``MULTICHIP_r04.json``: an edit to
``__graft_entry__.py`` landed in the snapshot commit without ever being
executed (an equivalent-sharding ``device_put`` aliased buffers that a
``donate_argnums`` jit then deleted, and a later section used the dead
array).  Nothing in ``tests/`` exercised ``_dryrun_multichip_impl``, so the
gate could only be validated manually.  This test closes that hole: the gate
function itself now runs in the suite on a small virtual-CPU mesh.

``n_devices=4`` keeps CPU compile time sane while still exercising the
(data=2, spatial=2) mesh split inside the dryrun; ``PCRL_DRYRUN_2D=0`` skips
the 2D grad-program compiles (minutes on CPU — the driver's real 8-device
run keeps them on).  The 2D sections are covered by their own unit tests
(``test_train2d_parity.py``, ``test_finetune.py``).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_impl(monkeypatch):
    monkeypatch.setenv("PCRL_DRYRUN_2D", "0")
    import __graft_entry__ as g

    g._dryrun_multichip_impl(4)
