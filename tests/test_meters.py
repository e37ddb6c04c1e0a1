"""Metrics plumbing units (``pcrlv2_tpu/utils/meters.py``)."""

import json

import numpy as np

from pcrlv2_tpu.utils.meters import AverageMeter, MetricLogger, metrics_path


def test_average_meter_weighted():
    m = AverageMeter()
    m.update(1.0, 4)
    m.update(3.0, 2)
    assert m.count == 6
    np.testing.assert_allclose(m.avg, (1.0 * 4 + 3.0 * 2) / 6)


def test_metric_logger_jsonl(tmp_path):
    p = tmp_path / "m.jsonl"
    log = MetricLogger(str(p))
    log.log({"epoch": 0, "loss": 1.5}, console=False)
    log.log({"epoch": 1, "loss": 1.25}, console=False)
    log.close()
    rows = [json.loads(l) for l in p.read_text().splitlines()]
    assert [r["epoch"] for r in rows] == [0, 1]
    assert all("ts" in r for r in rows)


def test_batch_not_shardable_is_global():
    """Divisibility over the data axis is a GLOBAL-batch property: under
    multihost each process holds 1/world of the batch, so the local size
    must be scaled by the process count — otherwise every valid multihost
    eval batch gets flagged ragged and skipped (all-zero metrics)."""
    from pcrlv2_tpu.core.mesh import batch_not_shardable

    # single host: local == global
    assert not batch_not_shardable(4, 4)
    assert batch_not_shardable(2, 4)
    assert batch_not_shardable(6, 4)
    # 2 hosts × 2 devices (data axis 4): local 2 → global 4 → shardable
    assert not batch_not_shardable(2, 4, world=2)
    # local 3 → global 6 → NOT shardable over 4
    assert batch_not_shardable(3, 4, world=2)
    # no mesh data axis → never ragged
    assert not batch_not_shardable(5, 1)


def test_metrics_path_rank_suffix(tmp_path, monkeypatch):
    """Process 0 keeps the canonical metrics.jsonl (all tooling reads it);
    other ranks get a rank-suffixed stream — no interleaved writes into one
    shared file on multi-host runs."""
    import jax

    assert metrics_path(str(tmp_path)).endswith("metrics.jsonl")
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert metrics_path(str(tmp_path)).endswith("metrics.rank2.jsonl")
    assert metrics_path(str(tmp_path), "other.jsonl").endswith(
        "other.rank2.jsonl")
