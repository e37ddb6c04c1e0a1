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
