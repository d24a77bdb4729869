"""Meter semantics for utils/logging.py.

The reference's ``SmoothedValue``/``MetricLogger``
(``CXPMRG.../pretrain/utils/misc.py:19-163``) read each value eagerly;
ours defers the host read to log boundaries so device scalars never
block the dispatch pipeline (BENCH.md "step-dispatch pipeline"). These
tests pin the two contracts: (1) statistics match the eager reference
math, (2) ``update`` never forces a read — only statistic reads do.
"""

import json
import os

from medical_image_analysis_tpu.utils.logging import (
    JsonlLogger,
    MetricLogger,
    SmoothedValue,
)


class _LazyScalar:
    """Stand-in for a device scalar: counts float() coercions."""

    reads = 0

    def __init__(self, v):
        self.v = v

    def __float__(self):
        _LazyScalar.reads += 1
        return float(self.v)


def test_smoothed_value_window_and_global_math():
    m = SmoothedValue(window=4)
    for i in range(10):
        m.update(float(i))
    # window average over the last 4 values, global over all 10
    assert m.avg == (6 + 7 + 8 + 9) / 4
    assert m.global_avg == sum(range(10)) / 10
    # weighted updates hit global_avg only
    m.update(100.0, n=10)
    assert m.global_avg == (sum(range(10)) + 1000.0) / 20


def test_update_defers_reads_until_statistic():
    _LazyScalar.reads = 0
    m = SmoothedValue(window=8)
    for i in range(5):
        m.update(_LazyScalar(i))
    assert _LazyScalar.reads == 0, "update() must not read device values"
    assert m.avg == 2.0
    assert _LazyScalar.reads == 5
    # re-reading statistics does not re-read drained values
    assert m.global_avg == 2.0
    assert _LazyScalar.reads == 5


def test_metric_logger_defers_and_formats():
    _LazyScalar.reads = 0
    ml = MetricLogger()
    for i in range(3):
        ml.update(loss=_LazyScalar(i), grad_norm=_LazyScalar(2 * i))
    assert _LazyScalar.reads == 0
    assert ml.meters["loss"].global_avg == 1.0
    assert ml.meters["grad_norm"].global_avg == 2.0


def test_log_every_drains_at_boundaries(capsys):
    ml = MetricLogger()
    seen = []
    for item in ml.log_every(range(5), print_freq=2, header="h", total=5):
        ml.update(loss=_LazyScalar(item))
        seen.append(item)
    assert seen == list(range(5))
    out = capsys.readouterr().out
    assert "h [0/5]" in out and "h [4/5]" in out and "done in" in out
    assert "loss:" in out


def test_jsonl_logger_roundtrip(tmp_path):
    lg = JsonlLogger(str(tmp_path))
    lg.write({"epoch": 0, "loss": 1.5})
    lg.write({"epoch": 1, "loss": 0.5})
    with open(os.path.join(str(tmp_path), "log.txt")) as f:
        rows = [json.loads(line) for line in f]
    assert rows == [{"epoch": 0, "loss": 1.5}, {"epoch": 1, "loss": 0.5}]
    with open(os.path.join(str(tmp_path), "metrics.csv")) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "epoch,loss" and len(lines) == 3
