"""Edge-case coverage: checkpoint discovery, CSV polar path, logging,
device-iterator error propagation."""
import json
import os
import threading

import numpy as np
import pytest

from seld_tpu.train.checkpoint import latest_best
from seld_tpu.utils import io
from seld_tpu.utils.logging import ScalarLogger
from seld_tpu.data.loader import DeviceIterator


def test_latest_best_picks_lowest_score(tmp_path):
    for score in ("0.90000", "0.45000", "0.70000"):
        os.makedirs(tmp_path / f"bestscore_{score}")
    (tmp_path / "bestscore_0.10000.meta.json").write_text("{}")  # sidecar file
    best = latest_best(str(tmp_path))
    assert best.endswith("bestscore_0.45000")
    assert latest_best(str(tmp_path / "empty")) is None


def test_csv_polar_round_trip(tmp_path):
    # polar CSVs (5 columns) -> cartesian conversion -> back to polar
    path = tmp_path / "gt.csv"
    path.write_text("0,3,0,45,-30\n1,2,0,-120,60\n")
    d = io.load_output_format_file(str(path))
    assert d[0][0] == [3, 45.0, -30.0, 0]
    cart = io.convert_output_format_polar_to_cartesian(d)
    polar = io.convert_output_format_cartesian_to_polar(cart)
    assert polar[0][0][0] == 3
    np.testing.assert_allclose(polar[0][0][1:3], [45.0, -30.0], atol=1e-6)
    np.testing.assert_allclose(polar[1][0][1:3], [-120.0, 60.0], atol=1e-6)


def test_scalar_logger_jsonl(tmp_path):
    logger = ScalarLogger(str(tmp_path / "run"))
    logger.add_scalar("train/loss", 1.5, 0)
    logger.add_scalar("train/loss", 1.2, 1)
    logger.close()
    records = [json.loads(l) for l in open(logger.path)]
    assert [r["value"] for r in records] == [1.5, 1.2]
    assert records[0]["tag"] == "train/loss"


def test_device_iterator_empty_source():
    out = list(DeviceIterator([]))
    assert out == []


def test_device_iterator_propagates_producer_error():
    def bad_gen():
        yield (np.zeros((2, 2), np.float32),)
        raise RuntimeError("boom")

    it = DeviceIterator(bad_gen())
    batches = []
    with pytest.raises(RuntimeError, match="boom"):
        for b in it:
            batches.append(b)
    assert len(batches) == 1  # good batches still delivered first


def test_segment_labels_custom_block_size():
    d = {0: [[1, 0.1, 0.2, 0.3, 0]], 7: [[2, 0.5, 0.5, 0.5, 0]]}
    seg = io.segment_labels(d, 8, block_size=4)
    assert set(seg) == {0, 1}
    assert 1 in seg[0] and 2 in seg[1]
