"""Futuresales example: hermetic version of the reference's stale
example/futuresales/main_test.go (needed live MySQL + a deleted ps package).
Small sizes; asserts the planted signal is learnable, not a smoke print."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import futuresales  # noqa: E402


def test_feature_transform_layout():
    v = futuresales.feature_transform(
        "15.03.2014", 14, 7, 42, 128.0, 10, "mega widget 42")
    width = 31 + 12 + 3 + 34 + 60 + 84 + 7 + 10 + 1 + 100
    assert v.shape == (width,)
    assert v[14] == 1.0                       # day 15 -> index 14
    assert v[31 + 2] == 1.0                   # March
    assert v[31 + 12 + 1] == 1.0              # 2014
    assert v[31 + 12 + 3 + 14] == 1.0         # date_block 14
    # log2 price scalar sits after the hash block
    off = 31 + 12 + 3 + 34 + 60 + 84 + 7 + 10
    assert np.isclose(v[off], 7.0)            # log2(128)
    # 3 name tokens -> ≤3 bits in the multihot tail
    assert 1 <= v[off + 1:].sum() <= 3


def test_output_transform_roundtrip():
    y = np.asarray([0.0, 20.0, 123.0])
    assert np.allclose(
        futuresales.output_recovery(futuresales.output_transform(y)), y)


def test_end_to_end_learns(tmp_path):
    db = str(tmp_path / "sales.db")
    futuresales.generate_db(db, n_items=100, n_rows=3000, seed=0)
    res = futuresales.run(db, train_count=2500, test_count=500,
                          epochs=2, verbose=False)
    # Planted signal: both engines must beat the predict-the-mean baseline.
    assert res["mlp"][1] > 0.15, res
    assert res["neural"][1] > 0.0, res
