"""Guards on the driver-faithful replica (tools/verify_oracle.py).

The r5 escape: the replica SKIPped rows-only queries before hashing, so an
array-typed output column sailed through locally and ERR'd in the driver's
pandas canonicalizer (`text_bpe_encode`, TypeError: unhashable type 'list').
These tests pin the canonicalizer's behavior on exactly that cell class so
the replica can never go blind to it again.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from verify_oracle import UnsortableCell, canon, table_hash, to_pandas_rows


def test_array_cell_raises_unsortable():
    pdf = pd.DataFrame({"doc_id": [1, 2], "pieces": [["a", "b"], ["c"]]})
    rows = to_pandas_rows(pdf)
    with pytest.raises(UnsortableCell):
        table_hash(rows, [0, 1])


def test_map_cell_raises_unsortable():
    pdf = pd.DataFrame({"k": [1], "m": [{"a": 1}]})
    with pytest.raises(UnsortableCell):
        table_hash(to_pandas_rows(pdf), [0, 1])


def test_scalar_rows_hash_cleanly():
    pdf = pd.DataFrame({"doc_id": [2, 1], "s": ["x", "y"], "v": [1.5, 2.5]})
    h = table_hash(to_pandas_rows(pdf), [0, 1, 2])
    # order-insensitive: a permuted frame hashes identically
    h2 = table_hash(to_pandas_rows(pdf.iloc[::-1]), [0, 1, 2])
    assert h == h2


def test_canon_dtype_classes_distinct():
    import numpy as np

    # int64 6 and float64 6.0 are DIFFERENT canon strings — the driver's
    # pandas dtype canon (r3 lesson: DuckDB HUGEINT → float64)
    assert canon(np.int64(6)) != canon(np.float64(6.0))
    assert canon(None) == "NULL"
    assert canon(True) == "1"
