"""The local comparator must be exactly as strict as the driver's
value hash (VERDICT.md round 1, "What's wrong" #5: a 6-sig-fig /
decimal→float collapse masked a real divergence). These tests pin the
failure modes the driver caught that the old comparator missed."""

import decimal

import pandas as pd

from tests.oracle_compare import _norm_cell, canonical_rows


def test_int_vs_float_dtype_drift_is_visible():
    # DuckDB HUGEINT -> pandas float64 ("196.0") vs Spark int64 ("196")
    assert _norm_cell(196) == "196"
    assert _norm_cell(196.0) == "196.0"
    assert _norm_cell(196) != _norm_cell(196.0)


def test_decimal_keeps_scale():
    # Decimal('1234.50') must NOT collapse to float 1234.5
    assert _norm_cell(decimal.Decimal("1234.50")) == "1234.50"
    assert _norm_cell(1234.5) == "1234.5"
    assert _norm_cell(decimal.Decimal("1234.50")) != _norm_cell(1234.5)


def test_float_full_precision_not_6_sig_figs():
    # the old comparator collapsed these to "2.80515e+08" — equal.
    a = 280514929.7747
    b = 280514929.7704
    assert _norm_cell(a) != _norm_cell(b)
    # and full shortest-repr round-trip precision survives
    assert _norm_cell(0.1 + 0.2) == "0.30000000000000004"


def test_numpy_scalars_unwrap_to_python_semantics():
    import numpy as np

    assert _norm_cell(np.int64(7)) == "7"
    assert _norm_cell(np.float64(7.0)) == "7.0"
    assert _norm_cell(np.bool_(True)) == "t"


def test_canonical_rows_sorts_columns_and_rows():
    df1 = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    df2 = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    assert canonical_rows(df1) == canonical_rows(df2)
