"""Order-insensitive Spark↔DuckDB result comparison, mimicking the
driver's correctness gate (row count + schema width + value hash over
name-sorted columns)."""

from __future__ import annotations

import decimal
import math
from typing import Any

import pandas as pd


def _norm_cell(v: Any) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (bool,)):
        return "t" if v else "f"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def compare(spark_df, duck_df: pd.DataFrame) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        return False, f"schema mismatch: {sorted(sp.columns)} vs {sorted(duck_df.columns)}"
    if len(sp) != len(duck_df):
        return False, f"row count {len(sp)} vs {len(duck_df)}"
    a, b = canonical_rows(sp), canonical_rows(duck_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
