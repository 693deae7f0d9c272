"""Order-insensitive Spark↔DuckDB result comparison, mimicking the
driver's correctness gate (row count + schema width + value hash over
name-sorted columns).

Canonicalization is STRICT (round-1 lesson, VERDICT.md "What's wrong"
#5): the old 6-sig-fig / decimal→float collapse masked a real value
divergence (a1) and dtype mismatches ("196" vs "196.0"). Now:

- ints stringify as ints ("196"), floats as full-precision repr
  ("196.0", "0.30000000000000004") — an int64 vs float64 dtype drift
  between engines is a FAILURE, as the driver sees it;
- Decimal keeps its exact scale-preserving string ("1234.50"), so a
  Decimal column vs a float64 column only matches when both the value
  AND the rendered scale agree — queries should avoid emitting
  decimals entirely (cast final aggregates to DOUBLE/BIGINT on both
  engines);
- no tolerance anywhere: equal means byte-equal canonical strings.
"""

from __future__ import annotations

import decimal
import math
from typing import Any

import pandas as pd


def _norm_cell(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, decimal.Decimal):
        # scale-preserving: Decimal('1234.50') -> '1234.50' (NOT 1234.5)
        return str(v)
    if isinstance(v, float):
        return repr(float(v))  # shortest round-trip repr, full precision
    if isinstance(v, int):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    # numpy scalars (np.int64 / np.float64) reach here on some pandas
    # paths; unwrap via .item() to the matching python branch above.
    item = getattr(v, "item", None)
    if item is not None and type(v).__module__.startswith("numpy"):
        return _norm_cell(v.item())
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def _unhashable_cols(df: pd.DataFrame) -> list[str]:
    """Columns the driver's pandas canonicalizer cannot sort/hash.

    The driver does ``DataFrame.sort_values`` over every column; a cell
    holding a list/tuple/ndarray raises ``unhashable type`` there
    (round-2 lesson: 4 queries were locally green but driver-red).
    Local green must imply driver green, so such columns FAIL here too
    — queries must serialize arrays (array_join/to_json) on both
    engines before returning.

    Scans EVERY row, not a head sample: a container value produced by
    a conditional branch can first appear arbitrarily late (round-3
    ADVICE), and a sampled check would pass locally then crash the
    driver. This is the oracle-side net; the Spark side is caught
    structurally from its schema in ``compare`` before any data moves.
    """
    bad = []
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            if any(
                isinstance(v, (list, tuple, dict, set))
                or type(v).__name__ == "ndarray"
                for v in col.dropna()
            ):
                bad.append(c)
    return bad


def _spark_container_cols(spark_df) -> list[str]:
    """Array/map/struct columns detected from the Spark SCHEMA — exact
    and zero-cost, unlike value sampling (a NULL-heavy or late-branch
    column cannot slip through the way a data scan can miss it)."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def compare(spark_df, duck_df: pd.DataFrame) -> tuple[bool, str]:
    bad = _spark_container_cols(spark_df)
    if bad:
        return False, (
            f"driver-unhashable array/map/struct column(s) in spark "
            f"schema: {bad} — serialize with array_join/to_json on "
            "both engines"
        )
    sp = spark_df.toPandas()
    bad = _unhashable_cols(duck_df)
    if bad:
        return False, (
            f"driver-unhashable array column(s) in oracle result: {bad} "
            "— serialize with array_join/to_json on both engines"
        )
    if sorted(sp.columns) != sorted(duck_df.columns):
        return False, f"schema mismatch: {sorted(sp.columns)} vs {sorted(duck_df.columns)}"
    if len(sp) != len(duck_df):
        return False, f"row count {len(sp)} vs {len(duck_df)}"
    a, b = canonical_rows(sp), canonical_rows(duck_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
