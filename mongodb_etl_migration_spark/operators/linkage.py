"""Record linkage (entity resolution across two tables).

The classic two-stage shape (Fellegi & Sunter 1969 framing;
Christen's blocking taxonomy): BLOCK to candidate pairs with cheap
equi-joins, then COMPARE candidates with an edit-distance gate. The
point at scale is that the quadratic all-pairs comparison never
materializes — only block-mates meet, and every blocking pass is an
ordinary hash equi-join Spark shuffles on the block key.

Multi-pass blocking is the standard recall fix: one key's blind spot
(a typo inside the key) is covered by a second pass keyed elsewhere;
the union of passes is deduped before the (relatively) expensive
comparison so each pair is scored once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def record_linkage(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    name_a: str,
    name_b: str,
    block_passes: list[tuple[str, str]],
    max_edit: int = 2,
) -> DataFrame:
    """Link rows of ``a`` to rows of ``b`` whose names are within
    ``max_edit`` Levenshtein distance, considering only candidate
    pairs that share at least one blocking key.

    ``block_passes``: list of (sql_expr_over_a, sql_expr_over_b)
    pairs; each pass equi-joins the two tables on its key expression
    (e.g. nation + name-suffix for one pass, nation + a middle
    fragment for another). Keys evaluate in the scan (plan-literal
    expressions, no UDF).

    100 TB shape: each pass is a hash-partitioned equi-join whose
    cost is Σ block_size², controlled by key selectivity — never
    |a|·|b|; the union of passes dedups on the id pair BEFORE the
    levenshtein gate, so each candidate is compared exactly once.
    JVM ``levenshtein`` is integer-exact and engine-portable. Output:
    (id_a, id_b, edit_distance bigint), matched pairs only.

    The two inputs may share column names (both sides using ``id`` /
    ``name`` is the common case): each side is projected to internal
    side-qualified columns BEFORE the join, so no bare name is ever
    resolved against both inputs. Only ``id_a`` and ``id_b`` surface
    in the output, so they must differ as OUTPUT names — equal id
    column names raise up front with the fix spelled out.
    """
    if not block_passes:
        raise ValueError("at least one blocking pass is required")
    if id_a == id_b:
        raise ValueError(
            f"id_a and id_b are both {id_a!r}; the output carries one "
            "column per side, so rename one input id first "
            "(df.withColumnRenamed)"
        )
    cands: DataFrame | None = None
    for expr_a, expr_b in block_passes:
        pa = a.select(
            F.col(id_a).alias("__id_a"),
            F.col(name_a).alias("__name_a"),
            F.expr(expr_a).alias("__bk"),
        )
        pb = b.select(
            F.col(id_b).alias("__id_b"),
            F.col(name_b).alias("__name_b"),
            F.expr(expr_b).alias("__bk"),
        )
        p = pa.join(pb, "__bk").select(
            "__id_a", "__id_b", "__name_a", "__name_b"
        )
        cands = p if cands is None else cands.unionByName(p)
    return (
        cands.distinct()
        .withColumn(
            "edit_distance",
            F.levenshtein(
                F.col("__name_a"), F.col("__name_b")
            ).cast("bigint"),
        )
        .filter(F.col("edit_distance") <= max_edit)
        .select(
            F.col("__id_a").alias(id_a),
            F.col("__id_b").alias(id_b),
            "edit_distance",
        )
    )
