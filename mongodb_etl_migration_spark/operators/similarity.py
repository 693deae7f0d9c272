"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, plus an
LSH-bucketed (random-hyperplane/SimHash-for-vectors) variant as the
scale path. All vector math is built-in higher-order functions
(zip_with/aggregate) on doubles — JVM-side, no Python, and expressible
in the DuckDB oracle for verification.

Scale notes (100 TB of embeddings):
- brute force is a full scan per query — fine for one-off queries,
  linear in corpus size, embarrassingly parallel, zero shuffle.
- hyperplane LSH: bucket assignment is a narrow map; a query probes
  only its bucket (a partition-pruned fraction of the corpus). With
  the bucket column as a partition key on disk, Spark prunes files —
  the IVF idea expressed with Spark-native partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mongodb_etl_migration_spark.functions.scalars import stable_round
from mongodb_etl_migration_spark.operators.text import (
    lit_long_array,
    sql_name_ok,
)


# --- SQL-template fast paths for the vector helpers -------------------
# The pyspark higher-order-function builders (F.transform/F.aggregate/
# F.zip_with) do several py4j round-trips PER LAMBDA, which made the
# vector-query CONSTRUCTION cost scale with plane count × join sides
# (sim_bitext_margin: ~3,400 round-trips / 0.6 s socket time per build,
# r14 cProfile receipt — the same disease pass 6 cured for the gopher
# folds). Each helper therefore emits its expression as ONE parseable
# SQL string when given column NAMES / literal vectors, and keeps the
# original Column form for Column inputs; the two forms build the same
# resolved tree (CASE/lambda/cast shapes identical; double literals via
# repr round-trip exactly) and are pinned value-equal by
# tests/test_vector_sql_forms.py.

def _f8_sql(x: float) -> str:
    """Exact SQL double literal: repr() is the shortest round-tripping
    decimal and Java's parseDouble lands on the same IEEE-754 value;
    the D suffix makes the parser emit the same DoubleType Literal
    node as ``F.lit(float)``. Non-finite components take the CAST
    spelling (repr's 'inf'/'nan' would not parse) so the SQL and
    Column forms stay equivalent for pathological inputs (ADVICE
    r14)."""
    x = float(x)
    if x != x:
        return "cast('NaN' as double)"
    if x == float("inf"):
        return "cast('Infinity' as double)"
    if x == float("-inf"):
        return "cast('-Infinity' as double)"
    return f"{x!r}D"


def _vec_sql(name: str) -> str:
    """SQL fragment: the :func:`_dvec` cast-to-double transform."""
    return f"transform(`{name}`, __vx -> cast(__vx as double))"


def lit_vec_sql(v: Sequence[float]) -> str:
    """SQL fragment: array<double> literal (see :func:`_f8_sql`)."""
    if not len(v):
        return "cast(array() as array<double>)"
    return "array(" + ",".join(_f8_sql(x) for x in v) + ")"


def dot_sql(a: str, b: str) -> str:
    """SQL fragment: the :func:`dot` fold over two array fragments.
    Lambda variables dunder-named so they can never collide with (or
    silently shadow) a data column referenced by ``a``/``b``."""
    return (
        f"aggregate(zip_with({a}, {b}, (__zx, __zy) -> __zx * __zy), "
        f"0.0D, (__acc, __x) -> __acc + __x)"
    )


def norm_sql(a: str) -> str:
    """SQL fragment: the :func:`norm` fold over an array fragment."""
    return f"sqrt(aggregate({a}, 0.0D, (__acc, __x) -> __acc + __x * __x))"


def _dvec(c: Column | str) -> Column:
    if isinstance(c, str) and sql_name_ok(c):
        return F.expr(_vec_sql(c))
    if isinstance(c, str):
        c = F.col(c)  # dotted/backticked name: Column path (ADVICE r14)
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<double> columns. Column names take the
    one-parse SQL path; Column objects keep the HOF-builder form."""
    if (
        isinstance(a, str)
        and isinstance(b, str)
        and sql_name_ok(a)
        and sql_name_ok(b)
    ):
        return F.expr(dot_sql(f"`{a}`", f"`{b}`"))
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column | str) -> Column:
    """L2 norm of an array<double> column (name → one-parse SQL path)."""
    if isinstance(a, str) and sql_name_ok(a):
        return F.expr(norm_sql(f"`{a}`"))
    if isinstance(a, str):
        a = F.col(a)  # dotted/backticked name: Column path (ADVICE r14)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lit_vec(v: Sequence[float]) -> Column:
    # ONE py4j call (array<double> literal, identical schema/values to
    # the old per-element F.array(F.lit(x).cast("double"), ...) form —
    # verified non-null double elements both ways). The per-element
    # form cost ~2*dim driver round-trips PER VECTOR; with 4+ planes
    # per bucket expression and two join sides that was the dominant
    # driver-side plan-construction cost of every LSH query
    # (sim_bitext_margin: ~2 s of pure build time, r14 receipt).
    # numpy (not F.lit(list), which recurses per element): the 1-D
    # ndarray crosses py4j as one Array[Double].
    import numpy as np

    if not len(v):
        return F.array().cast("array<double>")
    return F.lit(np.asarray([float(x) for x in v], dtype="float64"))


def cosine_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k: scan + per-row cosine + global top-k.
    orderBy+limit compiles to TakeOrderedAndProject — a per-partition
    heap and a k-row driver merge, NOT a full sort/shuffle."""
    q = lit_vec(query_vec)
    return (
        emb.select(
            F.col(id_col),
            stable_round(cosine(_dvec(vec_col), q), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def hyperplane_bucket(
    vec_col: Column | str, planes: Sequence[Sequence[float]]
) -> Column:
    """LSH bucket id: sign bit of the dot product against each plane,
    concatenated ('110…'). Deterministic given the planes. A column
    NAME takes the one-parse SQL template (CASE WHEN == the Column
    form's F.when; see the fast-path note above :func:`_f8_sql`)."""
    if isinstance(vec_col, str) and sql_name_ok(vec_col):
        v = _vec_sql(vec_col)
        bits = ",".join(
            f"case when {dot_sql(v, lit_vec_sql(p))} >= 0 "
            "then '1' else '0' end"
            for p in planes
        )
        return F.expr(f"concat({bits})")
    if isinstance(vec_col, str):
        vec_col = F.col(vec_col)  # dotted/backticked: Column path
    v = _dvec(vec_col)
    bits = [
        F.when(dot(v, lit_vec(p)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def ann_topk_lsh(
    emb: DataFrame,
    query_vec: Sequence[float],
    planes: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket.
    With ``bucket`` as a physical partition column the scan prunes to
    1/2^planes of the corpus."""
    bucketed = emb.withColumn("bucket", hyperplane_bucket(vec_col, planes))
    qrow_bits = []
    import math

    for p in planes:
        s = sum(float(a) * float(b) for a, b in zip(query_vec, p))
        qrow_bits.append("1" if s >= 0 else "0")
    qbucket = "".join(qrow_bits)
    return (
        bucketed.filter(F.col("bucket") == qbucket)
        .select(
            F.col(id_col),
            stable_round(cosine(_dvec(vec_col), lit_vec(query_vec)), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def ann_topk_multiprobe(
    emb: DataFrame,
    query_vec: Sequence[float],
    planes: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Multi-probe LSH top-k: probe the query's bucket AND every
    Hamming-distance-1 neighbor (flip one plane sign) — the standard
    recall lever for hyperplane LSH. A near neighbor lands in a
    different bucket exactly when it straddles one of the few planes
    the query sits close to; probing the 1-flip neighborhood recovers
    those misses WITHOUT rebuilding the index or adding planes,
    scanning n_planes+1 of the 2^n_planes buckets (a fixed fraction —
    with the bucket as a physical partition key this stays file-level
    partition pruning, just over a slightly larger prune set)."""
    bucketed = emb.withColumn("bucket", hyperplane_bucket(vec_col, planes))
    qbits = [
        "1" if sum(float(a) * float(b) for a, b in zip(query_vec, p)) >= 0
        else "0"
        for p in planes
    ]
    qbucket = "".join(qbits)
    probe_set = [qbucket] + [
        "".join(b if j != i else ("0" if b == "1" else "1")
                for j, b in enumerate(qbits))
        for i in range(len(qbits))
    ]
    return (
        bucketed.filter(F.col("bucket").isin(probe_set))
        .select(
            F.col(id_col),
            stable_round(
                cosine(_dvec(vec_col), lit_vec(query_vec)), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    planes: Sequence[Sequence[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked: self-join
    within hyperplane buckets only, then exact cosine filter. The
    bucket key bounds the quadratic pair space.

    Norms are precomputed per ROW before the join (round-1 VERDICT
    "What's wrong" #7): inside a bucket of m vectors the old plan
    re-ran norm() per joined pair — m² O(d) evaluations; now it's m,
    and the pair step is one dot product plus a multiply."""
    b = emb.select(
        F.col(id_col),
        _dvec(vec_col).alias("v"),
        hyperplane_bucket(vec_col, planes).alias("bucket"),
    ).select(
        F.col(id_col), "v", "bucket", norm("v").alias("nrm")
    )
    # shuffle on the bucket BEFORE the per-side renames: identical
    # exchanges on both sides → ReuseExchange computes the
    # bucket+norm projection once (see dedup.lsh_candidate_pairs).
    # The lazy checkpoint UNDER the repartition pins that even when
    # the planner broadcast-rewrites the self-join (a BroadcastExchange
    # build side cannot reuse a hash-partitioned exchange, so without
    # it the scan+bucket+norm pipeline would run once per side — the
    # r14 d2 runtime-plan finding, same fix).
    b = b.localCheckpoint(eager=False).repartition(F.col("bucket"))
    left = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    right = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            stable_round(
                dot("va", "vb") / (F.col("na") * F.col("nb")),
                4,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_dedup_keep(
    emb: DataFrame,
    planes: Sequence[Sequence[float]],
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: keep one representative
    per cosine ε-neighborhood, blocked by hyperplane-LSH bucket.

    A vector is DROPPED iff some lower-id vector in its bucket has
    cosine ≥ ``threshold`` with it; survivors are returned as
    (id_col, bucket). The keep rule is "dominated by any lower id",
    not transitive closure — deterministic, order-free, and exactly
    expressible in SQL (an anti-join on the pair report), which is
    what makes it oracle-checkable; chains therefore prune harder
    than greedy-sequential SemDeDup (if a~b and b~c, both b and c
    drop even when a!~c), the conservative direction for dedup.

    Blocking by hyperplane bucket instead of k-means cluster (the
    SemDeDup paper's blocker) keeps the blocker SCALE-INVARIANT:
    sign(v·p) = sign(c·v·p), so an exact or rescaled copy provably
    shares its original's block — an L2 coarse quantizer can send a
    rescaled copy to a different cluster and never compare the pair.
    At 100 TB the plan is the near-dup pair plan (one bucket-key
    shuffle with per-row precomputed norms, quadratic only within a
    bucket, AQE skew split as backstop) plus one left-anti join whose
    build side is duplicate-sized, not corpus-sized.
    """
    bucketed = emb.select(
        F.col(id_col), hyperplane_bucket(vec_col, planes).alias("bucket")
    )
    dropped = (
        embedding_neardup_pairs(emb, planes, threshold, id_col, vec_col)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return bucketed.join(dropped, id_col, "left_anti")


def write_ivf_index(
    emb: DataFrame,
    path: str,
    planes: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF-style index: embeddings written partitioned
    BY LSH bucket (directory per bucket). A probe filters on the bucket
    column → PartitionFilters prune to 1/2^|planes| of the files before
    any IO — the inverted-file idea expressed with Spark-native
    physical partitioning.

    Alongside the postings, a 1-row stats frame persists at
    ``path/_stats`` (underscore-prefixed: invisible to the partitioned
    read) carrying n_vectors and THE PLANES THEMSELVES — maintenance
    and probes derive the quantizer from the index's own stats, never
    a repeated literal (the bm25_probe_indexed rule: a plane mismatch
    would assign new vectors to directories inconsistent with the
    existing layout and silently corrupt pruning)."""
    emb.withColumn("bucket", hyperplane_bucket(vec_col, planes)).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)
    import json as _json

    n = emb.count()
    emb.sparkSession.createDataFrame(
        [(int(n), _json.dumps([[float(x) for x in p] for p in planes]))],
        "n_vectors bigint, planes_json string",
    ).write.mode("overwrite").parquet(f"{path}/_stats")


def read_ivf_stats(spark, path: str) -> tuple[int, list[list[float]]]:
    """(n_vectors, planes) from the index's own stats row — one
    bounded 1-row collect (the documented bounded-collect pattern)."""
    import json as _json

    row = spark.read.parquet(f"{path}/_stats").collect()[0]
    return int(row["n_vectors"]), _json.loads(row["planes_json"])


def append_ivf_index(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """ADDITIVE IVF maintenance — the postings_from_tf rule applied to
    ANN: assign a new vector batch to the PERSISTED index's own planes
    (read from ``path/_stats``, never re-passed by the caller), append
    its postings into the existing bucket directories, and fold the
    1-row stats additively. Cost is batch-sized: the assignment is a
    projection over the batch, the write appends only the batch's
    files (ZERO shuffle, no touch of historical postings), and the
    stats update is a 1-row rewrite — continuous embedding ingest
    never rebuilds or rereads the 100 TB index. Probe parity with a
    from-scratch rebuild over the union is pinned by test
    (bucket = pure function of (vector, planes), so append and
    rebuild agree bit for bit). Append-only single-writer, like the
    bm25 maintenance path.

    ``n_vectors`` is DERIVED from the written postings after the
    append (a parquet footer-metadata count) rather than folded from
    a second execution of the batch plan — a nondeterministic source
    could otherwise record a count different from what was written,
    and a crash between the postings write and the stats rewrite
    would understate n_vectors forever. Deriving self-heals: the next
    append recomputes the truth from the postings themselves."""
    import json as _json

    spark = batch.sparkSession
    _, planes = read_ivf_stats(spark, path)
    batch.withColumn(
        "bucket", hyperplane_bucket(vec_col, planes)
    ).write.mode("append").partitionBy("bucket").parquet(path)
    n_total = spark.read.parquet(path).count()
    spark.createDataFrame(
        [(int(n_total), _json.dumps(planes))],
        "n_vectors bigint, planes_json string",
    ).write.mode("overwrite").parquet(f"{path}/_stats")


def ivf_probe_indexed(
    spark,
    path: str,
    query_vec: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """:func:`ivf_probe_topk` with the planes taken from the index's
    OWN stats (the bm25_probe_indexed shape) — the probe a maintained
    index serves, immune to caller-side plane drift."""
    _, planes = read_ivf_stats(spark, path)
    return ivf_probe_topk(
        spark, path, query_vec, planes, id_col, vec_col, k
    )


def ivf_probe_topk(
    spark,
    path: str,
    query_vec: Sequence[float],
    planes: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Top-k over the materialized IVF index: scans ONLY the query's
    bucket directory (partition pruning), then exact cosine + top-k."""
    qbits = "".join(
        "1" if sum(float(a) * float(b) for a, b in zip(query_vec, p)) >= 0 else "0"
        for p in planes
    )
    q = lit_vec(query_vec)
    return (
        spark.read.parquet(path)
        .filter(F.col("bucket") == qbits)
        .select(
            F.col(id_col),
            stable_round(cosine(_dvec(vec_col), q), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def l2_normalize(vec: Column | str) -> Column:
    """Unit-norm embedding (the preprocessing step before cosine ANN —
    normalized vectors turn cosine into dot product).

    The norm is bound ONCE per row via a single-element-array
    "let binding": higher-order-function lambda bodies get no codegen
    CSE, so writing ``x / sqrt(dot(v,v))`` inline would re-run the
    O(d) norm for every element — O(d²) per row (round-1 VERDICT
    "What's wrong" #6). ``transform(array(norm), n -> ...)`` evaluates
    the norm exactly once and exposes it to the inner lambda as a
    bound variable. A zero vector stays the zero vector (x/0 under
    non-ANSI Spark would silently NULL every element)."""
    v = _dvec(vec)
    return F.element_at(
        F.transform(
            F.array(norm(v)),
            lambda n: F.transform(
                v,
                lambda x: F.when(n == 0.0, F.lit(0.0)).otherwise(x / n),
            ),
        ),
        1,
    )


def int8_quantize(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x|/127``,
    ``q_i = floor(x_i/scale + 0.5)`` ∈ [-127, 127].

    This is the standard ANN memory lever — 8× smaller than float64
    (4× vs float32), which at 100 TB of embeddings decides whether the
    index fits executor memory at all. Dequantized cosine stays within
    ~1% of exact for typical distributions (pinned by test).

    ``floor(x + 0.5)`` instead of round(): IEEE floor is deterministic
    while round()'s half-tie mode differs across engines. The scale is
    materialized as a real column before the per-element lambda (no
    per-element recompute). Output: (id, scale, q array<long>).
    """
    v = _dvec(vec_col)
    amax = F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    withs = df.select(
        F.col(id_col), v.alias("_v"), (amax / F.lit(127.0)).alias("scale")
    )
    q = F.transform(
        F.col("_v"),
        lambda x: F.when(F.col("scale") == 0.0, F.lit(0))
        .otherwise(F.floor(x / F.col("scale") + F.lit(0.5)))
        .cast("long"),
    )
    return withs.select(F.col(id_col), F.col("scale"), q.alias("q"))


def int8_dequantize(q: Column, scale: Column) -> Column:
    """Back to approximate doubles: ``x_i ≈ q_i * scale``."""
    return F.transform(q, lambda x: x.cast("double") * scale)


def nearest_centroid_assign(
    emb: DataFrame,
    centroids: Sequence[tuple[int, Sequence[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest
    centroid — the partitioning step that turns brute-force ANN into
    an inverted-file index (each vector lands in exactly one list).

    ``centroids`` are (label, quantized-int-vector) pairs — element
    values pre-scaled by ``scale`` and rounded (see
    :func:`group_centroids` + floor(m·scale + 0.5)). The vector side
    is quantized the same way on the fly, so every distance is a SUM
    OF INTEGER SQUARES: bit-identical across engines and partitions
    (float summation order can flip an argmin at the boundary;
    integers cannot). Ties break on the smaller label via struct
    ordering.

    Plan shape: centroids fold into the plan as literals (k·dim ints —
    a few KB for any real IVF list count), so the assignment is ONE
    narrow projection over the scan: zero shuffle, zero join, scales
    to any corpus size. Output: (id_col, assigned, d2).
    """
    xq = emb.select(
        F.col(id_col),
        _quantize(vec_col, scale).alias("_xq"),
    )
    # _best materialized as its own attribute: array_min's argument
    # tree is non-cheap and referenced twice below — CollapseProject
    # keeps the projections separate so the k distance sums run once
    # per row, not once per output column.
    scored = xq.select(
        F.col(id_col),
        F.array_min(_centroid_dists(F.col("_xq"), centroids)).alias("_best"),
    )
    return scored.select(
        F.col(id_col),
        F.col("_best.assigned").alias("assigned"),
        F.col("_best.d2").alias("d2"),
    )


def _quantize(vec_col: Column | str, scale: int) -> Column:
    """floor(x·scale + 0.5) per element as bigint — the shared
    engine-deterministic quantizer."""
    return F.transform(
        _dvec(vec_col),
        lambda x: F.floor(x * F.lit(float(scale)) + F.lit(0.5)).cast("long"),
    )


def _pq_best_sql(sub: str, book: list[list[int]]) -> str:
    """ONE-parse SQL mirror of the per-subspace PQ argmin the Column
    form builds in :func:`pq_encode` / :func:`ivf_pq_topk`:
    ``array_min`` over per-centroid ``(d2, code)`` structs, d2 the
    integer squared distance of the subvector fragment ``sub``
    against each centroid's literal array. The Column build cost
    ~3 py4j round-trips per centroid ELEMENT plus the HOF builders'
    chatter — m·k·dsub = 1,024 literals for the catalog's 8×16×8
    books, ~4 s of pure construction per PQ query (r15 time_query
    receipt: sim_pq_encode 4.5 s warm, 1 job, zero shuffle — all
    build). Same tree, one parse. Value-equality pinned by
    test_pq_sql_form_matches_column_form and the PQ oracles."""
    from mongodb_etl_migration_spark.operators.text import (
        sql_bigint_array,
    )

    structs = ",".join(
        "named_struct('d2', aggregate(zip_with("
        f"{sub}, {sql_bigint_array(cvec)}, "
        "(__pa, __pb) -> (__pa - __pb) * (__pa - __pb)), "
        "CAST(0 AS BIGINT), (__pc, __px) -> __pc + __px), "
        f"'code', CAST({c} AS INT))"
        for c, cvec in enumerate(book)
    )
    return f"array_min(array({structs}))"


def _centroid_dists(
    xq_col: Column, centroids: Sequence[tuple[int, Sequence[int]]]
) -> Column:
    """Array of (d2, assigned) structs — one integer squared distance
    per centroid; array_min over it is the deterministic argmin (ties
    break to the smaller label by struct ordering)."""
    if not centroids:
        raise ValueError("need at least one centroid")
    return F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        xq_col,
                        lit_long_array(cvec),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d2"),
                F.lit(int(label)).alias("assigned"),
            )
            for label, cvec in centroids
        ]
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 10,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
) -> DataFrame:
    """Lloyd's k-means over embeddings — the iterative-algorithm
    pattern on Spark (MLlib's own KMeans has the same skeleton:
    centroids live on the driver, each iteration is one distributed
    assignment + one k×dim aggregate).

    Everything is integer arithmetic so every iteration is exactly
    reproducible: vectors quantize to ``floor(x·scale + 0.5)``,
    distances are sums of integer squares
    (:func:`nearest_centroid_assign`), and the update step is
    ``floor(sum/count)`` — an IEEE division of exactly-representable
    integers, bit-identical on every engine. Float k-means can flip
    an argmin at the boundary and diverge run-to-run; this cannot.

    Determinism contract: init = the quantized vectors of the ``k``
    smallest ids; ties in assignment break to the smaller cluster id;
    clusters that lose all members simply drop (no re-seeding) — the
    same rule an unrolled SQL twin applies naturally.

    Per-iteration cost at 100 TB: assignment AND update are computed
    in ONE scan of the quantized corpus — `cluster` is a pure function
    of the vector given the literal centroids, so the update projects
    it inline (no self-join, no second derivation of the corpus) and
    shuffles only k×dim partial sums (map-side combine collapses each
    task to ≤k rows). Driver round-trips are k×dim ints per iteration.
    Output: (id_col, cluster, d2) for the final assignment.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    xq = emb.select(F.col(id_col), _quantize(vec_col, scale).alias("_xq"))
    # seed from the k smallest ids (NOT `id < k` — id spaces need not
    # start at 0 or be contiguous); TakeOrderedAndProject, no sort.
    init = xq.orderBy(id_col).limit(k).collect()
    if not init:
        raise ValueError("kmeans_assign needs a non-empty input")
    cents: list[tuple[int, list[int]]] = [
        (int(r[id_col]), [int(v) for v in r["_xq"]]) for r in init
    ]
    # iterations-1 update rounds, then the final assignment below
    for _ in range(iterations - 1):
        # two-step select: the struct's field names only exist in the
        # schema once the array_min lands in a projection (a direct
        # getField on the raw expression sees unnamed col1/col2)
        scored_it = xq.select(
            "_xq",
            F.array_min(_centroid_dists(F.col("_xq"), cents)).alias("_best"),
        )
        per_pos = (
            scored_it.select(
                F.col("_best.assigned").alias("cluster"),
                F.posexplode("_xq").alias("pos", "x"),
            )
            .groupBy("cluster", "pos")
            .agg(
                F.floor(
                    F.sum("x").cast("double") / F.count("*")
                ).cast("long").alias("cq")
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in per_pos:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["pos"])] = int(
                r["cq"]
            )
        cents = [
            (c, [pm[p] for p in sorted(pm)]) for c, pm in sorted(by_cluster.items())
        ]
    scored = xq.select(
        F.col(id_col),
        F.array_min(_centroid_dists(F.col("_xq"), cents)).alias("_best"),
    )
    return scored.select(
        F.col(id_col),
        F.col("_best.assigned").alias("cluster"),
        F.col("_best.d2").alias("d2"),
    )


def group_centroids(df: DataFrame, key: str, vec_col: str, dim: int) -> DataFrame:
    """Element-wise mean embedding per group (class centroids — the
    build step of an IVF index, label prototypes for probing mixes).

    posexplode → per-(key, position) avg → re-assemble ordered array.
    The explode multiplies rows by ``dim``, but partial aggregation
    collapses each map task to #keys×dim rows before the single
    shuffle — at 100 TB the exchange carries centroids, not vectors.
    Output: (key, centroid array<double>)."""
    ex = df.select(F.col(key), F.posexplode(_dvec(vec_col)).alias("pos", "x"))
    per_pos = ex.groupBy(key, "pos").agg(F.avg("x").alias("m"))
    return (
        per_pos.groupBy(key)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("m")))
            ).alias("_pm")
        )
        .select(
            F.col(key),
            F.transform(F.col("_pm"), lambda s: s.getField("m")).alias("centroid"),
        )
    )


def matryoshka(vec: Column | str, k: int) -> Column:
    """Matryoshka (MRL) truncation: keep the first ``k`` dimensions
    and re-unit-normalize the PREFIX — the serving-side trick that
    trades recall for k/d of the memory and FLOPs when embeddings
    were trained with Matryoshka representation learning. Same
    let-binding shape as l2_normalize (the prefix norm evaluates once
    per row, not once per element); pure Column, zero shuffle. An
    all-zero PREFIX — possible even when the full vector is nonzero —
    stays the zero vector rather than silently NULLing out."""
    v = F.slice(_dvec(vec), 1, k)
    return F.element_at(
        F.transform(
            F.array(norm(v)),
            lambda n: F.transform(
                v,
                lambda x: F.when(n == 0.0, F.lit(0.0)).otherwise(x / n),
            ),
        ),
        1,
    )


def int8_gram(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 16,
):
    """Upper-triangular Gram matrix Σ qᵢ·qⱼ over int8-quantized
    embedding prefixes — the exact-integer core of covariance/PCA/
    whitening prep. Quantizing first (int8_quantize) turns the
    accumulations into long-integer sums, so the distributed result
    is order-independent and verifies hash-exact; a float Gram matrix
    would drift with partial-sum ordering.

    Plan shape: dims·(dims+1)/2 sum aggregates evaluated COLUMN-WISE
    in one pass — no explode, no self-join, no per-vector shuffle;
    the only exchange carries the single partial-agg row per
    partition (d² longs). The one-row result unpivots to (i, j, sxy,
    n) rows driver-side-free via explode(array(struct…)). ``dims``
    bounds codegen width (d=16 → 136 aggregates); for wider prefixes
    chunk the pair list over several passes.
    """
    q = int8_quantize(df, id_col, vec_col).select(
        F.slice("q", 1, dims).alias("q")
    )
    aggs = [F.count("*").alias("n")]
    pairs = [(i, j) for i in range(1, dims + 1) for j in range(i, dims + 1)]
    for i, j in pairs:
        aggs.append(
            F.sum(
                F.element_at(F.col("q"), i) * F.element_at(F.col("q"), j)
            ).alias(f"s_{i}_{j}")
        )
    one = q.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("i"),
                F.lit(j).cast("bigint").alias("j"),
                F.col(f"s_{i}_{j}").cast("bigint").alias("sxy"),
                F.col("n").cast("bigint").alias("n"),
            )
            for i, j in pairs
        ]
    )
    return one.select(F.explode(structs).alias("e")).select("e.*")


def pca_power_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 16,
    rounds: int = 3,
    scale: int = 1000,
):
    """Top-principal-component projection via INTEGER fixed-point
    power iteration on the int8 Gram matrix — the PCA step of
    embedding pipelines (whitening prep, 1-D bucketing for dedup /
    range partitioning, coarse ANN ordering), in the engine's
    exactly-verifiable discipline (the k-means/PageRank treatment
    applied to an eigenproblem).

    Method: G = int8_gram (order-independent long sums, one pass);
    ``rounds`` power iterations on the driver over the d×d integer
    matrix — u = G·v exactly, then renormalize v ← sign(u)·(|u|·scale
    ÷ max|u|) with NON-NEGATIVE floor division only (Python floors
    and DuckDB truncates on negatives; splitting the sign makes both
    engines compute the identical vector). The iterate count is part
    of the operator contract (fixed-point, not convergence-tested) —
    same as pagerank_integer's unrolled rounds. Finally each vector's
    int8 quantization dots the iterate IN-PLAN: one zip_with/
    aggregate expression, zero shuffle, no UDF.

    Driver state is d² longs + the d-vector (the centroid
    discipline); the corpus passes: one for G, one for projections.
    Output: (id_col, proj bigint).
    """
    rows = int8_gram(df, id_col, vec_col, dims).collect()
    G = [[0] * dims for _ in range(dims)]
    for r in rows:
        G[r["i"] - 1][r["j"] - 1] = r["sxy"]
        G[r["j"] - 1][r["i"] - 1] = r["sxy"]
    v = [scale] * dims
    for _ in range(rounds):
        u = [sum(G[i][j] * v[j] for j in range(dims)) for i in range(dims)]
        m = max(abs(x) for x in u)
        if m == 0:
            break  # zero matrix: keep the uniform direction
        v = [
            -((-x * scale) // m) if x < 0 else (x * scale) // m for x in u
        ]
    q = int8_quantize(df, id_col, vec_col).select(
        F.col(id_col), F.slice("q", 1, dims).alias("_q")
    )
    vlit = lit_long_array(v)
    proj = F.aggregate(
        F.zip_with(F.col("_q"), vlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return q.select(F.col(id_col), proj.alias("proj"))


def cosine_topk_batch(
    emb: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
):
    """BATCHED brute-force cosine top-k — the real serving/eval shape
    (a query arrives in batches, recall sweeps score hundreds of
    probes): one corpus scan answers ALL queries. The query batch
    rides as a plan-literal array of (query_id, vector) structs
    (the centroid/LSH-plane discipline — KB-scale, no join, so the
    plan has no BroadcastNestedLoopJoin for the cross product);
    explode fans each corpus row out to per-query scores, and the
    per-query top-k is a rank window — WindowGroupLimit trims every
    map task to k rows per query BEFORE the single query_id exchange,
    so shuffle volume is #queries·k per task, never #queries·corpus.

    One scan, one bounded exchange, at any corpus size; for larger
    query batches the same plan holds until the literal array stops
    fitting the plan (~thousands), after which the LSH-bucketed
    probe (`neardup_probe`/`ann_topk_lsh` family) is the path.

    Output: (query_id, id_col, cos_sim, rn) with rn 1..k per query.
    """
    from pyspark.sql import Window

    qarr = F.array(
        *[
            F.struct(
                F.lit(int(qid)).cast("long").alias("query_id"),
                lit_vec(v).alias("qv"),
            )
            for qid, v in queries
        ]
    )
    ex = emb.select(F.col(id_col), _dvec(vec_col).alias("_v")).select(
        id_col, "_v", F.explode(qarr).alias("q")
    )
    scored = ex.select(
        F.col("q.query_id").alias("query_id"),
        F.col(id_col),
        stable_round(cosine(F.col("_v"), F.col("q.qv")), 4).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", id_col, "cos_sim", F.col("rn").cast("bigint").alias("rn"))
    )


def random_projection_int(
    df: DataFrame,
    id_col: str = "vec_id",
    out_dims: int = 4,
    vec_col: str = "embedding",
    dims: int = 16,
    seed: str = "jl",
):
    """Johnson-Lindenstrauss dimensionality reduction with an
    Achlioptas ±1 projection — the cheap distance-preserving shrink
    embedding pipelines run before LSH/clustering when vectors are
    wide. INTEGER-exact end to end: inputs are the int8 quantization,
    and the projection matrix entries r[j][k] ∈ {-1, 0, +1} derive
    from the engine-portable 60-bit md5 idiom
    (md5(seed#j#k) mod 3 − 1), so the DuckDB oracle re-derives the
    SAME matrix from the same strings — no RNG, no shipped state,
    reruns and engines agree bit-for-bit.

    The matrix folds into the plan as literals (out_dims × dims
    ints); each output coordinate is one zip_with/aggregate fold —
    zero shuffle, zero UDF, one scan. Output: (id_col, p1..p{out_dims}
    bigint scalars — scalar columns, not an array, so downstream
    hash-verification and parquet stats both work)."""
    import hashlib

    def r(j: int, k: int) -> int:
        h = hashlib.md5(f"{seed}#{j}#{k}".encode()).hexdigest()[:15]
        return int(h, 16) % 3 - 1

    q = int8_quantize(df, id_col, vec_col).select(
        F.col(id_col), F.slice("q", 1, dims).alias("_q")
    )
    outs = []
    for k in range(1, out_dims + 1):
        col = lit_long_array([r(j, k) for j in range(1, dims + 1)])
        outs.append(
            F.aggregate(
                F.zip_with(F.col("_q"), col, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias(f"p{k}")
        )
    return q.select(F.col(id_col), *outs)


def derived_pq_codebooks(
    m: int = 8,
    k: int = 16,
    dsub: int = 8,
    scale: int = 10000,
    seed: str = "pq",
) -> list[list[list[int]]]:
    """Deterministic product-quantization codebooks: centroid element
    (s, c, e) derives from the engine-portable md5 idiom
    (md5(seed#s#c#e) mod (2·scale+1) − scale) — no RNG, no shipped
    state, reruns agree bit-for-bit and the oracle embeds the same
    values (generated from this function at import). Real TRAINED
    codebooks come from the same per-subspace k-means machinery
    already proven integer-exact (kmeans_assign/group_centroids) and
    drop into pq_encode/pq_adc_topk unchanged — the derived books keep
    the encode/ADC oracle closed-form. Shape: m × k × dsub ints in
    [−scale, scale], the same range as the shared _quantize output."""
    import hashlib

    def v(s: int, c: int, e: int) -> int:
        h = hashlib.md5(f"{seed}#{s}#{c}#{e}".encode()).hexdigest()[:15]
        return int(h, 16) % (2 * scale + 1) - scale

    return [
        [[v(s, c, e) for e in range(dsub)] for c in range(k)]
        for s in range(m)
    ]


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
) -> DataFrame:
    """Product-quantization ENCODE — the memory half of large-scale
    ANN (Jégou et al. 2011): split each vector into m subvectors,
    store only each subvector's nearest-codebook-centroid index. m
    single-byte-ish codes replace d floats — the ~100× shrink that
    decides whether a 100 TB embedding corpus's index fits executor
    memory. Distances are sums of integer squares over the shared
    _quantize grid (bit-identical across engines — a float argmin can
    flip at the boundary); ties break to the smaller code via struct
    ordering.

    Plan shape: codebooks fold into the plan as literals (m·k·dsub
    ints — KBs for real PQ sizes); the encode is a chain of NARROW
    projections (quantize → subvector slices → per-subspace argmin
    structs → codes), each stage materializing what the next
    references more than once, so the per-row work is exactly
    m·k·dsub integer ops — zero shuffle, zero join, zero UDF at any
    corpus size. Output: (id_col, codes array<int>, d2_total bigint —
    the total quantization error, the index-quality audit number)."""
    m = len(codebooks)
    if m == 0:
        raise ValueError("need at least one codebook")
    k = len(codebooks[0])
    dsub = len(codebooks[0][0])
    for s, book in enumerate(codebooks):
        if len(book) != k or any(len(c) != dsub for c in book):
            raise ValueError(f"ragged codebook at subspace {s}")

    p1 = emb.select(F.col(id_col), _quantize(vec_col, scale).alias("__xq"))
    p2 = p1.select(
        F.col(id_col),
        *[
            F.slice("__xq", s * dsub + 1, dsub).alias(f"__s{s}")
            for s in range(m)
        ],
    )

    # per-subspace best struct materialized once: "code" and "d2" are
    # both read below, and array_min's argument tree is non-cheap.
    # One-parse SQL form (see _pq_best_sql) — the per-element-literal
    # Column build dominated this operator's wall at every SF.
    p3 = p2.select(
        F.col(id_col),
        *[
            F.expr(_pq_best_sql(f"`__s{s}`", codebooks[s])).alias(
                f"__b{s}"
            )
            for s in range(m)
        ],
    )
    total = F.col("__b0.d2")
    for s in range(1, m):
        total = total + F.col(f"__b{s}.d2")
    return p3.select(
        F.col(id_col),
        F.array(*[F.col(f"__b{s}.code") for s in range(m)]).alias("codes"),
        total.cast("bigint").alias("d2_total"),
    )


def pq_adc_lut(
    query_q: list[int], codebooks: list[list[list[int]]]
) -> list[list[int]]:
    """Asymmetric-distance lookup table: LUT[s][c] = integer squared
    distance between the query's s-th QUANTIZED subvector and codebook
    centroid c. Driver-side, m·k longs — the per-query precompute
    that makes scoring a code a table lookup instead of a d-dim
    distance."""
    m, dsub = len(codebooks), len(codebooks[0][0])
    if len(query_q) != m * dsub:
        raise ValueError(
            f"query dim {len(query_q)} != m*dsub {m * dsub}"
        )
    return [
        [
            sum(
                (query_q[s * dsub + e] - cvec[e]) ** 2
                for e in range(dsub)
            )
            for cvec in codebooks[s]
        ]
        for s in range(m)
    ]


def pq_adc_topk(
    emb: DataFrame,
    query_q: list[int],
    codebooks: list[list[list[int]]],
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
) -> DataFrame:
    """PQ asymmetric-distance top-k — the serving half: score every
    vector's m-byte CODE against the query's per-subspace lookup
    table (pq_adc_lut) and keep the k best. At 100 TB this is the
    difference between scanning codes (m bytes/vector) and scanning
    vectors (d floats/vector); the scan itself is one narrow
    projection (encode chain + an m-step zip_with fold over literal
    LUT arrays), and the ONLY data movement is TakeOrderedAndProject's
    per-partition top-k heaps + driver merge — no global sort, no
    shuffle of the corpus. Deterministic (score, id) ordering.
    Output: (id_col, codes array<int>, adc_score bigint)."""
    lut = pq_adc_lut(query_q, codebooks)
    coded = pq_encode(emb, codebooks, id_col, vec_col, scale)
    lut_lit = F.array(
        *[
            lit_long_array(row)
            for row in lut
        ]
    )
    score = F.aggregate(
        F.zip_with(
            F.col("codes"), lut_lit, lambda c, row: F.element_at(row, c + 1)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        coded.select(
            F.col(id_col), F.col("codes"), score.alias("adc_score")
        )
        .orderBy(F.col("adc_score").asc(), F.col(id_col).asc())
        .limit(topk)
    )


def ivf_pq_topk(
    emb: DataFrame,
    query_q: list[int],
    coarse: Sequence[tuple[int, Sequence[int]]],
    codebooks: list[list[list[int]]],
    nprobe: int = 2,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10000,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the FAISS-standard shape for
    ANN over corpora that dwarf memory: the coarse quantizer
    (``coarse``: the same (label, int-centroid) table
    nearest_centroid_assign takes) prunes the corpus to the
    ``nprobe`` inverted lists nearest the query, and within those
    lists each vector's RESIDUAL (vector − its list centroid) is
    PQ-coded and scored against a per-list asymmetric-distance LUT
    (the query's residual differs per probed list, so the driver
    precomputes nprobe LUTs — nprobe·m·k longs).

    Everything is integer-exact on the shared quantization grid:
    coarse argmin, probe ranking (d2 asc, label asc), residuals,
    code argmins, ADC sums — bit-identical across engines. Plan
    shape: coarse centroids, codebooks, and the LUTs all fold in as
    literals (a literal MAP keyed by list label routes each row to
    its list's centroid and LUT); the whole scoring path is narrow
    projections + one Filter (assigned ∈ probed — at scale this is
    the partition-pruning dimension), and the only data movement is
    TakeOrderedAndProject's heaps. Output: (id_col, assigned,
    adc_score), deterministic (score, id) order."""
    m = len(codebooks)
    k = len(codebooks[0])
    dsub = len(codebooks[0][0])
    if len(query_q) != m * dsub:
        raise ValueError(f"query dim {len(query_q)} != m*dsub {m * dsub}")
    # driver: probe the nprobe nearest lists, then one LUT per list
    ranked = sorted(
        (
            sum((q - c) ** 2 for q, c in zip(query_q, cvec)),
            int(label),
            cvec,
        )
        for label, cvec in coarse
    )
    probed = ranked[:nprobe]
    luts = {
        label: pq_adc_lut(
            [q - c for q, c in zip(query_q, cvec)], codebooks
        )
        for _, label, cvec in probed
    }
    cent_map = F.create_map(
        *[
            x
            for label, cvec in coarse
            for x in (
                F.lit(int(label)).cast("int"),
                lit_long_array(cvec),
            )
        ]
    )
    lut_map = F.create_map(
        *[
            x
            for label, lut in sorted(luts.items())
            for x in (
                F.lit(int(label)).cast("int"),
                F.array(
                    *[
                        lit_long_array(row)
                        for row in lut
                    ]
                ),
            )
        ]
    )

    p1 = emb.select(F.col(id_col), _quantize(vec_col, scale).alias("__xq"))
    p2 = p1.select(
        F.col(id_col),
        F.col("__xq"),
        F.array_min(_centroid_dists(F.col("__xq"), coarse)).alias("__best"),
    )
    p3 = p2.select(
        F.col(id_col),
        F.col("__best.assigned").cast("int").alias("assigned"),
        F.zip_with(
            F.col("__xq"),
            F.element_at(cent_map, F.col("__best.assigned").cast("int")),
            lambda a, b: a - b,
        ).alias("__res"),
    ).filter(F.col("assigned").isin([label for _, label, _ in probed]))
    p4 = p3.select(
        F.col(id_col),
        F.col("assigned"),
        *[
            F.slice("__res", s * dsub + 1, dsub).alias(f"__s{s}")
            for s in range(m)
        ],
    )

    # one-parse SQL argmin per subspace (see _pq_best_sql)
    p5 = p4.select(
        F.col(id_col),
        F.col("assigned"),
        *[
            F.expr(
                f"({_pq_best_sql(f'`__s{s}`', codebooks[s])}).code"
            ).alias(f"__c{s}")
            for s in range(m)
        ],
    )
    row_lut = F.element_at(lut_map, F.col("assigned"))
    score = F.aggregate(
        F.zip_with(
            F.array(*[F.col(f"__c{s}") for s in range(m)]),
            row_lut,
            lambda c, row: F.element_at(row, c + 1),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        p5.select(
            F.col(id_col), F.col("assigned"), score.alias("adc_score")
        )
        .orderBy(F.col("adc_score").asc(), F.col(id_col).asc())
        .limit(topk)
    )


def bitext_margin_pairs(
    src: DataFrame,
    tgt: DataFrame,
    planes: Sequence[Sequence[float]],
    k: int = 4,
    margin_milli: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bitext mining: align two embedding corpora (source/target
    language sentences encoded in a shared space) by MUTUAL best match
    with a margin criterion — the Artetxe & Schwenk (2019) ratio
    margin, cos(x, y) / mean(top-k neighborhood of BOTH sides), which
    suppresses hubs that plain cosine thresholds mine as false pairs.
    This is how parallel corpora for translation pretraining are mined
    from web-scale monolingual dumps (CCMatrix et al.).

    Spark-first shape: the quadratic candidate space is LSH-BLOCKED —
    both sides bucket by hyperplane signs (a projection), candidates
    come from ONE equi-join on the bucket key, so work is
    sum-of-bucket-products, never |src|x|tgt|. Per-side neighborhood
    stats are rank windows + groupBys on the SAME key (the window's
    exchange is reused by the aggregate). No collects, no UDFs, no
    cartesian: at 100 TB the plane count grows log2(N) like
    semantic_dedup_keep's, holding per-bucket work flat.

    INTEGER-EXACT scoring: pair cosines land as e4 integers
    (floor(cos*1e4 + 0.5), the stable_round formula), neighborhood
    sums stay integral, and the margin is one BIGINT expression —
    margin_milli = cos_e4 * 2000 * a_k * b_k
                   div (a_sum * b_k + b_sum * a_k)
    (the k-normalized two-side mean folded into a single division) —
    so an oracle reproduces every value bit-for-bit; no float drift,
    no truncate-vs-floor edge (non-positive cosines are dropped from
    the candidate set first, standard in margin mining, making every
    operand positive). Numerators cap at 1e4*2000*k^2 — far inside
    BIGINT.

    Returns (src_id, tgt_id, cos_e4, margin_milli): each src's best
    target where the match is mutual and the margin clears the
    threshold (1000 = best exactly at its neighborhood mean).
    """
    pairs = _bitext_candidates(src, tgt, planes, id_col, vec_col)
    return _bitext_margin_from(pairs, k, margin_milli)


def _bitext_candidates(
    src: DataFrame,
    tgt: DataFrame,
    planes: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-blocked candidate pairs with integer e4 cosines — the
    shared front half of bitext_margin_pairs / bitext_hard_negatives
    (see bitext_margin_pairs for the full scale/exactness story).

    The in-bucket pair cosines are the dominant CPU (dim multiplies
    per candidate in interpreted HOF eval), and on a broadcastable
    ``tgt`` the planner computes them in the PROBE side's partitions
    — which for an unsplittable single-row-group source is ONE task
    (r13 bench: 2.6 s wall / 1.6 s cpu, nearly serial). The gated
    cpu_fan_out repartition of ``src`` spreads the probe side across
    cores; a many-split real corpus keeps the heuristic false and
    the plan unchanged (same rule as minhash_dedup_pairs)."""
    from mongodb_etl_migration_spark.operators.text import cpu_fan_out

    src = cpu_fan_out(src)

    def bucketed(df: DataFrame, side: str) -> DataFrame:
        b = df.select(
            F.col(id_col).alias(f"{side}_id"),
            _dvec(vec_col).alias(f"{side}_v"),
            hyperplane_bucket(vec_col, planes).alias("bucket"),
        )
        return b.select(
            f"{side}_id",
            f"{side}_v",
            "bucket",
            norm(f"{side}_v").alias(f"{side}_n"),
        )

    pairs = (
        bucketed(src, "src")
        .join(bucketed(tgt, "tgt"), "bucket")
        .select(
            "src_id",
            "tgt_id",
            F.floor(
                dot("src_v", "tgt_v")
                / (F.col("src_n") * F.col("tgt_n"))
                * 10000
                + 0.5
            )
            .cast("bigint")
            .alias("cos_e4"),
        )
        .filter(F.col("cos_e4") > 0)
        # both rank sides (src windows, tgt windows) consume this
        # frame: without a materialization the bucket join + every
        # pair cosine would be evaluated TWICE (the r9-advice
        # duplicated-subtree lesson). Lazy localCheckpoint computes
        # the candidate set once; at scale that halves the dominant
        # cost (the in-bucket dot products).
        .localCheckpoint(eager=False)
    )
    return pairs


def _bitext_margin_from(
    pairs: DataFrame, k: int, margin_milli: int
) -> DataFrame:
    """Mutual-best margin selection over a candidate frame (the back
    half of bitext_margin_pairs; also consumed by
    bitext_hard_negatives so mined pairs and their negatives derive
    from ONE materialized candidate set)."""
    from pyspark.sql import Window

    w_src = Window.partitionBy("src_id").orderBy(
        F.desc("cos_e4"), F.asc("tgt_id")
    )
    a = (
        pairs.withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") <= k)
        .groupBy("src_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("tgt_id"))).alias(
                "best_tgt"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("cos_e4"))).alias(
                "best_cos"
            ),
            F.sum("cos_e4").alias("a_sum"),
            F.count("*").alias("a_k"),
        )
    )
    w_tgt = Window.partitionBy("tgt_id").orderBy(
        F.desc("cos_e4"), F.asc("src_id")
    )
    b = (
        pairs.withColumn("rn", F.row_number().over(w_tgt))
        .filter(F.col("rn") <= k)
        .groupBy("tgt_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("src_id"))).alias(
                "best_src"
            ),
            F.sum("cos_e4").alias("b_sum"),
            F.count("*").alias("b_k"),
        )
    )
    return (
        a.join(b, a["best_tgt"] == b["tgt_id"])
        .filter(F.col("best_src") == F.col("src_id"))
        .select(
            F.col("src_id").cast("bigint").alias("src_id"),
            F.col("best_tgt").cast("bigint").alias("tgt_id"),
            F.col("best_cos").cast("bigint").alias("cos_e4"),
            F.expr(
                "best_cos * 2000 * a_k * b_k div (a_sum * b_k + b_sum * a_k)"
            )
            .cast("bigint")
            .alias("margin_milli"),
        )
        .filter(F.col("margin_milli") >= margin_milli)
    )


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    planes: Sequence[Sequence[float]],
    k: int = 4,
    n_neg: int = 3,
    margin_milli: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """The contrastive-training workflow in one call: (mined_pairs,
    hard_negatives) sharing ONE materialized candidate frame and ONE
    margin selection — a pipeline producing positives AND negatives
    must not pay the LSH bucket join, the pair cosines, and the
    margin windows twice (r10 code-review finding; the single-output
    wrappers below recompute when called separately).

    ``mined_pairs`` is bitext_margin_pairs' output; it is ALSO
    lazily localCheckpointed here because both the returned frame and
    the negatives' semi-join consume it. ``hard_negatives`` holds the
    next-best ``n_neg`` same-bucket targets per mined src (ranks
    2..n_neg+1 — rank 1 IS the mined translation, excluded by
    construction: mutual-best means the mined tgt is the top-ranked
    candidate) as (src_id, neg_id, cos_e4, neg_rank), neg_rank 1 =
    hardest. The highest-similarity NON-translations are exactly what
    embedding-model training wants as negatives (random negatives are
    too easy; these sit just under the decision boundary). Srcs whose
    bucket held no runner-up emit nothing. Integer-exact like the
    miner.
    """
    from pyspark.sql import Window

    pairs = _bitext_candidates(src, tgt, planes, id_col, vec_col)
    mined = _bitext_margin_from(pairs, k, margin_milli).localCheckpoint(
        eager=False
    )
    w_src = Window.partitionBy("src_id").orderBy(
        F.desc("cos_e4"), F.asc("tgt_id")
    )
    ranked = pairs.withColumn("rn", F.row_number().over(w_src)).filter(
        (F.col("rn") >= 2) & (F.col("rn") <= n_neg + 1)
    )
    negatives = ranked.join(mined.select("src_id"), "src_id").select(
        F.col("src_id").cast("bigint").alias("src_id"),
        F.col("tgt_id").cast("bigint").alias("neg_id"),
        F.col("cos_e4").cast("bigint").alias("cos_e4"),
        (F.col("rn") - 1).cast("bigint").alias("neg_rank"),
    )
    return mined, negatives


def bitext_hard_negatives(
    src: DataFrame,
    tgt: DataFrame,
    planes: Sequence[Sequence[float]],
    k: int = 4,
    n_neg: int = 3,
    margin_milli: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Negatives-only wrapper over :func:`bitext_mine` (see there for
    semantics and the shared-candidate-frame scale story). Pipelines
    that also need the mined pairs should call bitext_mine directly
    instead of pairing this with bitext_margin_pairs."""
    return bitext_mine(
        src, tgt, planes, k, n_neg, margin_milli, id_col, vec_col
    )[1]
