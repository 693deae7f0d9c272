"""Deterministic sampling for training-data pipelines.

Big-corpus pipelines never sample with RNG: a rerun must pick the SAME
rows (replayable lineage, cacheable shards, stable eval sets). The
standard trick is hash-gating — a row is in the sample iff a stable
hash of its key lands under the cut. Everything here is pure Column
arithmetic on a 60-bit md5 prefix (15 hex digits, portable:
Spark ``conv(hex,16,10)`` == DuckDB ``('0x'||hex)::BIGINT`` — same
idiom as operators/dedup.py's MinHash family). Gates compare in
INTEGER space (``h < floor(fraction * 2^60)``), never via float
division, so engine-boundary rounding can't flip a row at the cut.

Scale: ``deterministic_sample`` / ``train_test_split`` are narrow
(filter-only — at 100 TB they read and drop, no exchange);
``stratified_take`` shuffles once on the strata and uses the same
rank-window shape as top-k (WindowGroupLimit pushes the per-stratum
limit map-side, so the exchange carries ~n rows per stratum per map
task, not the corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit hash space (15 hex digits of md5)
_SPACE = 1 << 60


def hash_key(key: Column | str, salt: str = "") -> Column:
    """Stable uniform 60-bit integer per key (bigint in [0, 2^60)).
    ``salt`` decorrelates independent sampling decisions over the same
    key space (a sample of a sample stays uniform).

    CONTRACT: the key should be NON-NULL and row-unique (a document
    id). Same key ⇒ same hash by design, which means ALL NULL keys
    share one sampling decision (concat_ws skips NULLs, so they hash
    as the bare salt) — an all-in-or-all-out block, not a uniform
    sample. Filter or surrogate NULL keys upstream."""
    col = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.lit(salt), col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def cut(fraction: float) -> int:
    """Integer gate threshold for a [0,1] fraction."""
    return int(fraction * _SPACE)


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hash gate — reproducible
    across runs/engines, unlike ``df.sample`` (RNG, partition-layout
    dependent)."""
    return df.filter(hash_key(key, salt) < F.lit(cut(fraction)))


def train_test_split(
    df: DataFrame, key: str, test_fraction: float, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """(train, test) by hash gate — disjoint, exhaustive, and stable:
    a row never migrates between splits when the corpus grows."""
    h = hash_key(key, salt)
    c = F.lit(cut(test_fraction))
    return df.filter(h >= c), df.filter(h < c)


def weighted_mix(
    df: DataFrame,
    key: str,
    group_col: str,
    rates: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Per-group sampling rates in one pass — the data-mixture step
    that reweights a corpus before training (e.g. keep all of a
    high-quality source, 10 % of a crawl). Each group's rate becomes
    an integer hash gate via a CASE over ``group_col``; groups absent
    from ``rates`` drop entirely (an explicit mixture, not a default).

    Narrow filter only — zero shuffle at any scale, and the same row
    set survives regardless of partition layout or rerun (hash-gated,
    not RNG). Rates compose: mixing then re-sampling with a different
    salt stays uniform within each group."""
    c = F.col(group_col).cast("string")
    gate = None
    for g, frac in sorted(rates.items()):
        branch = (c == g, F.lit(cut(frac)))
        gate = F.when(*branch) if gate is None else gate.when(*branch)
    if gate is None:
        raise ValueError("weighted_mix needs at least one group rate")
    return df.filter(hash_key(key, salt) < gate.otherwise(F.lit(0)))


def stratified_take(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    key: str,
    salt: str = "",
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, picked by hash order
    (deterministic "uniform without replacement" within each stratum —
    quota sampling for balanced training mixes). Rank window ordered by
    (hash, key): WindowGroupLimit keeps each map task's top-n before
    the shuffle.

    Determinism requires ``key`` to be unique WITHIN each stratum
    (hash_key's contract): two rows sharing a key value tie on the
    whole sort key and row_number breaks the tie by partition layout.
    Dedup or extend the key upstream when it can repeat."""
    w = Window.partitionBy(*strata).orderBy(hash_key(key, salt), F.col(key))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def temperature_mix(
    df: DataFrame,
    key: str,
    group_col: str,
    budget: int,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled corpus mixing (α = 0.5): per-group sampling
    probability ∝ n_g^α — the multilingual/multi-domain rebalancing
    step (XLM-R, mT5, DoReMi-style static mixtures) that upsamples
    small domains relative to their share while keeping big domains
    dominant in absolute terms. ``budget`` is the target TOTAL kept
    rows; group g keeps ≈ budget · √n_g / Σ√n (capped at all of g).

    Every quantity is INTEGER-exact so the gate is engine-portable:
    √n via isqrt(n·10⁴) (floor(sqrt(double)) is provably exact here —
    the 0.5-ulp error of a correctly-rounded sqrt is orders below the
    1/(2m) distance to the next integer for n·10⁴ < 2^52), the
    normalizer is an integer SUM (order-free, unlike a float Σ), and
    the per-group cut is one floor division in arbitrary precision:
    cut_g = min(2^60, 2^60 · budget · √n_g ÷ (Σ√n · n_g)).

    Plan shape: one tiny count aggregate collected to the driver
    (O(#groups) — the k-means-centroids discipline), then the same
    zero-shuffle CASE hash-gate as weighted_mix. Rerun-stable,
    layout-independent, composes with other salted gates."""
    import math

    # group keys are collected AS the same string cast the gate
    # compares against — a boolean/decimal group column's Spark
    # rendering ('true', '1.50') would otherwise never match Python's
    # str() and silently drop the corpus. NULL keys form their own
    # group, gated with an isNull branch.
    c = F.col(group_col).cast("string")
    counts = {
        row[0]: row[1]
        for row in df.groupBy(c.alias("__g")).agg(F.count("*")).collect()
    }
    if not counts:
        return df.filter(F.lit(False))
    sq = {g: math.isqrt(n * 10_000) for g, n in counts.items()}
    total = sum(sq.values())
    cuts = {
        g: min(_SPACE, _SPACE * budget * sq[g] // (total * counts[g]))
        for g in counts
    }
    gate = None
    for g, cut_g in sorted(
        cuts.items(), key=lambda kv: (kv[0] is None, kv[0] or "")
    ):
        branch = (c.isNull() if g is None else (c == g), F.lit(cut_g))
        gate = F.when(*branch) if gate is None else gate.when(*branch)
    return df.filter(hash_key(key, salt) < gate.otherwise(F.lit(0)))


def temperature_mix_tokens(
    df: DataFrame,
    key: str,
    group_col: str,
    tokens_col: str,
    budget_tokens: int,
    salt: str = "temptok",
) -> DataFrame:
    """Token-weighted temperature mixing (α = 0.5): the same gate as
    temperature_mix with every quantity measured in TOKENS — the unit
    training budgets are actually set in (a domain of few LONG
    documents must not be upsampled like a domain of many short
    ones, which doc-count weighting does). Group g keeps each doc
    with probability budget·√T_g / (Σ√T · T_g), so its EXPECTED kept
    tokens ≈ budget·√T_g/Σ√T; documents are hash-gated whole (an
    exact-token cut would have to split documents — the loader's
    packing stage already handles sub-document granularity).

    Integer-exact like temperature_mix: isqrt(T·10⁴) (exact as long
    as a group's T·10⁴ < 2^52 ≈ 450 G tokens — past that the oracle's
    floor(sqrt(double)) and Python's isqrt may differ by 1 ulp; shard
    the mix per corpus slice before then), integer-sum normalizer,
    one arbitrary-precision floor division per group. Plan: one
    O(#groups) token-sum collect, then the zero-shuffle CASE
    hash-gate. Groups with zero/NULL token totals keep nothing."""
    import math

    c = F.col(group_col).cast("string")
    rows = (
        df.groupBy(c.alias("__g"))
        .agg(
            F.sum(F.coalesce(F.col(tokens_col), F.lit(0)))
            .cast("long")
            .alias("__t")
        )
        .collect()
    )
    totals = {r[0]: int(r[1] or 0) for r in rows}
    sq = {g: math.isqrt(t * 10_000) for g, t in totals.items() if t > 0}
    if not sq:
        return df.filter(F.lit(False))
    tot = sum(sq.values())
    cuts = {
        g: min(
            _SPACE, _SPACE * budget_tokens * sq[g] // (tot * totals[g])
        )
        for g in sq
    }
    gate = None
    for g, cut_g in sorted(
        cuts.items(), key=lambda kv: (kv[0] is None, kv[0] or "")
    ):
        branch = (c.isNull() if g is None else (c == g), F.lit(cut_g))
        gate = F.when(*branch) if gate is None else gate.when(*branch)
    return df.filter(hash_key(key, salt) < gate.otherwise(F.lit(0)))
