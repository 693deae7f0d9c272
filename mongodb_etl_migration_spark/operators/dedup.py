"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a document
table — the standard large-corpus dedup ladder. All hashing is md5
(lowercase hex, identical in Spark and DuckDB) and all "min" choices
are lexicographic, so every stage is deterministic and oracle-checkable.

Scale design notes (100 TB):
- exact dedup: one shuffle on the content hash; map-side partial
  aggregation shrinks it to #distinct rows.
- MinHash: shingling is a narrow explode; signatures are one shuffle on
  (doc, seed) collapsed by partial min; LSH banding turns the O(n²)
  pair space into per-bucket self-joins — the only quadratic work is
  inside a bucket, and bucket sizes are bounded by collision rate, not
  corpus size. Hot buckets (boilerplate docs) are the skew risk → AQE
  skew-join handles the bucket self-join.
- SimHash: per-document signature via explode+sum — no pairwise work
  at signature time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mongodb_etl_migration_spark.operators.text import TOKEN_RE, tokens


# ------------------------------------------------------------- exact
def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact dedup via content hash: one representative (min id) per
    distinct content + duplicate count. groupBy = single shuffle with
    map-side combine."""
    return (
        df.select(
            F.col(id_col), F.md5(F.col(content_col)).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count("*").alias("dup_count"),
        )
    )


# ---------------------------------------------------------- shingles
def shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Distinct k-token shingles per document: tokenize (narrow), then
    join consecutive tokens via a per-document lead() window. Output:
    (id_col, shingle)."""
    toked = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    return (
        toked.withColumn("shingle", F.concat_ws(" ", *parts))
        # lead() returns NULL past the end → drop short tails
        .filter(F.size(F.split(F.col("shingle"), " ")) == k)
        .select(id_col, "shingle")
        .distinct()
    )


# ----------------------------------------------------------- MinHash
def minhash_signatures(
    shingle_df: DataFrame, id_col: str, num_hashes: int = 16
) -> DataFrame:
    """MinHash signature per document: hash family h_i(s) =
    md5(i || ':' || s); signature_i = lexicographic min. Output:
    (id_col, seed, sig). One shuffle on (id, seed), collapsed by
    partial min aggregation."""
    seeds = F.explode(
        F.sequence(F.lit(0), F.lit(num_hashes - 1))
    ).alias("seed")
    return (
        shingle_df.select(F.col(id_col), F.col("shingle"), seeds)
        .withColumn(
            "h",
            F.md5(F.concat_ws(":", F.col("seed").cast("string"), F.col("shingle"))),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("sig"))
    )


def lsh_bands(
    sig_df: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature: band_key = md5(concat of the band's sigs in
    seed order). Docs sharing any (band, band_key) are candidates.
    Output: (id_col, band, band_key)."""
    rows_per_band = num_hashes // bands
    return (
        sig_df.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|", F.array_sort(F.collect_list(F.concat_ws("=", F.col("seed").cast("string"), "sig")))
                )
            ).alias("band_key")
        )
    )


def lsh_candidate_pairs(band_df: DataFrame, id_col: str) -> DataFrame:
    """Self-join within buckets → distinct candidate pairs (a<b).
    The join key (band, band_key) keeps the quadratic work inside
    buckets; AQE splits skewed buckets."""
    left = band_df.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_a")
    )
    right = band_df.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_b")
    )
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """End-to-end MinHash-LSH candidate pairs."""
    sh = shingles(df, id_col, text_col, k)
    sig = minhash_signatures(sh, id_col, num_hashes)
    band = lsh_bands(sig, id_col, num_hashes, bands)
    return lsh_candidate_pairs(band, id_col)


# ----------------------------------------------------------- SimHash
def simhash_signature(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """SimHash over word features: bit d of the signature is the sign of
    Σ_tokens (msb of hex digit d of md5(token) ? +1 : −1). ``bits`` ≤ 32
    (one per md5 hex digit). Output: (id_col, simhash string of 0/1).

    Per-document explode + one groupBy — no pairwise computation.
    """
    toked = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok")).withColumn(
        "h", F.md5("tok")
    )
    sums = [
        F.sum(
            F.when(
                F.substring("h", d + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"),
                1,
            ).otherwise(-1)
        ).alias(f"b{d}")
        for d in range(bits)
    ]
    agg = toked.groupBy(id_col).agg(*sums)
    bit_chars = [
        F.when(F.col(f"b{d}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for d in range(bits)
    ]
    return agg.select(F.col(id_col), F.concat(*bit_chars).alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between equal-length 0/1 signature strings,
    computed columnar via position fold (no UDF)."""
    idx = F.sequence(F.lit(1), F.length(a))
    return F.aggregate(
        idx,
        F.lit(0),
        lambda acc, i: acc
        + F.when(a.substr(i, F.lit(1)) != b.substr(i, F.lit(1)), 1).otherwise(0),
    )


# ----------------------------------------------------- n-gram Jaccard
def ngram_jaccard(
    shingle_df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Exact Jaccard over k-gram sets for given candidate pairs —
    the verify stage after LSH. |A∩B| via join on shingle, |A∪B| =
    |A|+|B|−|A∩B|. Output: (id_a, id_b, jaccard)."""
    sizes = shingle_df.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = shingle_df.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingle_df.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
    )
