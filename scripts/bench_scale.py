#!/usr/bin/env python
"""Scale receipt for the dedup/ANN path — the 100×-credibility check
the per-round sf0.1 bench can't give (VERDICT r3 item 8).

Claim under test: in minhash_dedup_pairs / dedup_representatives /
ann_topk_lsh, the expensive moving part (the LSH bucket self-join's
shuffle and output) grows with the DUPLICATE RATE, and only linearly
with corpus size — never quadratically in the corpus. If that holds at
1× → 10× locally, the same plan shape holds at 100 TB, where the
banding stage is a narrow projection and AQE splits any hot bucket.

Method: synthesize corpora from sf0.1's documents by replication —
each replica's words get a replica-unique suffix, so replicas share
NO shingles and add zero cross-replica near-dups (pure corpus growth);
exact dups are then planted at a controlled rate via a hash gate.
Three configs: base (5k docs, 10% dups), x10 (50k docs, 10%), and
x10_dup4x (50k docs, 40%). Embeddings are replicated with per-replica
jitter for the ANN probe.

Run:  python scripts/bench_scale.py          (~3-4 min, local[32])
Writes BENCH_scale.json at the repo root; corpora land under /tmp.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from bench import UiMetrics  # noqa: E402
from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.operators import dedup as D  # noqa: E402
from mongodb_etl_migration_spark.operators import similarity as SIM  # noqa: E402
from mongodb_etl_migration_spark.operators import text as T  # noqa: E402

SF01 = "/root/testdata/sf0.1"
# "planes" grows with log2(corpus): the LSH blocker's bucket count
# must track corpus size to keep BUCKET SIZE (and with it the
# within-bucket quadratic work) constant — 4 planes/16 buckets at 2k
# vectors, 8 planes/256 buckets at 20k. A fixed blocker at 10x corpus
# makes semdedup's within-bucket join grow ~quadratically (measured
# 21x wall before this scaling); this IS the documented operating
# rule, not a tuning hack.
CONFIGS = {
    "base": {"replicas": 1, "dup_pct": 10, "planes": 4},
    "x10": {"replicas": 10, "dup_pct": 10, "planes": 8},
    "x10_dup4x": {"replicas": 10, "dup_pct": 40, "planes": 8},
}


def build_corpus(spark, replicas: int, dup_pct: int, out_dir: str) -> None:
    src = spark.read.parquet(f"{SF01}/documents.parquet").select("doc_id", "text")
    parts = []
    for r in range(replicas):
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit(f"r{r}")),
            ),
            " ",
        )
        parts.append(
            src.select(
                (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"),
                suffixed.alias("text"),
            )
        )
    base = parts[0]
    for p in parts[1:]:
        base = base.unionByName(p)
    dups = base.filter(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(100)) < F.lit(dup_pct)
    ).select((F.col("doc_id") + F.lit(100_000_000)).alias("doc_id"), "text")
    base.unionByName(dups).write.mode("overwrite").parquet(f"{out_dir}/documents")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    eparts = []
    for r in range(replicas):
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * 1_000_000)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x + F.lit(float(r)) * F.lit(0.001)
                ).alias("embedding"),
                "label",
            )
        )
    e = eparts[0]
    for p in eparts[1:]:
        e = e.unionByName(p)
    e.write.mode("overwrite").parquet(f"{out_dir}/embeddings")


def timed(ui: UiMetrics, df) -> dict:
    """One cold + one timed warm run through the noop sink, with the
    warm run's shuffle-byte delta (the number that must scale right)."""
    df.write.format("noop").mode("overwrite").save()
    w0, r0 = ui.shuffle_totals()
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    sec = round(time.time() - t0, 3)
    w1, r1 = ui.shuffle_totals()
    return {"sec": sec, "shuffle_bytes": (w1 - w0) + (r1 - r0)}


def main() -> None:
    spark = get_spark(app_name="bench_scale", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = UiMetrics(spark)
    results: dict[str, dict] = {}

    for name, cfg in CONFIGS.items():
        out_dir = f"/tmp/bench_scale_{name}"
        build_corpus(spark, cfg["replicas"], cfg["dup_pct"], out_dir)
        docs = spark.read.parquet(f"{out_dir}/documents")
        emb = spark.read.parquet(f"{out_dir}/embeddings")
        n_docs = docs.count()

        pairs = D.minhash_dedup_pairs(docs, "doc_id", "text")
        d2 = timed(ui, pairs)
        d2["pairs_found"] = pairs.count()

        reps = D.dedup_representatives(docs, pairs, "doc_id")
        d7 = timed(ui, reps)
        d7["survivors"] = reps.count()

        planes = [
            r["embedding"]
            for r in emb.filter(
                F.col("vec_id").isin(list(range(1, cfg["planes"] + 1)))
            ).orderBy("vec_id").collect()
        ]
        qvec = emb.filter(F.col("vec_id") == 0).head()["embedding"]
        topk = SIM.ann_topk_lsh(emb, qvec, planes, k=10)
        lsh = timed(ui, topk)

        # SemDeDup at scale: the jittered replicas are planted
        # near-dups (cosine ~1 with their base vector, same LSH
        # bucket); shuffle is the bucket self-join — linear in corpus.
        sem = SIM.semantic_dedup_keep(emb, planes, threshold=0.999)
        sd = timed(ui, sem)
        sd["survivors"] = sem.count()

        # Bloom decontamination at scale: eval set FIXED (base-replica
        # slice) while the corpus grows 10x; replicas share no grams,
        # so contamination — and with it the confirm join's shuffle —
        # must stay ~flat as the corpus grows. That flatness is the
        # "shuffle tracks contamination, not corpus" claim, measured.
        evals = docs.filter(
            (F.col("doc_id") < 1_000_000)
            & (F.pmod(F.col("doc_id"), F.lit(97)) == F.lit(0))
        )
        train = docs.join(evals.select("doc_id"), "doc_id", "left_anti")
        cont = T.decontaminate_bloom(train, evals, "doc_id", "text", n=3)
        bl = timed(ui, cont)
        bl["contaminated"] = cont.count()

        # Inverted index at scale: shuffle is the distinct (doc, term)
        # set — linear in corpus (replica-suffixed words grow the
        # vocabulary with the corpus); bounded postings keep stopword
        # aggregation state fixed regardless of df.
        inv = T.inverted_index(docs, "doc_id", "text", min_df=2, max_postings=20)
        ii = timed(ui, inv)
        ii["terms"] = inv.count()

        # Rare-bigram scoring at scale: shuffle is the exploded bigram
        # set (window count + per-doc rollup) — linear in corpus.
        rbt = timed(ui, T.rare_bigram_stats(docs, "doc_id", "text", min_count=10))

        # ExactSubstr duplicated spans at scale: shuffle is the
        # exploded k-gram fingerprint set — linear in corpus (replicas
        # share no k-grams); spans found track the PLANTED duplicate
        # rate (each planted dup doubles its doc's windows corpus-wide).
        spans = T.duplicated_spans(docs, "doc_id", "text", k=8)
        ds = timed(ui, spans)
        ds["spans"] = spans.count()

        # Linear classifier at scale: the vocabulary grows WITH the
        # corpus (per-replica suffixed weight terms — the real-world
        # shape where a 10x corpus ships a bigger trained vocab); the
        # weight relation stays broadcast, and the plan's one shuffle
        # (per-doc margin sum) is linear in matched tokens + one
        # sentinel row per doc.
        vocab = {
            f"{t}r{r}": wt
            for t, wt in T.QUALITY_CLASSIFIER_WEIGHTS.items()
            for r in range(cfg["replicas"])
        }
        cls = T.classifier_margin(docs, "doc_id", "text", weights=vocab)
        cm = timed(ui, cls)
        cm["vocab_terms"] = len(vocab)
        cm["kept"] = cls.filter(F.col("keep")).count()

        # BPE training at scale: the corpus is touched once (word
        # count); every round then runs on the vocabulary (here the
        # replica-suffixed vocab grows with the corpus, the worst
        # case) with a 1-row argmax collect per round — shuffle is
        # the word-count exchange + rounds x vocab-sized aggregates,
        # never corpus x rounds.
        def timed_train():
            w0, r0 = ui.shuffle_totals()
            t0 = time.time()
            mg, vocab = T.bpe_train(docs, "text", n_merges=4)
            nv = vocab.count()
            return {
                "sec": round(time.time() - t0, 3),
                "shuffle_bytes": sum(
                    a - b
                    for a, b in zip(ui.shuffle_totals(), (w0, r0))
                ),
                "merges": len(mg),
                "vocab": nv,
            }

        bt = timed_train()

        # PQ at scale: codebooks are plan literals and the encode is
        # narrow — shuffle must be ZERO at any corpus size; ADC top-k
        # moves only per-partition heaps (TakeOrderedAndProject).
        cbq = SIM.derived_pq_codebooks(4, 8, 4, seed="pqscale")
        emb16 = emb.select(
            "vec_id", F.slice("embedding", 1, 16).alias("embedding")
        )
        pqm = timed(ui, SIM.pq_encode(emb16, cbq))
        pqm["vectors"] = emb16.count()

        # Language-ID classifier at scale: the gram explode is narrow
        # and the weight relation is broadcast and FIXED (a lid model
        # does not grow with the corpus); the plan's one exchange
        # carries one (doc, k sums) row per doc per map task —
        # shuffle linear in docs.
        lid = T.lang_id_ngram(docs, "doc_id", "text")
        lm = timed(ui, lid)
        lm["docs"] = lid.count()

        # Hash-bucketed variant: the broadcast relation is FIXED at
        # <= 2^13 bucket rows no matter the vocabulary; same
        # single-exchange plan, so shuffle must track lang_id_ngram's
        # (linear in docs).
        lidh = T.lang_id_hashed(docs, "doc_id", "text")
        lhm = timed(ui, lidh)
        lhm["docs"] = lidh.count()

        # Sequence packing at scale: the ONLY exchange is the bucket
        # groupBy moving the token stream once — shuffle linear in
        # corpus tokens; per-bucket state bounded by bucket sizing
        # (buckets scale with the corpus here, 32 per replica).
        tok_ids = docs.select(
            "doc_id",
            F.transform(
                T.tokens("text"), lambda t: F.length(t).cast("int")
            ).alias("tid"),
        )
        packed = T.pack_sequences(
            tok_ids, "doc_id", "tid", seq_len=256, eos_id=0,
            n_buckets=32 * cfg["replicas"],
        )
        pk = timed(ui, packed)
        pk["sequences"] = packed.count()

        # Z-order layout at scale: the Morton encode is a narrow
        # projection (zero shuffle on its own); zorder_layout adds one
        # tiny exact-percentile aggregate (bounded driver row) plus
        # the min/max receipt's partial-agg exchange — shuffle is the
        # (file_id, bounds) rows only, far sub-linear in the corpus.
        from mongodb_etl_migration_spark.operators import layout as LO

        dims = docs.select(
            (F.col("doc_id") % 1024).cast("bigint").alias("d1"),
            (F.length("text") % 1024).cast("bigint").alias("d2"),
        )
        laid = LO.zorder_layout(dims, ["d1", "d2"], bits=10, n_files=64)
        zstats = LO.layout_pruning_stats(laid, ["d1", "d2"])
        zm = timed(ui, zstats)
        zm["files"] = zstats.count()

        # Paragraph dedup at scale: every doc carries one corpus-wide
        # boilerplate line plus its body line. The corpus's replica
        # suffixes are DIGITS, which CCNet normalization strips — so
        # body lines are re-tagged with a per-replica LETTER to keep
        # replicas distinct under the digit-stripped hash (the planted
        # exact dups share their source's tag and still vanish).
        # Claim: the paragraph-hash exchange carries (md5, id, idx)
        # only and line TEXT crosses exactly one exchange — shuffle
        # grows linearly in lines; boilerplate survives once.
        rep = (F.col("doc_id") / 1_000_000).cast("int") % 100
        letter = F.element_at(
            F.array(*[F.lit(c) for c in "abcdefghij"]), rep + 1
        )
        pdocs = docs.select(
            "doc_id",
            F.concat(
                F.lit("site boilerplate banner\n"),
                F.col("text"),
                F.lit(" uniq"),
                letter,
            ).alias("text"),
        )
        pd_out = T.dedup_paragraphs(pdocs, "doc_id", "text")
        pdm = timed(ui, pd_out)
        pdm["docs_kept"] = pd_out.count()

        # Graph loops at scale: a deterministic synthetic digraph with
        # 10 out-edges per node (edges ∝ corpus). Claim: per-round
        # shuffle is linear in EDGES for both PageRank and HITS (the
        # rank/score frames stay node-sized and broadcast).
        n_nodes = 2_000 * cfg["replicas"]
        g_edges = (
            spark.range(n_nodes * 10)
            .select(
                (F.col("id") % n_nodes).alias("src"),
                F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
        )
        from mongodb_etl_migration_spark.operators import graph as GR

        # the loops materialize per round via localCheckpoint, so the
        # shuffle happens during CONSTRUCTION — measure around the
        # builder call, not a post-hoc write
        def timed_build(fn):
            w0, r0 = ui.shuffle_totals()
            t0 = time.time()
            out = fn()
            n = out.count()
            sec = round(time.time() - t0, 3)
            w1, r1 = ui.shuffle_totals()
            return {
                "sec": sec,
                "shuffle_bytes": (w1 - w0) + (r1 - r0),
                "nodes": n,
            }

        gp = timed_build(
            lambda: GR.pagerank_integer(g_edges, "src", "dst", iterations=3)
        )
        gh = timed_build(
            lambda: GR.hits_integer(g_edges, "src", "dst", iterations=3)
        )

        results[name] = {
            "docs": n_docs,
            "dup_pct": cfg["dup_pct"],
            "planes": cfg["planes"],
            "vectors": emb.count(),
            "d2_minhash_pairs": d2,
            "d7_representatives": d7,
            "sim_topk_lsh": lsh,
            "sim_semdedup": sd,
            "t_decontaminate_bloom": bl,
            "t_inverted_index": ii,
            "t_rare_bigrams": rbt,
            "t_dup_spans": ds,
            "t_quality_classifier": cm,
            "sim_pq_encode": pqm,
            "t_bpe_train": bt,
            "t_lang_id": lm,
            "t_lang_id_hashed": lhm,
            "t_seq_pack": pk,
            "o6_zorder_layout": zm,
            "g_pagerank": gp,
            "g_hits": gh,
            "t_paragraph_dedup": pdm,
        }
        print(f"{name}: {json.dumps(results[name])}", file=sys.stderr)

    b, x, xd = results["base"], results["x10"], results["x10_dup4x"]
    summary = {
        # corpus 10×, same dup rate: shuffle should grow ~linearly
        # (banding rows ∝ N), NOT quadratically
        "shuffle_growth_at_10x_corpus": round(
            x["d2_minhash_pairs"]["shuffle_bytes"]
            / max(1, b["d2_minhash_pairs"]["shuffle_bytes"]),
            2,
        ),
        # same corpus, 4× dup rate: pair OUTPUT grows with dup rate —
        # the join's work tracks duplication, not corpus volume
        "pair_growth_at_4x_dup_rate": round(
            xd["d2_minhash_pairs"]["pairs_found"]
            / max(1, x["d2_minhash_pairs"]["pairs_found"]),
            2,
        ),
        "wall_growth_at_10x_corpus": round(
            x["d2_minhash_pairs"]["sec"] / max(1e-9, b["d2_minhash_pairs"]["sec"]),
            2,
        ),
        # fixed eval set, 10x corpus: the bloom-confirm shuffle must
        # track contamination (constant by construction), not corpus
        "bloom_shuffle_growth_at_10x_corpus": round(
            x["t_decontaminate_bloom"]["shuffle_bytes"]
            / max(1, b["t_decontaminate_bloom"]["shuffle_bytes"]),
            2,
        ),
        "semdedup_shuffle_growth_at_10x_corpus": round(
            x["sim_semdedup"]["shuffle_bytes"]
            / max(1, b["sim_semdedup"]["shuffle_bytes"]),
            2,
        ),
        # both text-index paths must grow ~linearly (shuffle ∝ rows)
        "inverted_index_shuffle_growth_at_10x_corpus": round(
            x["t_inverted_index"]["shuffle_bytes"]
            / max(1, b["t_inverted_index"]["shuffle_bytes"]),
            2,
        ),
        "rare_bigram_shuffle_growth_at_10x_corpus": round(
            x["t_rare_bigrams"]["shuffle_bytes"]
            / max(1, b["t_rare_bigrams"]["shuffle_bytes"]),
            2,
        ),
        # k-gram fingerprint set ∝ corpus; span OUTPUT ∝ dup rate
        "dup_spans_shuffle_growth_at_10x_corpus": round(
            x["t_dup_spans"]["shuffle_bytes"]
            / max(1, b["t_dup_spans"]["shuffle_bytes"]),
            2,
        ),
        "dup_spans_growth_at_4x_dup_rate": round(
            xd["t_dup_spans"]["spans"] / max(1, x["t_dup_spans"]["spans"]),
            2,
        ),
        # 10x corpus AND 10x vocabulary: margin-sum shuffle ∝ matched
        # tokens (linear), weight relation still broadcast
        "classifier_shuffle_growth_at_10x_corpus": round(
            x["t_quality_classifier"]["shuffle_bytes"]
            / max(1, b["t_quality_classifier"]["shuffle_bytes"]),
            2,
        ),
        # 10x nodes AND edges: per-round shuffle ∝ edges for both
        # iterative graph loops
        "pagerank_shuffle_growth_at_10x_graph": round(
            x["g_pagerank"]["shuffle_bytes"]
            / max(1, b["g_pagerank"]["shuffle_bytes"]),
            2,
        ),
        "hits_shuffle_growth_at_10x_graph": round(
            x["g_hits"]["shuffle_bytes"]
            / max(1, b["g_hits"]["shuffle_bytes"]),
            2,
        ),
        # 10x lines: paragraph-hash exchange (ids only) + one text
        # exchange -> linear
        "paragraph_dedup_shuffle_growth_at_10x_corpus": round(
            x["t_paragraph_dedup"]["shuffle_bytes"]
            / max(1, b["t_paragraph_dedup"]["shuffle_bytes"]),
            2,
        ),
        # 10x corpus, FIXED lid vocabulary: the per-doc sums exchange
        # is the only shuffle -> linear in docs
        "lang_id_shuffle_growth_at_10x_corpus": round(
            x["t_lang_id"]["shuffle_bytes"]
            / max(1, b["t_lang_id"]["shuffle_bytes"]),
            2,
        ),
        # same claim for the hash-bucketed variant (fixed 2^13-bucket
        # broadcast relation, identical plan shape)
        "lang_id_hashed_shuffle_growth_at_10x_corpus": round(
            x["t_lang_id_hashed"]["shuffle_bytes"]
            / max(1, b["t_lang_id_hashed"]["shuffle_bytes"]),
            2,
        ),
        # packing's one exchange moves the token stream once ->
        # shuffle linear in corpus tokens
        "seq_pack_shuffle_growth_at_10x_corpus": round(
            x["t_seq_pack"]["shuffle_bytes"]
            / max(1, b["t_seq_pack"]["shuffle_bytes"]),
            2,
        ),
        # z-order's shuffle is (file, bounds) rows, not the corpus —
        # absolute bytes stay tiny at 10x
        "zorder_shuffle_bytes_at_10x_corpus":
            x["o6_zorder_layout"]["shuffle_bytes"],
        # PQ encode is shuffle-FREE by construction at every size
        "pq_encode_shuffle_bytes_at_10x_corpus":
            x["sim_pq_encode"]["shuffle_bytes"],
        # training shuffle = one corpus word count + per-round
        # vocab-sized aggregates -> ~linear even with a 10x vocab
        "bpe_train_shuffle_growth_at_10x_corpus": round(
            x["t_bpe_train"]["shuffle_bytes"]
            / max(1, b["t_bpe_train"]["shuffle_bytes"]),
            2,
        ),
    }
    out = {"configs": results, "summary": summary}
    (REPO / "BENCH_scale.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
