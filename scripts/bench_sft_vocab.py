#!/usr/bin/env python
"""Real-vocab-scale SFT receipt (r12 verdict item 5): run the SFT
tokenize path with a PRODUCTION-SIZED learned vocabulary, not the
demo merge table the catalog rows pin.

1. Learn ~50k merges with the engine's incremental BPE trainer
   (bpe_train_incremental_reference — the mode="driver" engine path's
   core) over the uniform-tail synthetic wordform table
   (BENCH_bpe_train's 50k tier; the sf0.1 corpus's 31 distinct words
   cannot support 50k merges, so vocabulary scale has to come from
   the synthetic regime — documented, not hidden).
2. Encode the sf0.1 CONVERSATIONS (the c_sft_tokens fixture) through
   chat.sft_tokens_batch — the Arrow twin that ships the 50k vocab
   once per executor (a plan-literal Column chain at this size is the
   wrong tool by design). Receipt: wall, rows, tokens, tokens/s.
3. Column-path equivalence on the ASCII scope: the Column chain is
   feasible only for demo-scale vocabularies (the compiled merge
   chain nests one expression level per merge; ~200 already
   overflows the JVM stack at plan build), so the assertion runs
   both paths over a 200-conversation sample with a LEARNED 64-merge
   prefix of the same vocabulary — real trainer output, 3x the demo
   table — and requires byte-identical (n_tokens, token_ids,
   mask_spans).

Usage: python scripts/bench_sft_vocab.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from bench_bpe_batched import uniform_tail_vocab  # noqa: E402
from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.operators import chat as CH  # noqa: E402
from mongodb_etl_migration_spark.operators import text as T  # noqa: E402

N_MERGES = 50_000
PREFIX = 64
SAMPLE = 200


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sft_vocab.json"

    t0 = time.time()
    wc = uniform_tail_vocab(280_000, seed=42)
    merges3, _ = T.bpe_train_incremental_reference(wc, N_MERGES, min_count=2)
    merges = [(a, b) for a, b, *_ in merges3]
    train_sec = round(time.time() - t0, 1)

    spark = get_spark(app_name="bench_sft_vocab")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    conv = d.select(
        "doc_id", CH.parse_turns("text", turn_words=6).alias("turns")
    ).localCheckpoint()
    n_conv = conv.count()  # warm the input before timing the encode

    t0 = time.time()
    enc = CH.sft_tokens_batch(conv, "turns", merges, "chatml")
    agg = enc.agg(
        F.count("*").alias("rows"), F.sum("n_tokens").alias("toks")
    ).collect()[0]
    enc_sec = round(time.time() - t0, 3)
    rows, toks = int(agg["rows"]), int(agg["toks"])

    # ASCII-scope equivalence: Column chain vs Arrow twin on a real
    # learned-merge PREFIX (Column-feasible size)
    pfx = merges[:PREFIX]
    sample = conv.orderBy("doc_id").limit(SAMPLE).localCheckpoint()
    col_rows = {
        r["doc_id"]: r
        for r in sample.select(
            "doc_id", CH.sft_tokens("turns", pfx, "chatml").alias("s")
        )
        .select(
            "doc_id",
            F.size(F.col("s.token_ids")).cast("bigint").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.col("s.token_ids"), lambda i: i.cast("string")
                ),
                " ",
            ).alias("token_ids"),
            F.array_join(
                F.transform(
                    F.col("s.mask_spans"),
                    lambda x: F.concat_ws(
                        ":",
                        x["turn_idx"].cast("string"),
                        x["tok_start"].cast("string"),
                        x["tok_end"].cast("string"),
                    ),
                ),
                ",",
            ).alias("mask_spans"),
        )
        .collect()
    }
    bat_rows = {
        r["doc_id"]: r
        for r in CH.sft_tokens_batch(sample, "turns", pfx, "chatml").collect()
    }
    assert set(col_rows) == set(bat_rows)
    mismatch = [
        did
        for did in col_rows
        if (
            col_rows[did]["n_tokens"],
            col_rows[did]["token_ids"],
            col_rows[did]["mask_spans"],
        )
        != (
            bat_rows[did]["n_tokens"],
            bat_rows[did]["token_ids"],
            bat_rows[did]["mask_spans"],
        )
    ]
    assert not mismatch, mismatch[:5]

    doc = {
        "metric": "sft_tokens_batch_real_vocab",
        "sf_dir": sf_dir,
        "vocab": {
            "merges": len(merges),
            "vocab_size": 256 + len(merges),
            "trainer": "bpe_train_incremental_reference(uniform_tail 280k)",
            "train_sec": train_sec,
        },
        "encode": {
            "conversations": n_conv,
            "rows": rows,
            "tokens": toks,
            "sec": enc_sec,
            "tokens_per_sec": int(toks / enc_sec) if enc_sec else None,
        },
        "column_path_equivalence": {
            "merge_prefix": PREFIX,
            "sample_conversations": SAMPLE,
            "fields": ["n_tokens", "token_ids", "mask_spans"],
            "equal": True,
        },
        "git_sha": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
        ).stdout.strip(),
    }
    Path(out).write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
