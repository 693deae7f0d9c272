"""Catalog-wide physical-plan invariants — the 100 TB guardrails.

Every query in the catalog must compile to a plan that would survive a
1000-executor cluster: no CartesianProduct, no BroadcastNestedLoopJoin
(a range predicate that misses its equi-key degenerates to one), and
no row-at-a-time Python UDFs (BatchEvalPython). Arrow-batched Python
(ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is allowed
only for the queries that declare it — keys, crypto, multimodal,
stateful streaming.

This is a systemic regression net: any future query that accidentally
plans a nested loop or drops to per-row Python fails here, not in a
100 TB run.
"""

from __future__ import annotations

import pytest

from mongodb_etl_migration_spark.queries import QUERIES

# Queries whose Arrow-batched Python stages are by design.
ARROW_OK = {
    # k1_uuid5 / k1b_uuid5_invariants / k2_timeuuid left this list in
    # r14: the key builders are pure Column expressions now (JVM sha1 +
    # hex slicing) — no Python stage remains in their plans.
    "x_crypto_migration",  # Salsa20 (pure-Python spec cipher, F22)
    "m_multimodal_decode",   # mapInPandas decode plumbing
    "m_image_decode_real",   # real BMP codec (mapInPandas)
    "m_image_decode_png",    # real PNG codec (mapInPandas)
    "m_image_decode_qoi",    # real QOI codec (mapInPandas)
    "m_image_decode_jpeg",   # real baseline-JPEG codec (mapInPandas)
    "m_image_decode_jpeg_progressive",  # real Annex-G codec (mapInPandas)
    "m_mp4_metadata",        # real ISO BMFF box walk (mapInPandas)
    "m_image_dhash",         # perceptual hash over real codec (mapInPandas)
    "m_video_neardup",       # per-frame dHash fan-out through the real
                             # GIF/MJPEG decoders (mapInPandas) feeding
                             # the shared-frame join
    "m_video_neardup_aligned",  # same decode fan-out feeding the
                                # aligned-run island windows
    "m_video_neardup_probe",    # history + batch decode fan-outs
                                # around the persisted frame index
    "m_image_neardup",       # dHash stage (mapInPandas) under the CC
                             # loop — usually hidden behind the round
                             # checkpoints, listed in case
    "m_image_neardup_probe",  # same dHash stage under the index write
    "m_image_caption_curation",  # dHash stage under the dedup-
                                 # representative anti join + caption
                                 # gate (checkpoints may hide it)
    "m_audio_features",      # windowed PCM features (mapInPandas)
    "m_audio_neardup",       # per-window fingerprint fan-out through
                             # the real WAV decode (mapInPandas)
                             # feeding the shared-key join
    "m_audio_neardup_probe",  # same fingerprint stage over the probe
                              # batch (index side is a parquet read)
    "m_audio_neardup_aligned",  # fingerprint fan-out feeding the
                                # aligned-run island windows
    "m_mp4_frames",          # real mdat sample extraction (mapInPandas)
    "m_gif_frames",          # real GIF multi-frame codec (mapInPandas)
    "m_audio_decode_real",   # real WAV codec (mapInPandas)
    "m_frame_sample",        # frame-sampling fan-out (mapInPandas)
    "w_warc_extract",        # WARC record explode (mapInPandas)
    "e_sessionization",      # batch twin is pure SQL — listed in case
    "t_unicode_nfc",         # unicodedata NFC (pandas UDF — Spark has
                             # no built-in normalizer)
    "t_bpe_ids_unicode",     # full-Unicode GPT-2 BPE: the UTF-8
                             # byte→unicode-shim remap + per-byte merge
                             # loop over arbitrary codepoints has no
                             # Column expression form — Arrow-batched
                             # pandas UDF is the genuinely-required hop
                             # (the ASCII fast path t_bpe_ids stays in
                             # codegen and is lint-checked normally)
    "w_frontier_pipeline",   # gunzip_text (pandas UDF — Spark has no
                             # gunzip builtin) + the fixture's gzip
                             # writer; narrow, batch-bounded
    "t_gopher_repetition",   # the nine gram folds as ONE Arrow-
                             # vectorized UDF (gopher_fold_arrow,
                             # r15): largest executor-CPU item in the
                             # headline bench; numpy/pyarrow batch
                             # kernel, byte-equality with the codegen
                             # fold pinned by test_gopher_fold_arrow
}

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
ARROW_NODES = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_invariants(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in FORBIDDEN:
        assert node not in plan, f"{name}: forbidden {node} in plan"
    if name not in ARROW_OK:
        for node in ARROW_NODES:
            assert node not in plan, (
                f"{name}: unexpected Python stage {node} — add to ARROW_OK "
                "only if the Python hop is genuinely required"
            )


def test_no_global_window_in_package():
    """``Window.orderBy(...)`` without a partitionBy plans a single-task
    sort of the full input — the classic 100 TB scale-killer. Every
    window in the package must start from ``Window.partitionBy``;
    global dense numbering goes through keys.assign_sequential_ids
    (range-partitioned) instead."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / (
        "mongodb_etl_migration_spark"
    )
    offenders = [
        str(f)
        for f in pkg.rglob("*.py")
        if "Window.orderBy" in f.read_text(encoding="utf-8")
    ]
    assert offenders == [], (
        f"global (un-partitioned) Window in: {offenders} — use "
        "Window.partitionBy or assign_sequential_ids"
    )
