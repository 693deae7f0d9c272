"""Iterative materialized-path hierarchy resolution — SURVEY.md J9.

The reference migrates a folder tree whose parentage is encoded as a
string path ('/a/b/c') by looping over depth levels with an accumulating
path→id dict (etl/orchestrator.py:743-1000). Spark SQL has no recursive
CTE, so the level loop stays in the driver — but each level is a
DataFrame join, and the loop is bounded by max path depth (tiny), not
row count. The accumulated map is a DataFrame that stays distributed;
nothing is collected.

Determinism: ids are assigned by dense ordering over (depth, path), so
re-runs and the DuckDB oracle (which expresses the same thing with
row_number over the full set — legal there because id assignment is
order-defined, not arrival-defined; SURVEY §7.4.1/.3) agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mongodb_etl_migration_spark.functions.scalars import parent_path, path_depth


def resolve_folder_tree(
    folders: DataFrame,
    path_col: str = "path",
    id_start: int = 1,
) -> DataFrame:
    """Assign ids to folders and resolve each folder's parent id.

    Input: one row per folder with its full materialized path.
    Output: path, depth, folder_id, parent_id (0 for roots/orphans —
    the reference's default-to-root rule, orchestrator.py:893-933).

    Level-by-level driver loop mirroring _process_docs_hierarchical:
    level N joins against the union of already-resolved levels < N.
    Each iteration is one broadcast join (a level of a folder tree is
    dimension-sized even at 100 TB of documents).
    """
    base = (
        folders.select(F.col(path_col).alias("path"))
        .distinct()
        .withColumn("depth", path_depth("path"))
        .withColumn("parent_path", parent_path("path"))
    )
    # Deterministic id assignment: dense numbering ordered by
    # (depth, path). Folder sets are small; for huge trees swap the
    # global window for functions.keys.assign_sequential_ids.
    w = Window.orderBy("depth", "path")
    base = base.withColumn(
        "folder_id", (F.row_number().over(w) + F.lit(id_start - 1)).cast("bigint")
    ).persist()

    max_depth_row = base.agg(F.max("depth")).head()[0]
    max_depth = max_depth_row if max_depth_row is not None else -1
    resolved: DataFrame | None = None
    # levels start at the MINIMUM depth present (a root row '/' is
    # depth 0 — it must be emitted AND serve as its children's parent,
    # not silently dropped while still consuming a folder_id)
    for level in range(0, max_depth + 1):
        lvl = base.filter(F.col("depth") == level)
        if resolved is None:
            lvl = lvl.withColumn("parent_id", F.lit(0).cast("bigint"))
        else:
            parents = resolved.select(
                F.col("path").alias("parent_path"),
                F.col("folder_id").alias("parent_id"),
            )
            lvl = lvl.join(F.broadcast(parents), "parent_path", "left").withColumn(
                "parent_id", F.coalesce(F.col("parent_id"), F.lit(0)).cast("bigint")
            )
        lvl = lvl.select("path", "depth", "folder_id", "parent_id")
        resolved = lvl if resolved is None else resolved.unionByName(lvl)
        # pin each round: without this the next level's broadcast
        # re-executes every prior level's join and the plan doubles
        # (the repo's iterative-loop pitfall, as in dedup._cc_*)
        resolved = resolved.localCheckpoint()

    base.unpersist()
    if resolved is None:  # empty input
        return base.select(
            "path", "depth", "folder_id", F.lit(0).cast("bigint").alias("parent_id")
        )
    return resolved


def resolve_files_to_folders(
    files: DataFrame,
    folder_ids: DataFrame,
    on_folder_col: str = "on_folder",
) -> DataFrame:
    """Attach files to their folder id; unresolved paths → root (0) —
    etl/orchestrator.py:893-933."""
    fmap = folder_ids.select(
        F.col("path").alias(on_folder_col), F.col("folder_id").alias("parent_id")
    )
    return (
        files.join(F.broadcast(fmap), on_folder_col, "left")
        .withColumn("parent_id", F.coalesce(F.col("parent_id"), F.lit(0)).cast("bigint"))
    )
