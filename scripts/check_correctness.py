#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
catalog query on Spark and its oracle on DuckDB at a given sf dir,
compare row count + schema + order-insensitive values.

Usage: python scripts/check_correctness.py [--json OUT] [sf_dir] [name ...]

--json OUT additionally writes a per-query receipt file (ok/rows/sec
per query plus sf_dir, git sha, timestamp) — the committed local
evidence for queries the driver's capped per-round check doesn't
reach.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.catalog import TABLES  # noqa: E402
from mongodb_etl_migration_spark.queries import ORACLES, QUERIES  # noqa: E402
from tests.oracle_compare import compare  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or sorted(QUERIES)
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    results: dict[str, dict] = {}
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            if name not in ORACLES:
                n = sdf.count()
                print(f"  {name:28s} rows-only ({n} rows) "
                      f"[{time.time() - t0:.1f}s]")
                results[name] = {
                    "ok": True, "rows": n, "rows_only": True,
                    "sec": round(time.time() - t0, 1),
                }
                continue
            ddf = con.execute(ORACLES[name]).fetchdf()
            ok, msg = compare(sdf, ddf)
            status = "OK " if ok else "FAIL"
            print(f"  {name:28s} {status} ({len(ddf)} rows) "
                  f"[{time.time() - t0:.1f}s] {'' if ok else msg[:200]}")
            results[name] = {
                "ok": bool(ok), "rows": len(ddf),
                "sec": round(time.time() - t0, 1),
                **({} if ok else {"err": msg[:200]}),
            }
            failures += 0 if ok else 1
        except Exception as e:  # pragma: no cover
            print(f"  {name:28s} ERROR {str(e)[:200]}")
            results[name] = {"ok": False, "err": str(e)[:200]}
            failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'}: "
          f"{len(names) - failures}/{len(names)} queries")
    if json_out:
        import json
        import subprocess

        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip()
        Path(json_out).write_text(json.dumps({
            "_meta": {
                "sf_dir": sf_dir,
                "git_sha": sha,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "pass": failures == 0,
                "checked": len(names),
            },
            "queries": results,
        }, indent=1) + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
