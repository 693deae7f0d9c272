#!/usr/bin/env python
"""Regenerate GREEN_HASHES.json — the per-query implementation hash
snapshot taken AT THE COMMIT each query's latest green driver row
actually tested.

Run at round start, after the driver lands a new CORRECTNESS_r{N}.json:

    python scripts/update_green_hashes.py

For every query, find the latest round with a fully-green row
(rows+schema+hash all true), map that round to the commit the driver
verified (the last CODE commit before the round's artifact commit),
check out that commit into a temp worktree, and compute the query's
implementation hash there with the CURRENT provenance module (loaded
by file path, so old worktrees don't need to contain it). A query
whose present-day hash differs from its snapshot enumerates first in
__spark_entry__.queries() — changed code invalidates its green.

--compute --root <dir> is the internal subprocess mode that prints
{name: hash} for the catalog importable from <dir>.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Round → the artifact commit the driver wrote AFTER verifying; the
# code it verified is that commit's parent (artifact commits only add
# VERDICT/BENCH/CORRECTNESS files).
_ARTIFACT_RE = re.compile(r"^round (\d+): verdict/advice/correctness/bench")


def _round_code_commits() -> dict[int, str]:
    log = subprocess.run(
        ["git", "-C", str(REPO), "log", "--format=%H %s"],
        capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    out: dict[int, str] = {}
    for i, line in enumerate(log):
        sha, _, subject = line.partition(" ")
        m = _ARTIFACT_RE.match(subject)
        if m and i + 1 < len(log):
            out[int(m.group(1))] = log[i + 1].split()[0]
    return out


def _latest_green_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        for name, row in json.loads(path.read_text()).items():
            if row.get("rows_match") and row.get("schema_match") and (
                row.get("hash_match") or row.get("hash_match") is None
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _compute(root: Path) -> dict[str, str]:
    sys.path.insert(0, str(root))
    spec = importlib.util.spec_from_file_location(
        "_provenance", REPO / "mongodb_etl_migration_spark" / "provenance.py"
    )
    prov = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(prov)
    from mongodb_etl_migration_spark.queries import ORACLES, QUERIES

    return prov.catalog_hashes(
        QUERIES, ORACLES, root / "mongodb_etl_migration_spark"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--compute", action="store_true")
    ap.add_argument("--root", type=Path, default=REPO)
    args = ap.parse_args()

    if args.compute:
        print(json.dumps(_compute(args.root)))
        return

    rounds = _round_code_commits()
    greens = _latest_green_rounds()
    snapshot: dict[str, dict] = {}
    by_round: dict[int, list[str]] = {}
    for name, rnd in greens.items():
        by_round.setdefault(rnd, []).append(name)

    for rnd, names in sorted(by_round.items()):
        sha = rounds.get(rnd)
        if sha is None:
            print(f"!! no code commit found for round {rnd}", file=sys.stderr)
            continue
        wt = Path(f"/tmp/green_hashes_r{rnd}")
        if not (wt / "mongodb_etl_migration_spark").exists():
            subprocess.run(
                ["git", "-C", str(REPO), "worktree", "add", "--force", str(wt), sha],
                check=True, capture_output=True,
            )
        hashes = json.loads(
            subprocess.run(
                [sys.executable, __file__, "--compute", "--root", str(wt)],
                check=True, capture_output=True, text=True,
            ).stdout
        )
        missing = [n for n in names if n not in hashes]
        if missing:
            print(f"!! r{rnd}: no hash for {missing}", file=sys.stderr)
        for n in names:
            if n in hashes:
                snapshot[n] = {"round": rnd, "hash": hashes[n]}

    out = REPO / "GREEN_HASHES.json"
    out.write_text(json.dumps(dict(sorted(snapshot.items())), indent=1) + "\n")
    print(f"wrote {out} ({len(snapshot)} queries)")


if __name__ == "__main__":
    main()
