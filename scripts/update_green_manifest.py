"""Regenerate GREEN_MANIFEST.json — run at ROUND START, while the
working tree still equals the round-end commit the external driver
just verified (CORRECTNESS_r{N}.json was produced against exactly
these sources).

For every registry entry whose LATEST driver row is green, the
manifest records the entry's current source hash (query function
source + oracle SQL, via ``_entry_src_hash``).  The rotation in
``plans/queries.py`` then treats any entry whose hash later drifts
from its manifest value as never-green, so rewritten queries rotate
back into the driver's verification prefix (round-8 lesson:
ann_pq_topk / ann_recall_report shipped material rewrites on top of
r07 greens and the stalest-first rotation never noticed).

Usage: python scripts/update_green_manifest.py  (from the repo root)
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from gtfs_realtime_etl_spark.plans.queries import (
        ORACLE_SQL,
        QUERIES,
        _driver_rows,
        _entry_src_hash,
    )

    path = os.path.join(ROOT, "GREEN_MANIFEST.json")
    try:
        with open(path) as fh:
            manifest = json.load(fh)
    except (OSError, ValueError):
        manifest = {}

    rows = _driver_rows()
    latest_round = max((rnd for rnd, _ok, _f in rows.values()), default=0)
    updated = 0
    for name, (rnd, ok, _full) in sorted(rows.items()):
        if not ok or name not in QUERIES:
            continue
        # Only rows from the LATEST correctness round were verified
        # against the current tree (this script runs at round start,
        # while the tree still equals the round-end commit).  Recording
        # the current hash for an OLDER green row would silently erase
        # changed-since-green debt: the driver verified that entry's
        # old source, not whatever it looks like now (round-10 lesson:
        # the first run of this script converted all 46 debt entries
        # into trusted greens and the rotation would have burned
        # never-changed round-5 entries instead).
        if rnd < latest_round:
            continue
        h = _entry_src_hash(QUERIES[name], ORACLE_SQL.get(name))
        prev = manifest.get(name)
        if not isinstance(prev, dict) or prev.get("hash") != h:
            manifest[name] = {"hash": h, "round": rnd}
            updated += 1
        elif prev.get("round", 0) < rnd:
            manifest[name]["round"] = rnd

    with open(path, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"GREEN_MANIFEST.json: {len(manifest)} entries, {updated} updated")


if __name__ == "__main__":
    main()
