"""Round-11 migration: rebuild the green manifest under the
closure-aware v2 entry hash WITHOUT erasing changed-since-green debt.

Why this exists: switching ``_entry_src_hash`` to the v2 definition
(scripts/entry_hash_v2.py) invalidates every committed v1 hash.
Regenerating against the CURRENT tree would re-trust entries whose
kernels drifted after their green rounds — the exact bug class
round 10 hit twice.  The only safe base for an entry's v2 hash is the
tree the driver actually verified: the round-end commit of the entry's
recorded green round.  This script therefore:

1. derives each entry's latest GREEN round directly from the committed
   ``CORRECTNESS_r*.json`` artifacts (same ok-logic as
   ``plans/queries.py::_driver_rows``) — NOT from the v1 manifest, so
   rounds the v1 manifest has not folded yet (e.g. the most recent
   driver run) are covered automatically and v1 staleness cannot leak
   into v2;
2. for each distinct round R, resolves THE commit touching
   ``CORRECTNESS_r{R:02d}.json`` (the driver's round-end artifact
   commit — its tree IS the verified tree; the script FAILS if an
   artifact has more than one touching commit, because an amended
   artifact would silently rebase that round's hashes onto a tree the
   driver never verified) and materializes it with
   ``git worktree add --detach``;
3. in a SUBPROCESS rooted at that worktree (cwd + PYTHONPATH), imports
   that tree's registry and computes v2 hashes for the entries green
   at R, using the CURRENT v2 implementation loaded by file path (old
   trees don't ship it);
4. writes GREEN_MANIFEST_V2.json ``{name: {hash, round}}`` and prints
   a verification report.  Safety property, by construction: an entry
   is trusted (absent from the rotation front) iff its CURRENT closure
   surface hashes identically to the surface at the tree its latest
   green driver row verified.  Entries with no green row must always
   be in the v2 front (asserted).  Entries the v1 front listed that v2
   clears are printed with their green round — each is an entry whose
   current source is byte-identical (in closure surface) to its
   verified tree, i.e. v1-manifest staleness healed, not debt erased.

Nothing in the live rotation reads the V2 file.  Flipping is a
deliberate round-boundary change: point ``_entry_src_hash`` at the v2
definition and ``_GREEN_MANIFEST_PATH`` at the V2 file in the same
commit, at round start, BEFORE any source edits.

Usage:  python scripts/migrate_manifest_v2.py           # migrate
        python scripts/migrate_manifest_v2.py --emit F  # internal
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_V2_PATH = os.path.join(ROOT, "scripts", "entry_hash_v2.py")


def _load_v2(path: str):
    spec = importlib.util.spec_from_file_location("entry_hash_v2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.entry_src_hash_v2


def emit(names_file: str, v2_path: str) -> None:
    """Subprocess body: run from a (possibly historical) tree root,
    print {name: v2hash} JSON for the requested registry entries."""
    sys.path.insert(0, os.getcwd())
    hash_v2 = _load_v2(v2_path)
    with open(names_file) as fh:
        names = json.load(fh)
    from gtfs_realtime_etl_spark.plans.queries import ORACLE_SQL, QUERIES

    out = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            out[name] = None  # entry absent at this commit
        else:
            out[name] = hash_v2(fn, ORACLE_SQL.get(name))
    json.dump(out, sys.stdout)


def _git(*args: str) -> str:
    p = subprocess.run(
        ["git", *args], cwd=ROOT, capture_output=True, text=True
    )
    if p.returncode != 0:
        raise RuntimeError(f"git {' '.join(args)}: {p.stderr.strip()}")
    return p.stdout


def _latest_green_rounds() -> dict[str, int]:
    """name -> latest green round, derived from CORRECTNESS_r*.json with
    the same ok-logic as ``plans/queries.py::_driver_rows`` (latest row
    wins; a red latest row means never-green).  Stdlib-only so it works
    without importing the package."""
    import re

    latest: dict[str, tuple[int, bool]] = {}
    for fname in sorted(os.listdir(ROOT)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(os.path.join(ROOT, fname)) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("err") is None
                and bool(row.get("rows_match"))
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, ok)
    return {name: rnd for name, (rnd, ok) in latest.items() if ok}


def migrate() -> None:
    green_rounds = _latest_green_rounds()
    by_round: dict[int, list[str]] = {}
    for name, rnd in green_rounds.items():
        by_round.setdefault(rnd, []).append(name)

    v2_manifest: dict[str, dict] = {}
    missing: list[str] = []
    for rnd, names in sorted(by_round.items()):
        artifact = f"CORRECTNESS_r{rnd:02d}.json"
        touching = [
            c
            for c in _git("log", "--format=%H", "--", artifact).splitlines()
            if c.strip()
        ]
        if not touching:
            print(f"round {rnd}: no commit for {artifact}; skipping", flush=True)
            missing.extend(names)
            continue
        if len(touching) != 1:
            # An amended artifact would rebase this round's hashes onto a
            # tree the driver never verified — the exact re-trust bug
            # class this script exists to prevent.  Fail loudly.
            raise RuntimeError(
                f"{artifact} has {len(touching)} touching commits "
                f"({', '.join(c[:10] for c in touching)}); refusing to "
                "guess which tree the driver verified"
            )
        commit = touching[0]
        wt = tempfile.mkdtemp(prefix=f"mig_r{rnd}_")
        os.rmdir(wt)  # git worktree wants to create it
        _git("worktree", "add", "--detach", wt, commit)
        try:
            with tempfile.NamedTemporaryFile(
                "w", suffix=".json", delete=False
            ) as nf:
                json.dump(names, nf)
                names_file = nf.name
            env = dict(os.environ)
            env["PYTHONPATH"] = wt
            p = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--emit",
                    names_file,
                    "--hash-impl",
                    _V2_PATH,
                ],
                cwd=wt,
                env=env,
                capture_output=True,
                text=True,
            )
            os.unlink(names_file)
            if p.returncode != 0:
                raise RuntimeError(
                    f"round {rnd} emit failed: {p.stderr[-2000:]}"
                )
            hashes = json.loads(p.stdout.strip().splitlines()[-1])
            for name, h in hashes.items():
                if h is None:
                    missing.append(name)
                else:
                    v2_manifest[name] = {"hash": h, "round": rnd}
            print(
                f"round {rnd} @ {commit[:10]}: {len(hashes)} entries hashed",
                flush=True,
            )
        finally:
            _git("worktree", "remove", "--force", wt)

    out_path = os.path.join(ROOT, "GREEN_MANIFEST_V2.json")
    with open(out_path, "w") as fh:
        json.dump(v2_manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out_path}: {len(v2_manifest)} entries "
          f"({len(missing)} unresolvable: {sorted(missing)})")

    # Verification report.  NOTE (round-12, advisor finding): since the
    # round-11 flip, the LIVE rotation already uses the v2 hash and
    # GREEN_MANIFEST_V2.json — so the live front recomputed here is a
    # self-check against the manifest this script just wrote (it should
    # agree except for entries the live manifest has folded since their
    # green-round commits), NOT the historical v1-vs-v2 comparison the
    # original migration printed.  Labels say so.
    sys.path.insert(0, ROOT)
    hash_v2 = _load_v2(_V2_PATH)
    from gtfs_realtime_etl_spark.plans.queries import (
        ORACLE_SQL,
        QUERIES,
        _load_driver_green,
    )

    live_front = {k for k in QUERIES if k not in _load_driver_green()}
    v2_front = set()
    for name, fn in QUERIES.items():
        rec = v2_manifest.get(name)
        if rec is None or rec["hash"] != hash_v2(fn, ORACLE_SQL.get(name)):
            v2_front.add(name)
    print(f"live front (rotation's own view): {len(live_front)} | "
          f"regenerated-manifest front: {len(v2_front)}")
    print(f"fronted by regenerated manifest but not live (folded since "
          f"green-round commit): {sorted(v2_front - live_front)}")
    # Safety assertions:
    # (a) entries with NO green driver row can never be trusted.
    never_green = {k for k in QUERIES if k not in green_rounds}
    leaked = never_green - v2_front
    if leaked:
        print(f"ERROR: never-green entries absent from the v2 front: "
              f"{sorted(leaked)}")
        sys.exit(1)
    # (b) entries the live rotation fronts but the regenerated manifest
    # clears are, by construction, entries whose current closure surface
    # hashes identically to the tree their latest green row verified
    # (hash recomputed AT that commit) — live-manifest staleness healed,
    # not debt erased.  Print for audit.
    healed = sorted(live_front - v2_front)
    if healed:
        print(
            f"cleared from front ({len(healed)} — current surface matches "
            "the verified tree at their latest green round):"
        )
        for k in healed:
            print(f"  {k} (green r{green_rounds[k]:02d})")
    print("verified: never-green entries all front; trusted entries all "
          "hash-match their driver-verified trees")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit", metavar="NAMES_JSON")
    ap.add_argument("--hash-impl", default=_V2_PATH)
    args = ap.parse_args()
    if args.emit:
        emit(args.emit, args.hash_impl)
    else:
        migrate()


if __name__ == "__main__":
    main()
