"""Round-11 migration: rebuild the green manifest under the
closure-aware v2 entry hash WITHOUT erasing changed-since-green debt.

Why this exists: switching ``_entry_src_hash`` to the v2 definition
(scripts/entry_hash_v2.py) invalidates every committed v1 hash.
Regenerating against the CURRENT tree would re-trust entries whose
kernels drifted after their green rounds — the exact bug class
round 10 hit twice.  The only safe base for an entry's v2 hash is the
tree the driver actually verified: the round-end commit of the entry's
recorded green round.  This script therefore:

1. reads GREEN_MANIFEST.json (v1) for each entry's green round;
2. for each distinct round R, resolves the last commit touching
   ``CORRECTNESS_r{R:02d}.json`` (the driver's round-end artifact
   commit — its tree IS the verified tree) and materializes it with
   ``git worktree add --detach``;
3. in a SUBPROCESS rooted at that worktree (cwd + PYTHONPATH), imports
   that tree's registry and computes v2 hashes for the entries green
   at R, using the CURRENT v2 implementation loaded by file path (old
   trees don't ship it);
4. writes GREEN_MANIFEST_V2.json ``{name: {hash, round}}`` and prints
   a verification report: the rotation front under v2 vs under v1 —
   every v1-front entry must remain in the v2 front (debt preserved);
   new v2-front entries are kernels that drifted invisibly to v1.

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


def migrate() -> None:
    with open(os.path.join(ROOT, "GREEN_MANIFEST.json")) as fh:
        v1 = json.load(fh)
    by_round: dict[int, list[str]] = {}
    for name, row in v1.items():
        by_round.setdefault(int(row["round"]), []).append(name)

    v2_manifest: dict[str, dict] = {}
    missing: list[str] = []
    for rnd, names in sorted(by_round.items()):
        artifact = f"CORRECTNESS_r{rnd:02d}.json"
        commit = _git("log", "-1", "--format=%H", "--", artifact).strip()
        if not commit:
            print(f"round {rnd}: no commit for {artifact}; skipping", flush=True)
            missing.extend(names)
            continue
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

    # Verification report: front sets under v1 vs v2 on the CURRENT tree.
    sys.path.insert(0, ROOT)
    hash_v2 = _load_v2(_V2_PATH)
    from gtfs_realtime_etl_spark.plans.queries import (
        ORACLE_SQL,
        QUERIES,
        _load_driver_green,
    )

    v1_front = {k for k in QUERIES if k not in _load_driver_green()}
    v2_front = set()
    for name, fn in QUERIES.items():
        rec = v2_manifest.get(name)
        if rec is None or rec["hash"] != hash_v2(fn, ORACLE_SQL.get(name)):
            v2_front.add(name)
    regressions = v1_front - v2_front
    print(f"v1 front: {len(v1_front)} | v2 front: {len(v2_front)}")
    print(f"newly flagged by v2 (kernel/constant drift invisible to v1): "
          f"{sorted(v2_front - v1_front)}")
    if regressions:
        print(f"ERROR: v2 would DROP debt entries from the front: "
              f"{sorted(regressions)}")
        sys.exit(1)
    print("debt preserved: every v1-front entry is in the v2 front")


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
