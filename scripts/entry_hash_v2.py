"""By-path shim over the canonical closure-aware entry hash (v2),
which lives inside the package since round 12:
``gtfs_realtime_etl_spark/plans/entry_hash_v2.py``.

The migration (``scripts/migrate_manifest_v2.py``) loads THIS file by
absolute path and applies it to historical git worktrees; the shim
resolves the sibling package file relative to its own location, so the
loaded implementation is always the current tree's — never a
worktree's — and stays stdlib-only (no package import, which would
pull in pyspark and ambiguously resolve against whatever tree is first
on ``sys.path``)."""

from __future__ import annotations

import importlib.util as _ilu
import os as _os

_IMPL = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "gtfs_realtime_etl_spark",
    "plans",
    "entry_hash_v2.py",
)
_spec = _ilu.spec_from_file_location("_entry_hash_v2_impl", _IMPL)
if _spec is None or _spec.loader is None:  # pragma: no cover
    raise RuntimeError(f"entry hash v2 implementation missing: {_IMPL}")
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

entry_src_hash_v2 = _mod.entry_src_hash_v2
