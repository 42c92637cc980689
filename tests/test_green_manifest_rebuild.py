"""GREEN_MANIFEST refresh rule (round-10 lesson): regenerating the
manifest must record CURRENT source hashes only for entries whose
latest green driver row came from the LATEST correctness round — the
round verified against this exact tree.  Recording current hashes for
older greens silently erases changed-since-green debt and the driver
budget burns never-changed entries instead of the rewritten ones."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "update_green_manifest",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "update_green_manifest.py",
    ),
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)
rebuild = _MOD.rebuild


def test_latest_round_green_records_current_hash():
    manifest, n = rebuild(
        {},
        {"q": (9, True, True)},
        {"q": "H_cur"},
    )
    assert manifest == {"q": {"hash": "H_cur", "round": 9}} and n == 1


def test_older_green_keeps_recorded_hash_preserving_debt():
    """The round-10 bug: an entry green at round 5 whose source was
    rewritten afterwards must KEEP its round-5 hash so the rotation
    still sees the drift."""
    manifest, n = rebuild(
        {"old": {"hash": "H_r5", "round": 5}},
        {"old": (5, True, True), "fresh": (9, True, True)},
        {"old": "H_rewritten", "fresh": "H_cur"},
    )
    assert manifest["old"] == {"hash": "H_r5", "round": 5}
    assert manifest["fresh"] == {"hash": "H_cur", "round": 9}
    assert n == 1


def test_older_green_never_in_manifest_stays_absent():
    """An old green with no recorded hash cannot be trusted with the
    current hash either — absence keeps it in the re-verify queue."""
    manifest, _ = rebuild(
        {},
        {"old": (5, True, True), "fresh": (9, True, True)},
        {"old": "H_now", "fresh": "H_cur"},
    )
    assert "old" not in manifest and "fresh" in manifest


def test_red_and_unknown_entries_never_recorded():
    manifest, n = rebuild(
        {},
        {"red": (9, False, False), "gone": (9, True, True)},
        {"red": "H1"},  # 'gone' absent: not in the current registry
    )
    assert manifest == {} and n == 0


def test_idempotent_on_unchanged_tree():
    rows = {"q": (9, True, True)}
    cur = {"q": "H"}
    m1, n1 = rebuild({}, rows, cur)
    m2, n2 = rebuild(m1, rows, cur)
    assert (n1, n2) == (1, 0) and m1 == m2


def test_unsafe_latest_round_entry_keeps_previous_value():
    """Second round-10 lesson: a latest-round green whose defining file
    changed after the round-end commit must NOT be re-trusted with the
    current hash (keep the old value — or absence)."""
    manifest, n = rebuild(
        {"edited": {"hash": "H_round_end", "round": 9}},
        {"edited": (9, True, True), "fresh": (9, True, True)},
        {"edited": "H_after_edit", "fresh": "H_cur"},
        unsafe={"edited"},
    )
    assert manifest["edited"] == {"hash": "H_round_end", "round": 9}
    assert manifest["fresh"] == {"hash": "H_cur", "round": 9}
    assert n == 1
