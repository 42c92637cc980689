"""Registry-wide guard: no native ROUND-at-digits anywhere in the
query surface.

Spark's native ``ROUND(x, n)`` on DOUBLE (BigDecimal HALF_UP on the
exact binary expansion) and DuckDB's (``round(x*10^n)/10^n`` in IEEE
floats) disagree near half-boundaries (see tests/test_engine_round.py
for the measured rates) — the op class behind round 8's two external
hash-gate failures.  Round 9 rewrote every site on BOTH sides to the
engine-exact mult-form ``ROUND(E * 10^n, 0) / 10^n``; this test scans
the source so no new site can sneak back in:

- every textual ``ROUND(...)`` with two args must have digit 0
  (the mult-form's own inner call, engine-exact by itself);
- every ``F.round(...)`` likewise.

One-arg ``ROUND(E)`` stays allowed — Spark's HALF_UP at digit 0
equals C ``round`` bit-for-bit, so it is already engine-exact.
"""

from __future__ import annotations

import os
import re

PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gtfs_realtime_etl_spark",
)
SCAN_DIRS = ("plans", "operators", "functions", "streaming")


def _split_args(text: str, start: int):
    depth = 0
    args: list[str] = []
    cur: list[str] = []
    in_str = None
    i = start
    while i < len(text):
        c = text[i]
        if in_str:
            if c == in_str:
                in_str = None
            cur.append(c)
        elif c in "'\"":
            in_str = c
            cur.append(c)
        elif c == "(":
            depth += 1
            if depth > 1:
                cur.append(c)
        elif c == ")":
            depth -= 1
            if depth == 0:
                args.append("".join(cur))
                return args, i
            cur.append(c)
        elif c == "," and depth == 1:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    return None, i  # unbalanced (f-string fragment) — caller skips


def test_no_native_round_at_digits():
    offenders = []
    for d in SCAN_DIRS:
        root = os.path.join(PLANS, d)
        for dirpath, _dirs, files in os.walk(root):
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fname)
                src = open(path).read()
                for m in re.finditer(r"(F\.round|ROUND)\(", src):
                    args, _ = _split_args(src, m.end() - 1)
                    if args is None:
                        continue
                    args = [a.strip() for a in args]
                    if args and args[-1] == "":
                        args = args[:-1]
                    if len(args) != 2:
                        continue
                    digit = args[1]
                    if digit == "0":
                        continue
                    line = src.count("\n", 0, m.start()) + 1
                    offenders.append(
                        f"{path}:{line}: {m.group(1)}(..., {digit})"
                    )
    assert offenders == [], (
        "native ROUND-at-digits found — use the engine-exact mult-form "
        "ROUND(E * 10^n, 0) / 10^n instead (tests/test_engine_round.py):\n"
        + "\n".join(offenders)
    )
