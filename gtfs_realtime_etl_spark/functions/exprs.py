"""SQL-parsed literal-array construction (round-12).

Column-built literal arrays — ``F.array(*[F.lit(float(x)) for x in
xs])`` — cost one py4j round trip per element, and profiling showed
they dominate plan CONSTRUCTION for every driver-loop operator that
re-embeds collected state as literals each round: embedding_pc1's
64×64 covariance matrix was ~12k py4j commands (4.1 s of a 5.5 s
build), kmeans_centroids' per-round centroid re-embedding 14k
commands (5.2 s).  One D-suffixed SQL string parsed by ``F.expr`` is
~10 ms.

Bit-identity argument (pinned in tests/test_functions.py): ``repr``
of a Python float emits the shortest string that round-trips, and a
``D``-suffixed literal is parsed with ``Double.parseDouble`` —
correctly rounded — so the parsed double has exactly the bits of the
``F.lit`` double.  (A bare decimal literal would route through
DECIMAL and is avoided.)  Only finite values are representable this
way; callers hold collected statistics, never NaN/Inf.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: float) -> str:
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(f"non-finite literal not representable: {x}")
    return f"{x!r}D"


def lit_double_array(values: Iterable[float]) -> Column:
    """``array<double>`` literal, bit-identical to
    ``F.array(*[F.lit(float(x)) for x in values])`` at ~1 py4j call."""
    vals = list(values)
    if not vals:
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr("array(" + ", ".join(_d(x) for x in vals) + ")")


def lit_double_matrix(rows: Sequence[Iterable[float]]) -> Column:
    """``array<array<double>>`` literal (nested form of
    :func:`lit_double_array`)."""
    if not rows:
        return F.expr("CAST(array() AS ARRAY<ARRAY<DOUBLE>>)")
    return F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(_d(x) for x in row) + ")" for row in rows
        )
        + ")"
    )
