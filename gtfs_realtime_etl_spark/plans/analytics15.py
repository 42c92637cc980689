"""Nineteenth query bank: distribution distance, audience overlap, and
market concentration.

- ``wasserstein_drift`` — EXACT 1-D Wasserstein-1 (earth mover's)
  distance between the two user-parity halves of each event type's
  value distribution — the metric complement of ``ks_drift`` (KS is
  the sup of |F_a - F_b|; W1 is its integral, sensitive to WHERE mass
  moved).  Exactness: with integer-cents values and exact counts,
  |F_a(x) - F_b(x)| = |cum_a*n_b - cum_b*n_a| / (n_a*n_b), so
  W1 = Σ |cum_a*n_b - cum_b*n_a| * gap(x) summed as exact
  DECIMAL(38,0) with ONE final double division — engine-exact.  The
  step grid is each type's own distinct cents (both halves change
  only there), so the plan is one groupBy + one per-type ordered
  window — no union grid, no cross join.
- ``audience_overlap`` — pairwise audience intersection across event
  types (the ad-tech overlap matrix): per-user type SETS built in one
  user-grain aggregate, ordered pairs generated IN-ROW from each
  user's ≤|types| set (the dedup_agreement combination idiom — no
  self-join on the user table), then one tiny pair count.  Exact
  integers + Jaccard in ppm.
- ``hhi_concentration`` — Herfindahl–Hirschman supplier-revenue
  concentration per nation: exact integer cents per (nation,
  supplier), HHI = Σ share_i² reported from exact decimal sums with
  one final double division (scaled ×10⁶, the antitrust convention
  rescaled to ppm).  Plan: lineitem⋈supplier (broadcast dim),
  supplier-grain aggregate, nation-grain aggregate — two shuffles,
  both on keys that shrink the data.

Reference scope note: the reference (smohiudd/gtfs-realtime-etl) has
no analytics surface of this kind; these are driver-mandated
LLM-pipeline / warehouse extensions (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.sources.testdata import load_testdata


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_testdata(spark, sf_dir, tables=tuple(names))
    return [tabs[n] for n in names]


_CENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# wasserstein_drift
# ---------------------------------------------------------------------------


def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    counts = (
        events.select(
            "event_type",
            (F.col("user_id") % 2).alias("half"),
            F.expr(_CENTS).alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(
            F.sum(F.expr("CASE WHEN half = 0 THEN 1 ELSE 0 END")).alias("c0"),
            F.sum(F.expr("CASE WHEN half = 1 THEN 1 ELSE 0 END")).alias("c1"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    stepped = counts.select(
        "event_type",
        "cents",
        F.sum("c0").over(w).alias("cum0"),
        F.sum("c1").over(w).alias("cum1"),
        (F.lead("cents").over(w) - F.col("cents")).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    per_type = (
        events.select("event_type", (F.col("user_id") % 2).alias("half"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("CASE WHEN half = 0 THEN 1 ELSE 0 END")).alias("n0"),
            F.sum(F.expr("CASE WHEN half = 1 THEN 1 ELSE 0 END")).alias("n1"),
        )
    )
    sums = (
        stepped.join(F.broadcast(per_type), "event_type")
        .groupBy("event_type", "n0", "n1")
        .agg(
            F.sum(
                F.expr("CAST(abs(cum0 * n1 - cum1 * n0) * gap AS DECIMAL(38,0))")
            ).alias("num")
        )
    )
    return sums.select(
        "event_type",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.expr(
            "ROUND(CAST(num AS DOUBLE)"
            " / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)), 6)"
        ).alias("w1_cents"),
    )


Q_WASSERSTEIN_DRIFT_SQL = f"""
WITH ev AS (
  SELECT event_type, user_id % 2 AS half, {_CENTS} AS cents FROM events
),
counts AS (
  SELECT event_type, cents,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM ev GROUP BY 1, 2
),
stepped AS (
  SELECT event_type, cents,
         SUM(c0) OVER w AS cum0, SUM(c1) OVER w AS cum1,
         LEAD(cents) OVER w - cents AS gap
  FROM counts
  WINDOW w AS (PARTITION BY event_type ORDER BY cents)
),
per_type AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM ev GROUP BY 1
)
SELECT s.event_type, n0, n1,
       ROUND(CAST(SUM(CAST(abs(cum0 * n1 - cum1 * n0) * gap
                           AS DECIMAL(38,0))) AS DOUBLE)
             / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)), 6) AS w1_cents
FROM stepped s JOIN per_type p ON s.event_type = p.event_type
WHERE gap IS NOT NULL
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# audience_overlap
# ---------------------------------------------------------------------------


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    # Ordered pairs IN-ROW from each user's <=|event types| set — the
    # dedup_agreement combination idiom: no self-join on users.
    pairs = per_user.select(
        F.explode(
            F.expr(
                "flatten(transform(types, (a, i) ->"
                " transform(slice(types, i + 2, size(types)), b ->"
                " struct(a AS type_a, b AS type_b))))"
            )
        ).alias("p")
    ).groupBy("p.type_a", "p.type_b").agg(
        F.count(F.lit(1)).alias("n_both")
    )
    sizes = (
        events.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.withColumnRenamed("event_type", "type_a")),
            "type_a",
        )
        .withColumnRenamed("n_users", "n_a")
        .join(
            F.broadcast(sizes.withColumnRenamed("event_type", "type_b")),
            "type_b",
        )
        .withColumnRenamed("n_users", "n_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.expr("n_both * 1000000L div (n_a + n_b - n_both)").alias(
                "jaccard_ppm"
            ),
        )
    )


#: The oracle is the semantic SPEC, not the plan: a plain distinct
#: self-join on user (quadratic in types-per-user, fine for an oracle;
#: the Spark side generates pairs in-row with no self-join).
Q_AUDIENCE_OVERLAP_SQL = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM du a JOIN du b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
sizes AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY 1
)
SELECT type_a, type_b, sa.n_users AS n_a, sb.n_users AS n_b, n_both,
       CAST(n_both * 1000000 // (sa.n_users + sb.n_users - n_both)
            AS BIGINT) AS jaccard_ppm
FROM pairs
JOIN sizes sa ON pairs.type_a = sa.event_type
JOIN sizes sb ON pairs.type_b = sb.event_type
"""


# ---------------------------------------------------------------------------
# hhi_concentration
# ---------------------------------------------------------------------------


def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation = _t(
        spark, sf_dir, "lineitem", "supplier", "nation"
    )
    rev = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"
    per_supp = (
        lineitem.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum(F.expr(rev)).alias("c"))
    )
    # A small scale factor concentrates a nation's whole revenue in
    # a handful of suppliers, so BIGINT c*c overflows (measured at
    # sf0.001).  Each engine squares in its own exact 128-bit integer
    # form — Spark's DECIMAL(38,0) product (capped precision, exact
    # while the value fits 38 digits) and DuckDB's HUGEINT — identical
    # integer semantics, so the hash gate still compares exact values.
    per_nation = per_supp.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0))")).alias("t"),
        F.sum(
            F.expr(
                "CAST(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))"
                " AS DECIMAL(38,0))"
            )
        ).alias("sq"),
    )
    return (
        per_nation.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            "n_suppliers",
            F.col("t").cast("decimal(38,0)").alias("revenue_cents"),
            F.expr(
                "ROUND(CAST(sq AS DOUBLE) * 1000000.0"
                " / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)), 6)"
            ).alias("hhi_ppm"),
        )
    )


Q_HHI_CONCENTRATION_SQL = """
WITH per_supp AS (
  SELECT s_nationkey, s_suppkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                             + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
),
per_nation AS (
  SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         SUM(CAST(c AS DECIMAL(38,0))) AS t,
         SUM(CAST(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
                  AS DECIMAL(38,0))) AS sq
  FROM per_supp GROUP BY 1
)
SELECT n_name, n_suppliers,
       CAST(t AS DECIMAL(38,0)) AS revenue_cents,
       ROUND(CAST(sq AS DOUBLE) * 1000000.0
             / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS hhi_ppm
FROM per_nation JOIN nation ON s_nationkey = n_nationkey
"""


EXT18_QUERIES = {
    "wasserstein_drift": q_wasserstein_drift,
    "audience_overlap": q_audience_overlap,
    "hhi_concentration": q_hhi_concentration,
}

EXT18_ORACLE_SQL = {
    "wasserstein_drift": Q_WASSERSTEIN_DRIFT_SQL,
    "audience_overlap": Q_AUDIENCE_OVERLAP_SQL,
    "hhi_concentration": Q_HHI_CONCENTRATION_SQL,
}
