"""Unit tests for the column-function library against independent
oracles (known geohash vectors, stdlib erf, struct-packed WKB)."""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from gtfs_realtime_etl_spark.functions import (
    geohash_encode,
    gtfs_time_to_secs,
    norm_cdf,
    point_wkb,
    seconds_of_day,
    token_count,
)
from gtfs_realtime_etl_spark.functions.stats import norm_cdf_sql
from gtfs_realtime_etl_spark.functions.text import lang_id
from gtfs_realtime_etl_spark.functions.time import NOT_PAST_MIDNIGHT

# Known geohash vectors (classic public test points).
GEOHASH_CASES = [
    (57.64911, 10.40744, "u4pruyd"),
    (43.6532, -79.3832, "dpz83df"),
    (-33.8688, 151.2093, "r3gx2f7"),
    (0.0, 0.0, "s000000"),
    (90.0, 180.0, "zzzzzzz"),  # edge clamp
    (-90.0, -180.0, "0000000"),
]


def test_geohash_known_values(spark):
    df = spark.createDataFrame(
        [(lat, lon) for lat, lon, _ in GEOHASH_CASES], "lat double, lon double"
    )
    got = [
        r.gh
        for r in df.select(
            geohash_encode(F.col("lat"), F.col("lon"), 7).alias("gh")
        ).collect()
    ]
    assert got == [gh for _, _, gh in GEOHASH_CASES]


def test_norm_cdf_vs_erf(spark):
    xs = [-4.0, -2.0, -1.0, -0.5, 0.0, 0.3, 1.0, 1.96, 3.5]
    df = spark.range(1).select(
        *[norm_cdf(F.lit(x)).alias(f"c{i}") for i, x in enumerate(xs)]
    )
    row = df.collect()[0]
    for i, x in enumerate(xs):
        exact = 0.5 * (1 + math.erf(x / math.sqrt(2)))
        assert row[i] == pytest.approx(exact, abs=2e-7)


def test_norm_cdf_sql_matches_spark(spark):
    """The SQL rendering is algebraically identical to the Column
    version; results agree to ULP level (JVM Math.exp and C libm may
    differ in the last bit, which the queries' 6-dp rounding absorbs)."""
    import duckdb

    xs = [-2.0, -0.5, 0.0, 0.77, 2.5]
    srow = spark.range(1).select(
        *[norm_cdf(F.lit(x)).alias(f"c{i}") for i, x in enumerate(xs)]
    ).collect()[0]
    con = duckdb.connect()
    for i, x in enumerate(xs):
        (dv,) = con.execute(f"SELECT {norm_cdf_sql(repr(x))}").fetchone()
        assert srow[i] == pytest.approx(dv, abs=1e-14)


def test_point_wkb_bytes(spark):
    df = spark.createDataFrame([(-79.38, 43.65)], "lon double, lat double")
    (got,) = df.select(point_wkb(F.col("lon"), F.col("lat")).alias("w")).collect()
    assert bytes(got.w) == struct.pack("<BIdd", 1, 1, -79.38, 43.65)


def test_wkb_point_lonlat_roundtrip(spark):
    """wkb_point_lonlat is the exact inverse of point_wkb: little- and
    big-endian WKB points decode bit-exactly; nulls, wrong-length
    payloads, and non-Point geometry types decode to null."""
    from gtfs_realtime_etl_spark.functions.geo import wkb_point_lonlat

    le = struct.pack("<BIdd", 1, 1, -79.38, 43.65)
    be = struct.pack(">BIdd", 0, 1, 139.6917, 35.6895)
    linestring = struct.pack("<BIdd", 1, 2, 1.0, 2.0)
    rows = [(le,), (be,), (linestring,), (None,), (b"\x01short",)]
    df = spark.createDataFrame(rows, "wkb binary")
    out = df.select(wkb_point_lonlat(F.col("wkb")).alias("pt")).collect()
    assert (out[0].pt.lon, out[0].pt.lat) == (-79.38, 43.65)
    assert (out[1].pt.lon, out[1].pt.lat) == (139.6917, 35.6895)
    assert out[2].pt.lon is None and out[2].pt.lat is None
    assert out[3].pt.lon is None
    assert out[4].pt.lon is None

    # roundtrip through the writer on a grid of awkward doubles
    vals = [(-180.0, -90.0), (0.0, 0.0), (1e-308, -1e-308), (179.999999, 89.999999)]
    df2 = spark.createDataFrame(vals, "lon double, lat double")
    rt = df2.select(
        "lon", "lat",
        wkb_point_lonlat(point_wkb(F.col("lon"), F.col("lat"))).alias("pt"),
    ).collect()
    for r in rt:
        assert r.pt.lon == r.lon and r.pt.lat == r.lat


def test_gtfs_time_handling(spark):
    df = spark.createDataFrame(
        [("06:30:15",), ("25:10:00",), ("00:00:00",)], "t string"
    )
    rows = df.select(
        gtfs_time_to_secs(F.col("t")).alias("s"),
        NOT_PAST_MIDNIGHT(F.col("t")).alias("keep"),
    ).collect()
    assert [r.s for r in rows] == [6 * 3600 + 30 * 60 + 15, 25 * 3600 + 600, 0]
    assert [r.keep for r in rows] == [True, False, True]


def test_seconds_of_day_session_tz(spark):
    # 2024-03-05 14:30:00 America/Toronto == 19:30:00 UTC
    df = spark.createDataFrame([(1709667000,)], "epoch long").select(
        F.to_timestamp(F.from_unixtime("epoch")).alias("ts")
    )
    (row,) = df.select(seconds_of_day(F.col("ts")).alias("s")).collect()
    assert row.s == 14 * 3600 + 30 * 60


def test_lang_id_real_sentences(spark):
    cases = [
        ("the cat sat on the mat and it is happy", "en"),
        ("le chat est sur la table et il est content", "fr"),
        ("der hund ist nicht mit der katze", "de"),
        ("el perro y el gato en la casa", "es"),
        ("zzz qqq xxx", "und"),
    ]
    df = spark.createDataFrame(cases, "text string, expected string")
    rows = df.select(lang_id(F.col("text")).alias("got"), "expected").collect()
    for r in rows:
        assert r.got == r.expected


def test_token_count(spark):
    df = spark.createDataFrame([("  a b   c  ",), ("", ), ("one",)], "t string")
    got = [r.n for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert got == [3, 0, 1]


def test_lang_id_kernel_matches_column(spark):
    """The Arrow lang-ID kernel (hot path) is bit-identical to the
    Column form on adversarial inputs: ties, zero hits, mixed case,
    tabs/newlines, empties, nulls, non-ASCII."""
    from gtfs_realtime_etl_spark.functions.text import lang_id_kernel

    texts = [
        "THE cat AND the dog IS it",
        "le chat est sur la table",
        "el perro y el gato",          # es words
        "de la en es",                 # fr/es tie → earliest sorted lang
        "zzz qqq",                     # und
        "  \t the \n and\tof  ",      # odd whitespace
        "",
        None,
        "das ist nicht von zu der die und ein mit",
        "café déjà vu the the",       # non-ASCII chars present
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    from gtfs_realtime_etl_spark.functions.text import lang_id

    rows = df.select(
        lang_id(F.col("text")).alias("col_form"),
        lang_id_kernel()(F.col("text")).alias("kernel"),
    ).collect()
    for r in rows:
        assert r.col_form == r.kernel


def test_doc_fingerprint_kernel_matches_column(spark):
    """The Arrow fingerprint kernel is bit-identical to the interpreted
    Column Horner fold (same base/modulus) on edge-shaped inputs."""
    from gtfs_realtime_etl_spark.functions.hashing import doc_fingerprint_kernel
    from gtfs_realtime_etl_spark.plans.queries import doc_fingerprint_column

    texts = ["", "A", "abc", "The QUICK brown FOX! 123", "é" * 5, "x" * 3000, None]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        doc_fingerprint_column(F.col("text")).alias("col_form"),
        doc_fingerprint_kernel()(F.col("text")).alias("kernel"),
    ).collect()
    for r in rows:
        assert r.col_form == r.kernel


def test_pii_patterns_on_crafted_strings(spark):
    """Redaction + counting on strings with real PII shapes (emails,
    IPv4s, phones), near-misses, and adjacency — and Spark must agree
    with the DuckDB twins token for token."""
    import duckdb

    from gtfs_realtime_etl_spark.functions.text import (
        pii_count,
        redact_pii,
        sql_pii_count,
        sql_redact_pii,
    )

    cases = [
        "mail a.b-c_d%x+1@sub.domain.org now",
        "two bob@x.io and eve@y.co.uk here",
        "ip 192.168.0.1 and 10.0.255.7, not 1.2.3 or 300.300",  # 300.300 not ipv4
        "call 555-867-5309 or 555 123 4567 or 555.000.1111",
        "no pii at all",
        "a@b.c",  # single-letter TLD: NOT an email per the pattern
        "edge9@x.ab.cd 7.7.7.7",
    ]
    df = spark.createDataFrame([(t,) for t in cases], "t string")
    t = F.col("t")
    rows = df.select(
        "t",
        pii_count(t, "email").alias("e"),
        pii_count(t, "ipv4").alias("i"),
        pii_count(t, "phone").alias("p"),
        redact_pii(t).alias("red"),
    ).collect()
    by_text = {r.t: r for r in rows}
    assert by_text[cases[0]].e == 1
    assert by_text[cases[1]].e == 2
    assert by_text[cases[2]].i == 2
    assert by_text[cases[3]].p == 3
    assert by_text[cases[4]].red == cases[4]
    assert by_text[cases[5]].e == 0
    assert "[PII]" in by_text[cases[6]].red and "@" not in by_text[cases[6]].red

    con = duckdb.connect()
    for r in rows:
        lit = "'" + r.t.replace("'", "''") + "'"
        e, i, p, red = con.execute(
            f"SELECT {sql_pii_count(lit, 'email')}, {sql_pii_count(lit, 'ipv4')}, "
            f"{sql_pii_count(lit, 'phone')}, {sql_redact_pii(lit)}"
        ).fetchone()
        assert (r.e, r.i, r.p, r.red) == (e, i, p, red), r.t


def test_bigrams_edges(spark):
    from gtfs_realtime_etl_spark.functions.text import bigrams, tokens

    df = spark.createDataFrame(
        [("a b c",), ("one",), ("",), ("  X  y Z ",)], "t string"
    )
    got = [
        r.g
        for r in df.select(bigrams(tokens(F.col("t"))).alias("g")).collect()
    ]
    assert got[0] == ["a b", "b c"]
    assert got[1] == [] and got[2] == []
    assert got[3] == ["x y", "y z"]


def test_to_web_mercator_known_values(spark):
    """EPSG:3857 anchors (values pyproj's 4326->3857 transformer yields
    to float precision; (1,1) is the widely published OSM anchor
    111319.49079327357 / 111325.1428663851)."""
    from gtfs_realtime_etl_spark.functions.geo import to_web_mercator

    cases = [
        (0.0, 0.0, 0.0, 0.0),
        (180.0, 0.0, 20037508.342789244, 0.0),
        (1.0, 1.0, 111319.49079327357, 111325.1428663851),
        (-79.38, 43.65, -8836541.179170055, 5411437.673564396),
        (151.2093, -33.8688, 16832542.27920734, -4011198.6473075734),
    ]
    df = spark.createDataFrame(
        [(lon, lat) for lon, lat, _, _ in cases], "lon double, lat double"
    )
    got = (
        df.select("lon", "lat", to_web_mercator(F.col("lon"), F.col("lat")).alias("m"))
        .orderBy("lon")
        .collect()
    )
    exp = {(lon, lat): (x, y) for lon, lat, x, y in cases}
    for r in got:
        x, y = exp[(r.lon, r.lat)]
        assert abs(r.m.x - x) <= 1e-6, (r.lon, r.lat)
        assert abs(r.m.y - y) <= 1e-6, (r.lon, r.lat)


def test_portable_int_log2_accuracy_and_cross_engine_bits(spark):
    """portable_int_log2 is (a) within 1e-12 of math.log2 and (b)
    BIT-identical between Spark and DuckDB — the property engine-native
    log2 lacks (last-ulp divergence flips fixed-dp rounding)."""
    import math

    import duckdb

    from gtfs_realtime_etl_spark.functions.stats import (
        portable_int_log2,
        portable_int_log2_sql,
    )

    vals = [1, 2, 3, 7, 29, 1023, 1024, 1025, 999_983, 2**40 - 1, 2**40,
            12_345_678_901]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    got = {
        r.n: r.lg
        for r in df.select("n", portable_int_log2(F.col("n")).alias("lg")).collect()
    }
    con = duckdb.connect()
    for n in vals:
        frag = portable_int_log2_sql(str(n), "p")
        (oracle,) = con.execute(f"SELECT p_lg FROM (SELECT {frag})").fetchone()
        assert got[n] == oracle, (n, got[n], oracle)  # bit-identical
        assert abs(got[n] - math.log2(n)) < 1e-12, (n, got[n])


def test_portable_int_log2_staged_bit_identical(spark):
    """The staged multi-column form (round-11, plan-compile fix) must
    produce the bit-identical double of the inline Column form for
    every input — same correctly-rounded ops in the same order, only
    the intermediates are named."""
    import random

    from gtfs_realtime_etl_spark.functions.stats import (
        portable_int_log2,
        portable_int_log2_staged,
    )

    rnd = random.Random(411)
    vals = [1, 2, 3, 5, 7, 8, 1023, 1024, 1025, 10**6, 10**12,
            2**62, (2**63) - 1]
    vals += [rnd.getrandbits(50) | 1 for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in sorted(set(vals))], "n long")
    inline = df.select("n", portable_int_log2(F.col("n")).alias("lg_i"))
    staged = portable_int_log2_staged(df, {"lg_s": F.col("n")})
    # String inputs take the round-12 selectExpr fast path — same grid,
    # same bit-identity requirement.
    fast = portable_int_log2_staged(df, {"lg_q": "n"})
    j = inline.join(staged, "n").join(fast, "n")
    assert (
        j.filter(
            F.col("lg_i").isNull()
            | F.col("lg_s").isNull()
            | F.col("lg_q").isNull()
        ).count()
        == 0
    )
    assert j.filter(F.col("lg_i") != F.col("lg_s")).count() == 0
    assert j.filter(F.col("lg_i") != F.col("lg_q")).count() == 0


def test_lit_double_array_bit_identical(spark):
    """SQL-parsed literal arrays (round-12 plan-construction fix) must
    carry exactly the bits of the F.lit form — D-suffixed repr goes
    through Double.parseDouble, which is correctly rounded on the
    shortest round-tripping string."""
    import math
    import random
    import struct

    import pytest

    from gtfs_realtime_etl_spark.functions.exprs import (
        lit_double_array,
        lit_double_matrix,
    )

    rnd = random.Random(412)
    vals = [0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 1 / 3, 2**-30, 1e-300,
            1e300, 123456789.123456789, 5e-324]
    vals += [rnd.uniform(-1e6, 1e6) for _ in range(100)]
    vals += [rnd.random() * 10**rnd.randint(-200, 200) for _ in range(100)]
    df = spark.range(1)
    a = df.select(
        F.array(*[F.lit(float(x)) for x in vals]).alias("v")
    ).collect()[0].v
    b = df.select(lit_double_array(vals).alias("v")).collect()[0].v
    pack = lambda xs: [struct.pack(">d", x) for x in xs]  # noqa: E731
    assert pack(a) == pack(b)
    m = df.select(
        lit_double_matrix([vals[:5], vals[5:10]]).alias("m")
    ).collect()[0].m
    assert pack(m[0]) == pack(vals[:5]) and pack(m[1]) == pack(vals[5:10])
    assert df.select(lit_double_array([]).alias("e")).collect()[0].e == []
    with pytest.raises(ValueError):
        lit_double_array([math.nan])
