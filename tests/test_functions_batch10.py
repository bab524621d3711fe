"""Function batch 10: Presto binary functions (big-endian / IEEE-754 bit
views, base32, xxhash64, murmur3_x64_128), the incomplete-gamma/beta CDF
completion (beta/gamma/chi_squared/f/inverse_beta), map_union_sum,
from_unixtime_nanos, is_private, key_sampling_percent.

Oracle strategy: published constants where they exist (RFC 4648 base32
vectors, IEEE-754 bit patterns, the xxHash reference test vector), pure
Python/stdlib recomputation for the bit views, and closed-form identity
points + self-consistency sweeps for the special-function CDFs (integer
shapes have exact elementary closed forms — an independent check of the
series/continued-fraction code paths).

Ref surface: the reference registers the whole Presto scalar library
(axiom/optimizer/tests/AxiomSql.cpp:149); Presto binary/statistical
function docs define the semantics checked here.
"""

import math
import struct

import pytest
import pyspark.sql.functions as F

from verax_spark.functions.presto import presto_call as pc
from verax_spark.functions import udfs


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


# ---------------------------------------------------------------------------
# big-endian bit views
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("v", [0, 1, 255, 2**40 + 17, -1, -2**63, 2**63 - 1])
def test_big_endian_64_roundtrip(spark, v):
    out = _one(
        spark, pc("from_big_endian_64", pc("to_big_endian_64", F.lit(v)))
    )
    assert out == v
    raw = _one(spark, pc("to_big_endian_64", F.lit(v)))
    assert bytes(raw) == struct.pack(">q", v)


@pytest.mark.parametrize("v", [0, 1, -1, 2**31 - 1, -(2**31), 123456])
def test_big_endian_32_roundtrip(spark, v):
    raw = _one(spark, pc("to_big_endian_32", F.lit(v)))
    assert bytes(raw) == struct.pack(">i", v)
    out = _one(
        spark, pc("from_big_endian_32", pc("to_big_endian_32", F.lit(v)))
    )
    assert out == v


def test_big_endian_sql_udfs(spark):
    from verax_spark.functions.presto import register_sql_compat

    register_sql_compat(spark)
    row = spark.sql(
        "select from_big_endian_64(to_big_endian_64(-7)) a, "
        "from_big_endian_32(to_big_endian_32(-7)) b, "
        "hex(to_big_endian_64(255)) h"
    ).collect()[0]
    assert row.a == -7 and row.b == -7
    assert row.h == "00000000000000FF"


# ---------------------------------------------------------------------------
# IEEE-754 bit views
# ---------------------------------------------------------------------------


def test_ieee754_64(spark):
    raw = _one(spark, pc("to_ieee754_64", F.lit(1.0)))
    assert bytes(raw).hex() == "3ff0000000000000"  # IEEE-754 for 1.0
    for v in [0.0, -2.5, math.pi, 1e308, -1e-300]:
        assert _one(
            spark, pc("from_ieee754_64", pc("to_ieee754_64", F.lit(v)))
        ) == v


def test_ieee754_32(spark):
    raw = _one(spark, pc("to_ieee754_32", F.lit(1.0)))
    assert bytes(raw).hex() == "3f800000"
    # roundtrip lands on the nearest float32
    out = _one(spark, pc("from_ieee754_32", pc("to_ieee754_32", F.lit(0.1))))
    assert out == struct.unpack(">f", struct.pack(">f", 0.1))[0]


# ---------------------------------------------------------------------------
# base32 (RFC 4648 §10 test vectors)
# ---------------------------------------------------------------------------

_RFC4648 = {
    "": "",
    "f": "MY======",
    "fo": "MZXQ====",
    "foo": "MZXW6===",
    "foob": "MZXW6YQ=",
    "fooba": "MZXW6YTB",
    "foobar": "MZXW6YTBOI======",
}


def test_base32_rfc_vectors(spark):
    for plain, enc in _RFC4648.items():
        assert _one(spark, pc("to_base32", F.lit(plain))) == enc
        back = _one(spark, pc("from_base32", F.lit(enc)))
        assert bytes(back).decode() == plain


# ---------------------------------------------------------------------------
# hashes
# ---------------------------------------------------------------------------


def test_xxh64_reference_vectors():
    # xxHash repository's published sanity values
    assert udfs.xxh64(b"") == 0xEF46DB3751D8E999
    # self-consistency across the three code paths (tail-only, 8/4-byte
    # lanes, >=32-byte stripe loop)
    for data in [b"a", b"abcd", b"abcdefgh", b"x" * 31, b"x" * 32, b"x" * 100]:
        h = udfs.xxh64(data)
        assert 0 <= h < 2**64
        assert udfs.xxh64(data) == h
        assert udfs.xxh64(data, seed=1) != h


def test_xxhash64_udf(spark):
    out = _one(spark, pc("xxhash64", F.lit("")))
    assert bytes(out) == (0xEF46DB3751D8E999).to_bytes(8, "big")


def test_murmur3_x64_128():
    # empty input, seed 0: both lanes stay 0 through the finalizer
    assert udfs.murmur3_x64_128(b"") == b"\x00" * 16
    seen = set()
    for data in [b"a", b"abc", b"0123456789abcde", b"0123456789abcdef",
                 b"0123456789abcdefg", b"x" * 64]:
        h = udfs.murmur3_x64_128(data)
        assert len(h) == 16
        assert h not in seen
        seen.add(h)
        assert udfs.murmur3_x64_128(data) == h


def test_key_sampling_percent(spark):
    vals = (
        spark.createDataFrame([(f"k{i}",) for i in range(200)], ["k"])
        .select(pc("key_sampling_percent", F.col("k")).alias("p"))
        .collect()
    )
    ps = [r.p for r in vals]
    assert all(0.0 <= p < 1.0 for p in ps)
    assert len(set(ps)) > 190  # near-uniform, deterministic
    again = _one(spark, pc("key_sampling_percent", F.lit("k0")))
    assert again == ps[0]


# ---------------------------------------------------------------------------
# incomplete-gamma/beta CDF family
# ---------------------------------------------------------------------------


def test_gamma_cdf_closed_forms():
    # shape 1 => exponential: P(1, x) = 1 - e^-x
    for x in [0.01, 0.5, 1.0, 3.0, 10.0]:
        assert udfs.reg_gamma_p(1.0, x) == pytest.approx(
            1 - math.exp(-x), abs=1e-12
        )
    # integer shape 3: P(3, x) = 1 - e^-x (1 + x + x^2/2)
    for x in [0.2, 1.0, 2.5, 8.0]:
        assert udfs.reg_gamma_p(3.0, x) == pytest.approx(
            1 - math.exp(-x) * (1 + x + x * x / 2), abs=1e-12
        )
    # series vs continued-fraction joint consistency at the x = a+1 seam
    for a in [0.3, 2.7, 9.5]:
        lo = udfs.reg_gamma_p(a, a + 1 - 1e-9)
        hi = udfs.reg_gamma_p(a, a + 1 + 1e-9)
        assert hi == pytest.approx(lo, abs=1e-7)


def test_beta_closed_forms():
    # I_x(2,3) = 6x^2(1-x)^2 + 4x^3(1-x) + x^4
    for x in [0.1, 0.35, 0.5, 0.8, 0.99]:
        exact = 6 * x**2 * (1 - x) ** 2 + 4 * x**3 * (1 - x) + x**4
        assert udfs.reg_beta_i(2.0, 3.0, x) == pytest.approx(exact, abs=1e-12)
    # symmetry I_x(a,b) = 1 - I_{1-x}(b,a) off the closed-form grid
    for a, b, x in [(0.5, 2.5, 0.3), (4.2, 1.1, 0.77), (7.0, 7.0, 0.5)]:
        assert udfs.reg_beta_i(a, b, x) == pytest.approx(
            1 - udfs.reg_beta_i(b, a, 1 - x), abs=1e-10
        )


def test_inverse_beta_roundtrip():
    for a, b, p in [(2.0, 1.0, 0.25), (0.7, 3.3, 0.5), (5.0, 2.0, 0.9)]:
        x = udfs.inv_reg_beta(a, b, p)
        assert udfs.reg_beta_i(a, b, x) == pytest.approx(p, abs=1e-9)
    # inverse_beta_cdf(2, 1, p) = sqrt(p)
    assert udfs.inv_reg_beta(2.0, 1.0, 0.25) == pytest.approx(0.5, abs=1e-9)


def test_cdf_udfs(spark):
    row = (
        spark.range(1)
        .select(
            pc("gamma_cdf", F.lit(1.0), F.lit(2.0), F.lit(3.0)).alias("g"),
            pc("chi_squared_cdf", F.lit(4.0), F.lit(5.0)).alias("c"),
            pc("beta_cdf", F.lit(2.0), F.lit(3.0), F.lit(0.4)).alias("b"),
            pc("f_cdf", F.lit(2.0), F.lit(4.0), F.lit(1.5)).alias("f"),
            pc("inverse_beta_cdf", F.lit(2.0), F.lit(1.0), F.lit(0.81)).alias(
                "ib"
            ),
        )
        .collect()[0]
    )
    assert row.g == pytest.approx(1 - math.exp(-1.5), abs=1e-12)
    assert row.c == pytest.approx(1 - math.exp(-2.5) * (1 + 2.5), abs=1e-12)
    x = 0.4
    assert row.b == pytest.approx(
        6 * x**2 * (1 - x) ** 2 + 4 * x**3 * (1 - x) + x**4, abs=1e-12
    )
    # f_cdf(2, 4, x) = 1 - (1 - y)^2 with y = 2x / (2x + 4)
    y = 2 * 1.5 / (2 * 1.5 + 4)
    assert row.f == pytest.approx(1 - (1 - y) ** 2, abs=1e-12)
    assert row.ib == pytest.approx(0.9, abs=1e-9)


# ---------------------------------------------------------------------------
# map_union_sum / from_unixtime_nanos / is_private
# ---------------------------------------------------------------------------


def test_map_union_sum(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": 2}), (1, {"b": 10, "c": 5}), (2, {"z": 7})],
        ["g", "m"],
    )
    rows = {
        r.g: r.u
        for r in df.groupBy("g")
        .agg(pc("map_union_sum", F.col("m")).alias("u"))
        .collect()
    }
    assert rows[1] == {"a": 1, "b": 12, "c": 5}
    assert rows[2] == {"z": 7}


def test_map_union_sum_sql(spark):
    from verax_spark.sql.presto import PrestoSession

    ps = PrestoSession(spark)
    df = spark.createDataFrame(
        [(1, {"a": 1.0, "b": 2.0}), (1, {"b": 10.0, "c": 5.0})], ["g", "m"]
    )
    df.createOrReplaceTempView("mus_t")
    out = ps.sql("select g, map_union_sum(m) u from mus_t group by g")
    got = out.collect()[0].u
    assert got == {"a": 1.0, "b": 12.0, "c": 5.0}


def test_from_unixtime_nanos(spark):
    out = _one(
        spark,
        F.unix_micros(pc("from_unixtime_nanos", F.lit(1500000000123456789))),
    )
    assert out == 1500000000123456
    # pre-epoch: floor toward negative infinity
    out = _one(spark, F.unix_micros(pc("from_unixtime_nanos", F.lit(-1500))))
    assert out == -2


@pytest.mark.parametrize(
    "ip,expected",
    [
        ("10.1.2.3", True),
        ("192.168.255.1", True),
        ("172.16.0.1", True),
        ("172.32.0.1", False),
        ("100.64.3.1", True),
        ("8.8.8.8", False),
        ("127.0.0.1", True),
        ("203.0.113.9", True),
        ("203.0.114.9", False),
        ("240.1.2.3", True),
    ],
)
def test_is_private(spark, ip, expected):
    assert _one(spark, pc("is_private", F.lit(ip))) is expected


def test_is_private_sql(spark):
    from verax_spark.functions.presto import register_sql_compat

    register_sql_compat(spark)
    row = spark.sql(
        "select is_private('10.0.0.1') a, is_private('8.8.8.8') b"
    ).collect()[0]
    assert row.a is True and row.b is False


# ---------------------------------------------------------------------------
# batch 11: classification aggregates


def test_classification_curves(spark):
    """Hand-computable 6-row corpus: curves match exact TP/FP/FN algebra."""
    rows = [
        (True, 0.9), (True, 0.6), (True, 0.2),
        (False, 0.7), (False, 0.3), (False, 0.1),
    ]
    df = spark.createDataFrame(rows, ["y", "x"])
    out = df.agg(
        pc("classification_recall", 4, F.col("y"), F.col("x")).alias("rc"),
        pc("classification_miss_rate", 4, F.col("y"), F.col("x")).alias("mr"),
        pc("classification_fall_out", 4, F.col("y"), F.col("x")).alias("fo"),
        pc("classification_precision", 4, F.col("y"), F.col("x")).alias("pr"),
        pc("classification_thresholds", 4, F.col("y"), F.col("x")).alias("th"),
    ).collect()[0]
    # thresholds 0, .25, .5, .75; P = 3, N = 3
    # t=0: TP=3 FP=3; t=.25: TP=2 FP=2; t=.5: TP=2 FP=1; t=.75: TP=1 FP=0
    assert out.th == [0.0, 0.25, 0.5, 0.75]
    assert out.rc == pytest.approx([1.0, 2 / 3, 2 / 3, 1 / 3])
    assert out.mr == pytest.approx([0.0, 1 / 3, 1 / 3, 2 / 3])
    assert out.fo == pytest.approx([1.0, 2 / 3, 1 / 3, 0.0])
    assert out.pr == pytest.approx([0.5, 0.5, 2 / 3, 1.0])


def test_classification_weights_and_range_filter(spark):
    """Weights scale the sums; predictions outside [0,1] are excluded."""
    rows = [
        (True, 0.8, 2.0), (True, 0.8, 1.0), (False, 0.8, 1.0),
        (True, 1.5, 100.0),  # out of range: ignored entirely
    ]
    df = spark.createDataFrame(rows, ["y", "x", "w"])
    out = df.agg(
        pc(
            "classification_precision", 2, F.col("y"), F.col("x"), F.col("w")
        ).alias("pr")
    ).collect()[0]
    # both thresholds (0, .5) keep all in-range rows: TP=3, FP=1
    assert out.pr == pytest.approx([0.75, 0.75])
