"""Presto function shim sanity: renames resolve, adapters behave, unknown
names fail loudly. Every PRESTO_TO_SPARK / _ADAPTERS entry is exercised with
representative typed args (test_every_mapping_entry) so an arity- or
semantics-incompatible mapping fails here, not at a user's call site."""

import datetime
import math

import pyspark.sql.functions as F
import pytest

from verax_spark.functions.presto import _ADAPTERS, PRESTO_TO_SPARK, presto_call

_URL = "https://example.com:8080/p/x?a=1&b=2#frag"


@pytest.fixture(scope="module")
def one(spark):
    return spark.createDataFrame(
        [(1, 2.5, "hello world", [1, 2, 3], True)],
        "i bigint, d double, s string, xs array<int>, b boolean",
    )


def test_scalar_renames_resolve(one):
    row = one.select(
        presto_call("cardinality", F.col("xs")).alias("card"),
        presto_call("strpos", F.col("s"), "world").alias("pos"),
        presto_call("codepoint", F.lit("A")).alias("cp"),
        presto_call("power", F.col("d"), 2).alias("sq"),
        presto_call("ceiling", F.col("d")).alias("ce"),
        presto_call("starts_with", F.col("s"), "he").alias("sw"),
        presto_call("regexp_like", F.col("s"), "w.rld").alias("rl"),
    ).collect()[0]
    assert (row.card, row.pos, row.cp) == (3, 7, 65)
    assert row.sq == 6.25 and row.ce == 3 and row.sw and row.rl


def test_aggregate_renames_resolve(one):
    row = one.select(
        presto_call("approx_distinct", F.col("i")).alias("ad"),
        presto_call("arbitrary", F.col("s")).alias("arb"),
        presto_call("bool_and", F.col("b")).alias("ba"),
        presto_call("bool_or", F.col("b")).alias("bo"),
    ).collect()[0]
    assert (row.ad, row.arb, row.ba, row.bo) == (1, "hello world", True, True)


def test_array_agg_and_set_agg(spark):
    df = spark.createDataFrame([(1,), (2,), (2,)], "x int")
    row = df.select(
        F.sort_array(presto_call("array_agg", F.col("x"))).alias("la"),
        F.sort_array(presto_call("set_agg", F.col("x"))).alias("sa"),
    ).collect()[0]
    assert row.la == [1, 2, 2] and row.sa == [1, 2]


def test_unknown_function_raises_actionably(one):
    with pytest.raises(ValueError, match="no Spark mapping"):
        one.select(presto_call("definitely_not_a_function", F.col("i")))


def test_array_union_dedups(one):
    row = one.select(
        presto_call("array_union", F.col("xs"), F.array(F.lit(3), F.lit(4))).alias("u")
    ).collect()[0]
    assert row.u == [1, 2, 3, 4]


# ---------------------------------------------------------------------------
# exhaustive per-entry coverage of the dialect maps
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fx(spark):
    return spark.sql(
        "select cast(5 as bigint) i, cast(2.5 as double) d, 'hello world' s, "
        "array(1, 2, 3) xs, array(3, 4) ys, true b, "
        "timestamp'2020-01-02 03:04:05.5' ts, "  # a Thursday
        "map('a', 1) m1, map('b', 2) m2, '{\"a\": 1}' j"
    )


def _c(name, *args):
    return presto_call(name, *args)


# name → list of (column, expected value | predicate); None → covered by a
# dedicated test below (context-dependent: grouping needs CUBE, reduce needs
# a SQL lambda). Built lazily: Columns need an active SparkContext.
# merge needs a sketch input; qdigest/tdigest_agg return pipeline markers
_NO_DIRECT_CASE = {
    "grouping", "reduce", "merge", "qdigest_agg", "tdigest_agg",
    # aggregate over grouped rows (no per-row fixture); covered by
    # test_geometry_union_agg
    "geometry_union_agg",
    # aggregate needing n >= 4 rows (single-row fixture is NULL by
    # definition); covered by test_presto_kurtosis
    "kurtosis",
    # operates on stored q-digest BYTES (no fixture column); covered by
    # test_sketches.test_qdigest_scalar_family_over_stored_bytes
    "quantile_at_value",
}


def _cases():
    return {
    "approx_distinct": [(_c("approx_distinct", F.col("i")), 1)],
    "chr": [(_c("chr", F.lit(66)), "B")],
    "approx_set": [(_c("approx_set", F.col("i")), lambda v: v is not None and len(bytes(v)) > 0)],
    # single-row fixture: geometric mean of {2.5} is 2.5 (exp(avg(ln x)))
    "geometric_mean": [
        (_c("geometric_mean", F.col("d")), lambda v: abs(v - 2.5) < 1e-12)
    ],
    "approx_percentile": [(_c("approx_percentile", F.col("d"), F.lit(0.5)), 2.5)],
    "arbitrary": [(_c("arbitrary", F.col("s")), "hello world")],
    "array_agg": [(_c("array_agg", F.col("i")), [5])],
    "set_agg": [(_c("set_agg", F.col("i")), [5])],
    "cardinality": [(_c("cardinality", F.col("xs")), 3)],
    "codepoint": [(_c("codepoint", F.lit("A")), 65)],
    "strpos": [(_c("strpos", F.col("s"), "world"), 7)],
    "starts_with": [(_c("starts_with", F.col("s"), "he"), True)],
    "ends_with": [(_c("ends_with", F.col("s"), "ld"), True)],
    "regexp_like": [(_c("regexp_like", F.col("s"), "w.rld"), True)],
    "json_extract_scalar": [(_c("json_extract_scalar", F.col("j"), "$.a"), "1")],
    "format_datetime": [(_c("format_datetime", F.col("ts"), "yyyy-MM-dd"), "2020-01-02")],
    "day_of_month": [(_c("day_of_month", F.col("ts")), 2)],
    "day_of_year": [(_c("day_of_year", F.col("ts")), 2)],
    "doy": [(_c("doy", F.col("ts")), 2)],
    "week_of_year": [(_c("week_of_year", F.col("ts")), 1)],
    "week": [(_c("week", F.col("ts")), 1)],
    "from_iso8601_timestamp": [
        (_c("from_iso8601_timestamp", F.lit("2020-01-02T03:04:05")),
         datetime.datetime(2020, 1, 2, 3, 4, 5)),
    ],
    "from_iso8601_date": [
        (_c("from_iso8601_date", F.lit("2020-01-02")), datetime.date(2020, 1, 2)),
    ],
    "bool_and": [(_c("bool_and", F.col("b")), True)],
    "bool_or": [(_c("bool_or", F.col("b")), True)],
    "count_if": [(_c("count_if", F.col("b")), 1)],
    "grouping": None,
    "is_nan": [(_c("is_nan", F.col("d")), False)],
    "power": [(_c("power", F.col("d"), F.lit(2)), 6.25)],
    "ln": [(_c("ln", F.lit(math.e)), lambda v: abs(v - 1.0) < 1e-12)],
    "ceiling": [(_c("ceiling", F.col("d")), 3)],
    "reduce": None,
    "zip": [(_c("zip", F.col("xs"), F.col("ys")), lambda v: len(v) == 3 and v[0][0] == 1 and v[0][1] == 3)],
    "flatten": [(_c("flatten", F.array(F.col("xs"), F.col("ys"))), [1, 2, 3, 3, 4])],
    "array_sort": [(_c("array_sort", F.array(F.lit(3), F.lit(1), F.lit(2))), [1, 2, 3])],
    "array_distinct": [(_c("array_distinct", F.array(F.lit(1), F.lit(1), F.lit(2))), [1, 2])],
    "arrays_overlap": [(_c("arrays_overlap", F.col("xs"), F.col("ys")), True)],
    "map_concat": [(_c("map_concat", F.col("m1"), F.col("m2")), {"a": 1, "b": 2})],
    "map_from_entries": [
        (_c("map_from_entries", F.array(F.struct(F.lit("k"), F.lit(1)))), {"k": 1}),
    ],
    "md5": [(_c("md5", F.lit("abc").cast("binary")), "900150983cd24fb0d6963f7d28e17f72")],
    "rand": [(_c("rand"), lambda v: 0.0 <= v < 1.0)],
    "array_to_string": [(_c("array_to_string", F.col("xs"), ","), "1,2,3")],
    # adapters
    "date_add": [
        (_c("date_add", "day", F.lit(3), F.col("ts")),
         datetime.datetime(2020, 1, 5, 3, 4, 5, 500000)),
        (_c("date_add", "month", F.lit(1), F.lit("2020-01-31 10:00:00").cast("timestamp")),
         datetime.datetime(2020, 2, 29, 10, 0)),  # clamps day-of-month
    ],
    "date_diff": [
        (_c("date_diff", "hour",
            F.lit("2020-01-01 00:00:00").cast("timestamp"),
            F.lit("2020-01-02 01:00:00").cast("timestamp")), 25),
        # truncation toward zero for negative spans
        (_c("date_diff", "day",
            F.lit("2020-01-02 00:00:00").cast("timestamp"),
            F.lit("2020-01-01 12:00:00").cast("timestamp")), 0),
        (_c("date_diff", "month",
            F.lit("2020-01-15").cast("timestamp"),
            F.lit("2020-03-14").cast("timestamp")), 1),
    ],
    "date_trunc": [
        (_c("date_trunc", "month", F.col("ts")), datetime.datetime(2020, 1, 1)),
    ],
    "truncate": [
        (_c("truncate", F.lit(-2.7)), -2.0),
        (_c("truncate", F.lit(2.7)), 2.0),
        (_c("truncate", F.lit(2.345), F.lit(2)), lambda v: abs(v - 2.34) < 1e-9),
    ],
    "sha256": [
        (_c("sha256", F.lit("abc")),
         lambda v: bytes(v).hex() == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"),
    ],
    "json_parse": [(_c("json_parse", F.lit('{"a":  1, "b": [2]}')), '{"a":1,"b":[2]}')],
    "day_of_week": [(_c("day_of_week", F.col("ts")), 4)],  # Thursday → ISO 4
    "dow": [(_c("dow", F.col("ts")), 4)],
    "to_unixtime": [(_c("to_unixtime", F.col("ts")), lambda v: v % 1.0 == 0.5)],
    "bitwise_and": [(_c("bitwise_and", F.lit(12), F.lit(10)), 8)],
    "bitwise_or": [(_c("bitwise_or", F.lit(12), F.lit(10)), 14)],
    "bitwise_xor": [(_c("bitwise_xor", F.lit(12), F.lit(10)), 6)],
    "substr": [
        (_c("substr", F.col("s"), 1, 5), "hello"),
        (_c("substr", F.col("s"), 7), "world"),
    ],
    "element_at": [
        (_c("element_at", F.col("xs"), 2), 2),
        (_c("element_at", F.col("xs"), 5), None),  # NULL out of range, no throw
    ],
    "concat_ws": [(_c("concat_ws", "-", F.lit("a"), F.lit("b")), "a-b")],
    "infinity": [(_c("infinity"), float("inf"))],
    "nan": [(_c("nan"), lambda v: math.isnan(v))],
    "from_unixtime": [
        (F.unix_micros(_c("from_unixtime", F.lit(1577934245))), 1577934245000000),
    ],
    "slice": [(_c("slice", F.col("xs"), 2, 2), [2, 3])],
    "array_union": [(_c("array_union", F.col("xs"), F.col("ys")), [1, 2, 3, 4])],
    "contains": [(_c("contains", F.col("xs"), F.lit(2)), True)],
    "map": [
        (_c("map", F.array(F.lit("a"), F.lit("b")), F.array(F.lit(1), F.lit(2))),
         {"a": 1, "b": 2}),
    ],
    "split_part": [(_c("split_part", F.lit("a,b,c"), F.lit(","), F.lit(2)), "b")],
    "min_by": [(_c("min_by", F.col("s"), F.col("i")), "hello world")],
    "max_by": [(_c("max_by", F.col("s"), F.col("i")), "hello world")],
    "random": [(_c("random"), lambda v: 0.0 <= v < 1.0)],
    "levenshtein_distance": [
        (_c("levenshtein_distance", F.lit("kitten"), F.lit("sitting")), 3)
    ],
    "to_hex": [(_c("to_hex", F.lit("4V").cast("binary")), "3456")],
    "from_hex": [(_c("from_hex", F.lit("3456")), bytearray(b"4V"))],
    "to_base64": [(_c("to_base64", F.lit("ab").cast("binary")), "YWI=")],
    "from_base64": [(_c("from_base64", F.lit("YWI=")), bytearray(b"ab"))],
    # Presto repeat builds an array (NOT string repetition)
    "repeat": [(_c("repeat", F.lit(7), F.lit(3)), [7, 7, 7])],
    # Presto split treats '.' as a literal delimiter, not a regex
    "split": [(_c("split", F.lit("a.b.c"), "."), ["a", "b", "c"])],
    # Presto date_format is MySQL-%-style
    "date_format": [
        (
            _c(
                "date_format",
                F.lit("2020-01-02 03:04:05").cast("timestamp"),
                "%Y-%m-%d %H:%i",
            ),
            "2020-01-02 03:04",
        )
    ],
    "regexp_split": [
        (_c("regexp_split", F.lit("a1b2c"), F.lit("[0-9]")), ["a", "b", "c"])
    ],
    "last_day_of_month": [
        (_c("last_day_of_month", F.lit("2020-02-15").cast("date")),
         datetime.date(2020, 2, 29)),
    ],
    # Presto date_parse is MySQL-%-style (Spark to_timestamp is Java-style)
    "date_parse": [
        (_c("date_parse", F.lit("02/01/2020 03:04"), "%d/%m/%Y %H:%i"),
         datetime.datetime(2020, 1, 2, 3, 4)),
    ],
    "url_extract_protocol": [
        (_c("url_extract_protocol", F.lit(_URL)), "https"),
    ],
    "url_extract_host": [(_c("url_extract_host", F.lit(_URL)), "example.com")],
    "url_extract_path": [(_c("url_extract_path", F.lit(_URL)), "/p/x")],
    "url_extract_query": [(_c("url_extract_query", F.lit(_URL)), "a=1&b=2")],
    "url_extract_fragment": [(_c("url_extract_fragment", F.lit(_URL)), "frag")],
    "url_extract_parameter": [
        (_c("url_extract_parameter", F.lit(_URL), "b"), "2"),
    ],
    # Presto to_base is lowercase; from_base parses back to bigint
    "to_base": [(_c("to_base", F.lit(255), 16), "ff")],
    "from_base": [(_c("from_base", F.lit("ff"), 16), 255)],
    # Presto bit_count(x, bits): popcount in the bits-wide window
    "bit_count": [
        (_c("bit_count", F.lit(7), F.lit(64)), 3),
        (_c("bit_count", F.lit(9), F.lit(8)), 2),
        (_c("bit_count", F.lit(-1), F.lit(8)), 8),
    ],
    "split_to_map": [
        (_c("split_to_map", F.lit("a=1,b=2"), F.lit(","), F.lit("=")),
         {"a": "1", "b": "2"}),
    ],
    "ngrams": [
        (_c("ngrams", F.col("xs"), 2), [[1, 2], [2, 3]]),
        (_c("ngrams", F.array(F.lit(9)), 3), [[9]]),  # shorter than n
    ],
    "array_sum": [
        (_c("array_sum", F.array(F.lit(1), F.lit(None).cast("int"), F.lit(2))), 3.0),
    ],
    "array_average": [
        (_c("array_average", F.array(F.lit(1.0), F.lit(3.0))), 2.0),
        (_c("array_average", F.array(F.lit(None).cast("double"))), None),
    ],
    "hamming_distance": [
        (_c("hamming_distance", F.lit("karolin"), F.lit("kathrin")), 3),
        (_c("hamming_distance", F.lit("abc"), F.lit("abc")), 0),
    ],
    "to_utf8": [
        (_c("to_utf8", F.lit("Aé")), lambda v: bytes(v) == "Aé".encode()),
    ],
    "from_utf8": [
        (_c("from_utf8", F.lit("hello").cast("binary")), "hello"),
    ],
    "millisecond": [
        (_c("millisecond", F.col("ts")), 500),
        (_c("millisecond", F.lit("2020-01-02 03:04:05")), 0),
    ],
    "json_array_get": [
        (_c("json_array_get", F.lit('[10, "x", {"a": 1}]'), 2), '{"a":1}'),
        (_c("json_array_get", F.lit('[10, "x"]'), 1), '"x"'),
    ],
    # --- batch 6 ---
    "strrpos": [
        (_c("strrpos", F.lit("abcabc"), F.lit("bc")), 5),
        (_c("strrpos", F.lit("abcabc"), F.lit("zz")), 0),
        (_c("strrpos", F.lit("aaaa"), F.lit("aa")), 3),
    ],
    "to_iso8601": [
        (
            _c("to_iso8601", F.lit("2020-01-02 03:04:05.5").cast("timestamp")),
            "2020-01-02T03:04:05.500",
        ),
    ],
    # ISO week-year: 2021-01-01 (Friday) belongs to ISO week 53 of 2020;
    # 2019-12-30 (Monday) belongs to ISO week 1 of 2020
    "year_of_week": [
        (_c("year_of_week", F.lit("2021-01-01").cast("date")), 2020),
        (_c("year_of_week", F.lit("2019-12-30").cast("date")), 2020),
        (_c("year_of_week", F.lit("2020-06-15").cast("date")), 2020),
    ],
    "yow": [(_c("yow", F.lit("2021-01-01").cast("date")), 2020)],
    "is_finite": [
        (_c("is_finite", F.lit(1.5)), True),
        (_c("is_finite", F.lit(float("inf"))), False),
        (_c("is_finite", F.lit(float("nan"))), False),
    ],
    # 79927398713 is the canonical valid Luhn number
    "luhn_check": [
        (_c("luhn_check", F.lit("79927398713")), True),
        (_c("luhn_check", F.lit("79927398714")), False),
        (_c("luhn_check", F.lit("4532015112830366")), True),
    ],
    "cosine_similarity": [
        # identical vectors → 1.0; orthogonal (disjoint keys) → 0.0
        (
            _c(
                "cosine_similarity",
                F.create_map(F.lit("a"), F.lit(3.0), F.lit("b"), F.lit(4.0)),
                F.create_map(F.lit("a"), F.lit(3.0), F.lit("b"), F.lit(4.0)),
            ),
            1.0,
        ),
        (
            _c(
                "cosine_similarity",
                F.create_map(F.lit("a"), F.lit(1.0)),
                F.create_map(F.lit("b"), F.lit(1.0)),
            ),
            0.0,
        ),
    ],
    "json_size": [
        (_c("json_size", F.lit('{"a": {"x": 1, "y": 2}}'), "$.a"), 2),
        (_c("json_size", F.lit('{"a": [1, 2, 3]}'), "$.a"), 3),
        (_c("json_size", F.lit('{"a": 7}'), "$.a"), 0),
        (_c("json_size", F.lit('{"a": 7}'), "$.b"), None),
    ],
    # Presto least/greatest: NULL if ANY argument is NULL (Spark skips NULLs)
    "least": [
        (_c("least", F.lit(3), F.lit(1), F.lit(2)), 1),
        (_c("least", F.lit(1), F.lit(None).cast("int")), None),
    ],
    "greatest": [
        (_c("greatest", F.lit(3), F.lit(1)), 3),
        (_c("greatest", F.lit(3), F.lit(None).cast("int")), None),
    ],
    # Presto array_min/max: NULL if the array contains NULL
    "array_min": [
        (_c("array_min", F.col("xs")), 1),
        (_c("array_min", F.array(F.lit(1), F.lit(None).cast("int"))), None),
    ],
    "array_max": [
        (_c("array_max", F.col("xs")), 3),
        (_c("array_max", F.array(F.lit(2), F.lit(None).cast("int"))), None),
    ],
    # Presto regexp_extract defaults to group 0 (Spark SQL defaults to 1)
    "regexp_extract": [
        (_c("regexp_extract", F.lit("abc123def"), "[0-9]+"), "123"),
        (_c("regexp_extract", F.lit("abc123def"), "([a-z]+)([0-9]+)", 2), "123"),
    ],
    # Presto 2-arg regexp_replace removes matches
    "regexp_replace": [
        (_c("regexp_replace", F.lit("abc123"), "[0-9]"), "abc"),
        (_c("regexp_replace", F.lit("abc123"), "[0-9]", "#"), "abc###"),
    ],
    "json_extract": [
        (_c("json_extract", F.lit('{"a": {"b": 1}}'), "$.a"), '{"b":1}'),
        # scalar strings stay JSON-quoted (get_json_object would unquote)
        (_c("json_extract", F.lit('{"s": "x"}'), "$.s"), '"x"'),
    ],
    "map_agg": [
        (_c("map_agg", F.col("i"), F.col("s")), {5: "hello world"}),
    ],
    # --- batch 7 ---
    "sha512": [
        (
            _c("sha512", F.lit("hello world")),
            "309ecc489c12d6eb4cc40f50c902f2b4d0ed77ee511a7c7a9bcd3ca86d4cd86f"
            "989dd35bc5ff499670da34255b45b0cfd830e81f605dcf7dc5542e93ae9cd76f",
        ),
    ],
    "hmac_md5": [
        (
            _c("hmac_md5", F.lit("hello world"), F.lit("key")),
            "ae92cf51adf91130130aefc2b39a7595",
        ),
    ],
    "hmac_sha1": [
        (
            _c("hmac_sha1", F.lit("hello world"), F.lit("key")),
            "34dd234b92683593560528f6193ea68c8005f615",
        ),
    ],
    "hmac_sha256": [
        (
            _c("hmac_sha256", F.lit("hello world"), F.lit("key")),
            "0ba06f1f9a6300461e43454535dc3c4223e47b1d357073d7536eae90ec095be1",
        ),
    ],
    "hmac_sha512": [
        (
            _c("hmac_sha512", F.lit("hello world"), F.lit("key")),
            "ea0625a5ff1cd1653a327f8a4ae2f478fc51405c73ddac3a8a05a7a810310a6a"
            "14d7c8b4d284013493a6016ecadc772cfd98ed6cbe745949c5e6119fafb63b54",
        ),
    ],
    "to_base64url": [
        (_c("to_base64url", F.lit("hello world")), "aGVsbG8gd29ybGQ="),
        # bytes fb ff be encode to '+/++' in standard base64 → '-_--'
        (_c("to_base64url", F.unhex(F.lit("FBFFBE"))), "-_--"),
    ],
    "from_base64url": [
        (_c("from_base64url", F.lit("aGVsbG8gd29ybGQ=")), b"hello world"),
        (_c("from_base64url", F.lit("-_--")), bytes([251, 255, 190])),
    ],
    "wilson_interval_lower": [
        (
            _c("wilson_interval_lower", F.lit(50), F.lit(100), F.lit(1.96)),
            lambda v: abs(v - _wilson_py(50, 100, 1.96, -1)) < 1e-12,
        ),
    ],
    "wilson_interval_upper": [
        (
            _c("wilson_interval_upper", F.lit(50), F.lit(100), F.lit(1.96)),
            lambda v: abs(v - _wilson_py(50, 100, 1.96, +1)) < 1e-12,
        ),
    ],
    # session zone is UTC in tests → offset 0 (the shim reads the session
    # zone; Presto reads the value's zone)
    "timezone_hour": [(_c("timezone_hour", F.col("ts")), 0)],
    "timezone_minute": [(_c("timezone_minute", F.col("ts")), 0)],
    "parse_datetime": [
        (
            _c("parse_datetime", F.lit("2020-01-02 03:04:05"), "yyyy-MM-dd HH:mm:ss"),
            datetime.datetime(2020, 1, 2, 3, 4, 5),
        ),
    ],
    "url_extract_port": [
        (_c("url_extract_port", F.lit(_URL)), 8080),
        (_c("url_extract_port", F.lit("https://example.com/p")), None),
        (_c("url_extract_port", F.lit("https://u:pw@example.com:9443/p")), 9443),
    ],
    "json_format": [
        (_c("json_format", F.lit('{"a":   1, "b": [1, 2]}')), '{"a":1,"b":[1,2]}'),
    ],
    "json_array_contains": [
        (_c("json_array_contains", F.lit("[1, 2, 3]"), F.lit(2)), True),
        (_c("json_array_contains", F.lit("[1, 2, 3]"), F.lit(5)), False),
        (_c("json_array_contains", F.lit('["x", "y"]'), F.lit("x")), True),
        (_c("json_array_contains", F.lit('{"a": 1}'), F.lit(1)), None),
        (_c("json_array_contains", F.lit("[true]"), F.lit(True)), True),
    ],
    "is_json_scalar": [
        (_c("is_json_scalar", F.lit("1")), True),
        (_c("is_json_scalar", F.lit('"abc"')), True),
        (_c("is_json_scalar", F.lit("[1, 2]")), False),
        (_c("is_json_scalar", F.lit('{"a": 1}')), False),
        (_c("is_json_scalar", F.lit("not json")), None),
    ],
    "normalize": [
        # NFD 'e' + combining acute composes to U+00E9 under NFC
        (_c("normalize", F.lit("é")), "é"),
        (_c("normalize", F.lit("é"), "NFD"), "é"),
    ],
    "word_stem": [
        # canonical examples from Porter (1980)
        (_c("word_stem", F.lit("caresses")), "caress"),
        (_c("word_stem", F.lit("ponies")), "poni"),
        (_c("word_stem", F.lit("running")), "run"),
        # (official Porter vocabulary output: step 5a strips the final e)
        (_c("word_stem", F.lit("agreed")), "agre"),
        (_c("word_stem", F.lit("happy")), "happi"),
        (_c("word_stem", F.lit("relational"), "en"), "relat"),
    ],
    "multimap_from_entries": [
        (
            _c(
                "multimap_from_entries",
                F.array(
                    F.struct(F.lit("a").alias("key"), F.lit(1).alias("value")),
                    F.struct(F.lit("a").alias("key"), F.lit(2).alias("value")),
                    F.struct(F.lit("b").alias("key"), F.lit(3).alias("value")),
                ),
            ),
            {"a": [1, 2], "b": [3]},
        ),
    ],
    "map_union": [
        (_c("map_union", F.col("m1")), {"a": 1}),
    ],
    "multimap_agg": [
        (_c("multimap_agg", F.col("s"), F.col("i")), {"hello world": [5]}),
    ],
    "set_union": [
        (_c("set_union", F.col("xs")), [1, 2, 3]),
    ],
    "histogram": [
        (_c("histogram", F.col("s")), {"hello world": 1}),
    ],
    "checksum": [
        (_c("checksum", F.col("s")), lambda v: isinstance(v, int)),
    ],
    "approx_most_frequent": [
        (_c("approx_most_frequent", 2, F.col("s"), 10), {"hello world": 1}),
    ],
    "numeric_histogram": [
        (_c("numeric_histogram", 2, F.col("d")), {2.5: 1}),
    ],
    "ip_prefix": [
        (_c("ip_prefix", F.lit("10.1.2.3"), 24), "10.1.2.0/24"),
        (_c("ip_prefix", F.lit("10.1.2.3"), 32), "10.1.2.3/32"),
        # IPv6 now routes through the stdlib-ipaddress Arrow fallback
        (_c("ip_prefix", F.lit("2001:db8::1"), 48), "2001:db8::/48"),
    ],
    "ip_subnet_min": [
        (_c("ip_subnet_min", F.lit("10.1.2.0/24")), "10.1.2.0"),
    ],
    # --- color family ---
    "rgb": [(_c("rgb", F.lit(255), F.lit(0), F.lit(128)), 0xFF0080)],
    "color": [
        (_c("color", F.lit("#ff0080")), 0xFF0080),
        (_c("color", F.lit("#f08")), 0xFF0088),
        (_c("color", F.lit("red")), 0xFF0000),
        (_c("color", F.lit("not-a-color")), None),
    ],
    "render": [
        (_c("render", F.lit(True)),
         "\x1b[38;2;0;255;0m\u2713\x1b[0m"),
        (_c("render", F.lit("hi"), F.lit(0x0000FF)),
         "\x1b[38;2;0;0;255mhi\x1b[0m"),
    ],
    "bar": [
        # half-filled width-4 bar: 2 colored blocks + reset + 2 spaces
        (_c("bar", F.lit(0.5), F.lit(4)),
         lambda v: v.count("\u2588") == 2 and v.endswith("  ")
         and v.startswith("\x1b[38;2;255;0;0m")),
        (_c("bar", F.lit(0.0), F.lit(3)), "   "),
    ],
    # --- geospatial core (functions/geo.py) ---
    "st_point": [
        (
            _c("st_point", F.lit(1.5), F.lit(2.5)),
            lambda v: v.kind == "POINT" and v.xs == [1.5] and v.ys == [2.5],
        ),
    ],
    "st_geometryfromtext": [
        (
            _c("st_geometryfromtext", F.lit("LINESTRING (0 0, 3 4)")),
            lambda v: v.kind == "LINESTRING"
            and v.xs == [0.0, 3.0]
            and v.ys == [0.0, 4.0],
        ),
    ],
    "st_astext": [
        (
            _c("st_astext", _c("st_geometryfromtext",
                               F.lit("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))),
            "POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0))",
        ),
    ],
    "st_x": [(_c("st_x", _c("st_point", F.lit(7.0), F.lit(8.0))), 7.0)],
    "st_y": [(_c("st_y", _c("st_point", F.lit(7.0), F.lit(8.0))), 8.0)],
    # r09 tail: hull / simplify / WKB codec
    "st_convexhull": [
        (
            _c("st_convexhull", _c("st_geometryfromtext",
                F.lit("LINESTRING (0 0, 1 1, 2 0, 2 2, 0 2)"))),
            lambda v: v.kind == "POLYGON"
            and v.xs == [0.0, 2.0, 2.0, 0.0, 0.0]
            and v.ys == [0.0, 0.0, 2.0, 2.0, 0.0],
        ),
    ],
    "st_simplify": [
        (
            _c("st_simplify", _c("st_geometryfromtext",
                F.lit("LINESTRING (0 0, 1 0.01, 2 0, 4 3)")), F.lit(0.1)),
            lambda v: v.kind == "LINESTRING"
            and v.xs == [0.0, 2.0, 4.0]
            and v.ys == [0.0, 0.0, 3.0],
        ),
    ],
    "st_asbinary": [
        (
            _c("st_asbinary", _c("st_point", F.lit(1.5), F.lit(2.5))),
            lambda v: v.hex()
            == "0101000000000000000000f83f0000000000000440",
        ),
    ],
    "st_geomfrombinary": [
        (
            _c("st_geomfrombinary", _c("st_asbinary",
                _c("st_geometryfromtext", F.lit("LINESTRING (0 0, 3 4)")))),
            lambda v: v.kind == "LINESTRING"
            and v.xs == [0.0, 3.0]
            and v.ys == [0.0, 4.0],
        ),
    ],
    # r07 accessor/predicate tail (box = POLYGON ((1 0, 7 0, 7 4, 1 4, 1 0)))
    "st_xmin": [(_c("st_xmin", _c("st_geometryfromtext",
        F.lit("POLYGON ((1 0, 7 0, 7 4, 1 4, 1 0))"))), 1.0)],
    "st_xmax": [(_c("st_xmax", _c("st_geometryfromtext",
        F.lit("POLYGON ((1 0, 7 0, 7 4, 1 4, 1 0))"))), 7.0)],
    "st_ymin": [(_c("st_ymin", _c("st_geometryfromtext",
        F.lit("POLYGON ((1 0, 7 0, 7 4, 1 4, 1 0))"))), 0.0)],
    "st_ymax": [(_c("st_ymax", _c("st_geometryfromtext",
        F.lit("POLYGON ((1 0, 7 0, 7 4, 1 4, 1 0))"))), 4.0)],
    # a closed quad counts 4 vertices: Presto's Esri backend excludes the
    # repeated closing point (r07 advice fix)
    "st_numpoints": [(_c("st_numpoints", _c("st_geometryfromtext",
        F.lit("POLYGON ((1 0, 7 0, 7 4, 1 4, 1 0))"))), 4),
        (_c("st_numpoints", _c("st_geometryfromtext",
            F.lit("LINESTRING (0 0, 3 0, 3 4)"))), 3)],
    "st_isempty": [(_c("st_isempty", _c("st_point", F.lit(1.0), F.lit(2.0))),
                    False)],
    "st_isclosed": [
        (_c("st_isclosed", _c("st_geometryfromtext",
            F.lit("LINESTRING (0 0, 1 1, 0 0)"))), True),
        (_c("st_isclosed", _c("st_geometryfromtext",
            F.lit("LINESTRING (0 0, 1 1)"))), False),
    ],
    "st_geometrytype": [
        (_c("st_geometrytype", _c("st_point", F.lit(1.0), F.lit(2.0))),
         "ST_Point"),
    ],
    # --- batch 15: vertex/component accessors ---
    "st_startpoint": [
        (_c("st_astext", _c("st_startpoint", _c("st_geometryfromtext",
            F.lit("LINESTRING (0 0, 3 0, 3 4)")))), "POINT (0.0 0.0)"),
        (_c("st_startpoint", _c("st_point", F.lit(1.0), F.lit(2.0))), None),
    ],
    "st_endpoint": [
        (_c("st_astext", _c("st_endpoint", _c("st_geometryfromtext",
            F.lit("LINESTRING (0 0, 3 0, 3 4)")))), "POINT (3.0 4.0)"),
    ],
    "st_pointn": [
        (_c("st_astext", _c("st_pointn", _c("st_geometryfromtext",
            F.lit("LINESTRING (0 0, 3 0, 3 4)")), 2)), "POINT (3.0 0.0)"),
        (_c("st_pointn", _c("st_geometryfromtext",
            F.lit("LINESTRING (0 0, 3 0)")), 5), None),
    ],
    "st_points": [
        (
            _c(
                "st_points",
                _c("st_geometryfromtext", F.lit("LINESTRING (0 0, 3 4)")),
            ),
            lambda v: v is not None
            and len(v) == 2
            and v[0].xs == [0.0]
            and v[1].ys == [4.0],
        ),
    ],
    "st_numgeometries": [
        (_c("st_numgeometries", _c("st_point", F.lit(1.0), F.lit(2.0))), 1),
    ],
    "st_geometryn": [
        (_c("st_astext", _c("st_geometryn",
            _c("st_point", F.lit(1.0), F.lit(2.0)), 1)), "POINT (1.0 2.0)"),
        (_c("st_geometryn", _c("st_point", F.lit(1.0), F.lit(2.0)), 2), None),
    ],
    "st_geometries": [
        (
            _c("st_geometries", _c("st_point", F.lit(1.0), F.lit(2.0))),
            lambda v: v is not None and len(v) == 1 and v[0].kind == "POINT",
        ),
    ],
    "st_exteriorring": [
        (_c("st_astext", _c("st_exteriorring", _c("st_geometryfromtext",
            F.lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")))),
         "LINESTRING (0.0 0.0, 2.0 0.0, 2.0 2.0, 0.0 2.0, 0.0 0.0)"),
    ],
    "st_interiorringn": [
        (_c("st_interiorringn", _c("st_geometryfromtext",
            F.lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")), 1), None),
    ],
    "st_numinteriorring": [
        (_c("st_numinteriorring", _c("st_geometryfromtext",
            F.lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))), 0),
        (_c("st_numinteriorring", _c("st_point", F.lit(1.0), F.lit(2.0))),
         None),
    ],
    "st_boundary": [
        (_c("st_astext", _c("st_boundary", _c("st_geometryfromtext",
            F.lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")))),
         "LINESTRING (0.0 0.0, 2.0 0.0, 2.0 2.0, 0.0 2.0, 0.0 0.0)"),
        (_c("st_geometrytype", _c("st_boundary",
            _c("st_point", F.lit(1.0), F.lit(2.0)))),
         lambda v: v in ("ST_GeometryCollection", None) or "EMPTY" in str(v)),
        # open linestring boundary = MULTIPOINT -> loud NULL
        (_c("st_boundary", _c("st_geometryfromtext",
            F.lit("LINESTRING (0 0, 1 1)"))), None),
    ],
    "bing_tile_parent": [
        (
            _c("bing_tile_parent", _c("bing_tile", 5, 6, 3)),
            lambda v: (v.x, v.y, v.zoom) == (2, 3, 2),
        ),
        (
            _c("bing_tile_parent", _c("bing_tile", 5, 6, 3), 0),
            lambda v: (v.x, v.y, v.zoom) == (0, 0, 0),
        ),
    ],
    "bing_tile_children": [
        (
            _c("bing_tile_children", _c("bing_tile", 1, 2, 3)),
            lambda v: sorted((c.x, c.y, c.zoom) for c in v)
            == [(2, 4, 4), (2, 5, 4), (3, 4, 4), (3, 5, 4)],
        ),
        (
            _c("bing_tile_children", _c("bing_tile", 0, 0, 1), 3),
            lambda v: len(v) == 16 and all(c.zoom == 3 for c in v),
        ),
    ],
    "st_intersects": [
        (_c("st_intersects", _c("st_point", F.lit(2.0), F.lit(1.0)),
            _c("st_geometryfromtext",
               F.lit("POLYGON ((1 0, 7 0, 7 4, 1 4, 1 0))"))), True),
        (_c("st_intersects", _c("st_point", F.lit(9.0), F.lit(1.0)),
            _c("st_point", F.lit(9.0), F.lit(1.0))), True),
    ],
    # r10 DE-9IM tail — one decided case each; the full decided/undecided
    # matrix lives in test_geo_de9im_predicate_tail
    "st_crosses": [
        (_c("st_crosses",
            _c("st_geometryfromtext", F.lit("LINESTRING (0 0, 4 4)")),
            _c("st_geometryfromtext", F.lit("LINESTRING (0 4, 4 0)"))), True),
    ],
    "st_touches": [
        (_c("st_touches", _c("st_point", F.lit(2.0), F.lit(0.0)),
            _c("st_geometryfromtext",
               F.lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))), True),
    ],
    "st_equals": [
        (_c("st_equals",
            _c("st_geometryfromtext", F.lit("LINESTRING (0 0, 4 4)")),
            _c("st_geometryfromtext", F.lit("LINESTRING (4 4, 0 0)"))), True),
    ],
    "st_overlaps": [
        (_c("st_overlaps", _c("st_point", F.lit(1.0), F.lit(1.0)),
            _c("st_geometryfromtext", F.lit("LINESTRING (0 0, 4 4)"))), False),
    ],
    "st_disjoint": [
        (_c("st_disjoint",
            _c("st_geometryfromtext", F.lit("LINESTRING (0 0, 4 4)")),
            _c("st_geometryfromtext", F.lit("LINESTRING (5 0, 9 4)"))), True),
    ],
    "st_distance": [
        (
            _c("st_distance", _c("st_point", F.lit(0.0), F.lit(0.0)),
               _c("st_point", F.lit(3.0), F.lit(4.0))),
            5.0,
        ),
    ],
    "st_area": [
        (
            _c("st_area", _c("st_geometryfromtext",
                             F.lit("POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"))),
            6.0,
        ),
    ],
    "st_length": [
        (
            _c("st_length", _c("st_geometryfromtext",
                               F.lit("LINESTRING (0 0, 3 4, 3 10)"))),
            11.0,
        ),
    ],
    "st_centroid": [
        (
            _c("st_centroid", _c("st_geometryfromtext",
                                 F.lit("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))),
            lambda v: abs(v.xs[0] - 0.5) < 1e-12 and abs(v.ys[0] - 0.5) < 1e-12,
        ),
    ],
    "st_envelope": [
        (
            _c("st_envelope", _c("st_geometryfromtext",
                                 F.lit("LINESTRING (0 1, 4 0, 2 5)"))),
            lambda v: v.kind == "POLYGON"
            and v.xs == [0.0, 4.0, 4.0, 0.0, 0.0]
            and v.ys == [0.0, 0.0, 5.0, 5.0, 0.0],
        ),
    ],
    "st_contains": [
        (
            _c("st_contains",
               _c("st_geometryfromtext", F.lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")),
               _c("st_point", F.lit(2.0), F.lit(2.0))),
            True,
        ),
        (
            _c("st_contains",
               _c("st_geometryfromtext", F.lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")),
               _c("st_point", F.lit(5.0), F.lit(2.0))),
            False,
        ),
    ],
    "st_within": [
        (
            _c("st_within",
               _c("st_point", F.lit(1.0), F.lit(1.0)),
               _c("st_geometryfromtext", F.lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))),
            True,
        ),
    ],
    "great_circle_distance": [
        (
            # Presto docs example: Nashville -> LA ≈ 2886.449 km
            _c("great_circle_distance", F.lit(36.12), F.lit(-86.67),
               F.lit(33.94), F.lit(-118.40)),
            lambda v: abs(v - 2886.449) < 0.5,
        ),
    ],
    "ip_subnet_max": [
        (_c("ip_subnet_max", F.lit("10.1.2.0/24")), "10.1.2.255"),
        (_c("ip_subnet_max", F.lit("0.0.0.0/0")), "255.255.255.255"),
    ],
    "ip_subnet_range": [
        (_c("ip_subnet_range", F.lit("10.1.2.0/24")), ["10.1.2.0", "10.1.2.255"]),
    ],
    "is_subnet_of": [
        (_c("is_subnet_of", F.lit("10.1.0.0/16"), F.lit("10.1.2.3")), True),
        (_c("is_subnet_of", F.lit("10.1.0.0/16"), F.lit("10.2.0.1")), False),
        (_c("is_subnet_of", F.lit("10.1.0.0/16"), F.lit("10.1.2.0/24")), True),
        (_c("is_subnet_of", F.lit("10.1.2.0/24"), F.lit("10.1.0.0/16")), False),
    ],
    "value_at_quantile": [
        (_c("value_at_quantile", _c("qdigest_agg", F.col("d")), 0.5), 2.5),
        (_c("value_at_quantile", _c("tdigest_agg", F.col("i")), 0.9), 5),
    ],
    "values_at_quantiles": [
        (
            _c(
                "values_at_quantiles",
                _c("qdigest_agg", F.col("d")),
                F.array(F.lit(0.1), F.lit(0.9)),
            ),
            [2.5, 2.5],
        ),
    ],
    # --- batch 8 ---
    "combinations": [
        (
            _c("combinations", F.col("xs"), 2),
            [[1, 2], [1, 3], [2, 3]],
        ),
        (_c("combinations", F.col("xs"), 3), [[1, 2, 3]]),
        (_c("combinations", F.array(F.lit(9)), 2), []),
    ],
    "array_has_duplicates": [
        (_c("array_has_duplicates", F.col("xs")), False),
        (_c("array_has_duplicates", F.array(F.lit(1), F.lit(1))), True),
    ],
    "array_duplicates": [
        (
            _c("array_duplicates", F.array(F.lit(1), F.lit(2), F.lit(1), F.lit(2), F.lit(3))),
            [1, 2],
        ),
    ],
    "array_frequency": [
        (
            _c("array_frequency", F.array(F.lit("a"), F.lit("b"), F.lit("a"))),
            {"a": 2, "b": 1},
        ),
    ],
    "array_cum_sum": [
        (_c("array_cum_sum", F.col("xs")), [1.0, 3.0, 6.0]),
    ],
    "trim_array": [
        (_c("trim_array", F.col("xs"), 1), [1, 2]),
        (_c("trim_array", F.col("xs"), 5), []),
    ],
    "any_match": [
        (_c("any_match", F.col("xs"), lambda e: e > 2), True),
        (_c("any_match", F.col("xs"), lambda e: e > 9), False),
    ],
    "all_match": [
        (_c("all_match", F.col("xs"), lambda e: e > 0), True),
        (_c("all_match", F.col("xs"), lambda e: e > 1), False),
    ],
    "none_match": [
        (_c("none_match", F.col("xs"), lambda e: e > 9), True),
    ],
    "map_subset": [
        (
            _c(
                "map_subset",
                F.map_concat(F.col("m1"), F.col("m2")),
                F.array(F.lit("a"), F.lit("z")),
            ),
            {"a": 1},
        ),
    ],
    "map_remove_null_values": [
        (
            _c(
                "map_remove_null_values",
                F.map_from_arrays(
                    F.array(F.lit("a"), F.lit("b")),
                    F.array(F.lit(1), F.lit(None).cast("int")),
                ),
            ),
            {"a": 1},
        ),
    ],
    "map_top_n": [
        (
            _c("map_top_n", F.map_concat(F.col("m1"), F.col("m2")), 1),
            {"b": 2},
        ),
    ],
    "map_top_n_keys": [
        (_c("map_top_n_keys", F.map_concat(F.col("m1"), F.col("m2")), 2), ["b", "a"]),
        # key-ordered, NOT value-ordered: key 'c' wins though its value is
        # smallest (the by-value form is map_keys_by_top_n_values)
        (
            _c(
                "map_top_n_keys",
                F.create_map(
                    F.lit("a"), F.lit(9), F.lit("c"), F.lit(1),
                    F.lit("b"), F.lit(5),
                ),
                1,
            ),
            ["c"],
        ),
    ],
    "map_top_n_values": [
        (_c("map_top_n_values", F.map_concat(F.col("m1"), F.col("m2")), 1), [2]),
    ],
    "map_keys_by_top_n_values": [
        (
            _c(
                "map_keys_by_top_n_values",
                F.create_map(
                    F.lit("a"), F.lit(9), F.lit("c"), F.lit(1),
                    F.lit("b"), F.lit(5),
                ),
                2,
            ),
            ["a", "b"],
        ),
    ],
    "map_values_by_top_n_keys": [
        (
            _c(
                "map_values_by_top_n_keys",
                F.create_map(
                    F.lit("a"), F.lit(9), F.lit("c"), F.lit(1),
                    F.lit("b"), F.lit(5),
                ),
                2,
            ),
            [1, 5],
        ),
    ],
    "array_has_dupes": [
        (_c("array_has_dupes", F.array(F.lit(1), F.lit(1))), True),
        (_c("array_has_dupes", F.array(F.lit(1), F.lit(2))), False),
    ],
    "array_least_frequent": [
        (
            _c(
                "array_least_frequent",
                F.array(F.lit(3), F.lit(3), F.lit(1), F.lit(2), F.lit(2)),
            ),
            [1],
        ),
        (
            _c(
                "array_least_frequent",
                F.array(F.lit(3), F.lit(3), F.lit(1), F.lit(2), F.lit(2)),
                2,
            ),
            [1, 2],
        ),
    ],
    "normal_cdf": [
        (_c("normal_cdf", F.lit(0), F.lit(1), F.lit(0.0)), lambda v: abs(v - 0.5) < 1e-7),
        (
            _c("normal_cdf", F.lit(0), F.lit(1), F.lit(1.96)),
            lambda v: abs(v - 0.9750021048517795) < 1e-6,
        ),
        (
            _c("normal_cdf", F.lit(10), F.lit(2), F.lit(8.0)),
            lambda v: abs(v - 0.15865525393145707) < 1e-6,
        ),
    ],
    "entropy": [
        # single row with count 5: a one-outcome distribution has H = 0
        (_c("entropy", F.col("i")), 0.0),
    ],
    "split_to_multimap": [
        (
            _c("split_to_multimap", F.lit("a=1,b=2,a=3"), ",", "="),
            {"a": ["1", "3"], "b": ["2"]},
        ),
    ],
    "regexp_position": [
        (_c("regexp_position", F.col("s"), "wor"), 7),
        (_c("regexp_position", F.col("s"), "zz+"), -1),
    ],
    "human_readable_seconds": [
        (_c("human_readable_seconds", F.lit(96)), "1 minute, 36 seconds"),
        (_c("human_readable_seconds", F.lit(0)), "0 seconds"),
        (
            _c("human_readable_seconds", F.lit(694861.0)),
            "1 week, 1 day, 1 hour, 1 minute, 1 second",
        ),
    ],
    "format": [
        (_c("format", F.lit("%s=%d"), F.lit("x"), F.col("i")), "x=5"),
    ],
    "every": [(_c("every", F.col("b")), True)],
    "bitwise_and_agg": [(_c("bitwise_and_agg", F.col("i")), 5)],
    "bitwise_or_agg": [(_c("bitwise_or_agg", F.col("i")), 5)],
    # batch 9
    "inverse_normal_cdf": [
        (_c("inverse_normal_cdf", F.lit(0.0), F.lit(1.0), F.lit(0.5)),
         lambda v: abs(v) < 1e-9),
    ],
    "cauchy_cdf": [
        (_c("cauchy_cdf", F.lit(0.0), F.lit(1.0), F.lit(0.0)), 0.5),
    ],
    "laplace_cdf": [
        (_c("laplace_cdf", F.lit(0.0), F.lit(1.0), F.lit(0.0)), 0.5),
    ],
    "weibull_cdf": [
        (_c("weibull_cdf", F.lit(1.0), F.lit(1.0), F.lit(1.0)),
         lambda v: abs(v - (1 - math.exp(-1.0))) < 1e-12),
    ],
    "binomial_cdf": [
        (_c("binomial_cdf", F.lit(2), F.lit(0.5), F.lit(1)), 0.75),
    ],
    "poisson_cdf": [
        (_c("poisson_cdf", F.lit(1.0), F.lit(0)),
         lambda v: abs(v - math.exp(-1.0)) < 1e-12),
    ],
    "jaccard_index": [
        (_c("jaccard_index", F.array(F.lit(1), F.lit(2)),
            F.array(F.lit(2), F.lit(3))),
         lambda v: abs(v - 1 / 3) < 1e-12),
    ],
    "array_sort_desc": [
        (_c("array_sort_desc", F.array(F.lit(1), F.lit(3), F.lit(2))),
         [3, 2, 1]),
    ],
    "map_normalize": [
        (_c("map_normalize",
            F.create_map(F.lit("a"), F.lit(1.0), F.lit("b"), F.lit(3.0))),
         {"a": 0.25, "b": 0.75}),
    ],
    "reduce_agg": [
        (_c("reduce_agg", F.col("i"), F.lit(0).cast("bigint"),
            lambda s, x: s + x), 5),
    ],
    "parse_duration": [
        (_c("parse_duration", F.lit("2s")),
         lambda v: v == datetime.timedelta(seconds=2)),
    ],
    "to_milliseconds": [
        (_c("to_milliseconds", _c("parse_duration", F.lit("1.5s"))), 1500),
    ],
    # --- batch 10: binary bit views, base32, standard hashes ---
    "to_big_endian_64": [
        (_c("to_big_endian_64", F.col("i")),
         lambda v: bytes(v) == b"\x00" * 7 + b"\x05"),
    ],
    "from_big_endian_64": [
        (_c("from_big_endian_64", _c("to_big_endian_64", F.lit(-7))), -7),
    ],
    "to_big_endian_32": [
        (_c("to_big_endian_32", F.col("i").cast("int")),
         lambda v: bytes(v) == b"\x00\x00\x00\x05"),
    ],
    "from_big_endian_32": [
        (_c("from_big_endian_32", _c("to_big_endian_32", F.lit(-7))), -7),
    ],
    "to_ieee754_64": [
        (_c("to_ieee754_64", F.col("d")),
         lambda v: bytes(v).hex() == "4004000000000000"),  # 2.5
    ],
    "from_ieee754_64": [
        (_c("from_ieee754_64", _c("to_ieee754_64", F.col("d"))), 2.5),
    ],
    "to_ieee754_32": [
        (_c("to_ieee754_32", F.col("d")),
         lambda v: bytes(v).hex() == "40200000"),
    ],
    "from_ieee754_32": [
        (_c("from_ieee754_32", _c("to_ieee754_32", F.col("d"))), 2.5),
    ],
    "to_base32": [(_c("to_base32", F.lit("foobar")), "MZXW6YTBOI======")],
    "from_base32": [
        (_c("from_base32", F.lit("MZXQ====")), lambda v: bytes(v) == b"fo"),
    ],
    "xxhash64": [
        (_c("xxhash64", F.lit("")),
         lambda v: bytes(v) == (0xEF46DB3751D8E999).to_bytes(8, "big")),
    ],
    "murmur3_x64_128": [
        (_c("murmur3_x64_128", F.lit("")), lambda v: bytes(v) == b"\x00" * 16),
    ],
    "key_sampling_percent": [
        (_c("key_sampling_percent", F.col("s")), lambda v: 0.0 <= v < 1.0),
    ],
    # --- batch 10: incomplete-gamma/beta CDF family (closed-form points) ---
    "gamma_cdf": [
        (_c("gamma_cdf", F.lit(1.0), F.lit(1.0), F.lit(1.0)),
         lambda v: abs(v - (1 - math.exp(-1))) < 1e-12),
    ],
    "chi_squared_cdf": [
        (_c("chi_squared_cdf", F.lit(2.0), F.lit(2.0)),
         lambda v: abs(v - (1 - math.exp(-1))) < 1e-12),
    ],
    "beta_cdf": [
        (_c("beta_cdf", F.lit(1.0), F.lit(1.0), F.lit(0.3)),
         lambda v: abs(v - 0.3) < 1e-12),
    ],
    "f_cdf": [
        (_c("f_cdf", F.lit(2.0), F.lit(2.0), F.lit(1.0)),
         lambda v: abs(v - 0.5) < 1e-12),
    ],
    "inverse_beta_cdf": [
        (_c("inverse_beta_cdf", F.lit(1.0), F.lit(1.0), F.lit(0.7)),
         lambda v: abs(v - 0.7) < 1e-9),
    ],
    "from_unixtime_nanos": [
        (F.unix_micros(_c("from_unixtime_nanos", F.lit(1500000000123456789))),
         1500000000123456),
    ],
    "is_private": [
        (_c("is_private", F.lit("10.0.0.1")), True),
        (_c("is_private", F.lit("8.8.8.8")), False),
    ],
    "map_union_sum": [
        (_c("map_union_sum", F.col("m1")), {"a": 1}),
    ],
    # --- batch 11: classification aggregates (1-row fixture: y=true, x=0.4,
    # thresholds 0 and 0.5 — no negatives, so fall_out is 0/0 = NULL) ---
    "classification_recall": [
        (_c("classification_recall", 2, F.col("b"), F.lit(0.4)), [1.0, 0.0]),
    ],
    "classification_miss_rate": [
        (_c("classification_miss_rate", 2, F.col("b"), F.lit(0.4)),
         [0.0, 1.0]),
    ],
    "classification_fall_out": [
        (_c("classification_fall_out", 2, F.col("b"), F.lit(0.4)),
         [None, None]),
    ],
    "classification_precision": [
        (_c("classification_precision", 2, F.col("b"), F.lit(0.4)),
         [1.0, None]),
    ],
    "classification_thresholds": [
        (_c("classification_thresholds", 2, F.col("b"), F.lit(0.4)),
         [0.0, 0.5]),
    ],
    # --- constructive geometry (closed-form areas; the full decision
    # matrix is op_fn_geo2 / tests/test_functions_batch10.py) ---
    "st_intersection": [
        (_c("st_area", _c("st_intersection",
            _c("st_geometryfromtext", F.lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")),
            _c("st_geometryfromtext", F.lit("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")))),
         lambda v: abs(v - 1.0) < 1e-12),
    ],
    "st_union": [
        # containment union: the contained ring dissolves into the outer
        (_c("st_area", _c("st_union",
            _c("st_geometryfromtext", F.lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")),
            _c("st_geometryfromtext", F.lit("POLYGON ((0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))")))),
         lambda v: abs(v - 4.0) < 1e-12),
    ],
    "st_buffer": [
        # point buffer = regular 32-gon: area 0.5 n r^2 sin(2 pi / n)
        (_c("st_area", _c("st_buffer", _c("st_point", F.lit(1.0), F.lit(2.0)),
                          F.lit(2.0))),
         lambda v: abs(v - 0.5 * 32 * 4.0 * math.sin(2 * math.pi / 32)) < 1e-9),
    ],
    # --- batch 12: inverse CDFs (closed-form checkpoints), Bing tiles
    # (Microsoft's published quadkey examples), collection/string tail ---
    "inverse_cauchy_cdf": [
        (_c("inverse_cauchy_cdf", F.lit(0.0), F.lit(1.0), F.lit(0.75)),
         lambda v: abs(v - 1.0) < 1e-12),
    ],
    "inverse_laplace_cdf": [
        (_c("inverse_laplace_cdf", F.lit(0.0), F.lit(1.0), F.lit(0.25)),
         lambda v: abs(v - math.log(0.5)) < 1e-12),
        (_c("inverse_laplace_cdf", F.lit(1.0), F.lit(2.0), F.lit(0.75)),
         lambda v: abs(v - (1.0 - 2.0 * math.log(0.5))) < 1e-12),
    ],
    "inverse_weibull_cdf": [
        # p = 1 - e^-1 inverts to exactly b for any shape a
        (_c("inverse_weibull_cdf", F.lit(3.0), F.lit(2.0),
            F.lit(1.0 - math.exp(-1.0))),
         lambda v: abs(v - 2.0) < 1e-12),
    ],
    "inverse_binomial_cdf": [
        # Binomial(20, .5): CDF(9) = .4119 < .5 <= CDF(10) = .5881
        (_c("inverse_binomial_cdf", F.lit(20), F.lit(0.5), F.lit(0.5)), 10),
        (_c("inverse_binomial_cdf", F.lit(20), F.lit(0.5), F.lit(0.0)), 0),
        (_c("inverse_binomial_cdf", F.lit(20), F.lit(0.5), F.lit(1.0)), 20),
    ],
    "inverse_poisson_cdf": [
        # Poisson(3): CDF(2) = .4232 < .5 <= CDF(3) = .6472
        (_c("inverse_poisson_cdf", F.lit(3.0), F.lit(0.5)), 3),
        (_c("inverse_poisson_cdf", F.lit(3.0), F.lit(0.1)), 1),
    ],
    "inverse_gamma_cdf": [
        # shape 1 = exponential: median is scale * ln 2
        (_c("inverse_gamma_cdf", F.lit(1.0), F.lit(2.0), F.lit(0.5)),
         lambda v: abs(v - 2.0 * math.log(2.0)) < 1e-9),
    ],
    "inverse_chi_squared_cdf": [
        # df 2 = exponential with scale 2
        (_c("inverse_chi_squared_cdf", F.lit(2.0), F.lit(0.5)),
         lambda v: abs(v - 2.0 * math.log(2.0)) < 1e-9),
    ],
    "inverse_f_cdf": [
        # F(2,2) has CDF x / (1 + x): p = .5 at x = 1
        (_c("inverse_f_cdf", F.lit(2.0), F.lit(2.0), F.lit(0.5)),
         lambda v: abs(v - 1.0) < 1e-9),
    ],
    "bing_tile": [
        (_c("bing_tile", F.lit(3), F.lit(5), F.lit(4)),
         lambda v: (v.x, v.y, v.zoom) == (3, 5, 4)),
        (_c("bing_tile", F.lit("0213")),
         lambda v: (v.x, v.y, v.zoom) == (3, 5, 4)),
        (_c("bing_tile", F.lit(99), F.lit(0), F.lit(4)), None),  # x >= 2^4
    ],
    "bing_tile_quadkey": [
        (_c("bing_tile_quadkey", _c("bing_tile", F.lit(3), F.lit(5), F.lit(4))),
         "0213"),
    ],
    "bing_tile_at": [
        (_c("bing_tile_at", F.lit(0.0), F.lit(0.0), F.lit(1)),
         lambda v: (v.x, v.y, v.zoom) == (1, 1, 1)),
        # NULL lat must be NULL, not clamped to the domain edge
        # (greatest/least skip nulls; ADVICE r09)
        (_c("bing_tile_at", F.lit(None).cast("double"), F.lit(0.0), F.lit(1)),
         None),
    ],
    "bing_tile_coordinates": [
        (_c("bing_tile_coordinates", _c("bing_tile", F.lit(3), F.lit(5), F.lit(4))),
         lambda v: (v.x, v.y) == (3, 5)),
    ],
    "bing_tile_zoom_level": [
        (_c("bing_tile_zoom_level", _c("bing_tile", F.lit(3), F.lit(5), F.lit(4))),
         4),
    ],
    "bing_tile_polygon": [
        # tile (0, 0, 1): west hemisphere north of the equator — a
        # 180 x 85.05112878-degree planar rectangle
        (_c("st_area", _c("bing_tile_polygon", _c("bing_tile", F.lit(0), F.lit(0), F.lit(1)))),
         lambda v: abs(v - 180.0 * 85.05112878) < 1e-6),
    ],
    "bing_tiles_around": [
        # (0, 0) at zoom 1 sits in tile (1, 1); the 3x3 window clamps to
        # the 2x2 map -> 4 tiles in (dx, dy) order
        (_c("bing_tiles_around", F.lit(0.0), F.lit(0.0), F.lit(1)),
         lambda v: [(t.x, t.y) for t in v] == [(0, 0), (0, 1), (1, 0), (1, 1)]),
        # NULL lat must yield NULL, not an empty array (ADVICE r09: the
        # center struct has NULL FIELDS but is itself non-null)
        (_c("bing_tiles_around",
            F.lit(None).cast("double"), F.lit(0.0), F.lit(1)), None),
        (_c("bing_tiles_around",
            F.lit(0.0), F.lit(None).cast("double"), F.lit(1)), None),
    ],
    "array_normalize": [
        (_c("array_normalize", F.array(F.lit(3.0), F.lit(4.0)), F.lit(2.0)),
         lambda v: max(abs(a - b) for a, b in zip(v, [0.6, 0.8])) < 1e-12),
        (_c("array_normalize", F.array(F.lit(0.0), F.lit(0.0)), F.lit(2.0)),
         [0.0, 0.0]),
    ],
    # --- batch 13 (r10): array/map stragglers ---
    "array_max_by": [
        (_c("array_max_by", F.array(F.lit("ab"), F.lit("x"), F.lit("def")),
            lambda s: F.length(s)), "def"),
        # NULL keys are skipped; all-NULL keys -> NULL
        (_c("array_max_by", F.array(F.lit("a"), F.lit(None)),
            lambda s: F.length(s)), "a"),
    ],
    "array_min_by": [
        (_c("array_min_by", F.array(F.lit("ab"), F.lit("x"), F.lit("def")),
            lambda s: F.length(s)), "x"),
    ],
    "array_top_n": [
        (_c("array_top_n", F.array(F.lit(3), F.lit(9), F.lit(1), F.lit(7)),
            F.lit(2)), [9, 7]),
        # n larger than the array keeps everything, descending
        (_c("array_top_n", F.array(F.lit(2), F.lit(5)), F.lit(9)), [5, 2]),
    ],
    "array_split_into_chunks": [
        (_c("array_split_into_chunks",
            F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4), F.lit(5)),
            F.lit(2)), [[1, 2], [3, 4], [5]]),
        (_c("array_split_into_chunks", F.array().cast("array<int>"),
            F.lit(2)), []),
        (_c("array_split_into_chunks", F.array(F.lit(1)), F.lit(0)), None),
    ],
    "contains_sequence": [
        (_c("contains_sequence",
            F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4)),
            F.array(F.lit(2), F.lit(3))), True),
        (_c("contains_sequence",
            F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4)),
            F.array(F.lit(2), F.lit(4))), False),  # not contiguous
        (_c("contains_sequence", F.array(F.lit(1)),
            F.array().cast("array<int>")), True),  # empty seq always
        (_c("contains_sequence", F.array(F.lit(1)),
            F.array(F.lit(1), F.lit(2))), False),  # longer than array
    ],
    "arrays_union": [
        (_c("arrays_union", F.array(F.lit(1), F.lit(2)),
            F.array(F.lit(2), F.lit(3))), [1, 2, 3]),
    ],
    "array_dupes": [
        (_c("array_dupes", F.array(F.lit(1), F.lit(2), F.lit(1), F.lit(3),
                                   F.lit(3), F.lit(3))),
         lambda v: sorted(v) == [1, 3]),
    ],
    "all_keys_match": [
        (_c("all_keys_match",
            F.create_map(F.lit("ab"), F.lit(1), F.lit("cd"), F.lit(2)),
            lambda k: F.length(k) == 2), True),
        (_c("all_keys_match",
            F.create_map(F.lit("ab"), F.lit(1), F.lit("c"), F.lit(2)),
            lambda k: F.length(k) == 2), False),
    ],
    "any_keys_match": [
        (_c("any_keys_match",
            F.create_map(F.lit("ab"), F.lit(1), F.lit("c"), F.lit(2)),
            lambda k: F.length(k) == 2), True),
    ],
    "no_keys_match": [
        (_c("no_keys_match",
            F.create_map(F.lit("ab"), F.lit(1)),
            lambda k: F.length(k) == 9), True),
    ],
    "any_values_match": [
        (_c("any_values_match",
            F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(5)),
            lambda v: v > 3), True),
    ],
    "no_values_match": [
        (_c("no_values_match",
            F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(5)),
            lambda v: v > 9), True),
    ],
    "find_first": [
        (_c("find_first", F.col("xs"), lambda x: x > 1), 2),
        (_c("find_first", F.col("xs"), lambda x: x > 99), None),
    ],
    "find_first_index": [
        (_c("find_first_index", F.col("xs"), lambda x: x > 1), 2),
        (_c("find_first_index", F.col("xs"), lambda x: x > 99), None),
    ],
    "trail": [
        (_c("trail", F.col("s"), F.lit(5)), "world"),
        (_c("trail", F.col("s"), F.lit(99)), "hello world"),
        (_c("trail", F.col("s"), F.lit(0)), ""),
    ],
    }


def _wilson_py(s, n, z, sign):
    p = s / n
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return (p + z * z / (2 * n) + sign * half) / (1 + z * z / n)


_ALL_NAMES = sorted(set(PRESTO_TO_SPARK) | set(_ADAPTERS))


def test_every_entry_has_a_case(spark):
    missing = set(_ALL_NAMES) - set(_cases()) - _NO_DIRECT_CASE
    assert not missing, f"mapping entries without a test case: {sorted(missing)}"


@pytest.mark.parametrize("name", [n for n in _ALL_NAMES if n not in _NO_DIRECT_CASE])
def test_every_mapping_entry(fx, name):
    cases = _cases()[name]
    exprs = [col.alias(f"v{i}") for i, (col, _) in enumerate(cases)]
    row = fx.select(*exprs).collect()[0]
    for i, (_, want) in enumerate(cases):
        got = row[f"v{i}"]
        if callable(want):
            assert want(got), (name, i, got)
        else:
            assert got == want, (name, i, got, want)


def test_grouping_maps_to_grouping_id(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    rows = df.cube("k").agg(
        presto_call("grouping", F.col("k")).alias("g"), F.sum("v").alias("s")
    ).collect()
    assert {(r.k, r.g) for r in rows} == {("a", 0), ("b", 0), (None, 1)}


def test_reduce_renames_to_aggregate_in_sql(spark):
    from verax_spark.sql.presto import transpile

    sql = transpile("select reduce(array[1, 2, 3], 0, (acc, x) -> acc + x) as v")
    assert "aggregate(" in sql
    assert spark.sql(sql).collect()[0].v == 6


# ---------------------------------------------------------------------------
# function metadata registry (FunctionRegistry.h:111-295 analog)
# ---------------------------------------------------------------------------

def test_registry_metadata_and_reversibles():
    from verax_spark.functions.registry import (
        FunctionMetadata,
        function_metadata,
        register_function,
        reversible_functions,
    )

    assert function_metadata("lt").reverse == "gt"
    assert function_metadata("plus").commutative
    assert not function_metadata("rand").deterministic
    assert function_metadata("regexp_like").cost > function_metadata("plus").cost
    assert function_metadata("transform").subfield_arg == 0
    assert function_metadata("nope_unregistered") is None
    rev = reversible_functions()
    assert rev["lte"] == "gte" and rev["eq"] == "eq"
    # double-registration contract matches FunctionRegistry::registerFunction
    assert register_function("my_fn_x", FunctionMetadata(cost=2))
    assert not register_function("my_fn_x", FunctionMetadata())


def test_canonicalize_flips_literal_first_comparisons():
    from verax_spark.functions.registry import canonicalize, expr_cost, is_deterministic
    from verax_spark.plans.expr import Call, Col, Lit

    e = Call("gt", Lit(5), Col("x"))  # 5 > x
    c = canonicalize(e)
    assert c.fn == "lt" and isinstance(c.args[1], Lit)  # x < 5
    # nested: (5 >= x) AND (y = 1) — only the literal-first side flips
    e2 = Call("and", Call("gte", Lit(5), Col("x")), Call("eq", Col("y"), Lit(1)))
    canonicalize(e2)
    assert e2.args[0].fn == "lte"
    assert e2.args[1].fn == "eq" and isinstance(e2.args[1].args[1], Lit)
    assert is_deterministic(e2)
    assert not is_deterministic(Call("plus", Call("rand"), Lit(1)))
    assert expr_cost(Call("regexp_like", Col("s"), Lit("x"))) >= 20


def test_canonical_predicates_share_history_signature(spark, sf_dir):
    """End-to-end consumer: flipped spellings of one predicate must build the
    same Spark plan, hence one history/plan-signature cache entry."""
    from verax_spark.catalog import Catalog
    from verax_spark.optimizer.history import plan_signature
    from verax_spark.plans import PlanBuilder
    from verax_spark.plans.expr import Call, Col, Lit

    cat = Catalog(spark, sf_dir)
    a = (
        PlanBuilder(spark, sf_dir).table_scan("orders")
        .filter(Call("lt", Col("o_totalprice"), Lit(1000.0))).build()
    )
    b = (
        PlanBuilder(spark, sf_dir).table_scan("orders")
        .filter(Call("gt", Lit(1000.0), Col("o_totalprice"))).build()
    )
    assert plan_signature(a) == plan_signature(b)
    assert a.count() == b.count()


def test_sql_front_door_divergent_semantics(spark):
    """repeat/split/date_format keep Presto semantics through the SQL
    renderer (all three collide with same-named Spark builtins that mean
    something different)."""
    from verax_spark.sql.presto import transpile

    assert spark.sql(transpile("select repeat(7, 3) as v")).collect()[0].v == [7, 7, 7]
    assert spark.sql(
        transpile("select split('a.b.c', '.') as v")
    ).collect()[0].v == ["a", "b", "c"]
    got = spark.sql(
        transpile(
            "select date_format(cast('2020-01-02 03:04:05' as timestamp),"
            " '%Y-%m-%dT%H:%i') as v"
        )
    ).collect()[0].v
    assert got == "2020-01-02T03:04"
    # non-literal delimiters cannot be made literal-safe → loud error
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        transpile("select split(s, d) from t")


def test_hll_family_and_cardinality_rewrite(spark):
    """Presto approx_set/merge/cardinality(hll) → Spark DataSketches; the
    cardinality-over-sketch pattern rewrites structurally in SQL text while
    bare cardinality stays size()."""
    from verax_spark.sql import transpile

    out = transpile("select cardinality(approx_set(x)) from t")
    assert "hll_sketch_estimate(hll_sketch_agg(x))" in out
    out2 = transpile("select cardinality(merge(sk)) from t")
    assert "hll_sketch_estimate(hll_union_agg(sk))" in out2
    assert "size(xs)" in transpile("select cardinality(xs) from t")
    df = spark.range(5000).selectExpr("id % 4 as g", "id")
    df.createOrReplaceTempView("hll_t")
    est = spark.sql(
        "select hll_sketch_estimate(hll_sketch_agg(id)) as e from hll_t"
    ).collect()[0].e
    assert abs(est - 5000) / 5000 < 0.05


def test_quantile_sketch_pipeline(spark):
    """Presto qdigest pipelines lower onto percentile_approx; a sketch
    marker escaping its pipeline fails at the call site."""
    df = spark.range(1, 101).select(F.col("id").cast("double").alias("x"))
    row = df.select(
        presto_call(
            "value_at_quantile", presto_call("qdigest_agg", F.col("x")), 0.5
        ).alias("med")
    ).collect()[0]
    assert 49 <= row.med <= 51
    # r06: a plain BINARY column is now the legitimate stored-qdigest path
    # for value_at_quantile (functions/sketches.py) — the marker-escape
    # guard still protects the marker-only pipelines
    with pytest.raises(ValueError, match="qdigest_agg"):
        presto_call(
            "values_at_quantiles", F.col("x"), F.array(F.lit(0.5))
        )
    import numpy as np

    from verax_spark.functions.sketches import qd_build

    blob = qd_build(np.arange(1, 101, dtype=np.int64))
    df2 = spark.createDataFrame([(blob,)], "qd binary")
    got = df2.select(
        presto_call("value_at_quantile", F.col("qd"), 0.5).alias("m")
    ).collect()[0]
    assert 49 <= got.m <= 51


def test_min_by_max_by_n_ary(spark):
    df = spark.createDataFrame(
        [("a", 3), ("b", 1), ("c", 2), ("d", None)], "x string, y int"
    )
    row = df.select(
        presto_call("min_by", F.col("x"), F.col("y")).alias("m1"),
        presto_call("min_by", F.col("x"), F.col("y"), 2).alias("m2"),
        presto_call("max_by", F.col("x"), F.col("y"), 2).alias("m3"),
    ).collect()[0]
    assert row.m1 == "b"
    assert row.m2 == ["b", "c"] and row.m3 == ["a", "c"]


def test_joda_pattern_quote_aware():
    """Joda→Java translation must not rewrite Z/Y inside quoted literals,
    and weekyear ('Y') raises instead of silently meaning calendar year."""
    from verax_spark.functions.presto import _joda_pattern

    # quoted 'Z' survives; unquoted Z becomes Java offset pattern
    assert _joda_pattern("yyyy-MM-dd'T'HH:mm:ss'Z'") == "yyyy-MM-dd'T'HH:mm:ss'Z'"
    assert _joda_pattern("yyyy-MM-dd HH:mm:ss Z") == "yyyy-MM-dd HH:mm:ss xx"
    assert _joda_pattern("yyyy ZZ") == "yyyy XXX"
    # doubled-quote escape inside a literal stays intact
    assert _joda_pattern("hh 'o''clock' Z") == "hh 'o''clock' xx"
    with pytest.raises(NotImplementedError, match="weekyear"):
        _joda_pattern("YYYY-MM-dd")


def test_ip_octet_range_validation(spark):
    """Out-of-range octets ('999.0.0.1') yield NULL, not garbage — in both
    the Column adapter and the SQL-compat UDF."""
    df = spark.createDataFrame(
        [("999.0.0.1",), ("10.0.0.256",), ("10.0.0.255",), ("1.2.3.4",)],
        "ip string",
    )
    rows = df.select(
        presto_call("ip_prefix", F.col("ip"), 24).alias("p")
    ).collect()
    assert [r.p for r in rows] == [None, None, "10.0.0.0/24", "1.2.3.0/24"]
    from verax_spark.functions.presto import register_sql_compat

    register_sql_compat(spark)
    sql_rows = df.createOrReplaceTempView("ip_range_t")
    got = spark.sql(
        "select ip4_to_int(ip) as v from ip_range_t"
    ).collect()
    assert got[0].v is None and got[1].v is None
    assert got[2].v == 10 * 16777216 + 255 and got[3].v == (
        1 * 16777216 + 2 * 65536 + 3 * 256 + 4
    )


def test_ipv6_fallback(spark):
    """IPv6 inputs route through the stdlib-ipaddress Arrow UDF (the r04
    'IPv6 yields NULL' gap); IPv4 stays on the Column fast path."""
    df = spark.createDataFrame(
        [("2001:db8::8a2e:370:7334",), ("10.1.2.3",)], "ip string"
    )
    rows = df.select(
        presto_call("ip_prefix", F.col("ip"), 24).alias("p24"),
    ).collect()
    assert rows[0].p24 == "2001:d00::/24"  # stdlib-canonical v6 network
    assert rows[1].p24 == "10.1.2.0/24"  # v4 stays on the Column path
    one = spark.range(1)
    r = one.select(
        presto_call("ip_subnet_min", F.lit("2001:db8::/32")).alias("mn"),
        presto_call("ip_subnet_max", F.lit("2001:db8::/126")).alias("mx"),
        presto_call(
            "is_subnet_of", F.lit("2001:db8::/32"), F.lit("2001:db8:1::/48")
        ).alias("sub"),
        presto_call(
            "is_subnet_of", F.lit("2001:db8::/32"), F.lit("2001:db9::1")
        ).alias("not_sub"),
        presto_call(
            "is_subnet_of", F.lit("10.0.0.0/8"), F.lit("10.1.0.0/16")
        ).alias("v4_sub"),
    ).collect()[0]
    assert r.mn == "2001:db8::"
    assert r.mx == "2001:db8::3"
    assert r.sub is True and r.not_sub is False and r.v4_sub is True


def test_batch9_statistical_cdfs(spark):
    """Batch 9 closed-form CDF family vs scipy-free ground truth: Acklam
    inverse normal round-trips through normal_cdf at 1e-8 including BOTH
    tail branches; binomial/poisson folds equal exact finite sums;
    cauchy/laplace/weibull match closed forms."""
    import math as m

    import pyspark.sql.functions as F

    from verax_spark.functions.presto import presto_call as pc

    df = spark.range(1).select(
        *[
            pc(
                "normal_cdf",
                F.lit(0.0),
                F.lit(1.0),
                pc("inverse_normal_cdf", F.lit(0.0), F.lit(1.0), F.lit(p)),
            ).alias(f"rt_{i}")
            for i, p in enumerate([0.001, 0.02, 0.5, 0.975, 0.999])
        ],
        pc("binomial_cdf", F.lit(10), F.lit(0.4), F.lit(3)).alias("b"),
        pc("poisson_cdf", F.lit(2.5), F.lit(4)).alias("p"),
        pc("cauchy_cdf", F.lit(1.0), F.lit(2.0), F.lit(3.0)).alias("c"),
        pc("laplace_cdf", F.lit(0.0), F.lit(1.0), F.lit(-1.0)).alias("l"),
        pc("weibull_cdf", F.lit(2.0), F.lit(1.0), F.lit(1.0)).alias("w"),
    )
    r = df.collect()[0]
    for i, p in enumerate([0.001, 0.02, 0.5, 0.975, 0.999]):
        # A&S-7.1.26 erf is the looser link (|err| ~1.5e-7); Acklam itself
        # is 1.15e-9
        assert abs(getattr(r, f"rt_{i}") - p) < 1e-6, (p, getattr(r, f"rt_{i}"))
    b_exact = sum(
        m.comb(10, i) * 0.4**i * 0.6 ** (10 - i) for i in range(4)
    )
    p_exact = sum(m.exp(-2.5) * 2.5**i / m.factorial(i) for i in range(5))
    assert abs(r.b - b_exact) < 1e-12
    assert abs(r.p - p_exact) < 1e-12
    assert abs(r.c - (0.5 + m.atan(1.0) / m.pi)) < 1e-12
    assert abs(r.l - 0.5 * m.exp(-1.0)) < 1e-12
    assert abs(r.w - (1 - m.exp(-1.0))) < 1e-12


def test_batch9_collections_and_duration(spark):
    """jaccard_index / array_sort_desc (nulls last) / map_normalize /
    reduce_agg / parse_duration -> to_milliseconds."""
    import pyspark.sql.functions as F

    from verax_spark.functions.presto import presto_call as pc

    r = spark.range(1).select(
        pc(
            "jaccard_index",
            F.array(F.lit(1), F.lit(2), F.lit(3)),
            F.array(F.lit(3), F.lit(4)),
        ).alias("j"),
        pc(
            "array_sort_desc",
            F.array(F.lit(2), F.lit(None).cast("int"), F.lit(5)),
        ).alias("sd"),
        pc(
            "map_normalize",
            F.create_map(F.lit("a"), F.lit(1.0), F.lit("b"), F.lit(3.0)),
        ).alias("mn"),
        pc(
            "to_milliseconds", pc("parse_duration", F.lit("2.5m"))
        ).alias("ms"),
        pc("to_milliseconds", pc("parse_duration", F.lit("750ms"))).alias(
            "ms2"
        ),
        pc("parse_duration", F.lit("oops")).alias("bad"),
    ).collect()[0]
    assert r.j == 0.25
    assert r.sd == [5, 2, None]
    assert r.mn == {"a": 0.25, "b": 0.75}
    assert r.ms == 150000 and r.ms2 == 750
    assert r.bad is None

    agg = (
        spark.range(6)
        .select((F.col("id") + 1).alias("v"), (F.col("id") % 2).alias("g"))
        .groupBy("g")
        .agg(
            pc(
                "reduce_agg",
                F.col("v"),
                F.lit(0).cast("bigint"),
                lambda s, x: s + x,
            ).alias("ra"),
            F.sum("v").alias("s"),
        )
        .collect()
    )
    assert all(row.ra == row.s for row in agg)


# ---------------------------------------------------------------------------
# batch 12: property checks beyond the single-point mapping cases
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("p", [0.05, 0.3, 0.5, 0.8, 0.99])
def test_inverse_cdf_round_trips(fx, p):
    """cdf(inverse_cdf(p)) = p for every continuous family (the bisection
    inverses must land inside the forward CDF's own precision)."""
    row = fx.select(
        _c("gamma_cdf", F.lit(2.5), F.lit(1.5),
           _c("inverse_gamma_cdf", F.lit(2.5), F.lit(1.5), F.lit(p))).alias("g"),
        _c("chi_squared_cdf", F.lit(7.0),
           _c("inverse_chi_squared_cdf", F.lit(7.0), F.lit(p))).alias("c"),
        _c("f_cdf", F.lit(3.0), F.lit(9.0),
           _c("inverse_f_cdf", F.lit(3.0), F.lit(9.0), F.lit(p))).alias("f"),
        _c("beta_cdf", F.lit(2.0), F.lit(5.0),
           _c("inverse_beta_cdf", F.lit(2.0), F.lit(5.0), F.lit(p))).alias("b"),
        _c("cauchy_cdf", F.lit(1.0), F.lit(2.0),
           _c("inverse_cauchy_cdf", F.lit(1.0), F.lit(2.0), F.lit(p))).alias("ca"),
        _c("laplace_cdf", F.lit(0.5), F.lit(1.5),
           _c("inverse_laplace_cdf", F.lit(0.5), F.lit(1.5), F.lit(p))).alias("la"),
        _c("weibull_cdf", F.lit(2.0), F.lit(3.0),
           _c("inverse_weibull_cdf", F.lit(2.0), F.lit(3.0), F.lit(p))).alias("w"),
    ).collect()[0]
    for k, v in row.asDict().items():
        assert abs(v - p) < 1e-8, (k, v, p)


def test_discrete_inverse_cdf_is_smallest_k(fx):
    """inverse_{binomial,poisson}_cdf(p) returns the SMALLEST k with
    CDF(k) >= p: CDF(k) >= p and (k = 0 or CDF(k-1) < p)."""
    rows = fx.select(
        *[
            F.struct(
                _c("inverse_binomial_cdf", F.lit(15), F.lit(0.4), F.lit(p)).alias("kb"),
                _c("inverse_poisson_cdf", F.lit(6.0), F.lit(p)).alias("kp"),
                F.lit(p).alias("p"),
            ).alias(f"s{i}")
            for i, p in enumerate([0.01, 0.2, 0.5, 0.77, 0.999])
        ]
    ).collect()[0]
    import math as _m

    def binom_cdf(n, q, k):
        return sum(
            _m.comb(n, i) * q**i * (1 - q) ** (n - i) for i in range(k + 1)
        )

    def pois_cdf(lam, k):
        return sum(_m.exp(-lam) * lam**i / _m.factorial(i) for i in range(k + 1))

    for s in rows:
        assert binom_cdf(15, 0.4, s.kb) >= s.p
        assert s.kb == 0 or binom_cdf(15, 0.4, s.kb - 1) < s.p
        assert pois_cdf(6.0, s.kp) >= s.p
        assert s.kp == 0 or pois_cdf(6.0, s.kp - 1) < s.p


def test_bing_tile_quadkey_round_trip(fx):
    """tile -> quadkey -> tile is the identity across zooms, and
    bing_tile_at lands inside its own polygon's lat/lng bounds."""
    cases = [(0, 0, 1), (3, 5, 4), (123, 456, 10), (0, 1023, 10)]
    cols = []
    for i, (x, y, z) in enumerate(cases):
        t = _c("bing_tile", F.lit(x), F.lit(y), F.lit(z))
        rt = _c("bing_tile", _c("bing_tile_quadkey", t))
        cols.append(rt.alias(f"t{i}"))
    row = fx.select(*cols).collect()[0]
    for i, (x, y, z) in enumerate(cases):
        got = row[f"t{i}"]
        assert (got.x, got.y, got.zoom) == (x, y, z)


def test_geo_tail_hull_simplify_wkb(spark):
    """r09 geospatial tail: ST_ConvexHull / ST_Simplify / WKB codec —
    degenerate shapes, NULL contracts, both byte orders."""
    import struct as _struct

    from verax_spark.functions.presto import presto_call as pc

    df = spark.range(1)
    row = df.select(
        # point hull = the point; collinear hull = linestring
        pc("st_geometrytype", pc("st_convexhull", pc("st_point", F.lit(1.0), F.lit(2.0)))).alias("pt_kind"),
        pc(
            "st_geometrytype",
            pc(
                "st_convexhull",
                pc("st_geometryfromtext", F.lit("LINESTRING (0 0, 1 1, 2 2)")),
            ),
        ).alias("collinear_kind"),
        # negative tolerance -> NULL; zero -> unchanged
        pc(
            "st_simplify",
            pc("st_geometryfromtext", F.lit("LINESTRING (0 0, 1 0, 2 0)")),
            F.lit(-1.0),
        ).isNull().alias("neg_tol_null"),
        pc(
            "st_numpoints",
            pc(
                "st_simplify",
                pc("st_geometryfromtext", F.lit("LINESTRING (0 0, 1 5, 2 0)")),
                F.lit(0.0),
            ),
        ).alias("zero_tol_npts"),
        # a polygon ring that would collapse keeps the original
        pc(
            "st_numpoints",
            pc(
                "st_simplify",
                pc(
                    "st_geometryfromtext",
                    F.lit("POLYGON ((0 0, 4 0, 4 0.01, 0 0.01, 0 0))"),
                ),
                F.lit(10.0),
            ),
        ).alias("collapse_npts"),
        pc("st_geomfrombinary", F.lit(b"nonsense")).isNull().alias("garbage_null"),
    ).collect()[0]
    assert row.pt_kind == "ST_Point"
    assert row.collinear_kind == "ST_LineString"
    assert row.neg_tol_null
    assert row.zero_tol_npts == 3
    assert row.collapse_npts == 4
    assert row.garbage_null

    # big-endian WKB parses too (byte-order flag 0)
    be = b"\x00" + _struct.pack(">I", 1) + _struct.pack(">2d", 3.25, -7.5)
    got = (
        spark.createDataFrame([(be,)], "b binary")
        .select(
            pc("st_x", pc("st_geomfrombinary", F.col("b"))).alias("x"),
            pc("st_y", pc("st_geomfrombinary", F.col("b"))).alias("y"),
        )
        .collect()[0]
    )
    assert (got.x, got.y) == (3.25, -7.5)

    # multi-ring polygon WKB (holes) -> NULL, the loud unsupported signal
    ring = _struct.pack("<5I", 0, 0, 0, 0, 0)  # placeholder coords block
    two_rings = b"\x01" + _struct.pack("<II", 3, 2) + ring
    assert (
        spark.createDataFrame([(two_rings,)], "b binary")
        .select(pc("st_geomfrombinary", F.col("b")).isNull().alias("n"))
        .collect()[0]
        .n
    )


def test_geo_de9im_predicate_tail(spark):
    """r10 DE-9IM predicates (ST_Disjoint/Equals/Touches/Crosses/Overlaps):
    every decided case is exact; undecided combinations are loud NULL —
    never a wrong answer (geo.py honesty contract)."""
    from verax_spark.functions.presto import presto_call as pc

    def g(w):
        return pc("st_geometryfromtext", F.lit(w))

    diag = g("LINESTRING (0 0, 4 4)")
    anti = g("LINESTRING (0 4, 4 0)")
    far = g("LINESTRING (5 0, 9 4)")
    collinear = g("LINESTRING (2 2, 8 8)")
    tjunc = g("LINESTRING (2 2, 2 8)")  # endpoint ON diag's interior
    square = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    square2 = g("POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))")  # shares an edge
    row = spark.range(1).select(
        pc("st_crosses", diag, anti).alias("x_proper"),
        pc("st_crosses", diag, far).alias("x_far"),
        pc("st_crosses", diag, collinear).alias("x_collinear"),
        pc("st_crosses", diag, tjunc).alias("x_tjunc"),
        pc("st_crosses", square, square2).alias("x_polys"),
        pc("st_crosses", pc("st_point", F.lit(1.0), F.lit(1.0)),
           pc("st_point", F.lit(1.0), F.lit(1.0))).alias("x_pts"),
        pc("st_touches", pc("st_point", F.lit(2.0), F.lit(0.0)), square).alias("t_ring"),
        pc("st_touches", pc("st_point", F.lit(2.0), F.lit(2.0)), square).alias("t_in"),
        pc("st_touches", pc("st_point", F.lit(9.0), F.lit(9.0)), square).alias("t_out"),
        pc("st_touches", pc("st_point", F.lit(0.0), F.lit(0.0)), diag).alias("t_end"),
        pc("st_touches", pc("st_point", F.lit(2.0), F.lit(2.0)), diag).alias("t_mid"),
        pc("st_touches", square, square2).alias("t_polys"),
        pc("st_equals", diag, g("LINESTRING (4 4, 0 0)")).alias("e_rev"),
        pc("st_equals", diag, g("LINESTRING (0 0, 3 3)")).alias("e_diff"),
        pc("st_equals", diag, anti).alias("e_anti"),
        pc("st_equals", diag, square).alias("e_kind"),
        pc("st_equals", diag, g("LINESTRING (0 0, 2 2, 4 4)")).alias("e_split"),
        pc("st_overlaps", diag, square).alias("o_kind"),
        pc("st_overlaps", square, g("POLYGON ((9 9, 12 9, 12 12, 9 12, 9 9))")).alias("o_far"),
        pc("st_overlaps", square, square2).alias("o_polys"),
        pc("st_disjoint", diag, far).alias("d_far"),
        pc("st_disjoint", diag, anti).alias("d_cross"),
    ).collect()[0]
    assert row.x_proper is True
    assert row.x_far is False
    assert row.x_collinear is None      # degenerate contact: undecided
    assert row.x_tjunc is None          # T-junction: undecided, not wrong
    assert row.x_polys is False         # polygons never cross (OGC dims)
    assert row.x_pts is False
    assert row.t_ring is True and row.t_in is False and row.t_out is False
    assert row.t_end is True and row.t_mid is False
    assert row.t_polys is None          # edge-sharing polygons: undecided
    assert row.e_rev is True and row.e_diff is False and row.e_kind is False
    assert row.e_anti is None  # same envelope, different chain: undecided
    assert row.e_split is None          # same line, different decomposition
    assert row.o_kind is False and row.o_far is False
    assert row.o_polys is None          # proper polygon overlap: undecided
    assert row.d_far is True and row.d_cross is False


def test_presto_kurtosis(spark):
    """r10: Presto kurtosis = UNBIASED sample excess estimator, NOT Spark's
    population excess. Expected value computed independently (closed-form
    estimator over the 7 fixture values; DuckDB's kurtosis returns the
    same number, verified out-of-band). Exercises the DSL adapter, the SQL
    text rewrite, the FILTER fold, and the n<4 / zero-variance guards."""
    import math

    from verax_spark.functions.presto import presto_call as pc

    vals = [1.0, 2.0, 2.5, 4.0, 7.0, 11.0, 12.5]
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((v - mu) ** 2 for v in vals)
    m4 = sum((v - mu) ** 4 for v in vals)
    expected = (
        n * (n + 1) * (n - 1) / ((n - 2) * (n - 3)) * m4 / m2**2
        - 3 * (n - 1) ** 2 / ((n - 2) * (n - 3))
    )
    assert abs(expected - (-1.41379862249146)) < 1e-12  # duckdb cross-check

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(pc("kurtosis", F.col("x")).alias("k")).collect()[0].k
    assert abs(got - expected) < 1e-9

    # Spark's builtin disagrees (population excess) — the adapter must win
    pop = df.agg(F.kurtosis("x").alias("k")).collect()[0].k
    assert abs(pop - expected) > 1e-3

    # SQL-text path renders the same estimator (transpile → Spark SQL)
    df.createOrReplaceTempView("kurt_t")
    from verax_spark.sql import transpile

    got_sql = spark.sql(
        transpile("select kurtosis(x) as k from kurt_t")
    ).collect()[0].k
    assert abs(got_sql - expected) < 1e-9

    # FILTER folds into the argument (drop the two tail values)
    got_f = spark.sql(
        transpile("select kurtosis(x) filter (where x < 11) as k from kurt_t")
    ).collect()[0].k
    sub = [v for v in vals if v < 11]
    ns = len(sub)
    mus = sum(sub) / ns
    m2s = sum((v - mus) ** 2 for v in sub)
    m4s = sum((v - mus) ** 4 for v in sub)
    exp_f = (
        ns * (ns + 1) * (ns - 1) / ((ns - 2) * (ns - 3)) * m4s / m2s**2
        - 3 * (ns - 1) ** 2 / ((ns - 2) * (ns - 3))
    )
    assert abs(got_f - exp_f) < 1e-9

    # guards: n < 4 and zero variance are NULL
    small = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    assert small.agg(pc("kurtosis", F.col("x")).alias("k")).collect()[0].k is None
    flat = spark.createDataFrame([(5.0,)] * 6, "x double")
    assert flat.agg(pc("kurtosis", F.col("x")).alias("k")).collect()[0].k is None


def test_stat_aggregate_passthroughs(spark):
    """corr/covar_samp/covar_pop/regr_slope/regr_intercept/skewness resolve
    by same-name passthrough with Presto-identical semantics (skewness =
    population g1 — DuckDB's is bias-corrected, the ORACLE converts)."""
    import math

    from verax_spark.functions.presto import presto_call as pc

    xs = [1.0, 2.0, 2.5, 4.0, 7.0, 11.0, 12.5]
    ys = [2 * v + (i % 3) for i, v in enumerate(xs)]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxy = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    sxx = sum((a - mx) ** 2 for a in xs)
    m3 = sum((a - mx) ** 3 for a in xs)
    g1 = math.sqrt(n) * m3 / sxx**1.5

    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    row = df.agg(
        pc("skewness", F.col("x")).alias("sk"),
        pc("covar_pop", F.col("x"), F.col("y")).alias("cp"),
        pc("covar_samp", F.col("x"), F.col("y")).alias("cs"),
        pc("regr_slope", F.col("y"), F.col("x")).alias("sl"),
        pc("regr_intercept", F.col("y"), F.col("x")).alias("ic"),
    ).collect()[0]
    assert abs(row.sk - g1) < 1e-9
    assert abs(row.cp - sxy / n) < 1e-9
    assert abs(row.cs - sxy / (n - 1)) < 1e-9
    assert abs(row.sl - sxy / sxx) < 1e-9
    assert abs(row.ic - (my - sxy / sxx * mx)) < 1e-9


def test_geometry_union_agg(spark):
    """r10 aggregate ST_Union fold: exact on decidable chains (identical
    geometries, box-covers-box, contained points), NULL once any step
    leaves the planar core (disjoint polygons would need a MULTI)."""
    from verax_spark.functions.presto import presto_call as pc

    def g(w):
        return pc("st_geometryfromtext", F.lit(w))

    df = spark.createDataFrame(
        [
            # group 1: three identical squares -> that square
            (1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
            (1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
            (1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
            # group 2: nested boxes -> the outer box
            (2, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))"),
            (2, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
            # group 3: disjoint polygons -> NULL (MULTI unsupported, loud)
            (3, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
            (3, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        ],
        "grp int, wkt string",
    )
    rows = {
        r.grp: r.u
        for r in df.groupBy("grp")
        .agg(
            pc("st_astext", pc("geometry_union_agg", g(F.col("wkt")))).alias("u")
        )
        .collect()
    }
    assert rows[1] == "POLYGON ((0.0 0.0, 2.0 0.0, 2.0 2.0, 0.0 2.0, 0.0 0.0))"
    assert rows[2] == "POLYGON ((0.0 0.0, 8.0 0.0, 8.0 8.0, 0.0 8.0, 0.0 0.0))"
    assert rows[3] is None
