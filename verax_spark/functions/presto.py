"""Presto-dialect scalar/aggregate function surface on Spark.

The reference registers the whole Velox/Presto function library by name
(axiom/optimizer/tests/AxiomSql.cpp:149 registerAllScalarFunctions;
metadata registry axiom/optimizer/FunctionRegistry.h:111-295). Spark's
built-in library covers the same ground under different names — this module
is the dialect shim: Presto name → Spark implementation.

Three tiers:
1. identical name → `F.call_function` passthrough (most functions);
2. renamed → PRESTO_TO_SPARK name map;
3. different signature/arg-order → explicit adapter in _ADAPTERS.

Everything stays a Column expression (JVM-side); unmapped names raise with
the candidate Spark name so gaps surface loudly in tests, not silently at
plan time.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tier 2: pure renames (Presto name → Spark function name).
PRESTO_TO_SPARK: dict[str, str] = {
    "approx_distinct": "approx_count_distinct",
    "approx_percentile": "percentile_approx",
    "arbitrary": "any_value",
    "array_agg": "collect_list",
    "set_agg": "collect_set",
    "cardinality": "size",
    "codepoint": "ascii",
    "strpos": "instr",
    "starts_with": "startswith",
    "ends_with": "endswith",
    "regexp_like": "rlike",
    "json_extract_scalar": "get_json_object",
    "format_datetime": "date_format",
    "day_of_month": "dayofmonth",
    "day_of_year": "dayofyear",
    "doy": "dayofyear",
    "week_of_year": "weekofyear",
    "week": "weekofyear",
    "from_iso8601_timestamp": "to_timestamp",
    "from_iso8601_date": "to_date",
    "bool_and": "every",
    "bool_or": "any",
    "count_if": "count_if",
    # Presto GROUPING(a, b, ...) is the bitmask form = Spark grouping_id
    # (identical for the 1-arg case too)
    "grouping": "grouping_id",
    "is_nan": "isnan",
    "power": "pow",
    "ln": "log",
    "ceiling": "ceil",
    "reduce": "aggregate",
    "zip": "arrays_zip",
    "flatten": "flatten",
    "array_sort": "array_sort",
    "array_distinct": "array_distinct",
    "arrays_overlap": "arrays_overlap",
    "map_concat": "map_concat",
    "map_from_entries": "map_from_entries",
    "md5": "md5",
    "rand": "rand",
    "random": "rand",
    "array_to_string": "array_join",
    # presto regexp_split's pattern IS a regex, like spark split
    "regexp_split": "split",
    # presto split_to_map(s, entryDelim, kvDelim) = spark str_to_map
    "split_to_map": "str_to_map",
    "last_day_of_month": "last_day",
    "levenshtein_distance": "levenshtein",
    "to_hex": "hex",
    "from_hex": "unhex",
    "to_base64": "base64",
    "from_base64": "unbase64",
    # batch 5: collection/math parity. Same-name functions with identical
    # semantics (array_position 1-based + 0-when-absent, array_remove,
    # array_intersect/except, map_keys/values/entries, map_filter,
    # transform_keys/values, map_zip_with, width_bucket, reverse, typeof,
    # corr, covar_samp/pop, stddev/var families) resolve by passthrough —
    # only genuine renames live here.
    "chr": "char",
    # Presto HLL sketches → Spark DataSketches (binary sketch column):
    # approx_set aggregates a sketch; merge unions sketches; the estimate
    # is hll_sketch_estimate — `cardinality(approx_set(..))` is rewritten
    # structurally at render time (sql/ast.py Call.sql) since bare
    # `cardinality` must keep meaning `size` for arrays.
    "approx_set": "hll_sketch_agg",
    "merge": "hll_union_agg",
    # batch 7 renames
    "every": "bool_and",
    "bitwise_and_agg": "bit_and",
    "bitwise_or_agg": "bit_or",
    # batch 8 renames
    "format": "format_string",
    # batch 10: Presto xxhash64(varbinary)->varbinary(8) is the standard
    # XXH64 of the bytes — NOT Spark's builtin xxhash64 (internal row
    # encoding, seed 42); the real algorithm is a registered UDF
    "xxhash64": "presto_xxhash64",
}

# Seconds per fixed-width unit for date_add/date_diff arithmetic.
_UNIT_SECONDS = {
    "millisecond": 0.001,
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}
# Months per calendar unit.
_UNIT_MONTHS = {"month": 1, "quarter": 3, "year": 12}


def _col(x) -> Column:
    return x if isinstance(x, Column) else (F.expr(x) if isinstance(x, str) else F.lit(x))


def _presto_date_add(unit, n, ts) -> Column:
    """Presto date_add(unit, value, ts) as pure Column arithmetic.

    Calendar units go through make_interval (month-aware, clamps day-of-month
    like Presto); fixed-width units are interval seconds. No SQL-text round
    trip, so Column args are safe (ref Presto datetime semantics; reference
    registers the Presto library wholesale, axiom/optimizer/FunctionRegistry.h).
    """
    u, n, ts = _unit(unit), _col(n), _col(ts)
    zero = F.lit(0)
    if u in _UNIT_MONTHS:
        return ts + F.make_interval(zero, n * F.lit(_UNIT_MONTHS[u]), zero, zero, zero, zero, zero)
    if u in _UNIT_SECONDS:
        secs = n.cast("double") * F.lit(float(_UNIT_SECONDS[u]))
        return ts + F.make_interval(zero, zero, zero, zero, zero, zero, secs)
    raise ValueError(f"unsupported date_add unit {u!r}")


def _presto_date_diff(unit, a, b) -> Column:
    """Presto date_diff(unit, a, b) = complete units from a to b (bigint).

    Spark's ``div`` is integral division truncating toward zero (Java
    semantics), which matches Presto's truncation for negative spans.
    """
    u, a, b = _unit(unit), _col(a), _col(b)
    if u in _UNIT_MONTHS:
        months = F.months_between(b, a, False).cast("long")
        if u == "month":
            return months
        return F.call_function("div", months, F.lit(_UNIT_MONTHS[u]))
    if u in _UNIT_SECONDS:
        micros = F.unix_micros(b.cast("timestamp")) - F.unix_micros(a.cast("timestamp"))
        per = int(_UNIT_SECONDS[u] * 1_000_000)
        return F.call_function("div", micros, F.lit(per))
    raise ValueError(f"unsupported date_diff unit {u!r}")

def _presto_truncate(x, n=None) -> Column:
    """Presto numeric truncate: toward zero, optionally to n decimal places.

    Spark's ``trunc`` is date-only; this is the numeric lowering
    (sign(x) * floor(abs(x) * 10^n) / 10^n).
    """
    x = _col(x)
    if n is None:
        return F.signum(x) * F.floor(F.abs(x))
    scale = F.pow(F.lit(10.0), _col(n).cast("int"))
    return F.signum(x) * F.floor(F.abs(x) * scale) / scale


def _presto_json_parse(x) -> Column:
    """Presto json_parse(varchar) → canonical JSON text.

    Spark 4 lowers this through the VARIANT type: parse_json validates and
    throws on malformed input (matching Presto), to_json re-serialises in
    canonical (minified) form. Downstream json_extract_scalar/get_json_object
    consume JSON text directly, so canonical text is the Spark analog of
    Presto's JSON type.
    """
    return F.to_json(F.parse_json(_col(x).cast("string")))


# Presto date_format uses MySQL-style % directives; Spark uses Java
# datetime patterns. Literal runs are single-quoted so pattern letters in
# them stay literal.
_MYSQL_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%M": "MMMM", "%b": "MMM", "%m": "MM",
    "%c": "M", "%d": "dd", "%e": "d", "%j": "DDD", "%W": "EEEE",
    "%a": "EEE", "%H": "HH", "%k": "H", "%h": "hh", "%l": "h", "%i": "mm",
    "%s": "ss", "%S": "ss", "%f": "SSSSSS", "%p": "a", "%T": "HH:mm:ss",
}


def mysql_datetime_pattern(fmt: str) -> str:
    """Translate a (literal) MySQL-style format to a Java datetime pattern."""
    if isinstance(fmt, Column):
        raise ValueError("date_format pattern must be a literal string")
    fmt = str(fmt)
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if lit:
            run = "".join(lit).replace("'", "''")
            out.append(f"'{run}'")
            lit.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok == "%%":
                lit.append("%")
            elif tok in _MYSQL_TO_JAVA:
                flush()
                out.append(_MYSQL_TO_JAVA[tok])
            else:
                raise ValueError(f"unsupported date_format directive {tok!r}")
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    return "".join(out)


_REGEX_META = set("\\.[]{}()*+?^$|")


def regex_quote(s: str) -> str:
    """Escape a literal string for use as a Java regex (split delimiter)."""
    return "".join("\\" + c if c in _REGEX_META else c for c in s)


def _null_if_any_null(fn: Callable[..., Column]) -> Callable[..., Column]:
    """Presto least/greatest return NULL if ANY argument is NULL; Spark's
    skip NULLs — a silent wrong answer if passed through."""

    def wrap(*args) -> Column:
        cols = [_col(a) for a in args]
        any_null = cols[0].isNull()
        for c in cols[1:]:
            any_null = any_null | c.isNull()
        return F.when(any_null, F.lit(None)).otherwise(fn(*cols))

    return wrap


def _null_if_has_null_element(fn: Callable[[Column], Column]) -> Callable[..., Column]:
    """Presto array_min/array_max return NULL if the array contains NULL;
    Spark's skip NULL elements."""

    def wrap(arr) -> Column:
        a = _col(arr)
        has_null = F.exists(a, lambda e: e.isNull())
        return F.when(has_null, F.lit(None)).otherwise(fn(a))

    return wrap


def _presto_split(s, delim, limit=None) -> Column:
    """Presto split(x, delim[, limit]): delim is a LITERAL string, not a
    regex (Spark's split takes a regex — unescaped metachars silently change
    semantics). Limit semantics match (last element holds the rest)."""
    if isinstance(delim, Column):
        raise ValueError("Presto split delimiter must be a literal string")
    pattern = regex_quote(str(delim))
    return F.split(_col(s), pattern, -1 if limit is None else limit)


# Tier 3: signature adapters (arg order / semantics differ).
def _geo():
    from verax_spark.functions import geo

    return geo


_ADAPTERS: dict[str, Callable[..., Column]] = {
    # presto geometric_mean aggregate: exp(mean(ln x)) — no Spark builtin
    "geometric_mean": lambda x: F.exp(F.avg(F.log(_col(x)))),
    # presto date_add(unit, n, ts): calendar-aware Column arithmetic
    "date_add": _presto_date_add,
    # presto date_diff(unit, ts1, ts2): complete units, truncated toward zero
    "date_diff": _presto_date_diff,
    "date_trunc": lambda unit, ts: F.date_trunc(_unit(unit), _col(ts)),
    # presto numeric truncate (spark trunc is date-only)
    "truncate": _presto_truncate,
    # presto sha256(varbinary) → varbinary; spark sha2 returns hex text
    "sha256": lambda x: F.unhex(F.sha2(_col(x).cast("binary"), 256)),
    "json_parse": _presto_json_parse,
    # presto day_of_week is ISO (1=Monday..7=Sunday); spark dayofweek is
    # 1=Sunday..7=Saturday
    "day_of_week": lambda x: ((F.dayofweek(_col(x)) + F.lit(5)) % F.lit(7) + F.lit(1)).cast("int"),
    "dow": lambda x: ((F.dayofweek(_col(x)) + F.lit(5)) % F.lit(7) + F.lit(1)).cast("int"),
    # presto to_unixtime returns DOUBLE with fractional seconds (spark
    # unix_timestamp truncates to whole seconds)
    "to_unixtime": lambda x: F.unix_micros(_col(x).cast("timestamp")) / F.lit(1e6),
    # presto bitwise_* are 2-arg scalars; spark bit_and/bit_or/bit_xor are
    # aggregates — lower onto the Column bitwise operators
    "bitwise_and": lambda a, b: _col(a).bitwiseAND(_col(b)),
    "bitwise_or": lambda a, b: _col(a).bitwiseOR(_col(b)),
    "bitwise_xor": lambda a, b: _col(a).bitwiseXOR(_col(b)),
    # presto substr is 1-based like spark substring
    "substr": lambda s, pos, length=None: (
        F.substring(_col(s), pos, length)
        if length is not None
        else F.substring(_col(s), pos, 2147483647)
    ),
    # presto element_at returns NULL out of range (spark throws under ANSI;
    # try_element_at matches presto)
    "element_at": lambda col, k: F.try_element_at(col, F.lit(k) if not isinstance(k, Column) else k),
    "concat_ws": F.concat_ws,
    "infinity": lambda: F.lit(float("inf")),
    "nan": lambda: F.lit(float("nan")),
    "from_unixtime": lambda c: F.timestamp_seconds(c),
    # presto slice(arr, start, length)
    "slice": lambda arr, start, length: F.slice(arr, start, length),
    # presto array_union dedups
    "array_union": lambda a, b: F.array_distinct(F.concat(a, b)),
    "contains": F.array_contains,
    "map": F.map_from_arrays,
    "split_part": F.split_part,
    # presto min_by/max_by have an n-ary form returning the x values for
    # the n smallest/largest y (2-arg form is the Spark builtin)
    "min_by": lambda x, y, n=None: (
        F.min_by(x, y) if n is None else _n_by(x, y, int(n), asc=True)
    ),
    "max_by": lambda x, y, n=None: (
        F.max_by(x, y) if n is None else _n_by(x, y, int(n), asc=False)
    ),
    # presto repeat(element, count) builds an ARRAY; spark repeat is
    # string repetition — silent wrong answers if passed through
    "repeat": lambda e, n: F.array_repeat(_col(e), n),
    # presto split takes a literal delimiter; spark split takes a regex
    "split": _presto_split,
    # presto date_format is MySQL-%-style; spark date_format is Java-style
    "date_format": lambda ts, fmt: F.date_format(
        _col(ts), mysql_datetime_pattern(fmt)
    ),
    # presto least/greatest are NULL if any arg is NULL (spark skips NULLs)
    "least": _null_if_any_null(F.least),
    "greatest": _null_if_any_null(F.greatest),
    # presto array_min/max are NULL if the array contains NULL
    "array_min": _null_if_has_null_element(F.array_min),
    "array_max": _null_if_has_null_element(F.array_max),
    # presto regexp_extract defaults to group 0 (whole match); spark SQL
    # defaults to group 1
    "regexp_extract": lambda s, p, g=0: F.regexp_extract(
        _col(s), str(p), int(g)
    ),
    # presto 2-arg regexp_replace removes matches; spark requires 3 args
    "regexp_replace": lambda s, p, r="": F.regexp_replace(
        _col(s), p if isinstance(p, Column) else F.lit(str(p)),
        r if isinstance(r, Column) else F.lit(str(r)),
    ),
    # presto map_agg(k, v) aggregate — no direct Spark analog
    "map_agg": lambda k, v: F.map_from_entries(
        F.collect_list(F.struct(_col(k), _col(v)))
    ),
    # presto json_extract returns JSON *text* (strings stay quoted) —
    # get_json_object unquotes scalars, so route through VARIANT instead
    "json_extract": lambda x, p: F.to_json(
        F.variant_get(F.parse_json(_col(x).cast("string")), str(p), "variant")
    ),
    # presto date_parse is MySQL-%-style; spark to_timestamp is Java-style
    "date_parse": lambda s, fmt: F.to_timestamp(
        _col(s), mysql_datetime_pattern(fmt)
    ),
    # presto URL accessors → spark parse_url parts
    "url_extract_protocol": lambda u: F.parse_url(_col(u), F.lit("PROTOCOL")),
    "url_extract_host": lambda u: F.parse_url(_col(u), F.lit("HOST")),
    "url_extract_path": lambda u: F.parse_url(_col(u), F.lit("PATH")),
    "url_extract_query": lambda u: F.parse_url(_col(u), F.lit("QUERY")),
    "url_extract_fragment": lambda u: F.parse_url(_col(u), F.lit("REF")),
    "url_extract_parameter": lambda u, k: F.parse_url(
        _col(u), F.lit("QUERY"), _col(k) if isinstance(k, Column) else F.lit(k)
    ),
    # presto to_base/from_base; spark conv uses uppercase digits and takes
    # literal int radixes
    "to_base": lambda x, radix: F.lower(F.conv(_col(x), 10, int(radix))),
    "from_base": lambda s, radix: F.conv(_col(s), int(radix), 10).cast("bigint"),
    "bit_count": lambda x, bits=64: _presto_bit_count(x, bits),
    # presto ngrams(arr, n) → array of n-element subarrays
    "ngrams": lambda arr, n: F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(_col(arr)) - int(n) + 1, F.lit(1))
        ),
        lambda i: F.slice(_col(arr), i, int(n)),
    ),
    # presto array_sum / array_average skip NULL elements
    "array_sum": lambda arr: F.aggregate(
        F.filter(_col(arr), lambda e: e.isNotNull()),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    ),
    "array_average": lambda arr: F.aggregate(
        F.filter(_col(arr), lambda e: e.isNotNull()),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    / F.nullif(F.size(F.filter(_col(arr), lambda e: e.isNotNull())), F.lit(0)),
    # presto json_array_get(json, i): 0-based index; returns JSON text
    # (VARIANT path keeps strings quoted). Negative (from-the-end) indexes
    # are not supported by Spark's variant path extraction — raise.
    "json_array_get": lambda x, i: _presto_json_array_get(x, i),
    # presto hamming_distance(a, b): equal-length strings; zip chars
    "hamming_distance": lambda a, b: F.aggregate(
        F.zip_with(
            F.split(_col(a), ""),
            F.split(_col(b), ""),
            lambda x, y: F.when(x != y, 1).otherwise(0).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ),
    # presto to_utf8/from_utf8: varchar ↔ varbinary through UTF-8
    "to_utf8": lambda s: F.encode(_col(s), "UTF-8"),
    "from_utf8": lambda b: F.decode(_col(b), "UTF-8"),
    # presto millisecond(ts): the millisecond component [0, 999]
    "millisecond": lambda ts: (
        F.floor(F.pmod(F.unix_micros(_col(ts).cast("timestamp")), 1_000_000) / 1000)
    ).cast("bigint"),
    # --- batch 6 ---
    # presto strrpos(s, sub): LAST 1-based occurrence, 0 when absent.
    # locate over the reversed pair finds the last original occurrence.
    "strrpos": lambda s, sub: _presto_strrpos(s, sub),
    # presto to_iso8601(timestamp) → 'YYYY-MM-DDTHH:MM:SS.mmm'
    "to_iso8601": lambda ts: F.date_format(
        _col(ts).cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSS"
    ),
    # presto year_of_week / yow: ISO-8601 week-numbering year = calendar
    # year of that ISO week's Thursday (Java 'YYYY' patterns are rejected
    # by Spark's formatter, so compute it arithmetically)
    "year_of_week": lambda ts: _presto_yow(ts),
    "yow": lambda ts: _presto_yow(ts),
    # presto is_finite(double): neither NaN nor ±Infinity
    "is_finite": lambda x: (
        ~F.isnan(_col(x).cast("double"))
        & (_col(x).cast("double") != F.lit(float("inf")))
        & (_col(x).cast("double") != F.lit(float("-inf")))
    ),
    # presto luhn_check(varchar): Spark >= 3.5 ships the identical
    # built-in, so delegate (and it already exists on the SQL side)
    "luhn_check": lambda s: F.call_function("luhn_check", _col(s)),
    # presto cosine_similarity(map<varchar,double>, map<varchar,double>):
    # dot(a,b) / (||a|| * ||b||) over the sparse key space
    "cosine_similarity": lambda a, b: _presto_cosine_similarity(a, b),
    # presto json_size(json, path): members of an object / elements of an
    # array at path; 0 for a scalar; NULL when the path is absent
    "json_size": lambda x, p: _presto_json_size(x, p),
    # --- batch 7: crypto / encodings ---
    # hex-digest convention (consistent with md5/sha1 passthroughs)
    "sha512": lambda x: F.sha2(_col(x).cast("binary"), 512),
    "hmac_md5": lambda m, k: _udf_call("hmac_md5", m, k),
    "hmac_sha1": lambda m, k: _udf_call("hmac_sha1", m, k),
    "hmac_sha256": lambda m, k: _udf_call("hmac_sha256", m, k),
    "hmac_sha512": lambda m, k: _udf_call("hmac_sha512", m, k),
    # presto to_base64url/from_base64url: RFC 4648 URL-safe alphabet
    "to_base64url": lambda x: F.translate(
        F.base64(_col(x).cast("binary")), "+/", "-_"
    ),
    "from_base64url": lambda s: F.unbase64(F.translate(_col(s), "-_", "+/")),
    # --- batch 7: math / stats ---
    "wilson_interval_lower": lambda s, n, z: _wilson(s, n, z, -1),
    "wilson_interval_upper": lambda s, n, z: _wilson(s, n, z, +1),
    # --- batch 7: datetime ---
    # session-zone offset components (Presto reads the value's own zone;
    # Spark timestamps are session-zoned, so the session zone is THE zone)
    "timezone_hour": lambda ts: _tz_offset_part(ts, "hour"),
    "timezone_minute": lambda ts: _tz_offset_part(ts, "minute"),
    # presto parse_datetime(string, joda_pattern)
    "parse_datetime": lambda s, fmt: F.to_timestamp(
        _col(s), _joda_pattern(fmt)
    ),
    # --- batch 7: URL ---
    # parse_url has no PORT part — take it from the authority
    "url_extract_port": lambda u: F.nullif(
        F.regexp_extract(
            _col(u), r"^[^:/?#]+://(?:[^/@]*@)?[^/:?#]*:([0-9]+)", 1
        ),
        F.lit(""),
    ).cast("bigint"),
    # --- batch 7: JSON ---
    "json_format": lambda x: F.to_json(
        F.parse_json(_col(x).cast("string"))
    ),
    "json_array_contains": lambda x, v: _presto_json_array_contains(x, v),
    "is_json_scalar": lambda x: _presto_is_json_scalar(x),
    # --- batch 7: text (UDF slow path, see functions/udfs.py) ---
    "normalize": lambda s, form="NFC": _udf_normalize(s, form),
    "word_stem": lambda s, lang="en": _udf_word_stem(s, lang),
    # --- batch 7: collections ---
    # presto multimap_from_entries(array<row(k,v)>): k -> array of all v
    "multimap_from_entries": lambda ents: _group_entries(_col(ents)),
    # --- batch 7: aggregates ---
    # presto map_union: merge maps across rows; on duplicate keys an
    # arbitrary value survives (here: first collected)
    "map_union": lambda m: _entries_to_map(
        F.flatten(F.collect_list(F.map_entries(_col(m))))
    ),
    "multimap_agg": lambda k, v: _group_entries(
        F.collect_list(F.struct(_col(k).alias("key"), _col(v).alias("value")))
    ),
    "set_union": lambda arr: F.array_distinct(
        F.flatten(F.collect_list(_col(arr)))
    ),
    # presto histogram(x): value -> count map. NOTE: like every
    # expression-level map aggregate here, the intermediate collect_list
    # is GROUP-sized before dedup — correct Presto semantics, but for
    # high-row-count groups at scale use the plan-level two-phase form
    # (operators.text.grouped_histogram), whose shuffle carries only
    # (group, value) partial counts.
    "histogram": lambda x: _presto_histogram(F.collect_list(_col(x))),
    # presto checksum: order-insensitive aggregate checksum. Engine-local
    # constant (Presto's exact bytes are xxhash64-based too but not
    # bit-compatible); the contract — equal multisets ⇒ equal checksum,
    # order-independent — holds.
    "checksum": lambda x: F.sum(F.xxhash64(_col(x))),
    # presto approx_most_frequent(buckets, value, capacity): here computed
    # exactly (a strictly stronger guarantee; capacity is accepted and
    # ignored). For hot-path global top-k at scale prefer
    # operators.text.token_vocabulary's two-level partial top-k plan.
    "approx_most_frequent": lambda b, x, cap=None: _top_k_by_count(
        F.collect_list(_col(x)), int(b)
    ),
    # presto numeric_histogram(buckets, x): Presto's is an adaptive
    # streaming histogram; this is the equal-width deterministic analog
    # (bin mean -> count), documented deviation.
    "numeric_histogram": lambda b, x: _numeric_histogram(
        F.collect_list(_col(x).cast("double")), int(b)
    ),
    # --- batch 7: quantile sketches. In EXPRESSION context
    # qdigest_agg/tdigest_agg return a pipeline marker that
    # value_at_quantile consumes (one-shot percentile_approx) — mirroring
    # the cardinality(approx_set(..)) HLL rewrite; a marker escaping its
    # pipeline fails loudly. For STORABLE, MERGEABLE digest state (build →
    # parquet → merge later) use functions/sketches.py: a real t-digest
    # (tdigest_partials / tdigest_merge / tdigest_quantile, r05) AND a real
    # q-digest over int64 (qdigest_partials / qdigest_merge /
    # qdigest_value_at_quantile, r06 — Shrivastava 2004, binary round-trip
    # driver-checked in op_fn_sketch_merge).
    # --- r05: color family (Presto color.h: color/rgb/render/bar —
    # terminal-visualization helpers). Colors are the RGB int Presto uses;
    # render/bar emit ANSI truecolor escapes (documented deviation: Presto
    # downsamples to its 256-color palette; block counts and hex parsing
    # are identical, so the VISIBLE content matches).
    "rgb": lambda r, g, b: (
        _col(r).cast("bigint") * 65536
        + _col(g).cast("bigint") * 256
        + _col(b).cast("bigint")
    ),
    "color": lambda s_: _presto_color(s_),
    "render": lambda x, c=None: _presto_render(x, c),
    "bar": lambda x, w, lo=None, hi=None: _presto_bar(x, w, lo, hi),
    # --- r05: geospatial core (functions/geo.py; planar ST_* subset —
    # Presto's ST_* is planar as well). great_circle_distance is Presto's
    # haversine, exact.
    "st_point": lambda x, y: _geo().st_point(_col(x), _col(y)),
    "st_geometryfromtext": lambda w: _geo().st_geometry_from_text(_col(w)),
    "st_astext": lambda g: _geo().st_as_text(_col(g)),
    "st_x": lambda g: _geo().st_x(_col(g)),
    "st_y": lambda g: _geo().st_y(_col(g)),
    "st_distance": lambda a, b: _geo().st_distance(_col(a), _col(b)),
    "st_area": lambda g: _geo().st_area(_col(g)),
    "st_length": lambda g: _geo().st_length(_col(g)),
    "st_centroid": lambda g: _geo().st_centroid(_col(g)),
    "st_envelope": lambda g: _geo().st_envelope(_col(g)),
    "st_contains": lambda p, q: _geo().st_contains(_col(p), _col(q)),
    "st_within": lambda p, q: _geo().st_within(_col(p), _col(q)),
    # --- r07: accessor/predicate tail of the planar core ---
    "st_xmin": lambda g: _geo().st_xmin(_col(g)),
    "st_xmax": lambda g: _geo().st_xmax(_col(g)),
    "st_ymin": lambda g: _geo().st_ymin(_col(g)),
    "st_ymax": lambda g: _geo().st_ymax(_col(g)),
    "st_numpoints": lambda g: _geo().st_num_points(_col(g)),
    "st_isempty": lambda g: _geo().st_is_empty(_col(g)),
    "st_isclosed": lambda g: _geo().st_is_closed(_col(g)),
    "st_geometrytype": lambda g: _geo().st_geometry_type(_col(g)),
    "st_intersects": lambda a, b: _geo().st_intersects(_col(a), _col(b)),
    # --- r08: constructive tail (exact planar-core cases, EMPTY for
    # provably-empty results, NULL for unsupported shapes) ---
    "st_intersection": lambda a, b: _geo().st_intersection(_col(a), _col(b)),
    "st_union": lambda a, b: _geo().st_union(_col(a), _col(b)),
    "st_buffer": lambda g, d: _geo().st_buffer(_col(g), d),
    # --- r10: DE-9IM predicate tail (exact decidable set per predicate,
    # NULL for undecided combinations — geo.py docstrings) ---
    "st_disjoint": lambda a, b: _geo().st_disjoint(_col(a), _col(b)),
    # aggregate ST_Union fold; exact on decidable union chains, NULL
    # propagates from any undecidable step (geo.py geometry_union_agg)
    "geometry_union_agg": lambda g: _geo().geometry_union_agg(_col(g)),
    "st_equals": lambda a, b: _geo().st_equals(_col(a), _col(b)),
    "st_touches": lambda a, b: _geo().st_touches(_col(a), _col(b)),
    "st_crosses": lambda a, b: _geo().st_crosses(_col(a), _col(b)),
    "st_overlaps": lambda a, b: _geo().st_overlaps(_col(a), _col(b)),
    # --- batch 15 (r10): vertex/component accessors of the planar core ---
    "st_startpoint": lambda g: _geo().st_start_point(_col(g)),
    "st_endpoint": lambda g: _geo().st_end_point(_col(g)),
    "st_pointn": lambda g, n: _geo().st_point_n(_col(g), n),
    "st_points": lambda g: _geo().st_points(_col(g)),
    "st_numgeometries": lambda g: _geo().st_num_geometries(_col(g)),
    "st_geometryn": lambda g, n: _geo().st_geometry_n(_col(g), n),
    "st_geometries": lambda g: _geo().st_geometries(_col(g)),
    "st_exteriorring": lambda g: _geo().st_exterior_ring(_col(g)),
    "st_interiorringn": lambda g, n: _geo().st_interior_ring_n(_col(g), n),
    "st_numinteriorring": lambda g: _geo().st_num_interior_ring(_col(g)),
    "st_boundary": lambda g: _geo().st_boundary(_col(g)),
    "bing_tile_parent": lambda t, z=None: _bing_tile_parent(t, z),
    "bing_tile_children": lambda t, z=None: _bing_tile_children(t, z),
    # --- r09: hull/simplify/WKB tail (pandas-batched in geo.py) ---
    "st_convexhull": lambda g: _geo().st_convex_hull(_col(g)),
    "st_simplify": lambda g, t: _geo().st_simplify(_col(g), t),
    "st_asbinary": lambda g: _geo().st_as_binary(_col(g)),
    "st_geomfrombinary": lambda b: _geo().st_geom_from_binary(_col(b)),
    "great_circle_distance": lambda a, b, c, d: _geo().great_circle_distance(
        _col(a), _col(b), _col(c), _col(d)
    ),
    "qdigest_agg": lambda x: _QuantileSketch(_col(x)),
    "tdigest_agg": lambda x: _QuantileSketch(_col(x)),
    # value_at_quantile accepts EITHER the qdigest_agg/tdigest_agg pipeline
    # marker (lowered onto percentile_approx) OR a BINARY column of stored
    # q-digest state (functions/sketches.py qd_* — built by
    # qdigest_partials/qdigest_merge, read per Presto's
    # value_at_quantile(qdigest, q) contract, r06)
    "value_at_quantile": lambda d, q: (
        __import__(
            "verax_spark.functions.sketches", fromlist=["x"]
        ).qdigest_value_at_quantile(d, float(q))
        if isinstance(d, Column) and not isinstance(q, Column)
        else F.percentile_approx(
            _sketch_input(d, "value_at_quantile"), _col(q), F.lit(10000)
        )
    ),
    "values_at_quantiles": lambda d, qs: (
        __import__(
            "verax_spark.functions.sketches", fromlist=["x"]
        ).qdigest_values_at_quantiles(d, [float(x) for x in qs])
        if isinstance(d, Column) and isinstance(qs, (list, tuple))
        else F.percentile_approx(
            _sketch_input(d, "values_at_quantiles"), _col(qs), F.lit(10000)
        )
    ),
    # quantile_at_value exists only for REAL digest state (Presto qdigest
    # scalar; no marker-pipeline lowering onto percentile_approx is exact)
    "quantile_at_value": lambda d, v: __import__(
        "verax_spark.functions.sketches", fromlist=["x"]
    ).qdigest_quantile_at_value(_col(d), int(v)),
    # --- batch 8: array combinatorics / matches ---
    "combinations": lambda arr, n: _combinations(_col(arr), int(n)),
    "array_has_duplicates": lambda arr: (
        F.size(_col(arr)) != F.size(F.array_distinct(_col(arr)))
    ),
    "array_duplicates": lambda arr: _array_duplicates(_col(arr)),
    # value -> occurrence count over NON-NULL elements (Presto semantics)
    "array_frequency": lambda arr: _presto_histogram(
        F.filter(_col(arr), lambda e: e.isNotNull())
    ),
    "array_cum_sum": lambda arr: F.transform(
        F.sequence(F.lit(1), F.size(_col(arr))),
        lambda i: F.aggregate(
            F.slice(_col(arr), 1, i),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        ),
    ),
    "trim_array": lambda arr, n: F.slice(
        _col(arr), 1, F.greatest(F.size(_col(arr)) - int(n), F.lit(0))
    ),
    # Spark exists/forall share Presto's 3-valued NULL semantics
    "any_match": lambda arr, fn: F.exists(_col(arr), fn),
    "all_match": lambda arr, fn: F.forall(_col(arr), fn),
    "none_match": lambda arr, fn: ~F.exists(_col(arr), fn),
    # --- batch 8: map utilities ---
    "map_subset": lambda m, keys: F.map_filter(
        _col(m), lambda k, _v: F.array_contains(_col(keys), k)
    ),
    "map_remove_null_values": lambda m: F.map_filter(
        _col(m), lambda _k, v: v.isNotNull()
    ),
    "map_top_n": lambda m, n: F.map_from_entries(
        F.slice(_map_entries_by_value_desc(_col(m)), 1, int(n))
    ),
    # map_top_n_keys orders by the KEYS themselves (descending) — Presto
    # ships the separate map_keys_by_top_n_values for the by-value form,
    # which is why this one cannot be value-ordered (r10 semantic fix; the
    # prior by-value behavior is exactly map_keys_by_top_n_values below)
    "map_top_n_keys": lambda m, n: F.slice(
        F.reverse(F.array_sort(F.map_keys(_col(m)))), 1, int(n)
    ),
    "map_top_n_values": lambda m, n: F.transform(
        F.slice(_map_entries_by_value_desc(_col(m)), 1, int(n)),
        lambda e: e["value"],
    ),
    # batch 15 (r10): the by-value / by-key cross-accessors
    "map_keys_by_top_n_values": lambda m, n: F.transform(
        F.slice(_map_entries_by_value_desc(_col(m)), 1, int(n)),
        lambda e: e["key"],
    ),
    "map_values_by_top_n_keys": lambda m, n: F.transform(
        F.slice(F.reverse(F.array_sort(F.map_keys(_col(m)))), 1, int(n)),
        lambda k: F.element_at(_col(m), k),
    ),
    # --- batch 8: math / stats / text ---
    # Φ((x-mean)/sd) via the Abramowitz-Stegun 7.1.26 erf approximation
    # (|err| < 1.5e-7), pure Column arithmetic — JVM-side
    "normal_cdf": lambda mean, sd, x: _normal_cdf(mean, sd, x),
    # Presto kurtosis is the UNBIASED excess estimator; Spark's builtin of
    # the same name is the population excess — override the passthrough
    "kurtosis": lambda x: _presto_kurtosis(x),
    # Presto entropy(c) aggregate over per-row counts:
    # H = log2(S) - Σ c·log2(c) / S, exact aggregate algebra
    "entropy": lambda c: _presto_entropy(_col(c)),
    "split_to_multimap": lambda s, ed, kd: _split_to_multimap(s, ed, kd),
    # Presto regexp_position: 1-based first match position, -1 if none
    "regexp_position": lambda s, p: F.when(
        F.regexp_instr(_col(s), _lit_or_col(p)) == 0, F.lit(-1)
    ).otherwise(F.regexp_instr(_col(s), _lit_or_col(p))).cast("bigint"),
    "human_readable_seconds": lambda x: _human_readable_seconds(_col(x)),
    # --- batch 7: IPv4 network functions (IPv6 inputs yield NULL) ---
    "ip_prefix": lambda ip, bits: _ip_prefix_any(ip, bits),
    "ip_subnet_min": lambda p: _ip_subnet_bound_any(p, "subnet_min"),
    "ip_subnet_max": lambda p: _ip_subnet_bound_any(p, "subnet_max"),
    "ip_subnet_range": lambda p: F.array(
        _ip_subnet_bound_any(p, "subnet_min"),
        _ip_subnet_bound_any(p, "subnet_max"),
    ),
    "is_subnet_of": lambda p, ip: _is_subnet_of_any(p, ip),
    # --- batch 9: statistical CDF family (closed-form members; the
    # incomplete-gamma/beta members — gamma/beta/chi_squared/t — have no
    # Column-expression spelling and are not registered), plus collection
    # and duration tail ---
    "inverse_normal_cdf": lambda mean, sd, p: _inverse_normal_cdf(mean, sd, p),
    "cauchy_cdf": lambda median, scale, x: F.lit(0.5)
    + F.atan(
        (_col(x).cast("double") - _col(median).cast("double"))
        / _col(scale).cast("double")
    )
    / F.lit(math.pi),
    "laplace_cdf": lambda mean, scale, x: _laplace_cdf(mean, scale, x),
    "weibull_cdf": lambda a, b, x: F.when(
        _col(x).cast("double") <= 0, F.lit(0.0)
    ).otherwise(
        F.lit(1.0)
        - F.exp(
            -F.pow(
                _col(x).cast("double") / _col(b).cast("double"),
                _col(a).cast("double"),
            )
        )
    ),
    "binomial_cdf": lambda n, p, k: _binomial_cdf(n, p, k),
    "poisson_cdf": lambda lam, k: _poisson_cdf(lam, k),
    # Presto jaccard_index(array, array): |a ∩ b| / |a ∪ b| over distinct
    # elements
    "jaccard_index": lambda a, b: (
        F.size(F.array_intersect(_col(a), _col(b))).cast("double")
        / F.size(F.array_union(_col(a), _col(b))).cast("double")
    ),
    "array_sort_desc": lambda a: F.sort_array(_col(a), asc=False),
    # Presto map_normalize: each value divided by the sum of all values
    "map_normalize": lambda m: _map_normalize(_col(m)),
    # Presto reduce_agg(input, init, input_fn, combine_fn): Spark has no
    # user-lambda UDAF; the exact algebra is aggregate(collect_list(v),
    # init, input_fn) — combine_fn is subsumed because the fold is a
    # single sequential pass. Group size bounds memory (documented; same
    # bound as Presto's own single-node state)
    "reduce_agg": lambda v, init, fn: F.aggregate(
        F.collect_list(_col(v)), init, fn
    ),
    "parse_duration": lambda s: _parse_duration(_col(s)),
    "to_milliseconds": lambda i: _to_milliseconds(_col(i)),
}


def _presto_strrpos(s, sub) -> Column:
    s, sub = _col(s), _col(sub)
    pos_in_rev = F.instr(F.reverse(s), F.reverse(sub))
    return F.when(
        pos_in_rev == 0, F.lit(0)
    ).otherwise(F.length(s) - pos_in_rev - F.length(sub) + 2).cast("bigint")


def _presto_yow(ts) -> Column:
    d = _col(ts).cast("date")
    iso_dow = ((F.dayofweek(d) + F.lit(5)) % F.lit(7) + F.lit(1))
    return F.year(F.date_add(d, (F.lit(4) - iso_dow).cast("int"))).cast("bigint")


def _presto_cosine_similarity(a, b) -> Column:
    a, b = _col(a), _col(b)
    dot = F.aggregate(
        F.map_values(
            F.map_zip_with(
                a, b, lambda _k, x, y: F.coalesce(x, F.lit(0.0)) * F.coalesce(y, F.lit(0.0))
            )
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(m):
        return F.sqrt(
            F.aggregate(
                F.map_values(m), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )

    return dot / (norm(a) * norm(b))


def _presto_json_size(x, p) -> Column:
    j = F.to_json(
        F.variant_get(F.parse_json(_col(x).cast("string")), str(p), "variant")
    )
    return F.when(j.isNull(), F.lit(None).cast("bigint")).otherwise(
        F.when(j.startswith("{"), F.size(F.json_object_keys(j)).cast("bigint"))
        .when(j.startswith("["), F.json_array_length(j).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
    )


def _lit_or_col(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def _combinations(arr: Column, n: int) -> Column:
    """Presto combinations(arr, n): all n-element subsequences (order
    preserved). n is capped at 5 like Presto; built as nested index
    transforms — no UDF."""
    if not 1 <= n <= 5:
        raise ValueError("combinations: n must be between 1 and 5")
    size = F.size(arr)

    def build(depth: int, start, picked):
        # picked: list of index Columns chosen so far
        if depth == n:
            return F.array(*[F.element_at(arr, i) for i in picked])
        return F.flatten(
            F.transform(
                F.sequence(start, size - F.lit(n - 1 - depth)),
                lambda i: _wrap(depth + 1 == n)(
                    build(depth + 1, i + 1, picked + [i])
                ),
            )
        )

    def _wrap(is_leaf: bool):
        # leaves produce array<T> elements; inner levels produce
        # array<array<T>> that flatten unnests one level
        return (lambda c: F.array(c)) if is_leaf else (lambda c: c)

    out = build(0, F.lit(1), [])
    # short-input guard: Spark's sequence(1, 0) runs DESCENDING and would
    # index 0. CaseWhen evaluates only the taken branch, so gate `out`
    # behind size >= n and build a typed empty for the short case
    # (element_at(arr, 1) is a safe NULL on an empty array).
    proto = F.array(*[F.element_at(arr, F.lit(1))] * n)
    empty = F.slice(F.array(proto), 1, 0)
    return F.when(size >= F.lit(n), out).otherwise(empty)


def _array_duplicates(arr: Column) -> Column:
    """Values (incl. NULL) appearing more than once, in first-seen order."""
    return F.filter(
        F.array_distinct(arr),
        lambda v: F.size(F.filter(arr, lambda e: e.eqNullSafe(v))) > 1,
    )


def _array_least_frequent(a: Column, n) -> Column:
    """n least-frequent non-null elements: count each distinct element with
    a row-local filter scan (O(d*len) per row, no shuffle), sort by
    (count asc, element asc), project the elements."""
    nn = F.filter(a, lambda e: e.isNotNull())
    stats = F.transform(
        F.array_distinct(nn),
        lambda e: F.struct(
            F.size(F.filter(nn, lambda x: x == e)).alias("c"),
            e.alias("v"),
        ),
    )
    ordered = F.array_sort(
        stats,
        lambda p, q: F.when(p["c"] < q["c"], -1)
        .when(p["c"] > q["c"], 1)
        .when(p["v"] < q["v"], -1)
        .when(p["v"] > q["v"], 1)
        .otherwise(0),
    )
    cnt = _col(n).cast("int") if isinstance(n, Column) else F.lit(int(n))
    return F.transform(F.slice(ordered, 1, cnt), lambda s: s["v"])


def _map_entries_by_value_desc(m: Column) -> Column:
    return F.array_sort(
        F.map_entries(m),
        lambda a, b: F.when(a["value"] > b["value"], -1)
        .when(a["value"] < b["value"], 1)
        .when(a["key"] > b["key"], -1)
        .when(a["key"] < b["key"], 1)
        .otherwise(0),
    )


def _erf(z: Column) -> Column:
    """Abramowitz & Stegun 7.1.26 rational approximation, |err| < 1.5e-7."""
    sign = F.when(z < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    za = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * za)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * t * t
        + F.lit(1.421413741) * t * t * t
        - F.lit(1.453152027) * t * t * t * t
        + F.lit(1.061405429) * t * t * t * t * t
    )
    return sign * (F.lit(1.0) - poly * F.exp(-za * za))


def _normal_cdf(mean, sd, x) -> Column:
    z = (_col(x).cast("double") - _col(mean).cast("double")) / (
        _col(sd).cast("double") * F.lit(2.0 ** 0.5)
    )
    return F.lit(0.5) * (F.lit(1.0) + _erf(z))


def _inverse_normal_cdf(mean, sd, p) -> Column:
    """Φ⁻¹(p) scaled to (mean, sd) via Acklam's rational approximation
    (|rel err| < 1.15e-9 — published algorithm, pure Column arithmetic).
    Three regions: lower tail, central, upper tail."""
    pp = _col(p).cast("double")

    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]

    def poly(coefs, x):
        out = F.lit(coefs[0])
        for k in coefs[1:]:
            out = out * x + F.lit(k)
        return out

    p_low, p_high = 0.02425, 1 - 0.02425
    q_c = pp - F.lit(0.5)
    r_c = q_c * q_c
    central = (poly(a, r_c) * q_c) / (poly(b + [1.0], r_c))
    q_l = F.sqrt(F.lit(-2.0) * F.log(pp))
    lower = poly(c, q_l) / poly(d + [1.0], q_l)
    q_u = F.sqrt(F.lit(-2.0) * F.log(F.lit(1.0) - pp))
    upper = -poly(c, q_u) / poly(d + [1.0], q_u)
    z = (
        F.when(pp < F.lit(p_low), lower)
        .when(pp > F.lit(p_high), upper)
        .otherwise(central)
    )
    return _col(mean).cast("double") + _col(sd).cast("double") * z


def _laplace_cdf(mean, scale, x) -> Column:
    xd = _col(x).cast("double")
    md = _col(mean).cast("double")
    sd = _col(scale).cast("double")
    return F.when(
        xd < md, F.lit(0.5) * F.exp((xd - md) / sd)
    ).otherwise(F.lit(1.0) - F.lit(0.5) * F.exp(-(xd - md) / sd))


def _binomial_cdf(n, p, k) -> Column:
    """P(X <= k), X ~ Binomial(n, p): finite sum via the multiplicative
    term recurrence t_i = t_{i-1} * (n-i+1)/i * p/(1-p), folded with
    aggregate() over sequence(1, k) — pure Column arithmetic, no UDF."""
    nd = _col(n).cast("double")
    pd_ = _col(p).cast("double")
    kk = F.greatest(F.lit(0), F.least(_col(k).cast("int"), _col(n).cast("int")))
    t0 = F.pow(F.lit(1.0) - pd_, nd)
    folded = F.aggregate(
        F.sequence(F.lit(1), kk),
        F.struct(t0.alias("term"), t0.alias("acc")),
        lambda st, i: F.struct(
            (
                st["term"]
                * (nd - i.cast("double") + F.lit(1.0))
                / i.cast("double")
                * pd_
                / (F.lit(1.0) - pd_)
            ).alias("term"),
            (
                st["acc"]
                + st["term"]
                * (nd - i.cast("double") + F.lit(1.0))
                / i.cast("double")
                * pd_
                / (F.lit(1.0) - pd_)
            ).alias("acc"),
        ),
    )["acc"]
    # k < 1 means the fold ran over an empty/descending sequence: P = t0
    return F.when(kk < 1, t0).otherwise(F.least(folded, F.lit(1.0)))


def _poisson_cdf(lam, k) -> Column:
    """P(X <= k), X ~ Poisson(λ): e^-λ Σ λ^i / i! with the same
    term-recurrence fold as binomial_cdf."""
    ld = _col(lam).cast("double")
    kk = F.greatest(F.lit(0), _col(k).cast("int"))
    t0 = F.exp(-ld)
    folded = F.aggregate(
        F.sequence(F.lit(1), kk),
        F.struct(t0.alias("term"), t0.alias("acc")),
        lambda st, i: F.struct(
            (st["term"] * ld / i.cast("double")).alias("term"),
            (st["acc"] + st["term"] * ld / i.cast("double")).alias("acc"),
        ),
    )["acc"]
    return F.when(kk < 1, t0).otherwise(F.least(folded, F.lit(1.0)))


def _map_normalize(m: Column) -> Column:
    entries = F.map_entries(m)
    total = F.aggregate(
        entries, F.lit(0.0), lambda acc, e: acc + e["value"].cast("double")
    )
    return F.map_from_entries(
        F.transform(
            entries,
            lambda e: F.struct(
                e["key"].alias("key"),
                (e["value"].cast("double") / total).alias("value"),
            ),
        )
    )


# Presto parse_duration units → seconds
_DURATION_UNIT_SECONDS = {
    "ns": 1e-9, "us": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0,
    "h": 3600.0, "d": 86400.0,
}


def _parse_duration(s: Column) -> Column:
    """Presto parse_duration('2.5m') → day-time interval. The unit table
    is the engine's own (ns..d); invalid text yields NULL (TRY-compatible
    rather than an opaque JVM error)."""
    num = F.regexp_extract(s, r"^\s*([0-9]*\.?[0-9]+)\s*([a-z]+)\s*$", 1)
    unit = F.regexp_extract(s, r"^\s*([0-9]*\.?[0-9]+)\s*([a-z]+)\s*$", 2)
    mapping = F.create_map(
        *[x for u, k in _DURATION_UNIT_SECONDS.items() for x in (F.lit(u), F.lit(k))]
    )
    secs = F.when(
        (num != "") & F.element_at(mapping, unit).isNotNull(),
        num.cast("double") * F.element_at(mapping, unit),
    )
    return F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs)


def _to_milliseconds(i: Column) -> Column:
    """Presto to_milliseconds(interval day to second) → bigint ms. A
    bigint cast truncates to whole seconds, but the DECIMAL cast keeps
    the interval's microsecond precision as fractional seconds."""
    return F.round(i.cast("decimal(19,6)") * 1000).cast("bigint")


def _presto_entropy(c: Column) -> Column:
    c = c.cast("double")
    total = F.sum(c)
    plogp = F.sum(
        F.when(c > 0, c * F.log2(c)).otherwise(F.lit(0.0))
    )
    return F.when(total > 0, F.log2(total) - plogp / total).otherwise(F.lit(0.0))


def _presto_kurtosis(x) -> Column:
    """Presto ``kurtosis(x)``: the UNBIASED sample excess kurtosis

        n(n+1)/((n-1)(n-2)(n-3)) * M4/s^4  -  3(n-1)^2/((n-2)(n-3))

    (M4 = sum((x-mean)^4), s^2 = M2/(n-1)) — presto docs "unbiased
    estimator". Spark's builtin ``kurtosis`` is the POPULATION excess
    (M4*n/M2^2 - 3), so a same-name passthrough would be silently wrong;
    this adapter overrides it. Computed one-pass from raw power sums
    (binomial expansion of the central moments): every term is a native
    partial-aggregable SUM/COUNT/AVG, so the map-side combine and a single
    shuffle survive any scale. Raw-moment expansion loses precision when
    |mean| >> stddev — acceptable for the parity surface; center the
    column first if that matters. NULL when n < 4 or the variance is 0
    (matches DuckDB; Presto raises/NaNs on the degenerate cases).
    """
    x = _col(x).cast("double")
    n = F.count(x).cast("double")
    m = F.avg(x)
    s2 = F.sum(x * x)
    s3 = F.sum(x * x * x)
    s4 = F.sum(x * x * x * x)
    m2 = s2 - n * m * m
    m4 = (
        s4
        - F.lit(4.0) * m * s3
        + F.lit(6.0) * m * m * s2
        - F.lit(3.0) * n * m * m * m * m
    )
    return F.when(
        (n > F.lit(3.0)) & (m2 > F.lit(0.0)),
        n * (n + 1) * (n - 1) / ((n - 2) * (n - 3)) * m4 / (m2 * m2)
        - F.lit(3.0) * (n - 1) * (n - 1) / ((n - 2) * (n - 3)),
    )


def _split_to_multimap(s, entry_delim, kv_delim) -> Column:
    ed = regex_quote(str(entry_delim)) if not isinstance(entry_delim, Column) else None
    kd = regex_quote(str(kv_delim)) if not isinstance(kv_delim, Column) else None
    if ed is None or kd is None:
        raise ValueError("split_to_multimap: delimiters must be literals")
    ents = F.transform(
        F.split(_col(s), ed),
        lambda e: F.struct(
            F.split(e, kd, 2)[0].alias("key"),
            F.split(e, kd, 2)[1].alias("value"),
        ),
    )
    return _group_entries(ents)


def _human_readable_seconds(x: Column) -> Column:
    """Presto human_readable_seconds(double): '1 week, 2 days, ...' with
    singular/plural unit names, rounding to whole seconds."""
    total = F.round(x.cast("double"), 0).cast("long")
    parts = []
    remain = total
    for unit, secs in (
        ("week", 604800), ("day", 86400), ("hour", 3600),
        ("minute", 60), ("second", 1),
    ):
        v = (remain / F.lit(secs)).cast("long")
        remain = remain - v * secs
        parts.append(
            F.when(
                v > 0,
                F.concat(
                    v.cast("string"),
                    F.lit(f" {unit}"),
                    F.when(v > 1, F.lit("s")).otherwise(F.lit("")),
                ),
            )
        )
    joined = F.concat_ws(", ", *parts)  # concat_ws skips the NULL parts
    return F.when(joined == "", F.lit("0 seconds")).otherwise(joined)


def _n_by(x, y, n: int, *, asc: bool) -> Column:
    """n-ary min_by/max_by: x values for the n smallest/largest y (NULL
    keys excluded, Presto semantics)."""
    pairs = F.filter(
        F.collect_list(F.struct(_col(y).alias("k"), _col(x).alias("v"))),
        lambda e: e["k"].isNotNull(),
    )
    lt, gt = (-1, 1) if asc else (1, -1)
    ranked = F.array_sort(
        pairs,
        lambda a, b: F.when(a["k"] < b["k"], lt)
        .when(a["k"] > b["k"], gt)
        .otherwise(0),
    )
    return F.transform(F.slice(ranked, 1, n), lambda e: e["v"])


class _QuantileSketch:
    """Marker produced by qdigest_agg/tdigest_agg, consumed by
    value_at_quantile/values_at_quantiles (Presto sketch pipelines;
    ref FunctionRegistry.h — approx aggregates). Not a Column: using it
    outside its pipeline raises at the call site."""

    def __init__(self, col: Column):
        self.col = col


def _sketch_input(d, fn: str) -> Column:
    if not isinstance(d, _QuantileSketch):
        raise ValueError(
            f"{fn}: first argument must be qdigest_agg(x)/tdigest_agg(x) "
            "(Spark has no standalone quantile-sketch value; the pipeline "
            "is rewritten onto percentile_approx)"
        )
    return d.col


def _udf_call(name: str, *args) -> Column:
    """Dispatch to a Pandas-UDF-backed function (functions/udfs.py)."""
    from verax_spark.functions import udfs

    fn = getattr(udfs, name)
    return fn(*(_col(a) for a in args))


def _udf_normalize(s, form) -> Column:
    from verax_spark.functions import udfs

    return udfs.normalize(_col(s), form if not isinstance(form, Column) else "NFC")


def _udf_word_stem(s, lang) -> Column:
    if not isinstance(lang, Column) and str(lang).lower() not in ("en", "english"):
        raise NotImplementedError(
            "word_stem: only the English Porter stemmer is implemented"
        )
    return _udf_call("word_stem", s)


def _wilson(s, n, z, sign: int) -> Column:
    """Wilson score interval bound: (p̂ + z²/2n ± z·√(p̂(1-p̂)/n + z²/4n²))
    / (1 + z²/n)."""
    s, n, z = _col(s).cast("double"), _col(n).cast("double"), _col(z).cast("double")
    p = s / n
    z2n = z * z / n
    half = z * F.sqrt(p * (F.lit(1.0) - p) / n + z2n / (F.lit(4.0) * n))
    return (p + z2n / F.lit(2.0) + F.lit(float(sign)) * half) / (F.lit(1.0) + z2n)


def _tz_offset_part(ts, part: str) -> Column:
    """Offset of the session zone at instant ts, split Presto-style
    (both components carry the offset's sign)."""
    t = _col(ts).cast("timestamp")
    off_min = (
        (
            F.unix_timestamp(t)
            - F.unix_timestamp(F.to_utc_timestamp(t, F.current_timezone()))
        )
        / F.lit(60)
    ).cast("int")
    hour = (off_min / F.lit(60)).cast("int")
    if part == "hour":
        return hour.cast("bigint")
    return (off_min - hour * F.lit(60)).cast("bigint")


_JODA_TO_JAVA = [
    # Joda zone tokens that Java-time (Spark) spells differently or
    # rejects; common field tokens (y M d H m s S E) are identical.
    ("ZZ", "XXX"),
    ("Z", "xx"),
]


def _joda_pattern(fmt) -> str:
    """Translate a Joda-Time pattern to Spark's Java-time dialect.

    Quote-aware (ADVICE r04): replacements must not rewrite Y/Z characters
    inside ``'...'`` literal sections, and Joda ``Y`` is WEEKYEAR — mapping
    it to calendar year silently misparsed ISO-week-boundary dates, so it
    raises instead (Spark's parser has no week-based date fields)."""
    if isinstance(fmt, Column):
        raise ValueError("parse_datetime: pattern must be a literal string")
    src = str(fmt)
    out = []
    i = 0
    while i < len(src):
        ch = src[i]
        if ch == "'":
            # copy the quoted literal verbatim (including '' escapes)
            j = i + 1
            while j < len(src):
                if src[j] == "'":
                    if j + 1 < len(src) and src[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(src[i : j + 1])
            i = j + 1
            continue
        if ch == "Y":
            raise NotImplementedError(
                "parse_datetime: Joda 'Y' is weekyear, which Spark's "
                "java.time formatter cannot express; use 'y' (calendar "
                "year) or 'x' (ISO weekyear via a custom pipeline)"
            )
        for joda, java in _JODA_TO_JAVA:
            if src.startswith(joda, i):
                out.append(java)
                i += len(joda)
                break
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _presto_json_array_contains(x, v) -> Column:
    arr = F.try_parse_json(_col(x).cast("string")).try_cast("array<variant>")
    # serialize the probe value through to_json(array(v)) and strip the
    # brackets so string values compare quoted, numbers unquoted — the same
    # canonical form to_json gives the elements
    wrapped = F.to_json(F.array(_col(v)))
    rhs = wrapped.substr(F.lit(2), F.length(wrapped) - 2)
    return F.when(arr.isNull(), F.lit(None).cast("boolean")).otherwise(
        F.exists(arr, lambda e: F.to_json(e) == rhs)
    )


def _presto_is_json_scalar(x) -> Column:
    v = F.try_parse_json(_col(x).cast("string"))
    sch = F.schema_of_variant(v)
    return F.when(v.isNull(), F.lit(None).cast("boolean")).otherwise(
        ~(sch.startswith("OBJECT") | sch.startswith("ARRAY") | sch.startswith("STRUCT"))
    )


def _entries_to_map(ents: Column) -> Column:
    """array<struct<key,value>> (possibly duplicate keys) → map keeping the
    first value per key."""
    keys = F.array_distinct(F.transform(ents, lambda e: e["key"]))
    return F.map_from_arrays(
        keys,
        F.transform(
            keys, lambda k: F.filter(ents, lambda e: e["key"] == k)[0]["value"]
        ),
    )


def _group_entries(ents: Column) -> Column:
    """array<struct<key,value>> → map key -> array of every value."""
    keys = F.array_distinct(F.transform(ents, lambda e: e["key"]))
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.transform(
                F.filter(ents, lambda e: e["key"] == k), lambda e: e["value"]
            ),
        ),
    )


def _presto_histogram(vals: Column) -> Column:
    keys = F.array_distinct(vals)
    return F.map_from_arrays(
        keys,
        F.transform(
            keys, lambda k: F.size(F.filter(vals, lambda e: e == k)).cast("long")
        ),
    )


def _top_k_by_count(vals: Column, k: int) -> Column:
    keys = F.array_distinct(vals)
    counted = F.transform(
        keys,
        lambda key: F.struct(
            key.alias("key"),
            F.size(F.filter(vals, lambda e: e == key)).cast("long").alias("value"),
        ),
    )
    ranked = F.array_sort(
        counted,
        lambda a, b: F.when(a["value"] > b["value"], -1)
        .when(a["value"] < b["value"], 1)
        .when(a["key"] < b["key"], -1)
        .when(a["key"] > b["key"], 1)
        .otherwise(0),
    )
    return F.map_from_entries(F.slice(ranked, 1, k))


def _numeric_histogram(vals: Column, buckets: int) -> Column:
    mn, mx = F.array_min(vals), F.array_max(vals)
    width = F.nullif((mx - mn) / F.lit(float(buckets)), F.lit(0.0))
    idxs = F.sequence(F.lit(0), F.lit(buckets - 1))

    def in_bucket(i):
        # [mn + i*w, mn + (i+1)*w), last bucket closed; degenerate
        # (all-equal) input collapses into bucket 0
        lo = mn + i.cast("double") * width
        hi = mn + (i.cast("double") + F.lit(1.0)) * width
        return F.when(
            width.isNull(), F.when(i == 0, vals).otherwise(F.array())
        ).otherwise(
            F.filter(
                vals,
                lambda v: (v >= lo)
                & (F.when(i == F.lit(buckets - 1), v <= hi).otherwise(v < hi)),
            )
        )

    entries = F.filter(
        F.transform(
            idxs,
            lambda i: F.struct(
                F.aggregate(
                    in_bucket(i), F.lit(0.0), lambda acc, v: acc + v
                ).alias("s"),
                F.size(in_bucket(i)).cast("long").alias("value"),
            ),
        ),
        lambda e: e["value"] > 0,
    )
    return F.map_from_entries(
        F.transform(
            entries,
            lambda e: F.struct(
                (e["s"] / e["value"].cast("double")).alias("key"),
                e["value"].alias("value"),
            ),
        )
    )


def _ip_to_int(ip) -> Column:
    """Dotted-quad IPv4 → bigint; NULL for anything else (IPv6 unsupported,
    documented)."""
    s = _col(ip)
    # shape AND per-octet range (ADVICE r04: '999.0.0.1' must be NULL, not
    # a garbage integer); 25[0-5]|2[0-4]\d|1?\d?\d covers 0-255 exactly
    octet = r"(25[0-5]|2[0-4]\d|1?\d?\d)"
    valid = s.rlike(rf"^{octet}\.{octet}\.{octet}\.{octet}$")
    parts = F.split(s, r"\.")
    val = (
        parts[0].cast("bigint") * F.lit(16777216)
        + parts[1].cast("bigint") * F.lit(65536)
        + parts[2].cast("bigint") * F.lit(256)
        + parts[3].cast("bigint")
    )
    return F.when(valid, val)


def _int_to_ip(v: Column) -> Column:
    # concat_ws skips NULL args, so guard explicitly (IPv6 input → NULL int)
    return F.when(
        v.isNotNull(),
        F.concat_ws(
            ".",
            (v / F.lit(16777216)).cast("bigint") % 256,
            (v / F.lit(65536)).cast("bigint") % 256,
            (v / F.lit(256)).cast("bigint") % 256,
            v % 256,
        ),
    )


def _prefix_parts(p) -> tuple[Column, Column]:
    s = _col(p)
    return F.split(s, "/")[0], F.split(s, "/")[1].cast("int")


def _pow2(e: Column) -> Column:
    # 2^e as bigint (exact for e <= 32; shiftleft needs a literal shift)
    return F.pow(F.lit(2.0), e.cast("double")).cast("bigint")


def _subnet_bounds(p) -> tuple[Column, Column]:
    ip_s, bits = _prefix_parts(p)
    base = _ip_to_int(ip_s)
    block = _pow2(F.lit(32) - bits)
    # mask off host bits (works for any in-subnet address given as base)
    lo = base - (base % block)
    return lo, lo + block - F.lit(1)


def _ip_prefix(ip, bits) -> Column:
    b = _col(bits).cast("int") if isinstance(bits, Column) else F.lit(int(bits))
    base = _ip_to_int(ip)
    lo = base - (base % _pow2(F.lit(32) - b))
    return F.concat(_int_to_ip(lo), F.lit("/"), b.cast("string"))


def _is_subnet_of(p, x) -> Column:
    lo, hi = _subnet_bounds(p)
    x_s = _col(x)
    # second arg may be an address or a prefix
    is_prefix = x_s.contains("/")
    xlo = F.when(is_prefix, _subnet_bounds(x_s)[0]).otherwise(_ip_to_int(x_s))
    xhi = F.when(is_prefix, _subnet_bounds(x_s)[1]).otherwise(_ip_to_int(x_s))
    return (xlo >= lo) & (xhi <= hi)


# ---------------------------------------------------------------------------
# IPv6 fallback (closes the r04 "IPv6 documented as NULL" gap): the pure
# Column expressions above handle IPv4 at codegen speed; for inputs
# containing ':' the functions fall back to an Arrow-batched pandas UDF on
# Python's stdlib ``ipaddress`` (128-bit arithmetic has no Column-expression
# spelling). The v4 hot path stays JVM-side — the UDF output is only
# selected where the v4 result is NULL and the input looks like IPv6.
def _ipaddress_udf(fn_name: str):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _kernel(a, b=None):
        import ipaddress

        def one(x, y=None):
            try:
                if fn_name == "prefix":
                    net = ipaddress.ip_network(f"{x}/{int(y)}", strict=False)
                    return str(net.network_address) + f"/{int(y)}"
                if fn_name == "subnet_min":
                    return str(ipaddress.ip_network(x, strict=False).network_address)
                if fn_name == "subnet_max":
                    return str(
                        ipaddress.ip_network(x, strict=False).broadcast_address
                    )
                if fn_name == "is_subnet_of":
                    outer = ipaddress.ip_network(x, strict=False)
                    if "/" in str(y):
                        return ipaddress.ip_network(
                            y, strict=False
                        ).subnet_of(outer)
                    return ipaddress.ip_address(y) in outer
            except (ValueError, TypeError):
                return None
            return None

        if b is None:
            vals = [None if x is None else one(x) for x in a]
        else:
            vals = [
                None if (x is None or y is None) else one(x, y)
                for x, y in zip(a, b)
            ]
        rt = "boolean" if fn_name == "is_subnet_of" else "object"
        return pd.Series(vals, dtype=rt if rt == "boolean" else None)

    rtype = "boolean" if fn_name == "is_subnet_of" else "string"
    if fn_name in ("prefix", "is_subnet_of"):
        def _two(a, b):
            return _kernel(a, b)

        _two.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
        return pandas_udf(_two, rtype)
    def _one_arg(a):
        return _kernel(a)

    _one_arg.__annotations__ = {"a": pd.Series, "return": pd.Series}
    return pandas_udf(_one_arg, rtype)


_ANSI_NAMED = {
    "black": 0x000000, "red": 0xFF0000, "green": 0x00FF00,
    "yellow": 0xFFFF00, "blue": 0x0000FF, "magenta": 0xFF00FF,
    "cyan": 0x00FFFF, "white": 0xFFFFFF,
}


def _presto_color(v) -> Column:
    """Presto color('#rgb'|'#rrggbb'|name) → RGB int; invalid → NULL
    (Presto raises; NULL is this engine's documented error-shape for
    scalar helpers)."""
    c = _col(v)
    full = F.when(
        c.rlike("^#[0-9a-fA-F]{6}$"), F.conv(c.substr(2, 6), 16, 10).cast("bigint")
    )
    short = F.when(
        c.rlike("^#[0-9a-fA-F]{3}$"),
        F.conv(
            F.concat(
                c.substr(2, 1), c.substr(2, 1),
                c.substr(3, 1), c.substr(3, 1),
                c.substr(4, 1), c.substr(4, 1),
            ),
            16,
            10,
        ).cast("bigint"),
    )
    named = F.lit(None).cast("bigint")
    for name, val in _ANSI_NAMED.items():
        named = F.when(F.lower(c) == name, F.lit(val)).otherwise(named)
    return F.coalesce(full, short, named)


def _ansi_fg(rgb: Column) -> Column:
    r = (rgb / 65536).cast("bigint") % 256
    g = (rgb / 256).cast("bigint") % 256
    b = rgb % 256
    return F.concat(
        F.lit("\u001b[38;2;"),
        r.cast("string"), F.lit(";"),
        g.cast("string"), F.lit(";"),
        b.cast("string"), F.lit("m"),
    )


def _presto_render(x, c) -> Column:
    v = _col(x)
    if c is None:
        # render(boolean): Presto's ✓ green / ✗ red
        return F.when(
            v.cast("boolean"),
            F.concat(_ansi_fg(F.lit(0x00FF00)), F.lit("\u2713\u001b[0m")),
        ).otherwise(
            F.concat(_ansi_fg(F.lit(0xFF0000)), F.lit("\u2717\u001b[0m"))
        )
    return F.concat(_ansi_fg(_col(c)), v.cast("string"), F.lit("\u001b[0m"))


def _presto_bar(x, w, lo, hi) -> Column:
    """bar(fraction, width[, low_color, high_color]): width-char bar,
    round(x*width) colored full blocks interpolated low→high (Presto
    defaults red→green), space-padded."""
    frac = F.greatest(F.least(_col(x).cast("double"), F.lit(1.0)), F.lit(0.0))
    width = _col(w).cast("int") if isinstance(w, Column) else F.lit(int(w))
    lo_c = _col(lo) if lo is not None else F.lit(0xFF0000)
    hi_c = _col(hi) if hi is not None else F.lit(0x00FF00)
    n = F.round(frac * width).cast("int")

    def chan(c, shift):
        return (c / F.lit(shift)).cast("bigint") % 256

    def interp(i):
        t = (i.cast("double") - 1) / F.greatest(width - 1, F.lit(1))
        mix = lambda a, b: F.round(a + (b - a) * t).cast("bigint")  # noqa: E731
        return (
            mix(chan(lo_c, 65536), chan(hi_c, 65536)) * 65536
            + mix(chan(lo_c, 256), chan(hi_c, 256)) * 256
            + mix(lo_c % 256, hi_c % 256)
        )

    blocks = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(_ansi_fg(interp(i)), F.lit("\u2588")),
        ),
        "",
    )
    pad = F.repeat(F.lit(" "), F.greatest(width - n, F.lit(0)))
    return F.when(n == 0, pad).otherwise(
        F.concat(blocks, F.lit("\u001b[0m"), pad)
    )


def _looks_v6(c: Column) -> Column:
    return c.cast("string").contains(":")


def _ip_prefix_any(ip, bits) -> Column:
    b = _col(bits).cast("int") if isinstance(bits, Column) else F.lit(int(bits))
    v4 = _ip_prefix(ip, bits)
    return F.when(
        _looks_v6(_col(ip)),
        _ipaddress_udf("prefix")(_col(ip).cast("string"), b),
    ).otherwise(v4)


def _ip_subnet_bound_any(p, which: str) -> Column:
    v4 = _int_to_ip(_subnet_bounds(p)[0 if which == "subnet_min" else 1])
    return F.when(
        _looks_v6(_col(p)), _ipaddress_udf(which)(_col(p).cast("string"))
    ).otherwise(v4)


def _is_subnet_of_any(p, x) -> Column:
    v4 = _is_subnet_of(p, x)
    return F.when(
        _looks_v6(_col(p)) | _looks_v6(_col(x)),
        _ipaddress_udf("is_subnet_of")(
            _col(p).cast("string"), _col(x).cast("string")
        ),
    ).otherwise(v4)


def _presto_json_array_get(x, i) -> Column:
    if int(i) < 0:
        raise ValueError("json_array_get: negative indexes are unsupported")
    return F.to_json(
        F.variant_get(
            F.parse_json(_col(x).cast("string")), f"$[{int(i)}]", "variant"
        )
    )


def _presto_bit_count(x, bits) -> Column:
    """Presto bit_count(x, bits): popcount of the `bits`-wide two's
    complement window. Spark's bit_count is 64-bit only; for negative x the
    64-bit form counts the (64 - bits) sign-extension ones above the window,
    so subtract them."""
    c = _col(x)
    b = bits if isinstance(bits, Column) else F.lit(int(bits))
    return F.when(
        c < 0, F.bit_count(c) - (F.lit(64) - b.cast("int"))
    ).otherwise(F.bit_count(c))


def _unit(u) -> str:
    if isinstance(u, Column):
        raise ValueError("date unit must be a literal string")
    return str(u).strip("'\"").lower()


# --------------------------------------------------------------------------
# Batch 10: Presto binary functions (big-endian/IEEE-754 bit views, base32,
# standard-algorithm hashes), the incomplete-gamma/beta CDF completion
# (beta/gamma/chi_squared/f/inverse_beta — closing the gap documented at the
# batch-9 note above), map_union_sum, from_unixtime_nanos, is_private.
# Column expressions where the semantics allow; Arrow-batched UDFs
# (functions/udfs.py) for the bit-view/hash/special-function tail.
# --------------------------------------------------------------------------

_U63 = "9223372036854775808"  # 2^63
_U64 = "18446744073709551616"  # 2^64


def _from_big_endian_64(b) -> Column:
    """Two's-complement bigint from an 8-byte big-endian buffer."""
    u = F.conv(F.hex(_col(b)), 16, 10).cast("decimal(21,0)")
    signed = F.when(
        u >= F.expr(f"cast('{_U63}' as decimal(21,0))"),
        u - F.expr(f"cast('{_U64}' as decimal(21,0))"),
    ).otherwise(u)
    return signed.cast("bigint")


def _from_big_endian_32(b) -> Column:
    u = F.conv(F.hex(_col(b)), 16, 10).cast("bigint")
    return (
        F.when(u >= F.lit(2147483648), u - F.lit(4294967296)).otherwise(u)
    ).cast("int")


def _to_big_endian_64(x) -> Column:
    # hex() of a bigint is already the two's-complement digits
    return F.unhex(F.lpad(F.hex(_col(x).cast("bigint")), 16, "0"))


def _to_big_endian_32(x) -> Column:
    masked = _col(x).cast("bigint").bitwiseAND(F.lit(4294967295))
    return F.unhex(F.lpad(F.hex(masked), 8, "0"))


def _from_unixtime_nanos(n) -> Column:
    # floor-division (not truncation) so pre-epoch nanos round toward
    # negative infinity, matching Presto; decimal keeps the full 64 bits
    micros = F.floor(_col(n).cast("decimal(25,3)") / F.lit(1000)).cast("bigint")
    return F.timestamp_micros(micros)


# IANA special-purpose IPv4 registries (RFC 6890 et al.) — the set Presto's
# is_private checks: private-use, loopback, link-local, CGN, documentation,
# benchmarking, reserved.
_PRIVATE_RANGES = [
    ("0.0.0.0", 8),
    ("10.0.0.0", 8),
    ("100.64.0.0", 10),
    ("127.0.0.0", 8),
    ("169.254.0.0", 16),
    ("172.16.0.0", 12),
    ("192.0.0.0", 24),
    ("192.0.2.0", 24),
    ("192.168.0.0", 16),
    ("198.18.0.0", 15),
    ("198.51.100.0", 24),
    ("203.0.113.0", 24),
    ("240.0.0.0", 4),
]


def _ipv4_lit(ip: str) -> int:
    a, b, c, d = (int(p) for p in ip.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


def _is_private_body(v: Column) -> Column:
    cond = F.lit(False)
    for start, bits in _PRIVATE_RANGES:
        lo = _ipv4_lit(start)
        hi = lo + (1 << (32 - bits)) - 1
        cond = cond | v.between(F.lit(lo), F.lit(hi))
    return F.when(v.isNull(), F.lit(None).cast("boolean")).otherwise(cond)


def _is_private(ip) -> Column:
    # let-bind the parsed int ONCE (geo.py _let): the 13 range checks
    # reference it 27x and _ip_to_int embeds its input ~6x, so inlining
    # multiplied a composite ip expression ~160x — 1.86 MB of generated
    # code for op_fn_batch12's CASE-built ip, blowing janino's 64 KB
    # method limit and paying a failed whole-stage compile on every run
    # (guide §7.2 duplicated-subtree smell; measured r10)
    from verax_spark.functions.geo import _let

    return _let(_ip_to_int(ip), _is_private_body)


def _map_union_sum(m) -> Column:
    """Aggregate: union of all maps in the group, summing values per key.

    Spark has no user-lambda UDAF; the fold is collect_list + aggregate
    with a map_zip_with merge (missing keys contribute nothing). Group
    cardinality bounds memory — same documented bound as reduce_agg above.
    """
    lst = F.collect_list(_col(m))

    def _merge(acc: Column, x: Column) -> Column:
        return F.map_zip_with(
            acc,
            x,
            lambda k, a, b: F.when(a.isNull(), b)
            .when(b.isNull(), a)
            .otherwise(a + b),
        )

    rest = F.slice(lst, F.lit(2), F.greatest(F.size(lst) - 1, F.lit(0)))
    return F.aggregate(rest, F.element_at(lst, F.lit(1)), _merge)


# Presto classification aggregates (batch 11): binary-classifier quality
# curves over (outcome boolean, prediction in [0,1], optional weight).
# For each threshold t_i = i / buckets (i in [0, buckets)): a row is
# predicted positive iff x >= t_i. Each curve point is a ratio of
# weighted conditional sums — pure Column aggregate expressions (an
# array of `buckets` sum-ratios, JVM-side, exact), so they nest inside
# any groupBy like the reference's Presto library versions. buckets must
# be a literal (it shapes the expression, as in Presto where it must be
# constant).


def _classification_curve(buckets, y, x, w, kind: str) -> Column:
    b = int(buckets)
    if b < 2:
        raise ValueError("classification_*: buckets must be >= 2")
    yc = _col(y)
    xc = _col(x).cast("double")
    wc = _col(w).cast("double") if w is not None else F.lit(1.0)
    # rows with predictions outside [0,1] are rejected by Presto; mirror
    # by excluding them from every sum
    valid = xc.isNotNull() & (xc >= 0.0) & (xc <= 1.0)
    wv = F.when(valid, wc).otherwise(F.lit(0.0))
    pos = F.sum(F.when(yc, wv).otherwise(F.lit(0.0)))
    neg = F.sum(F.when(~yc, wv).otherwise(F.lit(0.0)))
    out = []
    for i in range(b):
        t = i / b
        pred_pos = valid & (xc >= F.lit(t))
        tp = F.sum(F.when(yc & pred_pos, wv).otherwise(F.lit(0.0)))
        fp = F.sum(F.when(~yc & pred_pos, wv).otherwise(F.lit(0.0)))
        if kind == "thresholds":
            out.append(F.lit(float(t)))
        elif kind == "miss_rate":  # FN / P
            out.append((pos - tp) / pos)
        elif kind == "fall_out":  # FP / N
            out.append(fp / neg)
        elif kind == "recall":  # TP / P
            out.append(tp / pos)
        else:  # precision: TP / predicted-positive
            out.append(tp / (tp + fp))
    return F.array(*out)


_ADAPTERS.update(
    {
        "classification_miss_rate": lambda b, y, x, w=None: (
            _classification_curve(b, y, x, w, "miss_rate")
        ),
        "classification_fall_out": lambda b, y, x, w=None: (
            _classification_curve(b, y, x, w, "fall_out")
        ),
        "classification_precision": lambda b, y, x, w=None: (
            _classification_curve(b, y, x, w, "precision")
        ),
        "classification_recall": lambda b, y, x, w=None: (
            _classification_curve(b, y, x, w, "recall")
        ),
        "classification_thresholds": lambda b, y, x, w=None: (
            _classification_curve(b, y, x, w, "thresholds")
        ),
    }
)


_ADAPTERS.update(
    {
        "to_big_endian_64": _to_big_endian_64,
        "from_big_endian_64": _from_big_endian_64,
        "to_big_endian_32": _to_big_endian_32,
        "from_big_endian_32": _from_big_endian_32,
        "to_ieee754_64": lambda x: _udf_call("to_ieee754_64", x),
        "from_ieee754_64": lambda b: _udf_call("from_ieee754_64", b),
        "to_ieee754_32": lambda x: _udf_call("to_ieee754_32", x),
        "from_ieee754_32": lambda b: _udf_call("from_ieee754_32", b),
        "to_base32": lambda b: _udf_call("to_base32", b),
        "from_base32": lambda s: _udf_call("from_base32", s),
        # Presto xxhash64(varbinary) -> varbinary(8) is the STANDARD XXH64
        # of the bytes; Spark's builtin xxhash64 hashes the internal row
        # encoding with seed 42, so parity needs the real algorithm
        "xxhash64": lambda b: _udf_call("xxhash64_bytes", b),
        "murmur3_x64_128": lambda b: _udf_call("murmur3_udf", b),
        "key_sampling_percent": lambda s: _udf_call("key_sampling_percent", s),
        "gamma_cdf": lambda a, b, x: _udf_call("gamma_cdf", a, b, x),
        "beta_cdf": lambda a, b, x: _udf_call("beta_cdf", a, b, x),
        "f_cdf": lambda a, b, x: _udf_call("f_cdf", a, b, x),
        "chi_squared_cdf": lambda d, x: _udf_call("chi_squared_cdf", d, x),
        "inverse_beta_cdf": lambda a, b, p: _udf_call(
            "inverse_beta_cdf", a, b, p
        ),
        "from_unixtime_nanos": _from_unixtime_nanos,
        "is_private": _is_private,
        "map_union_sum": _map_union_sum,
    }
)


# --------------------------------------------------------------------------
# Batch 12: the audited Velox-prestosql tail — inverse CDFs for every
# forward CDF (closed forms as Column arithmetic; the incomplete-
# gamma/beta inverses ride the documented UDF slow path in
# functions/udfs.py), the Bing tile family (Microsoft's published Web
# Mercator tile system — pure Column arithmetic), and collection/string
# helpers (array_normalize, find_first, find_first_index, trail).
# Tiles are struct<x int, y int, zoom int> (the BingTile type analog);
# bing_tile_polygon returns the geo-module geometry struct so ST_*
# functions compose. Ref: the reference registers the full Velox scalar
# library (axiom/optimizer/tests/AxiomSql.cpp:149).
# --------------------------------------------------------------------------

_MAX_BING_LAT = 85.05112878
_MAX_BING_ZOOM = 23


def _bing_struct(x: Column, y: Column, zoom: Column) -> Column:
    return F.struct(
        x.cast("int").alias("x"),
        y.cast("int").alias("y"),
        zoom.cast("int").alias("zoom"),
    )


def _pow2d(e: Column) -> Column:
    """2^e as double (zoom <= 23, exact in a double)."""
    return F.pow(F.lit(2.0), e.cast("double"))


def _bing_tile(*args) -> Column:
    """bing_tile(x, y, zoom) | bing_tile(quadkey). Out-of-range inputs
    yield NULL (this engine's dirty-input posture; Presto raises)."""
    if len(args) == 3:
        x, y, z = (_col(a) for a in args)
        n = _pow2d(z)
        valid = (
            z.between(0, _MAX_BING_ZOOM)
            & (x.cast("double") >= 0)
            & (x.cast("double") < n)
            & (y.cast("double") >= 0)
            & (y.cast("double") < n)
        )
        return F.when(valid, _bing_struct(x, y, z))
    # let-bind the quadkey (geo.py _let): the body references qk ~10x
    # (length-derived zoom, digit check, the per-digit fold), and when qk
    # is itself a composed expression (bing_tile(bing_tile_quadkey(t)))
    # re-embedding its tree per reference made ANALYSIS the bottleneck
    # (r10 profile: 3.3s for one round-trip column)
    from verax_spark.functions.geo import _let

    return _let(_col(args[0]), _bing_tile_from_quadkey_body)


def _bing_tile_from_quadkey_body(qk: Column) -> Column:
    z = F.length(qk).cast("int")
    digits_ok = qk.rlike("^[0-3]*$")
    folded = F.aggregate(
        F.sequence(F.lit(1), F.greatest(z, F.lit(1))),
        F.struct(
            F.lit(0).cast("long").alias("x"), F.lit(0).cast("long").alias("y")
        ),
        lambda st, i: F.struct(
            (
                st["x"]
                + (F.substring(qk, i, F.lit(1)).cast("int") % 2).cast("long")
                * _pow2d(z - i).cast("long")
            ).alias("x"),
            (
                st["y"]
                + (F.substring(qk, i, F.lit(1)).cast("int") / 2).cast("long")
                * _pow2d(z - i).cast("long")
            ).alias("y"),
        ),
    )
    return F.when(
        digits_ok & (z == 0),
        _bing_struct(F.lit(0), F.lit(0), F.lit(0)),
    ).when(
        digits_ok & z.between(1, _MAX_BING_ZOOM),
        _bing_struct(folded["x"], folded["y"], z),
    )


def _bing_tile_parent(t, newzoom=None) -> Column:
    """bing_tile_parent(tile[, newzoom]): the ancestor tile at newzoom
    (default zoom-1) — coordinate right-shift by the zoom delta. newzoom
    outside [0, zoom] → NULL (dirty-input posture)."""
    t = _col(t)
    z = t["zoom"]
    nz = (z - 1) if newzoom is None else _col(newzoom).cast("int")
    d = (z - nz).cast("double")
    # x >> (z-nz) without shiftright (whose bit count must be a literal):
    # doubles are exact here (x < 2^23)
    shift = F.pow(F.lit(2.0), d)
    return F.when(
        t["x"].isNotNull() & t["zoom"].isNotNull() & nz.between(0, z),
        _bing_struct(
            F.floor(t["x"].cast("double") / shift),
            F.floor(t["y"].cast("double") / shift),
            nz,
        ),
    )


def _bing_tile_children(t, newzoom=None) -> Column:
    """bing_tile_children(tile[, newzoom]): the 4^(newzoom-zoom) descendant
    tiles at newzoom (default zoom+1), row-major (y-major, then x).
    newzoom below zoom or above the max zoom → NULL."""
    t = _col(t)
    z = t["zoom"]
    nz = (z + 1) if newzoom is None else _col(newzoom).cast("int")
    m = F.pow(F.lit(2.0), (nz - z).cast("double")).cast("int")
    x0 = t["x"] * m
    y0 = t["y"] * m
    return F.when(
        t["x"].isNotNull() & t["zoom"].isNotNull()
        & (nz >= z) & (nz <= _MAX_BING_ZOOM),
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), m - 1),
                lambda dy: F.transform(
                    F.sequence(F.lit(0), m - 1),
                    lambda dx: _bing_struct(x0 + dx, y0 + dy, nz),
                ),
            )
        ),
    )


def _bing_tile_at(lat, lng, zoom) -> Column:
    """Tile containing (lat, lng): Microsoft's published pixel mapping,
    latitude clamped to the Web Mercator domain the way Presto clamps."""
    latc = F.least(
        F.greatest(_col(lat).cast("double"), F.lit(-_MAX_BING_LAT)),
        F.lit(_MAX_BING_LAT),
    )
    lngc = F.least(
        F.greatest(_col(lng).cast("double"), F.lit(-180.0)), F.lit(180.0)
    )
    z = _col(zoom).cast("int")
    n = _pow2d(z)
    xf = (lngc + F.lit(180.0)) / F.lit(360.0) * n
    sin_lat = F.sin(F.radians(latc))
    yf = (
        F.lit(0.5)
        - F.log((F.lit(1.0) + sin_lat) / (F.lit(1.0) - sin_lat))
        / F.lit(4.0 * math.pi)
    ) * n
    clamp = lambda v: F.least(  # noqa: E731
        F.greatest(F.floor(v), F.lit(0).cast("long")),
        (n - 1).cast("long"),
    )
    # Spark's greatest/least SKIP nulls, so a NULL lat/lng would otherwise
    # silently clamp to the domain edge instead of propagating NULL the
    # way Presto does (ADVICE r09) — guard on the raw inputs.
    return F.when(
        z.between(0, _MAX_BING_ZOOM)
        & _col(lat).isNotNull()
        & _col(lng).isNotNull(),
        _bing_struct(clamp(xf), clamp(yf), z),
    )


def _bing_tile_quadkey(t) -> Column:
    # let-bind the tile: the body embeds t in every per-digit lambda term
    from verax_spark.functions.geo import _let

    return _let(_col(t), _bing_tile_quadkey_body)


def _bing_tile_quadkey_body(t: Column) -> Column:
    z = t["zoom"]
    digits = F.transform(
        F.sequence(F.lit(1), F.greatest(z, F.lit(1))),
        lambda i: (
            F.floor(t["x"].cast("double") / _pow2d(z - i)).cast("long") % 2
            + (F.floor(t["y"].cast("double") / _pow2d(z - i)).cast("long") % 2)
            * 2
        ).cast("string"),
    )
    return F.when(z == 0, F.lit("")).otherwise(F.array_join(digits, ""))


def _tile_lng(x: Column, n: Column) -> Column:
    return x.cast("double") / n * F.lit(360.0) - F.lit(180.0)


def _tile_lat(y: Column, n: Column) -> Column:
    # inverse Web Mercator: lat = atan(sinh(pi * (1 - 2 y / n))) in degrees
    arg = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * y.cast("double") / n)
    return F.degrees(F.atan((F.exp(arg) - F.exp(-arg)) / F.lit(2.0)))


def _bing_tile_polygon(t) -> Column:
    t = _col(t)
    n = _pow2d(t["zoom"])
    w, e = _tile_lng(t["x"], n), _tile_lng(t["x"] + 1, n)
    north, south = _tile_lat(t["y"], n), _tile_lat(t["y"] + 1, n)
    # closed ring, counter-clockwise from the south-west corner
    return F.struct(
        F.lit("POLYGON").alias("kind"),
        F.array(w, e, e, w, w).alias("xs"),
        F.array(south, south, north, north, south).alias("ys"),
    )


def _bing_tiles_around(lat, lng, zoom) -> Column:
    # let-bind (center, zoom): the body references the center tile — a
    # whole _bing_tile_at tree — seven times (range filter, transform,
    # NULL guard); binding caps the tree at |center| + |body|
    from verax_spark.functions.geo import _let2

    return _let2(
        _bing_tile_at(lat, lng, zoom),
        _col(zoom).cast("int"),
        _bing_tiles_around_body,
    )


def _bing_tiles_around_body(center: Column, z: Column) -> Column:
    n = _pow2d(z).cast("long")
    deltas = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    in_range = F.filter(
        deltas,
        lambda d: (center["x"] + d["dx"]).between(0, n - 1)
        & (center["y"] + d["dy"]).between(0, n - 1),
    )
    tiles = F.transform(
        in_range,
        lambda d: _bing_struct(
            center["x"] + d["dx"], center["y"] + d["dy"], center["zoom"]
        ),
    )
    # dirty input (NULL args / zoom out of range) must yield NULL like
    # bing_tile/bing_tile_at, not an empty array from NULL-filtered deltas.
    # _bing_tile_at nulls the whole struct on NULL lat/lng (ADVICE r09),
    # so the field guard covers both bad-zoom and NULL-coordinate input.
    return F.when(
        z.between(0, _MAX_BING_ZOOM)
        & center["x"].isNotNull()
        & center["y"].isNotNull(),
        tiles,
    )


def _inverse_laplace_cdf(mean, scale, p) -> Column:
    m = _col(mean).cast("double")
    s = _col(scale).cast("double")
    pp = _col(p).cast("double")
    return F.when(pp < 0.5, m + s * F.log(F.lit(2.0) * pp)).otherwise(
        m - s * F.log(F.lit(2.0) - F.lit(2.0) * pp)
    )


def _discrete_inverse_cdf(t0: Column, recur, k_max: Column, prob) -> Column:
    """Smallest k with CDF(k) >= p for a non-negative integer distribution
    given the PMF term recurrence term_i = recur(term_{i-1}, i) — one
    Column fold, the same shape as the forward binomial/poisson CDFs."""
    pr = _col(prob).cast("double")

    # build the recurrence term ONCE per step: each Column op is a py4j
    # round-trip, and the binomial term is ~8 ops — constructing it three
    # times tripled the driver-side build cost of every call (the same
    # planning-time trap as the r09 geo fix; Catalyst sees the identical
    # shared subtree either way)
    def _step(st, i):
        new_term = recur(st["term"], i)
        new_acc = st["acc"] + new_term
        return F.struct(
            new_term.alias("term"),
            new_acc.alias("acc"),
            F.coalesce(
                st["ans"], F.when(new_acc >= pr, i.cast("int"))
            ).alias("ans"),
        )

    folded = F.aggregate(
        F.sequence(F.lit(1), F.greatest(k_max, F.lit(1))),
        F.struct(
            t0.alias("term"),
            t0.alias("acc"),
            F.when(t0 >= pr, F.lit(0)).cast("int").alias("ans"),
        ),
        _step,
    )
    # NULL/out-of-range p must yield NULL like the continuous siblings
    # (inverse_laplace_cdf etc.), not silently fall back to k_max.
    return F.when(
        pr.isNull() | (pr < 0.0) | (pr > 1.0), F.lit(None).cast("int")
    ).otherwise(F.coalesce(folded["ans"], k_max.cast("int")))


def _inverse_binomial_cdf(n, p, prob) -> Column:
    nd = _col(n).cast("double")
    ni = _col(n).cast("int")
    pd_ = _col(p).cast("double")
    pr = _col(prob).cast("double")
    t0 = F.pow(F.lit(1.0) - pd_, nd)
    out = _discrete_inverse_cdf(
        t0,
        lambda term, i: term
        * (nd - i.cast("double") + F.lit(1.0))
        / i.cast("double")
        * pd_
        / (F.lit(1.0) - pd_),
        ni,
        prob,
    )
    # p = 1 breaks the term recurrence (division by zero): CDF is a step
    # at n, so the inverse is n for any prob > 0 and 0 at prob = 0.
    # Dirty prob must stay NULL even on this branch; the fold already
    # clamps its answer to k_max = n so no extra least() is needed.
    return F.when(
        pr.isNull()
        | (pr < 0.0)
        | (pr > 1.0)
        # successProb outside [0,1] is dirty input (Velox USER_CHECK →
        # error; this engine's posture maps errors to NULL — r10 fuzz)
        | pd_.isNull()
        | (pd_ < 0.0)
        | (pd_ > 1.0),
        F.lit(None).cast("int"),
    ).when(
        pd_ == 1.0, F.when(pr > 0.0, ni).otherwise(F.lit(0))
    ).when(
        # p = 1: CDF(k) < 1 strictly for every k < n, so the exact answer
        # is n — decided here rather than left to the float fold, whose
        # accumulated sum may cross 1.0 an ULP early (r10 fuzz)
        pr == 1.0, ni
    ).otherwise(out)


def _inverse_poisson_cdf(lam, prob) -> Column:
    ld = _col(lam).cast("double")
    pr = _col(prob).cast("double")
    t0 = F.exp(-ld)
    # 20 sigma above the mean bounds the scan for any p below 1 - 1e-80
    k_max = F.ceil(ld + F.lit(20.0) * F.sqrt(ld) + F.lit(30.0)).cast("int")
    out = _discrete_inverse_cdf(
        t0, lambda term, i: term * ld / i.cast("double"), k_max, prob
    )
    # Domain edges (r10 fuzz): the Poisson quantile DIVERGES at p = 1
    # (boost throws, Velox surfaces an error → NULL here, never a silent
    # k_max), and lambda must be strictly positive (Velox USER_CHECK).
    return F.when(
        ld.isNull() | (ld <= 0.0) | (pr >= 1.0), F.lit(None).cast("int")
    ).otherwise(out)


def _array_normalize(a, p) -> Column:
    arr = _col(a)
    pd_ = _col(p).cast("double")
    norm = F.pow(
        F.aggregate(
            arr,
            F.lit(0.0),
            lambda s, x: s + F.pow(F.abs(x.cast("double")), pd_),
        ),
        F.lit(1.0) / pd_,
    )
    as_double = F.transform(arr, lambda x: x.cast("double"))
    # Presto returns the array unchanged when the norm is zero
    return F.when(norm == 0.0, as_double).otherwise(
        F.transform(arr, lambda x: x.cast("double") / norm)
    )


def _trail(s, n) -> Column:
    """Last n characters of s (Velox trail); n <= 0 yields ''."""
    sc = _col(s)
    nn = _col(n).cast("int")
    return F.substring(
        sc,
        F.greatest(F.length(sc) - nn + 1, F.lit(1)),
        F.greatest(nn, F.lit(0)),
    )


_ADAPTERS.update(
    {
        "inverse_cauchy_cdf": lambda m, s, p: _col(m).cast("double")
        + _col(s).cast("double")
        * F.tan(F.lit(math.pi) * (_col(p).cast("double") - F.lit(0.5))),
        "inverse_laplace_cdf": _inverse_laplace_cdf,
        "inverse_weibull_cdf": lambda a, b, p: _col(b).cast("double")
        * F.pow(
            -F.log(F.lit(1.0) - _col(p).cast("double")),
            F.lit(1.0) / _col(a).cast("double"),
        ),
        "inverse_binomial_cdf": _inverse_binomial_cdf,
        "inverse_poisson_cdf": _inverse_poisson_cdf,
        "inverse_gamma_cdf": lambda a, b, p: _udf_call(
            "inverse_gamma_cdf", a, b, p
        ),
        "inverse_chi_squared_cdf": lambda d, p: _udf_call(
            "inverse_chi_squared_cdf", d, p
        ),
        "inverse_f_cdf": lambda d1, d2, p: _udf_call(
            "inverse_f_cdf", d1, d2, p
        ),
        "bing_tile": _bing_tile,
        "bing_tile_at": _bing_tile_at,
        "bing_tile_coordinates": lambda t: F.struct(
            _col(t)["x"].alias("x"), _col(t)["y"].alias("y")
        ),
        "bing_tile_zoom_level": lambda t: _col(t)["zoom"].cast("tinyint"),
        "bing_tile_quadkey": _bing_tile_quadkey,
        "bing_tile_polygon": _bing_tile_polygon,
        "bing_tiles_around": _bing_tiles_around,
        "array_normalize": _array_normalize,
        "find_first": lambda arr, fn: F.get(F.filter(_col(arr), fn), 0),
        "find_first_index": lambda arr, fn: F.nullif(
            F.array_position(F.transform(_col(arr), fn), F.lit(True)),
            F.lit(0),
        ),
        "trail": _trail,
        # --- batch 13 (r10): array/map stragglers a Presto port hits ---
        # array_max_by/min_by: element whose key function is largest/
        # smallest. Presto skips elements with NULL keys unless all are
        # NULL; comparator-sort then take the head (n log n Column-side,
        # no shuffle). Ties keep the first in comparator order, matching
        # a stable sort of the original order.
        "array_max_by": lambda arr, fn: _array_by(arr, fn, desc=True),
        "array_min_by": lambda arr, fn: _array_by(arr, fn, desc=False),
        # array_top_n: n largest elements, descending (Presto semantics;
        # NULLs sort last and are kept only to pad short arrays — Presto
        # keeps them at the tail)
        "array_top_n": lambda arr, n: F.slice(
            F.sort_array(_col(arr), asc=False), 1, _col(n).cast("int")
        ),
        "array_split_into_chunks": lambda a, n: _array_split_into_chunks(
            a, n
        ),
        "contains_sequence": lambda a, s: _contains_sequence(a, s),
        # Presto aliases of already-mapped names
        "arrays_union": lambda a, b: F.array_union(_col(a), _col(b)),
        "array_dupes": lambda a: _ADAPTERS["array_duplicates"](a),
        "array_has_dupes": lambda a: _ADAPTERS["array_has_duplicates"](a),
        # batch 15: n least-frequent NON-NULL elements, ascending frequency,
        # ties by element ascending (Velox array_least_frequent); 1-arg form
        # returns the single least-frequent element as a 1-element array
        "array_least_frequent": lambda arr, n=1: _array_least_frequent(
            _col(arr), n
        ),
        # map predicate family: quantified matches over keys/values.
        # NULL lambda results follow Presto's three-valued ANY/ALL/NONE
        # semantics (forall/exists are Spark's, which implement the same
        # Kleene logic).
        "all_keys_match": lambda m, fn: F.forall(F.map_keys(_col(m)), fn),
        "any_keys_match": lambda m, fn: F.exists(F.map_keys(_col(m)), fn),
        "no_keys_match": lambda m, fn: ~F.exists(F.map_keys(_col(m)), fn),
        "any_values_match": lambda m, fn: F.exists(
            F.map_values(_col(m)), fn
        ),
        "no_values_match": lambda m, fn: ~F.exists(
            F.map_values(_col(m)), fn
        ),
    }
)


def _array_by(arr, fn, *, desc: bool) -> Column:
    a = F.filter(_col(arr), lambda x: fn(x).isNotNull())
    lo, hi = (F.lit(1), F.lit(-1)) if desc else (F.lit(-1), F.lit(1))
    ordered = F.array_sort(
        a,
        lambda l, r: F.when(fn(l) < fn(r), lo)
        .when(fn(l) > fn(r), hi)
        .otherwise(F.lit(0)),
    )
    return F.get(ordered, 0)


def _array_split_into_chunks(arr, n) -> Column:
    """Presto array_split_into_chunks(array, n): consecutive chunks of at
    most n elements; the empty array yields zero chunks; invalid n (<= 0
    or NULL) → NULL (dirty-input posture; Presto raises)."""
    a = _col(arr)
    nn = _col(n).cast("int")
    starts = F.sequence(F.lit(1), F.greatest(F.size(a), F.lit(1)), nn)
    chunks = F.transform(starts, lambda s: F.slice(a, s, nn))
    return F.when(
        nn >= 1,
        F.when(F.size(a) == 0, F.slice(chunks, 1, 0)).otherwise(chunks),
    )


def _contains_sequence(arr, seq) -> Column:
    """TRUE when seq occurs as a CONTIGUOUS subsequence of arr (Presto
    contains_sequence): exists over start offsets + slice equality. The
    empty sequence is contained in every array (Presto returns true)."""
    a, s = _col(arr), _col(seq)
    k = F.size(s)
    n = F.size(a)
    found = F.exists(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(0))),
        lambda i: F.slice(a, i, k) == s,
    )
    return F.when(k == 0, F.lit(True)).otherwise(
        F.when(n >= k, found).otherwise(F.lit(False))
    )


# SQL-UDF lowerings for Presto functions whose Spark analog is not a rename.
# Registered as temporary SQL functions (Catalyst inlines the bodies — no UDF
# overhead), so transpiled Presto SQL text can keep the Presto spelling.
_SQL_COMPAT = [
    "CREATE OR REPLACE TEMPORARY FUNCTION truncate(x DOUBLE) "
    "RETURNS DOUBLE RETURN sign(x) * floor(abs(x))",
    "CREATE OR REPLACE TEMPORARY FUNCTION sha256(x BINARY) "
    "RETURNS BINARY RETURN unhex(sha2(x, 256))",
    "CREATE OR REPLACE TEMPORARY FUNCTION json_parse(x STRING) "
    "RETURNS STRING RETURN to_json(parse_json(x))",
    "CREATE OR REPLACE TEMPORARY FUNCTION infinity() "
    "RETURNS DOUBLE RETURN cast('Infinity' as double)",
    "CREATE OR REPLACE TEMPORARY FUNCTION nan() "
    "RETURNS DOUBLE RETURN cast('NaN' as double)",
    "CREATE OR REPLACE TEMPORARY FUNCTION day_of_week(x TIMESTAMP) "
    "RETURNS INT RETURN cast((dayofweek(x) + 5) % 7 + 1 as int)",
    "CREATE OR REPLACE TEMPORARY FUNCTION dow(x TIMESTAMP) "
    "RETURNS INT RETURN cast((dayofweek(x) + 5) % 7 + 1 as int)",
    "CREATE OR REPLACE TEMPORARY FUNCTION to_unixtime(x TIMESTAMP) "
    "RETURNS DOUBLE RETURN unix_micros(x) / 1e6",
    "CREATE OR REPLACE TEMPORARY FUNCTION bitwise_and(a BIGINT, b BIGINT) "
    "RETURNS BIGINT RETURN a & b",
    "CREATE OR REPLACE TEMPORARY FUNCTION bitwise_or(a BIGINT, b BIGINT) "
    "RETURNS BIGINT RETURN a | b",
    "CREATE OR REPLACE TEMPORARY FUNCTION bitwise_xor(a BIGINT, b BIGINT) "
    "RETURNS BIGINT RETURN a ^ b",
    "CREATE OR REPLACE TEMPORARY FUNCTION bitwise_left_shift(a BIGINT, s INT) "
    "RETURNS BIGINT RETURN shiftleft(a, s)",
    "CREATE OR REPLACE TEMPORARY FUNCTION bitwise_right_shift(a BIGINT, s INT) "
    "RETURNS BIGINT RETURN shiftright(a, s)",
    "CREATE OR REPLACE TEMPORARY FUNCTION bitwise_not(a BIGINT) "
    "RETURNS BIGINT RETURN -a - 1",
    # --- batch 6 ---
    "CREATE OR REPLACE TEMPORARY FUNCTION strrpos(s STRING, sub STRING) "
    "RETURNS BIGINT RETURN CASE WHEN instr(reverse(s), reverse(sub)) = 0 "
    "THEN 0 ELSE length(s) - instr(reverse(s), reverse(sub)) - length(sub) + 2 END",
    "CREATE OR REPLACE TEMPORARY FUNCTION to_iso8601(x TIMESTAMP) "
    "RETURNS STRING RETURN date_format(x, \"yyyy-MM-dd'T'HH:mm:ss.SSS\")",
    "CREATE OR REPLACE TEMPORARY FUNCTION year_of_week(x DATE) "
    "RETURNS BIGINT RETURN year(date_add(x, cast(4 - ((dayofweek(x) + 5) % 7 + 1) as int)))",
    "CREATE OR REPLACE TEMPORARY FUNCTION yow(x DATE) "
    "RETURNS BIGINT RETURN year(date_add(x, cast(4 - ((dayofweek(x) + 5) % 7 + 1) as int)))",
    "CREATE OR REPLACE TEMPORARY FUNCTION is_finite(x DOUBLE) "
    "RETURNS BOOLEAN RETURN NOT isnan(x) AND x != cast('Infinity' as double) "
    "AND x != cast('-Infinity' as double)",
    # luhn_check: Spark built-in since 3.5 — no shim needed on the SQL side
    "CREATE OR REPLACE TEMPORARY FUNCTION cosine_similarity("
    "a MAP<STRING, DOUBLE>, b MAP<STRING, DOUBLE>) RETURNS DOUBLE RETURN "
    "aggregate(map_values(map_zip_with(a, b, "
    "(k, x, y) -> coalesce(x, 0d) * coalesce(y, 0d))), 0d, (acc, x) -> acc + x)"
    " / (sqrt(aggregate(map_values(a), 0d, (acc, x) -> acc + x * x))"
    " * sqrt(aggregate(map_values(b), 0d, (acc, x) -> acc + x * x)))",
    # --- batch 7 ---
    "CREATE OR REPLACE TEMPORARY FUNCTION sha512(x BINARY) "
    "RETURNS STRING RETURN sha2(x, 512)",
    "CREATE OR REPLACE TEMPORARY FUNCTION to_base64url(x BINARY) "
    "RETURNS STRING RETURN translate(base64(x), '+/', '-_')",
    "CREATE OR REPLACE TEMPORARY FUNCTION from_base64url(s STRING) "
    "RETURNS BINARY RETURN unbase64(translate(s, '-_', '+/'))",
    "CREATE OR REPLACE TEMPORARY FUNCTION wilson_interval_lower("
    "s DOUBLE, n DOUBLE, z DOUBLE) RETURNS DOUBLE RETURN "
    "(s / n + z * z / (2 * n) - z * sqrt(s / n * (1 - s / n) / n "
    "+ z * z / (4 * n * n))) / (1 + z * z / n)",
    "CREATE OR REPLACE TEMPORARY FUNCTION wilson_interval_upper("
    "s DOUBLE, n DOUBLE, z DOUBLE) RETURNS DOUBLE RETURN "
    "(s / n + z * z / (2 * n) + z * sqrt(s / n * (1 - s / n) / n "
    "+ z * z / (4 * n * n))) / (1 + z * z / n)",
    "CREATE OR REPLACE TEMPORARY FUNCTION timezone_hour(t TIMESTAMP) "
    "RETURNS BIGINT RETURN cast(cast((unix_timestamp(t) - unix_timestamp("
    "to_utc_timestamp(t, current_timezone()))) / 60 as int) / 60 as int)",
    "CREATE OR REPLACE TEMPORARY FUNCTION timezone_minute(t TIMESTAMP) "
    "RETURNS BIGINT RETURN cast((unix_timestamp(t) - unix_timestamp("
    "to_utc_timestamp(t, current_timezone()))) / 60 as int) "
    "- 60 * cast(cast((unix_timestamp(t) - unix_timestamp("
    "to_utc_timestamp(t, current_timezone()))) / 60 as int) / 60 as int)",
    "CREATE OR REPLACE TEMPORARY FUNCTION url_extract_port(u STRING) "
    "RETURNS BIGINT RETURN cast(nullif(regexp_extract(u, "
    r"'^[^:/?#]+://(?:[^/@]*@)?[^/:?#]*:([0-9]+)', 1), '') as bigint)",
    "CREATE OR REPLACE TEMPORARY FUNCTION json_format(x STRING) "
    "RETURNS STRING RETURN to_json(parse_json(x))",
    "CREATE OR REPLACE TEMPORARY FUNCTION is_json_scalar(x STRING) "
    "RETURNS BOOLEAN RETURN case when try_parse_json(x) is null then "
    "cast(null as boolean) else not ("
    "startswith(schema_of_variant(try_parse_json(x)), 'OBJECT') or "
    "startswith(schema_of_variant(try_parse_json(x)), 'ARRAY') or "
    "startswith(schema_of_variant(try_parse_json(x)), 'STRUCT')) end",
    # IPv4 network helpers (documented: IPv6 inputs yield NULL)
    "CREATE OR REPLACE TEMPORARY FUNCTION ip4_to_int(ip STRING) "
    "RETURNS BIGINT RETURN case when ip rlike "
    r"'^((25[0-5]|2[0-4]\\d|1?\\d?\\d)\.){3}(25[0-5]|2[0-4]\\d|1?\\d?\\d)$' then "
    r"cast(split(ip, '\\.')[0] as bigint) * 16777216 "
    r"+ cast(split(ip, '\\.')[1] as bigint) * 65536 "
    r"+ cast(split(ip, '\\.')[2] as bigint) * 256 "
    r"+ cast(split(ip, '\\.')[3] as bigint) end",
    # concat_ws skips NULLs — guard so a NULL int (IPv6 input) stays NULL
    "CREATE OR REPLACE TEMPORARY FUNCTION int_to_ip4(v BIGINT) "
    "RETURNS STRING RETURN case when v is null then cast(null as string) "
    "else concat_ws('.', cast(v div 16777216 as string), "
    "cast(v div 65536 % 256 as string), cast(v div 256 % 256 as string), "
    "cast(v % 256 as string)) end",
    "CREATE OR REPLACE TEMPORARY FUNCTION ip_prefix(ip STRING, b INT) "
    "RETURNS STRING RETURN concat(int_to_ip4(ip4_to_int(ip) "
    "- ip4_to_int(ip) % cast(pow(2, 32 - b) as bigint)), '/', "
    "cast(b as string))",
    "CREATE OR REPLACE TEMPORARY FUNCTION ip_subnet_min(p STRING) "
    "RETURNS STRING RETURN int_to_ip4(ip4_to_int(split(p, '/')[0]) "
    "- ip4_to_int(split(p, '/')[0]) "
    "% cast(pow(2, 32 - cast(split(p, '/')[1] as int)) as bigint))",
    "CREATE OR REPLACE TEMPORARY FUNCTION ip_subnet_max(p STRING) "
    "RETURNS STRING RETURN int_to_ip4(ip4_to_int(split(p, '/')[0]) "
    "- ip4_to_int(split(p, '/')[0]) "
    "% cast(pow(2, 32 - cast(split(p, '/')[1] as int)) as bigint) "
    "+ cast(pow(2, 32 - cast(split(p, '/')[1] as int)) as bigint) - 1)",
    "CREATE OR REPLACE TEMPORARY FUNCTION ip_subnet_range(p STRING) "
    "RETURNS ARRAY<STRING> RETURN array(ip_subnet_min(p), ip_subnet_max(p))",
    "CREATE OR REPLACE TEMPORARY FUNCTION is_subnet_of(p STRING, x STRING) "
    "RETURNS BOOLEAN RETURN "
    "(case when contains(x, '/') then ip4_to_int(ip_subnet_min(x)) "
    "else ip4_to_int(x) end) >= ip4_to_int(ip_subnet_min(p)) AND "
    "(case when contains(x, '/') then ip4_to_int(ip_subnet_max(x)) "
    "else ip4_to_int(x) end) <= ip4_to_int(ip_subnet_max(p))",
    # --- batch 10: big-endian bit views, nano timestamps, private IPs ---
    "CREATE OR REPLACE TEMPORARY FUNCTION to_big_endian_64(x BIGINT) "
    "RETURNS BINARY RETURN unhex(lpad(hex(x), 16, '0'))",
    "CREATE OR REPLACE TEMPORARY FUNCTION from_big_endian_64(b BINARY) "
    "RETURNS BIGINT RETURN cast(case when "
    "cast(conv(hex(b), 16, 10) as decimal(21,0)) >= "
    "cast('9223372036854775808' as decimal(21,0)) then "
    "cast(conv(hex(b), 16, 10) as decimal(21,0)) "
    "- cast('18446744073709551616' as decimal(21,0)) else "
    "cast(conv(hex(b), 16, 10) as decimal(21,0)) end as bigint)",
    "CREATE OR REPLACE TEMPORARY FUNCTION to_big_endian_32(x INT) "
    "RETURNS BINARY RETURN unhex(lpad(hex(cast(x as bigint) & 4294967295), "
    "8, '0'))",
    "CREATE OR REPLACE TEMPORARY FUNCTION from_big_endian_32(b BINARY) "
    "RETURNS INT RETURN cast(case when cast(conv(hex(b), 16, 10) as bigint) "
    ">= 2147483648 then cast(conv(hex(b), 16, 10) as bigint) - 4294967296 "
    "else cast(conv(hex(b), 16, 10) as bigint) end as int)",
    "CREATE OR REPLACE TEMPORARY FUNCTION from_unixtime_nanos(n BIGINT) "
    "RETURNS TIMESTAMP RETURN timestamp_micros(cast(floor("
    "cast(n as decimal(25,3)) / 1000) as bigint))",
    # IANA special-purpose IPv4 registries (RFC 6890 et al.)
    "CREATE OR REPLACE TEMPORARY FUNCTION is_private(ip STRING) "
    "RETURNS BOOLEAN RETURN "
    + " OR ".join(
        f"ip4_to_int(ip) between {_ipv4_lit(start)} "
        f"and {_ipv4_lit(start) + (1 << (32 - bits)) - 1}"
        for start, bits in _PRIVATE_RANGES
    ),
    # --- batch 12: closed-form inverse CDFs + trail for SQL text (the
    # bisection/tile members stay DataFrame-dialect; the SQL front door
    # reaches the UDF-backed ones through register_udfs) ---
    "CREATE OR REPLACE TEMPORARY FUNCTION inverse_cauchy_cdf("
    "m DOUBLE, s DOUBLE, p DOUBLE) RETURNS DOUBLE RETURN "
    "m + s * tan(pi() * (p - 0.5))",
    "CREATE OR REPLACE TEMPORARY FUNCTION inverse_laplace_cdf("
    "m DOUBLE, s DOUBLE, p DOUBLE) RETURNS DOUBLE RETURN "
    "case when p < 0.5 then m + s * ln(2 * p) "
    "else m - s * ln(2 - 2 * p) end",
    "CREATE OR REPLACE TEMPORARY FUNCTION inverse_weibull_cdf("
    "a DOUBLE, b DOUBLE, p DOUBLE) RETURNS DOUBLE RETURN "
    "b * power(-ln(1 - p), 1.0 / a)",
    "CREATE OR REPLACE TEMPORARY FUNCTION trail(s STRING, n INT) "
    "RETURNS STRING RETURN "
    "substring(s, greatest(length(s) - n + 1, 1), greatest(n, 0))",
]


def register_sql_compat(spark) -> None:
    """Register Presto-compat SQL UDFs in the session (idempotent)."""
    for ddl in _SQL_COMPAT:
        spark.sql(ddl)
    from verax_spark.functions.udfs import register_geo_udfs, register_udfs

    register_udfs(spark)
    register_geo_udfs(spark)


def presto_call(name: str, *args) -> Column:
    """Call a Presto-dialect function on Spark columns."""
    key = name.lower()
    if key in _ADAPTERS:
        return _ADAPTERS[key](*args)
    target = PRESTO_TO_SPARK.get(key, key)
    cols = [a if isinstance(a, Column) else F.lit(a) for a in args]
    # call_function resolves lazily (analysis time); check the registry now
    # so a bad name fails at the call site with an actionable message
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None and not spark.catalog.functionExists(target):
        raise ValueError(
            f"Presto function {name!r} has no Spark mapping "
            f"(tried {target!r}); add it to verax_spark.functions.presto"
        )
    return F.call_function(target, *cols)
