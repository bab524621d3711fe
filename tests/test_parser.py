"""Grammar coverage for the recursive-descent Presto parser
(verax_spark/sql/parser.py) — pure transpile assertions, no Spark session.

Mirrors the reference's parser test strategy (differential parse-and-run in
test_sql_frontend.py; these are the fast shape checks)."""

import pytest

from verax_spark.sql.ast import ParseError
from verax_spark.sql.parser import parse
from verax_spark.sql.presto import transpile


def test_subscripts_are_one_based():
    out = transpile("select a[1], m['k'].f from t")
    assert "element_at(a, 1)" in out
    assert "element_at(m, 'k')" in out and ".f" in out


def test_array_row_map_constructors():
    out = transpile("select array[1, a[2], array[3]], row(1, 'x'), "
                    "map(array['a'], array[1]) from t")
    assert "array(1, element_at(a, 2), array(3))" in out
    assert "struct(1, 'x')" in out
    assert "map_from_arrays(array('a'), array(1))" in out


def test_typed_and_interval_literals():
    out = transpile("select decimal '1.25', timestamp '2000-01-01 00:00:00', "
                    "interval '3' month, interval 90 day from t")
    assert "cast('1.25' as decimal(3,2))" in out
    assert "timestamp '2000-01-01 00:00:00'" in out
    assert "interval '3' month" in out and "interval 90 day" in out


def test_predicates():
    out = transpile(
        "select * from t where a between 1 and 2 and b not in (1, 2) "
        "and c is not null and d is distinct from e and f not like 'x%' "
        "and g is not distinct from h"
    )
    assert "between 1 and 2" in out
    assert "not in (1, 2)" in out
    assert "is not null" in out
    assert "is distinct from" in out and "is not distinct from" in out
    assert "not like 'x%'" in out


def test_operator_precedence():
    assert transpile("select 1 + 2 * 3").endswith("(1 + (2 * 3))")
    assert "((a or (b and c)) or d)" in transpile("select * from t where a or b and c or d")
    out = transpile("select 'a' || 'b' || cast(1 + 2 as varchar)")
    assert "(('a' || 'b') || cast((1 + 2) as string))" in out


def test_lambdas():
    out = transpile("select transform(xs, x -> x + 1), "
                    "reduce(xs, 0, (acc, x) -> acc + x, s -> s) from t")
    assert "x -> (x + 1)" in out
    assert "aggregate(" in out  # reduce → aggregate rename
    assert "(acc, x) -> (acc + x)" in out


def test_case_forms():
    out = transpile("select case when a > 1 then 'x' else 'y' end, "
                    "case a when 1 then 'p' when 2 then 'q' end from t")
    assert "case when (a > 1) then 'x' else 'y' end" in out
    assert "case a when 1 then 'p' when 2 then 'q' end" in out


def test_set_operations_and_precedence():
    # INTERSECT binds tighter than UNION
    out = transpile("select 1 union all select 2 intersect select 3")
    assert "select 2 intersect distinct select 3" in out
    assert out.startswith("select 1 union all")


def test_group_by_forms():
    assert "rollup (a, b)" in transpile("select a, b from t group by rollup(a, b)")
    assert "cube (a, b)" in transpile("select a, b from t group by cube(a, b)")
    out = transpile("select a, b from t group by grouping sets ((a, b), (a), ())")
    assert "grouping sets ((a, b), (a), ())" in out


def test_window_frames():
    out = transpile(
        "select sum(x) over (partition by g order by o "
        "rows between 2 preceding and current row), "
        "lead(x, 1) ignore nulls over (order by o) from t"
    )
    assert "rows between 2 preceding and current row" in out
    assert "ignore nulls over" in out
    with pytest.raises(NotImplementedError):
        transpile("select sum(x) over (order by o groups between 1 preceding "
                  "and current row) from t")


def test_fetch_first_and_offset():
    out = transpile("select * from t order by a offset 5 fetch first 10 rows only")
    assert out.endswith("order by a limit 10 offset 5")


def test_tablesample():
    out = transpile("select * from t tablesample system (10)")
    assert "tablesample (10 percent)" in out
    with pytest.raises(NotImplementedError):
        transpile("select * from t tablesample foo (10)")


def test_values_relation():
    out = transpile("select * from (values (1, 'a'), (2, 'b')) as t(x, y)")
    assert "(values (1, 'a'), (2, 'b')) as t(x, y)" in out


def test_lateral_subquery():
    out = transpile("select * from t, lateral (select t.x + 1 as y) s")
    assert "lateral (select (t.x + 1) as y) as s" in out


def test_cte_with_column_aliases():
    out = transpile("with c(a, b) as (select 1, 2) select a from c")
    assert out.startswith("with c(a, b) as (select 1, 2)")


def test_quoted_identifiers():
    out = transpile('select "select" from "from"')
    # quoted names survive as identifiers (rendered bare when word-like)
    assert "select select from from" == out


def test_parse_errors_have_positions():
    with pytest.raises(ParseError) as e:
        parse("select * from")
    assert "at" in str(e.value)
    with pytest.raises(ParseError):
        parse("select (1 from t")
    # DDL parses since the CREATE/DROP front door; unknown statements don't
    stmt = parse("create table t (x int)")
    assert stmt.table == "t" and stmt.columns == [("x", "int")]
    with pytest.raises(ParseError):
        parse("grant select on t to alice")


def test_explain_statement_shape():
    from verax_spark.sql import ast

    stmt = parse("explain select 1")
    assert isinstance(stmt, ast.ExplainStmt)


def test_explain_options_parse():
    """EXPLAIN (TYPE .., FORMAT ..) — ref AstStatements.h:597-635."""
    from verax_spark.sql import ast

    stmt = parse("explain (type distributed) select 1")
    assert isinstance(stmt, ast.ExplainStmt)
    assert stmt.type_ == "distributed" and stmt.format is None

    stmt = parse("explain (type io, format json) select 1")
    assert stmt.type_ == "io" and stmt.format == "json"

    stmt = parse("explain (format text, type validate) select 1")
    assert stmt.type_ == "validate" and stmt.format == "text"

    stmt = parse("explain (type logical) analyze select 1")
    assert stmt.type_ == "logical" and stmt.analyze

    with pytest.raises(ParseError):
        parse("explain (type nonsense) select 1")
    with pytest.raises(ParseError):
        parse("explain (format yaml) select 1")
    with pytest.raises(ParseError):
        parse("explain (bogus distributed) select 1")


def test_comments_are_skipped():
    out = transpile("select 1 -- trailing\n, 2 /* block\ncomment */ from t")
    assert out == "select 1, 2 from t"


def test_ordered_aggregate_rendering():
    out = transpile("select array_agg(x order by k desc, id) from t group by g")
    assert "array_sort(collect_list(struct(x as __v, k as __k0, id as __k1))" in out
    assert "s -> s.__v" in out
    assert transpile("select sum(x order by y) from t") == "select sum(x) from t"
    assert "sort_array(collect_set(x), true)" in transpile(
        "select array_agg(distinct x order by x) from t")
    with pytest.raises(NotImplementedError):
        transpile("select string_agg(x order by y) from t")
    with pytest.raises(NotImplementedError):
        transpile("select array_agg(distinct x order by y) from t")


def test_try_lowering():
    out = transpile("select try(a / b), try(cast(s as integer)), try(xs[9]) from t")
    assert "try_divide(a, b)" in out
    assert "try_cast(s as int)" in out
    assert "try_element_at(xs, 9)" in out
    with pytest.raises(NotImplementedError):
        transpile("select try(some_udf(x)) from t")


def test_at_time_zone():
    out = transpile("select ts at time zone 'America/New_York' as v from t")
    assert "from_utc_timestamp(ts, 'America/New_York')" in out


def test_position_in():
    out = transpile("select position('b' in s) as p from t")
    assert "instr(s, 'b')" in out


def test_ansi_trim_forms():
    out = transpile(
        "select trim(both 'x' from s), trim(leading from s), "
        "trim('y' from s), trim(s) from t"
    )
    assert "trim(both 'x' from s)" in out
    assert "trim(leading from s)" in out
    assert "trim(both 'y' from s)" in out  # default spec is BOTH
    assert "trim(s)" in out  # plain call untouched


def test_type_grammar_nested_and_postfix():
    """Presto type grammar → Spark DDL types: postfix `T array`, nested
    row/map/array with inner scalar mapping, anonymous row fields named
    field0..fieldN-1 (Trino convention)."""
    out = transpile("select cast(null as int array) as a")
    assert "cast(null as array<int>)" in out
    out = transpile("select cast(null as varchar array) as a")
    assert "array<string>" in out
    out = transpile("select cast(null as row(int, double)) as a")
    assert "struct<field0: int, field1: double>" in out
    out = transpile("select cast(null as row(a varchar, b row(c int array))) as a")
    assert "struct<a: string, b: struct<c: array<int>>>" in out
    out = transpile("select cast(null as array(row(k varchar, v json))) as a")
    assert "array<struct<k: string, v: string>>" in out
    out = transpile("select cast(null as map(integer, real)) as a")
    assert "map<int,float>" in out


def test_unaliased_unnest_defaults():
    """Presto allows UNNEST with no AS alias (anonymous output columns) —
    single expressions omit AS so Spark assigns col/key/value; multi-array
    and ordinality forms synthesize col1..colN (+ ordinality)."""
    out = transpile("select * from nation, unnest(array[1, 2])")
    assert out.endswith("lateral view explode(array(1, 2)) __u")
    out2 = transpile("select * from unnest(map(array[1], array[10]))")
    assert "explode(map_from_arrays(array(1), array(10))) __u" in out2
    assert "__u.*" in out2  # star-safe: dummy column never leaks
    out3 = transpile(
        "select * from nation, unnest(array[1], array[2]) with ordinality"
    )
    assert "as col1, col2, ordinality" in out3


def test_standalone_unnest_relation():
    out = transpile("select u.* from unnest(array[1,2]) as u(x)")
    assert "lateral view explode(array(1, 2)) u as x" in out
    assert out.startswith("select u.* from (select x from (select 1)")
    # ordinality variant synthesizes the 1-based index column
    out2 = transpile(
        "select x, n from unnest(array[5,6]) with ordinality as u(x, n)"
    )
    assert "sequence(1, size(array(5, 6)))" in out2


def test_named_window_clause():
    s = parse(
        "select rank() over w as r from t "
        "window w as (partition by a order by b desc)"
    )
    sql = s.sql()
    assert "over w" in sql and "window w as (partition by a order by b desc)" in sql


def test_null_semantic_fn_rewrites():
    out = transpile("select least(a, b) as l, greatest(a, b, c) as g from t")
    assert "case when a is null or b is null then null else least(a, b) end" in out
    assert "a is null or b is null or c is null" in out
    out2 = transpile("select regexp_extract(s, 'x') as e, regexp_replace(s, 'y') as r from t")
    assert "regexp_extract(s, 'x', 0)" in out2
    assert "regexp_replace(s, 'y', '')" in out2
    out3 = transpile("select array_min(xs) as m from t")
    assert "exists(xs, _e -> _e is null)" in out3


def test_map_agg_rewrite():
    out = transpile("select k, map_agg(a, b) as m from t group by k")
    assert "map_from_entries(collect_list(struct(a, b)))" in out


def test_over_named_and_inline_mixed():
    s = parse(
        "select rank() over w, sum(x) over (order by y) from t "
        "window w as (order by z rows between 1 preceding and current row)"
    )
    sql = s.sql()
    assert "over w" in sql and "over (order by y)" in sql
    assert "rows between 1 preceding and current row" in sql


def test_describe_statements():
    from verax_spark.sql.ast import DescribeStmt
    from verax_spark.sql.parser import parse

    for text in ("DESCRIBE nation", "DESC orders", "SHOW COLUMNS FROM lineitem"):
        stmt = parse(text)
        assert isinstance(stmt, DescribeStmt), text
    assert parse("describe nation").table == "nation"
    assert parse("show columns from lineitem").table == "lineitem"


def test_adapter_fn_sql_rewrites():
    """Adapter-only functions stay reachable from SQL text via structural
    rewrites (no Spark builtin exists under these names)."""
    out = transpile("select ngrams(xs, 2) from t")
    assert "transform(sequence(1, greatest(size(xs) - 2 + 1, 1))" in out
    out = transpile("select array_sum(xs), array_average(xs) from t")
    assert out.count("aggregate(filter(xs, __e -> __e is not null)") == 2
    assert "nullif(size(" in out
    out = transpile("select json_array_get(j, 1) from t")
    assert "variant_get(parse_json(j)" in out


def test_natural_join_grammar():
    """NATURAL [kind] JOIN (ref NaturalJoin, AstRelations.h:477) parses,
    renders to Spark's native natural join, and never invents an ON."""
    from verax_spark.sql.parser import parse

    for text, want in [
        ("select * from a natural join b", "natural inner join"),
        ("select * from a natural left outer join b", "natural left join"),
        ("select * from a natural full join b", "natural full join"),
    ]:
        assert want in parse(text).sql(), text
    j = parse("select * from a natural join b").body.from_
    assert j.natural and j.on is None and not j.using


def test_table_version_grammar():
    """FOR (TIMESTAMP|VERSION) (AS OF|BEFORE) expr (ref
    TableVersionExpression AstFunctions.h:535, PrestoSql.g4:561-567)."""
    from verax_spark.sql.parser import parse

    t = parse("select * from t for version as of 3").body.from_
    assert (t.version_kind, t.version_before) == ("version", False)
    t = parse("select * from t for system_version before 7").body.from_
    assert (t.version_kind, t.version_before) == ("version", True)
    t = parse(
        "select * from t for timestamp as of timestamp '2026-01-01 00:00:00'"
    ).body.from_
    assert t.version_kind == "timestamp"
    # the spec composes with aliasing and joins
    q = parse(
        "select * from t for version as of 1 x join u on x.a = u.a"
    ).body.from_
    assert q.left.version_kind == "version" and q.left.alias == "x"
