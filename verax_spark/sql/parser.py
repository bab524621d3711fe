"""Recursive-descent Presto SQL parser → verax_spark.sql.ast.

Hand-written equivalent of the reference's generated ANTLR parser + AST
builder (ref axiom/sql/presto/grammar/PrestoSqlParser.cpp ~24k generated
lines; AST construction axiom/sql/presto/ast/AstBuilder.cpp; statement
surface SELECT/EXPLAIN only, ref axiom/optimizer/tests/SqlStatement.h:23-79).
The grammar subset is the reference PrestoParser's executable surface:

  statement   := [EXPLAIN] query
  query       := [WITH cte ("," cte)*] queryTerm
                 [ORDER BY sortItem ("," sortItem)*]
                 [OFFSET n [ROWS]] [LIMIT n | FETCH FIRST n ROWS ONLY]
  queryTerm   := queryPrimary ((UNION|EXCEPT) [ALL|DISTINCT] queryPrimary
                             | INTERSECT [ALL|DISTINCT] queryPrimary)*
  queryPrimary:= SELECT ... | "(" query ")" | VALUES row ("," row)*
  relation    := sampled ((CROSS JOIN | [join-type] JOIN) sampled
                 [ON expr | USING "(" idents ")"] | "," sampled)*
  sampled     := primaryRel [TABLESAMPLE (BERNOULLI|SYSTEM) "(" expr ")"]
  primaryRel  := table | "(" query ")" | "(" relation ")" | UNNEST "(" exprs
                 ")" [WITH ORDINALITY] | LATERAL "(" query ")" | VALUES ...
  expressions := full Presto precedence: OR < AND < NOT < predicate
                 (cmp, quantified cmp, BETWEEN, IN, LIKE, IS NULL,
                 IS DISTINCT FROM) < "||" < additive < multiplicative <
                 unary < postfix ("[" subscript "]", "." deref) < primary
                 (literals, typed literals, intervals, CASE, CAST/TRY_CAST,
                 EXISTS, scalar subquery, lambda, ARRAY/ROW constructors,
                 function calls with DISTINCT/FILTER/IGNORE NULLS/OVER,
                 EXTRACT(unit FROM e))

Everything parses into typed AST nodes; dialect lowering lives entirely in
the nodes' ``sql()`` renderers (ast.py), never here.
"""

from __future__ import annotations

import re

from verax_spark.sql import ast
from verax_spark.sql.ast import ParseError

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|--[^\n]*|/\*.*?\*/)
  | (?P<str>'(?:[^']|'')*')
  | (?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<qid>"(?:[^"]|"")*")
  | (?P<id>[A-Za-z_][A-Za-z0-9_$]*)
  | (?P<op><>|!=|>=|<=|=>|->|\|\||[(),.\[\]<>=+\-*/%?])
    """,
    re.VERBOSE | re.DOTALL,
)

# words that terminate an alias-less identifier position
_RESERVED_AFTER_RELATION = {
    "where", "group", "having", "order", "limit", "offset", "fetch", "union",
    "intersect", "except", "join", "inner", "left", "right", "full", "cross",
    "on", "using", "natural", "lateral", "tablesample", "with", "window",
}

_JOIN_TYPES = {"inner", "left", "right", "full"}

_FRAME_BOUND_START = {"unbounded", "current"}


class _Tok:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind = kind
        self.text = text
        self.pos = pos

    @property
    def lower(self) -> str:
        return self.text.lower()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"{self.kind}:{self.text}"


def _tokenize(sql: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(sql):
        m = _TOKEN.match(sql, i)
        if m is None:
            raise ParseError(f"unexpected character {sql[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append(_Tok(kind, m.group(), m.start()))
    toks.append(_Tok("eof", "", len(sql)))
    return toks


class Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0
        # count of `?` prepared-statement parameters seen, in parse order
        self.param_count = 0

    # -- token helpers -------------------------------------------------------
    def peek(self, ahead: int = 0) -> _Tok:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *words: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t.kind == "id" and t.lower in words

    def at_op(self, *ops: str, ahead: int = 0) -> bool:
        t = self.peek(ahead)
        return t.kind == "op" and t.text in ops

    def accept_kw(self, *words: str) -> str | None:
        if self.at_kw(*words):
            return self.next().lower
        return None

    def accept_op(self, *ops: str) -> str | None:
        if self.at_op(*ops):
            return self.next().text
        return None

    def expect_kw(self, word: str) -> None:
        if not self.accept_kw(word):
            t = self.peek()
            raise ParseError(f"expected {word.upper()} at {t.pos}, got {t.text!r}")

    def expect_op(self, op: str) -> None:
        if not self.accept_op(op):
            t = self.peek()
            raise ParseError(f"expected {op!r} at {t.pos}, got {t.text!r}")

    def ident(self) -> str:
        t = self.peek()
        if t.kind == "id":
            return self.next().text
        if t.kind == "qid":
            return self.next().text[1:-1].replace('""', '"')
        raise ParseError(f"expected identifier at {t.pos}, got {t.text!r}")

    def qname(self) -> str:
        """Possibly schema-qualified name (``s.t``) joined with dots —
        DML/DDL targets after CREATE SCHEMA namespaces landed."""
        parts = [self.ident()]
        while self.accept_op("."):
            parts.append(self.ident())
        return ".".join(parts)

    # -- statements ----------------------------------------------------------
    def parse_statement(self):
        """Query | ExplainStmt | DescribeStmt | InsertStmt | DeleteStmt |
        UpdateStmt (DML surface: reference sql/presto/ast/AstStatements.h)."""
        if self.accept_kw("describe") or self.accept_kw("desc"):
            stmt = ast.DescribeStmt(self.qname())
        elif self.at_kw("show") and self.at_kw("columns", ahead=1):
            self.next(), self.next()
            self.expect_kw("from")
            stmt = ast.DescribeStmt(self.ident())
        elif self.at_kw("show") and self.at_kw("tables", ahead=1):
            self.next(), self.next()
            stmt = ast.ShowTablesStmt()
        elif self.at_kw("show") and self.at_kw("schemas", ahead=1):
            self.next(), self.next()
            stmt = ast.ShowSchemasStmt()
        elif self.at_kw("show") and self.at_kw("roles", ahead=1):
            self.next(), self.next()
            stmt = ast.ShowRolesStmt()
        elif (
            self.at_kw("show")
            and self.at_kw("current", ahead=1)
            and self.at_kw("roles", ahead=2)
        ):
            self.next(), self.next(), self.next()
            stmt = ast.ShowRolesStmt(current=True)
        elif self.accept_kw("call"):
            # CALL qname '(' callArgument,* ')' — callArgument is
            # positional or named (identifier => expression), ref
            # PrestoSql.g4:101,548
            name = self.qname()
            self.expect_op("(")
            args: list[tuple[str | None, object]] = []
            if not self.at_op(")"):
                while True:
                    if (
                        self.peek().kind == "id"
                        and self.peek(1).kind == "op"
                        and self.peek(1).text == "=>"
                    ):
                        argname = self.ident()
                        self.expect_op("=>")
                        args.append((argname, self.parse_expr()))
                    else:
                        args.append((None, self.parse_expr()))
                    if not self.accept_op(","):
                        break
            self.expect_op(")")
            stmt = ast.CallStmt(name, args)
        elif self.accept_kw("refresh"):
            self.expect_kw("materialized"), self.expect_kw("view")
            stmt = ast.RefreshMViewStmt(self.qname())
        elif self.accept_kw("create"):
            or_replace = False
            if self.accept_kw("or"):
                self.expect_kw("replace")
                or_replace = True
            if self.accept_kw("schema"):
                if or_replace:
                    raise ParseError("CREATE OR REPLACE SCHEMA is not Presto syntax")
                ine = False
                if self.accept_kw("if"):
                    self.expect_kw("not"), self.expect_kw("exists")
                    ine = True
                stmt = ast.CreateSchemaStmt(self.ident(), ine)
            elif self.accept_kw("materialized"):
                self.expect_kw("view")
                name = self.qname()
                self.expect_kw("as")
                stmt = ast.CreateMViewStmt(name, self.parse_query(), or_replace)
            elif self.accept_kw("function"):
                name = self.qname()
                self.expect_op("(")
                params: list[tuple[str, str]] = []
                if not self.at_op(")"):
                    while True:
                        params.append((self.ident(), self._type_text()))
                        if not self.accept_op(","):
                            break
                self.expect_op(")")
                self.expect_kw("returns")
                rtype = self._type_text()
                deterministic = True
                # RoutineCharacteristics (ref AstStatements.h:269):
                # LANGUAGE SQL / [NOT] DETERMINISTIC / null-call behavior
                while True:
                    if self.accept_kw("language"):
                        lang = self.ident()
                        if lang.lower() != "sql":
                            raise NotImplementedError(
                                f"CREATE FUNCTION LANGUAGE {lang}: only "
                                "SQL-language bodies are executable (the "
                                "reference parses but does not execute "
                                "external routines)"
                            )
                    elif self.at_kw("not") and self.at_kw("deterministic", ahead=1):
                        self.next(), self.next()
                        deterministic = False
                    elif self.accept_kw("deterministic"):
                        deterministic = True
                    elif self.at_kw("returns") and self.at_kw("null", ahead=1):
                        self.next(), self.next()
                        self.expect_kw("on"), self.expect_kw("null")
                        self.expect_kw("input")
                    elif self.at_kw("called"):
                        self.next()
                        self.expect_kw("on"), self.expect_kw("null")
                        self.expect_kw("input")
                    else:
                        break
                self.expect_kw("return")
                stmt = ast.CreateFunctionStmt(
                    name, params, rtype, self.parse_expr(), or_replace,
                    deterministic,
                )
            elif self.accept_kw("type"):
                # CREATE TYPE qname AS ( paramdecls ) | type — ref
                # PrestoSql.g4:80, AstStatements.h:348
                name = self.qname()
                self.expect_kw("as")
                if self.accept_op("("):
                    fields: list[tuple[str, str]] = []
                    while True:
                        fields.append((self.ident(), self._type_text()))
                        if not self.accept_op(","):
                            break
                    self.expect_op(")")
                    stmt = ast.CreateTypeStmt(name, None, fields)
                else:
                    stmt = ast.CreateTypeStmt(name, self._type_text())
            elif self.accept_kw("role"):
                # CREATE ROLE name (WITH ADMIN grantor)? — ref
                # PrestoSql.g4:102; grantor is CURRENT_USER |
                # CURRENT_ROLE | [USER|ROLE] identifier (g4:570-581)
                name = self.ident()
                admin = None
                if self.accept_kw("with"):
                    self.expect_kw("admin")
                    if self.accept_kw("current_user"):
                        admin = "current_user"
                    elif self.accept_kw("current_role"):
                        admin = "current_role"
                    else:
                        self.accept_kw("user") or self.accept_kw("role")
                        admin = self.ident()
                stmt = ast.CreateRoleStmt(name, admin)
            elif self.accept_kw("view"):
                name = self.qname()
                self.expect_kw("as")
                stmt = ast.CreateViewStmt(name, self.parse_query(), or_replace)
            else:
                self.expect_kw("table")
                if or_replace:
                    raise ParseError("CREATE OR REPLACE TABLE is not Presto syntax")
                ine = False
                if self.accept_kw("if"):
                    self.expect_kw("not"), self.expect_kw("exists")
                    ine = True
                name = self.qname()
                if self.accept_kw("as"):
                    stmt = ast.CreateTableAsStmt(name, self.parse_query(), ine)
                    if self.accept_kw("with"):
                        no = bool(self.accept_kw("no"))
                        self.expect_kw("data")
                        stmt.with_data = not no
                else:
                    self.expect_op("(")
                    cols: list[tuple[str, str]] = []
                    while True:
                        cols.append((self.ident(), self._type_text()))
                        if not self.accept_op(","):
                            break
                    self.expect_op(")")
                    stmt = ast.CreateTableStmt(name, cols, ine)
        elif self.at_kw("start") and self.at_kw("transaction", ahead=1):
            self.next(), self.next()
            stmt = ast.StartTransactionStmt()
        elif self.accept_kw("begin"):
            stmt = ast.StartTransactionStmt()
        elif self.accept_kw("commit"):
            self.accept_kw("work")
            stmt = ast.CommitStmt()
        elif self.accept_kw("rollback"):
            self.accept_kw("work")
            stmt = ast.RollbackStmt()
        elif self.accept_kw("drop"):
            if self.accept_kw("role"):
                stmt = ast.DropRoleStmt(self.ident())
            elif self.accept_kw("function"):
                ie = False
                if self.accept_kw("if"):
                    self.expect_kw("exists")
                    ie = True
                stmt = ast.DropFunctionStmt(self.qname(), ie)
            elif self.accept_kw("schema"):
                ie = False
                if self.accept_kw("if"):
                    self.expect_kw("exists")
                    ie = True
                name = self.ident()
                cascade = bool(self.accept_kw("cascade"))
                if not cascade:
                    self.accept_kw("restrict")
                stmt = ast.DropSchemaStmt(name, ie, cascade)
            else:
                is_mview = bool(self.accept_kw("materialized"))
                is_view = bool(self.accept_kw("view"))
                if is_mview and not is_view:
                    raise ParseError("expected VIEW after MATERIALIZED")
                if not is_view:
                    self.expect_kw("table")
                ie = False
                if self.accept_kw("if"):
                    self.expect_kw("exists")
                    ie = True
                name = self.qname()
                if is_mview:
                    stmt = ast.DropMViewStmt(name, ie)
                elif is_view:
                    stmt = ast.DropViewStmt(name, ie)
                else:
                    stmt = ast.DropTableStmt(name, ie)
        elif self.accept_kw("explain"):
            # EXPLAIN ANALYZE? VERBOSE? ( '(' TYPE LOGICAL|DISTRIBUTED|
            # VALIDATE|IO [, FORMAT TEXT|JSON|GRAPHVIZ] ')' )? query —
            # reference grammar order (AstStatements.h:597-635 puts
            # ANALYZE/VERBOSE before the option list; ADVICE r09). The
            # nonstandard trailing ANALYZE is still accepted for
            # back-compat with earlier rounds' replay corpus.
            etype: str | None = None
            eformat: str | None = None
            analyze = bool(self.accept_kw("analyze"))
            verbose = bool(self.accept_kw("verbose"))
            if self.accept_op("("):
                while True:
                    if self.accept_kw("type"):
                        etype = self.ident().lower()
                        if etype not in (
                            "logical",
                            "distributed",
                            "validate",
                            "io",
                        ):
                            raise ParseError(f"unknown EXPLAIN TYPE {etype}")
                    elif self.accept_kw("format"):
                        eformat = self.ident().lower()
                        if eformat not in ("text", "json", "graphviz"):
                            raise ParseError(
                                f"unknown EXPLAIN FORMAT {eformat}"
                            )
                    else:
                        raise ParseError("expected TYPE or FORMAT")
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
            analyze = analyze or bool(self.accept_kw("analyze"))
            stmt = ast.ExplainStmt(
                self.parse_query(), analyze, etype, eformat, verbose
            )
        elif self.accept_kw("analyze"):
            stmt = ast.AnalyzeStmt(self.ident())
        elif self.accept_kw("insert"):
            self.expect_kw("into")
            table = self.qname()
            columns: list[str] = []
            if self.at_op("(") and not self.at_kw("select", ahead=1) and not self.at_kw(
                "values", ahead=1
            ) and not self.at_kw("with", ahead=1):
                self.expect_op("(")
                columns.append(self.ident())
                while self.accept_op(","):
                    columns.append(self.ident())
                self.expect_op(")")
            stmt = ast.InsertStmt(table, self.parse_query(), columns)
        elif self.accept_kw("delete"):
            self.expect_kw("from")
            table = self.qname()
            where = self.parse_expr() if self.accept_kw("where") else None
            stmt = ast.DeleteStmt(table, where)
        elif self.accept_kw("update"):
            table = self.qname()
            self.expect_kw("set")
            assignments: list[tuple[str, "ast.Expr"]] = []
            while True:
                col = self.ident()
                self.expect_op("=")
                assignments.append((col, self.parse_expr()))
                if not self.accept_op(","):
                    break
            where = self.parse_expr() if self.accept_kw("where") else None
            stmt = ast.UpdateStmt(table, assignments, where)
        else:
            stmt = self.parse_query()
        if not self.at_op(";") and self.peek().kind != "eof":
            t = self.peek()
            raise ParseError(f"trailing input at {t.pos}: {t.text!r}")
        return stmt

    def _type_text(self) -> str:
        """Column type in a CREATE TABLE definition: a name plus optional
        parenthesized parameters, e.g. ``decimal(12,2)``, ``varchar``."""
        t = self.ident()
        if self.accept_op("("):
            parts: list[str] = []
            while not self.at_op(")"):
                parts.append(self.next().text)
            self.expect_op(")")
            return f"{t}({''.join(parts)})"
        return t

    # -- query ---------------------------------------------------------------
    def parse_query(self) -> ast.Query:
        ctes: list[ast.CTE] = []
        if self.accept_kw("with"):
            if self.at_kw("recursive"):
                raise NotImplementedError("WITH RECURSIVE is not supported")
            while True:
                name = self.ident()
                cols: list[str] = []
                if self.accept_op("("):
                    while True:
                        cols.append(self.ident())
                        if not self.accept_op(","):
                            break
                    self.expect_op(")")
                self.expect_kw("as")
                self.expect_op("(")
                sub = self.parse_query()
                self.expect_op(")")
                ctes.append(ast.CTE(name, sub, cols))
                if not self.accept_op(","):
                    break
        body = self._query_term()
        order_by = self._order_by_opt()
        limit = offset = None
        # Presto puts OFFSET before LIMIT/FETCH; the ANSI/engine-common
        # LIMIT n OFFSET m order is accepted too (same semantics)
        if self.accept_kw("offset"):
            offset = int(self.next().text)
            self.accept_kw("rows") or self.accept_kw("row")
        if self.accept_kw("limit"):
            t = self.next()
            limit = None if t.lower == "all" else int(t.text)
        elif self.accept_kw("fetch"):
            self.accept_kw("first") or self.accept_kw("next")
            limit = int(self.next().text)
            self.accept_kw("rows") or self.accept_kw("row")
            self.expect_kw("only")
        if offset is None and self.accept_kw("offset"):
            offset = int(self.next().text)
            self.accept_kw("rows") or self.accept_kw("row")
        return ast.Query(body, ctes, order_by, limit, offset)

    def _order_by_opt(self) -> list[ast.SortItem]:
        if not (self.at_kw("order") and self.at_kw("by", ahead=1)):
            return []
        self.next(), self.next()
        items = [self._sort_item()]
        while self.accept_op(","):
            items.append(self._sort_item())
        return items

    def _sort_item(self) -> ast.SortItem:
        e = self.parse_expr()
        asc = True
        if self.accept_kw("desc"):
            asc = False
        else:
            self.accept_kw("asc")
        nulls = None
        if self.accept_kw("nulls"):
            nulls = self.next().lower
            if nulls not in ("first", "last"):
                raise ParseError(f"expected FIRST/LAST after NULLS, got {nulls!r}")
        return ast.SortItem(e, asc, nulls)

    def _query_term(self) -> ast.Select | ast.SetOp | ast.Query:
        # INTERSECT binds tighter than UNION/EXCEPT
        left = self._query_intersect()
        while self.at_kw("union", "except"):
            kind = self.next().lower
            all_ = bool(self.accept_kw("all"))
            if not all_:
                self.accept_kw("distinct")
            right = self._query_intersect()
            left = ast.SetOp(kind, all_, left, right)
        return left

    def _query_intersect(self) -> ast.Select | ast.SetOp | ast.Query:
        left = self._query_primary()
        while self.at_kw("intersect"):
            self.next()
            all_ = bool(self.accept_kw("all"))
            if not all_:
                self.accept_kw("distinct")
            right = self._query_primary()
            left = ast.SetOp("intersect", all_, left, right)
        return left

    def _query_primary(self) -> ast.Select | ast.SetOp | ast.Query:
        if self.at_kw("select"):
            return self._query_spec()
        if self.at_kw("values"):
            rows = self._values_rows()
            return ast.Query(
                ast.Select(
                    [ast.SelectItem(ast.Star())],
                    ast.ValuesRel(rows, alias="__v"),
                )
            )
        if self.accept_op("("):
            q = self.parse_query()
            self.expect_op(")")
            return q
        t = self.peek()
        raise ParseError(f"expected SELECT/VALUES/( at {t.pos}, got {t.text!r}")

    def _values_rows(self) -> list[list[ast.Expr]]:
        self.expect_kw("values")
        rows = []
        while True:
            if self.accept_op("("):
                row = [self.parse_expr()]
                while self.accept_op(","):
                    row.append(self.parse_expr())
                self.expect_op(")")
            else:
                row = [self.parse_expr()]
            rows.append(row)
            if not self.accept_op(","):
                break
        return rows

    def _query_spec(self) -> ast.Select:
        self.expect_kw("select")
        distinct = bool(self.accept_kw("distinct"))
        if not distinct:
            self.accept_kw("all")
        items = [self._select_item()]
        while self.accept_op(","):
            items.append(self._select_item())
        from_ = None
        if self.accept_kw("from"):
            from_ = self._relation_list()
        where = self.parse_expr() if self.accept_kw("where") else None
        group_by = None
        if self.at_kw("group") and self.at_kw("by", ahead=1):
            self.next(), self.next()
            group_by = self._group_by()
        having = self.parse_expr() if self.accept_kw("having") else None
        windows: list[tuple[str, ast.WindowSpec]] = []
        if self.accept_kw("window"):
            while True:
                name = self.next().text
                self.expect_kw("as")
                windows.append((name, self._window_spec()))
                if not self.accept_op(","):
                    break
        return ast.Select(
            items, from_, where, group_by, having, distinct, windows
        )

    def _select_item(self) -> ast.SelectItem:
        if self.at_op("*"):
            self.next()
            return ast.SelectItem(ast.Star())
        # qualified star: a.b.*
        save = self.i
        if self.peek().kind in ("id", "qid"):
            parts = []
            try:
                parts.append(self.ident())
                while self.at_op(".") and self.at_op("*", ahead=1):
                    self.next(), self.next()
                    return ast.SelectItem(ast.Star(parts))
                while (
                    self.at_op(".")
                    and self.peek(1).kind in ("id", "qid")
                    and not self.at_op("*", ahead=1)
                ):
                    self.next()
                    parts.append(self.ident())
                    if self.at_op(".") and self.at_op("*", ahead=1):
                        self.next(), self.next()
                        return ast.SelectItem(ast.Star(parts))
            except ParseError:
                pass
            self.i = save
        e = self.parse_expr()
        alias = None
        if self.accept_kw("as"):
            alias = self.ident()
        elif self.peek().kind in ("id", "qid") and not self.at_kw(
            *_RESERVED_AFTER_RELATION, "from", "when", "then", "else", "end",
            "and", "or", "not", "filter", "over", "ignore",
        ):
            alias = self.ident()
        return ast.SelectItem(e, alias)

    def _group_by(self) -> ast.GroupBy:
        if self.at_kw("grouping") and self.at_kw("sets", ahead=1):
            self.next(), self.next()
            self.expect_op("(")
            sets = []
            while True:
                if self.accept_op("("):
                    s: list[ast.Expr] = []
                    if not self.at_op(")"):
                        s.append(self.parse_expr())
                        while self.accept_op(","):
                            s.append(self.parse_expr())
                    self.expect_op(")")
                else:
                    s = [self.parse_expr()]
                sets.append(s)
                if not self.accept_op(","):
                    break
            self.expect_op(")")
            return ast.GroupBy("sets", sets=sets)
        for kind in ("rollup", "cube"):
            if self.at_kw(kind):
                self.next()
                self.expect_op("(")
                items = [self.parse_expr()]
                while self.accept_op(","):
                    items.append(self.parse_expr())
                self.expect_op(")")
                return ast.GroupBy(kind, items=items)
        items = [self.parse_expr()]
        while self.accept_op(","):
            items.append(self.parse_expr())
        return ast.GroupBy("plain", items=items)

    # -- relations -----------------------------------------------------------
    def _relation_list(self) -> ast.Relation:
        rel = self._joined_relation()
        while self.accept_op(","):
            right = self._joined_relation()
            # comma = cross join; UNNEST on the right is implicitly lateral,
            # which the renderer expresses as LATERAL VIEW
            rel = ast.Join("cross", rel, right)
        return rel

    def _joined_relation(self) -> ast.Relation:
        rel = self._sampled_relation()
        while True:
            if self.at_kw("cross") and self.at_kw("join", ahead=1):
                self.next(), self.next()
                right = self._sampled_relation()
                rel = ast.Join("cross", rel, right)
                continue
            kind = None
            save = self.i
            # NATURAL [INNER|LEFT|RIGHT|FULL [OUTER]] JOIN — implicit
            # equi-join on all same-named columns (ref NaturalJoin,
            # axiom/sql/presto/ast/AstRelations.h:477)
            natural = self.accept_kw("natural")
            if self.at_kw(*_JOIN_TYPES):
                kind = self.next().lower
                self.accept_kw("outer")
                if not self.accept_kw("join"):
                    self.i = save
                    break
            elif self.accept_kw("join"):
                kind = "inner"
            elif natural:
                raise ParseError(f"NATURAL requires a JOIN at {self.peek().pos}")
            else:
                break
            if natural:
                right = self._sampled_relation()
                rel = ast.Join(kind, rel, right, natural=True)
                continue
            if self.accept_kw("lateral"):
                raise NotImplementedError(
                    "JOIN LATERAL: use the comma/cross-join lateral subquery form"
                )
            right = self._sampled_relation()
            if isinstance(right, ast.Unnest):
                # Presto spells outer unnest as LEFT JOIN UNNEST(...) ON TRUE
                if self.accept_kw("on"):
                    cond = self.parse_expr()
                    if not (isinstance(cond, ast.Raw) and cond.text == "true"):
                        raise NotImplementedError(
                            "JOIN UNNEST supports only ON TRUE"
                        )
                rel = ast.Join(kind, rel, right)
                continue
            if self.accept_kw("on"):
                on = self.parse_expr()
                rel = ast.Join(kind, rel, right, on=on)
            elif self.accept_kw("using"):
                self.expect_op("(")
                cols = [self.ident()]
                while self.accept_op(","):
                    cols.append(self.ident())
                self.expect_op(")")
                rel = ast.Join(kind, rel, right, using=cols)
            else:
                raise ParseError(
                    f"{kind.upper()} JOIN requires ON or USING at {self.peek().pos}"
                )
        return rel

    def _sampled_relation(self) -> ast.Relation:
        rel = self._aliased_relation()
        if self.accept_kw("tablesample"):
            method = self.next().lower
            if method not in ("bernoulli", "system"):
                raise NotImplementedError(f"TABLESAMPLE {method.upper()}")
            self.expect_op("(")
            pct = self.parse_expr()
            self.expect_op(")")
            rel = ast.TableSample(rel, method, pct)
        return rel

    def _aliased_relation(self) -> ast.Relation:
        rel = self._primary_relation()
        alias = None
        cols: list[str] = []
        if self.accept_kw("as"):
            alias = self.ident()
        elif self.peek().kind in ("id", "qid") and not self.at_kw(
            *_RESERVED_AFTER_RELATION
        ):
            alias = self.ident()
        if alias and self.accept_op("("):
            cols = [self.ident()]
            while self.accept_op(","):
                cols.append(self.ident())
            self.expect_op(")")
        if alias:
            if isinstance(rel, (ast.Table, ast.SubqueryRel, ast.ValuesRel, ast.Unnest)):
                rel.alias = alias
                rel.col_aliases = cols
            else:
                raise ParseError(f"cannot alias {type(rel).__name__}")
        return rel

    def _primary_relation(self) -> ast.Relation:
        if self.at_kw("unnest"):
            self.next()
            self.expect_op("(")
            exprs = [self.parse_expr()]
            while self.accept_op(","):
                exprs.append(self.parse_expr())
            self.expect_op(")")
            ordinality = False
            if self.at_kw("with") and self.at_kw("ordinality", ahead=1):
                self.next(), self.next()
                ordinality = True
            return ast.Unnest(exprs, ordinality)
        if self.at_kw("lateral"):
            self.next()
            self.expect_op("(")
            q = self.parse_query()
            self.expect_op(")")
            return ast.SubqueryRel(q, lateral=True)
        if self.at_kw("values"):
            return ast.ValuesRel(self._values_rows())
        if self.accept_op("("):
            # values / subquery / parenthesized join
            if self.at_kw("values"):
                rows = self._values_rows()
                self.expect_op(")")
                return ast.ValuesRel(rows)
            if self.at_kw("select", "with") or self.at_op("("):
                save = self.i
                try:
                    q = self.parse_query()
                    self.expect_op(")")
                    return ast.SubqueryRel(q)
                except ParseError:
                    self.i = save
            rel = self._relation_list()
            self.expect_op(")")
            return rel
        parts = [self.ident()]
        while self.at_op(".") and self.peek(1).kind in ("id", "qid"):
            self.next()
            parts.append(self.ident())
        tbl = ast.Table(parts)
        # FOR (TIMESTAMP|VERSION) (AS OF|BEFORE) expr — time travel (ref
        # TableVersionExpression, grammar PrestoSql.g4:561-567; the
        # SYSTEM_TIME/SYSTEM_VERSION spellings map to the same two kinds)
        if self.at_kw("for") and self.at_kw(
            "timestamp", "version", "system_time", "system_version", ahead=1
        ):
            self.next()
            kw = self.next().lower
            tbl.version_kind = (
                "timestamp" if kw in ("timestamp", "system_time") else "version"
            )
            if self.accept_kw("before"):
                tbl.version_before = True
            else:
                if not (self.accept_kw("as") and self.accept_kw("of")):
                    raise ParseError(
                        f"expected AS OF or BEFORE at {self.peek().pos}"
                    )
            tbl.version_expr = self.parse_expr()
        return tbl

    # -- expressions ---------------------------------------------------------
    def parse_expr(self) -> ast.Expr:
        return self._or_expr()

    def _or_expr(self) -> ast.Expr:
        left = self._and_expr()
        while self.accept_kw("or"):
            left = ast.BinOp("or", left, self._and_expr())
        return left

    def _and_expr(self) -> ast.Expr:
        left = self._not_expr()
        while self.accept_kw("and"):
            left = ast.BinOp("and", left, self._not_expr())
        return left

    def _not_expr(self) -> ast.Expr:
        if self.accept_kw("not"):
            return ast.UnOp("not", self._not_expr())
        return self._predicate()

    def _predicate(self) -> ast.Expr:
        left = self._value_expr()
        while True:
            if self.at_kw("is"):
                self.next()
                neg = bool(self.accept_kw("not"))
                if self.accept_kw("null"):
                    left = ast.IsNull(left, neg)
                    continue
                if self.accept_kw("distinct"):
                    self.expect_kw("from")
                    left = ast.IsDistinctFrom(left, self._value_expr(), neg)
                    continue
                if self.accept_kw("true"):
                    cmp_ = ast.BinOp("=", left, ast.Raw("true"))
                    left = ast.UnOp("not", cmp_) if neg else cmp_
                    continue
                if self.accept_kw("false"):
                    cmp_ = ast.BinOp("=", left, ast.Raw("false"))
                    left = ast.UnOp("not", cmp_) if neg else cmp_
                    continue
                raise ParseError(f"unsupported IS predicate at {self.peek().pos}")
            neg = False
            save = self.i
            if self.accept_kw("not"):
                if self.at_kw("between", "in", "like"):
                    neg = True
                else:
                    self.i = save
                    break
            if self.accept_kw("between"):
                low = self._value_expr()
                self.expect_kw("and")
                high = self._value_expr()
                left = ast.Between(left, low, high, neg)
                continue
            if self.accept_kw("in"):
                self.expect_op("(")
                if self.at_kw("select", "with") or (
                    self.at_op("(") and self.at_kw("select", "with", ahead=1)
                ):
                    q = self.parse_query()
                    self.expect_op(")")
                    left = ast.InSubquery(left, q, neg)
                else:
                    items = [self.parse_expr()]
                    while self.accept_op(","):
                        items.append(self.parse_expr())
                    self.expect_op(")")
                    left = ast.InList(left, items, neg)
                continue
            if self.accept_kw("like"):
                pat = self._value_expr()
                esc = self._value_expr() if self.accept_kw("escape") else None
                left = ast.Like(left, pat, esc, neg)
                continue
            if self.peek().kind == "op" and self.peek().text in (
                "=", "<>", "!=", "<", ">", "<=", ">=",
            ):
                op = self.next().text
                if op == "!=":
                    op = "<>"
                if self.at_kw("any", "all", "some"):
                    quant = self.next().lower
                    if quant == "some":
                        quant = "any"
                    self.expect_op("(")
                    q = self.parse_query()
                    self.expect_op(")")
                    left = ast.Quantified(op, quant, left, q)
                else:
                    left = ast.BinOp(op, left, self._value_expr())
                continue
            break
        return left

    def _value_expr(self) -> ast.Expr:
        left = self._additive()
        while self.at_op("||"):
            self.next()
            left = ast.BinOp("||", left, self._additive())
        return left

    def _additive(self) -> ast.Expr:
        left = self._multiplicative()
        while self.at_op("+", "-"):
            op = self.next().text
            left = ast.BinOp(op, left, self._multiplicative())
        return left

    def _multiplicative(self) -> ast.Expr:
        left = self._unary()
        while self.at_op("*", "/", "%"):
            op = self.next().text
            left = ast.BinOp(op, left, self._unary())
        return left

    def _unary(self) -> ast.Expr:
        if self.at_op("-", "+"):
            op = self.next().text
            return ast.UnOp(op, self._unary())
        return self._postfix()

    def _postfix(self) -> ast.Expr:
        e = self._primary()
        while True:
            if self.accept_op("["):
                idx = self.parse_expr()
                self.expect_op("]")
                e = ast.Subscript(e, idx)
                continue
            if (
                self.at_kw("at")
                and self.at_kw("time", ahead=1)
                and self.at_kw("zone", ahead=2)
            ):
                self.next(), self.next(), self.next()
                e = ast.AtTimeZone(e, self._primary())
                continue
            if (
                self.at_op(".")
                and self.peek(1).kind in ("id", "qid")
                and not isinstance(e, ast.Ident)
            ):
                self.next()
                e = ast.Deref(e, self.ident())
                continue
            break
        return e

    _TYPED_LIT_TYPES = {
        "double", "real", "bigint", "integer", "smallint", "tinyint",
        "varchar", "decimal", "date", "timestamp", "char", "boolean",
    }

    _INTERVAL_UNITS = {
        "year", "years", "month", "months", "day", "days", "hour", "hours",
        "minute", "minutes", "second", "seconds", "week", "weeks",
    }

    def _primary(self) -> ast.Expr:
        t = self.peek()
        if t.kind == "num":
            return ast.Raw(self.next().text)
        if t.kind == "str":
            return ast.Raw(self.next().text)
        if t.kind == "op" and t.text == "(":
            self.next()
            if self.at_kw("select", "with"):
                q = self.parse_query()
                self.expect_op(")")
                return ast.ScalarSubquery(q)
            # lambda with multiple params: (x, y) -> body
            save = self.i
            if self.peek().kind == "id":
                params = [self.next().text]
                multi = True
                while self.accept_op(","):
                    if self.peek().kind != "id":
                        multi = False
                        break
                    params.append(self.next().text)
                if multi and self.at_op(")") and self.at_op("->", ahead=1):
                    self.next(), self.next()
                    return ast.Lambda(params, self.parse_expr())
                self.i = save
            e = self.parse_expr()
            if self.accept_op(","):
                # row constructor shorthand (a, b) in IN contexts: treat as row
                items = [e, self.parse_expr()]
                while self.accept_op(","):
                    items.append(self.parse_expr())
                self.expect_op(")")
                return ast.RowCtor(items)
            self.expect_op(")")
            return e
        if t.kind == "op" and t.text == "?":
            # positional prepared-statement parameter (ref Parameter,
            # axiom/sql/presto/ast/AstExpressions.h:133); bound by
            # PrestoSession.sql(text, params=[...]) in parse order
            self.next()
            p = ast.Parameter(self.param_count)
            self.param_count += 1
            return p
        if t.kind == "qid":
            return self._name_or_call()
        if t.kind != "id":
            raise ParseError(f"unexpected token {t.text!r} at {t.pos}")
        low = t.lower
        if low in ("null", "true", "false"):
            self.next()
            return ast.Raw(low)
        if low == "case":
            return self._case()
        if low in ("cast", "try_cast"):
            self.next()
            self.expect_op("(")
            e = self.parse_expr()
            self.expect_kw("as")
            type_ = self._type_name()
            self.expect_op(")")
            return ast.Cast(e, type_, try_=low == "try_cast")
        if low == "exists":
            self.next()
            self.expect_op("(")
            q = self.parse_query()
            self.expect_op(")")
            return ast.Exists(q)
        if low == "extract":
            self.next()
            self.expect_op("(")
            unit = self.ident()
            self.expect_kw("from")
            e = self.parse_expr()
            self.expect_op(")")
            return ast.Extract(unit, e)
        if low == "position" and self.at_op("(", ahead=1):
            # position(sub IN str) → strpos(str, sub) → instr
            self.next(), self.next()
            sub = self._value_expr()
            self.expect_kw("in")
            s = self.parse_expr()
            self.expect_op(")")
            return ast.Call("strpos", [s, sub])
        if low == "trim" and self.at_op("(", ahead=1):
            # ANSI trim([BOTH|LEADING|TRAILING] [chars] FROM src); plain
            # trim(expr[, chars]) falls through to the generic call path
            save = self.i
            self.next(), self.next()
            spec = None
            if self.at_kw("both", "leading", "trailing"):
                spec = self.next().lower
            chars = None
            if not self.at_kw("from"):
                chars = self.parse_expr()
            if self.accept_kw("from"):
                src = self.parse_expr()
                self.expect_op(")")
                return ast.TrimForm(spec or "both", chars, src)
            self.i = save
        if low == "interval":
            self.next()
            value = self.next().text  # quoted string or number
            unit = self.ident().lower()
            to_unit = None
            if self.accept_kw("to"):
                to_unit = self.ident().lower()
            return ast.Interval(value, unit, to_unit)
        if low == "array" and self.at_op("[", ahead=1):
            self.next(), self.next()
            items: list[ast.Expr] = []
            if not self.at_op("]"):
                items.append(self.parse_expr())
                while self.accept_op(","):
                    items.append(self.parse_expr())
            self.expect_op("]")
            return ast.ArrayCtor(items)
        if low == "row" and self.at_op("(", ahead=1):
            self.next(), self.next()
            items = [self.parse_expr()]
            while self.accept_op(","):
                items.append(self.parse_expr())
            self.expect_op(")")
            return ast.RowCtor(items)
        if low in self._TYPED_LIT_TYPES and self.peek(1).kind == "str":
            type_ = self.next().text
            value = self.next().text
            return ast.TypedLit(type_, value)
        if low in (
            "current_date", "current_timestamp", "current_time", "localtime",
            "localtimestamp",
        ) and not self.at_op("(", ahead=1):
            self.next()
            # Spark resolves current_* bare, but LOCALTIMESTAMP needs parens
            return ast.Raw("localtimestamp()" if low == "localtimestamp" else low)
        return self._name_or_call()

    def _name_or_call(self) -> ast.Expr:
        parts = [self.ident()]
        while self.at_op(".") and self.peek(1).kind in ("id", "qid"):
            self.next()
            parts.append(self.ident())
        if not self.at_op("("):
            # single-param lambda: x -> body
            if len(parts) == 1 and self.at_op("->"):
                self.next()
                return ast.Lambda(parts, self.parse_expr())
            return ast.Ident(parts)
        self.next()  # consume '('
        name = ".".join(parts)
        distinct = False
        args: list[ast.Expr] = []
        agg_order: list[ast.SortItem] = []
        if self.accept_op("*"):
            args = [ast.Star()]
            self.expect_op(")")
        else:
            if self.accept_kw("distinct"):
                distinct = True
            if not self.at_op(")"):
                args.append(self.parse_expr())
                while self.accept_op(","):
                    args.append(self.parse_expr())
            # ordered aggregate: array_agg(x ORDER BY y) — sort items before ')'
            if self.at_kw("order") and self.at_kw("by", ahead=1):
                self.next(), self.next()
                agg_order.append(self._sort_item())
                while self.accept_op(","):
                    agg_order.append(self._sort_item())
            if self.at_kw("on") and self.at_kw("overflow", ahead=1):
                raise NotImplementedError(
                    "listagg ON OVERFLOW is not supported (default ERROR"
                    " behavior only)"
                )
            self.expect_op(")")
        call = ast.Call(name, args, distinct)
        call.agg_order = agg_order
        # SQL-standard ordered-set aggregate: listagg(...) WITHIN GROUP
        # (ORDER BY ...) — the sort items land in the same agg_order slot
        # as Presto's in-call ORDER BY
        if self.at_kw("within") and self.at_kw("group", ahead=1):
            self.next(), self.next()
            self.expect_op("(")
            self.expect_kw("order")
            self.expect_kw("by")
            call.agg_order.append(self._sort_item())
            while self.accept_op(","):
                call.agg_order.append(self._sort_item())
            self.expect_op(")")
        if self.at_kw("filter"):
            self.next()
            self.expect_op("(")
            self.expect_kw("where")
            call.filter_ = self.parse_expr()
            self.expect_op(")")
        if self.at_kw("ignore") and self.at_kw("nulls", ahead=1):
            self.next(), self.next()
            call.ignore_nulls = True
        elif self.at_kw("respect") and self.at_kw("nulls", ahead=1):
            self.next(), self.next()
        if self.accept_kw("over"):
            if self.at_op("("):
                call.window = self._window_spec()
            else:
                call.window_name = self.next().text  # named WINDOW reference
        return call

    def _window_spec(self) -> ast.WindowSpec:
        self.expect_op("(")
        spec = ast.WindowSpec()
        if self.at_kw("partition") and self.at_kw("by", ahead=1):
            self.next(), self.next()
            spec.partition_by.append(self.parse_expr())
            while self.accept_op(","):
                spec.partition_by.append(self.parse_expr())
        if self.at_kw("order") and self.at_kw("by", ahead=1):
            self.next(), self.next()
            spec.order_by.append(self._sort_item())
            while self.accept_op(","):
                spec.order_by.append(self._sort_item())
        if self.at_kw("rows", "range", "groups"):
            kind = self.next().lower
            if self.accept_kw("between"):
                start = self._frame_bound()
                self.expect_kw("and")
                end = self._frame_bound()
            else:
                start, end = self._frame_bound(), None
            spec.frame = ast.WindowFrame(kind, start, end)
        self.expect_op(")")
        return spec

    def _frame_bound(self) -> str:
        if self.accept_kw("unbounded"):
            which = self.next().lower
            return f"unbounded {which}"
        if self.accept_kw("current"):
            self.expect_kw("row")
            return "current row"
        e = self._value_expr()
        which = self.next().lower
        if which not in ("preceding", "following"):
            raise ParseError(f"expected PRECEDING/FOLLOWING, got {which!r}")
        return f"{e.sql()} {which}"

    def _case(self) -> ast.Expr:
        self.expect_kw("case")
        operand = None
        if not self.at_kw("when"):
            operand = self.parse_expr()
        whens = []
        while self.accept_kw("when"):
            cond = self.parse_expr()
            self.expect_kw("then")
            whens.append((cond, self.parse_expr()))
        else_ = self.parse_expr() if self.accept_kw("else") else None
        self.expect_kw("end")
        return ast.Case(operand, whens, else_)

    def _type_name(self) -> str:
        """Presto type → Spark DDL type, recursively (nested array/map/row,
        optional row field names, ANSI postfix ``T array`` syntax)."""
        t = self._one_type()
        while self.at_kw("array"):  # ANSI postfix: `int array [array ...]`
            self.next()
            t = f"array<{t}>"
        return t

    def _type_opener(self) -> str | None:
        """Consume '(' or '<' if present; return the matching closer."""
        if self.at_op("("):
            self.next()
            return ")"
        if self.at_op("<"):
            self.next()
            return ">"
        return None

    def _one_type(self) -> str:
        base = self.ident().lower()
        if base in ("array", "map", "row"):
            closer = self._type_opener()
            if closer is None:
                return {"row": "struct"}.get(base, base)
            if base == "array":
                inner = self._type_name()
                self.expect_op(closer)
                return f"array<{inner}>"
            if base == "map":
                k = self._type_name()
                self.expect_op(",")
                v = self._type_name()
                self.expect_op(closer)
                return f"map<{k},{v}>"
            fields: list[str] = []
            while True:
                fields.append(self._row_field(len(fields), closer))
                if not self.accept_op(","):
                    break
            self.expect_op(closer)
            return f"struct<{', '.join(fields)}>"
        if base == "decimal" and self.accept_op("("):
            p = self.next().text
            self.expect_op(",")
            s = self.next().text
            self.expect_op(")")
            return f"decimal({p},{s})"
        if base in ("varchar", "char") and self.accept_op("("):
            self.next()  # length — Spark string has no length param
            self.expect_op(")")
            return "string" if base == "varchar" else base
        return {
            "varchar": "string",
            "varbinary": "binary",
            "integer": "int",
            "real": "float",
            # Presto's JSON type is represented as canonical JSON text
            "json": "string",
        }.get(base, base)

    def _row_field(self, idx: int, closer: str) -> str:
        """One row(...) field: `name type` or a bare `type` (anonymous
        fields get deterministic names field0..fieldN-1, the Trino
        convention)."""
        save = self.i
        first = self.ident()
        bare = (
            self.at_op(",")
            or self.at_op(closer)
            or self.at_op("(", "<")  # parameterized type, e.g. decimal(3,2)
            or self.at_kw("array")  # postfix array on an anonymous field
        )
        if bare:
            self.i = save
            return f"field{idx}: {self._type_name()}"
        return f"{first}: {self._type_name()}"


def parse(sql: str) -> ast.Query | ast.ExplainStmt:
    """Parse one Presto SELECT/EXPLAIN statement."""
    return Parser(sql).parse_statement()
