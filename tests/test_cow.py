"""Copy-on-write DELETE/UPDATE (TableWrite kDelete/kUpdate analog,
ref axiom/connectors/ConnectorMetadata.h:457-627)."""

import os
import uuid

import pyspark.sql.functions as F
import pytest

from verax_spark.sources.cow import delete_rows, update_rows


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / f"t_{uuid.uuid4().hex[:8]}")
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(100)], "id int, bucket int, v double"
    )
    # bucketed repartition → each bucket's rows concentrate in one file
    df.repartition(4, "bucket").write.parquet(path)
    return path


def _files(path):
    return sorted(f for f in os.listdir(path) if f.endswith(".parquet"))


def test_delete_rows_removes_only_matches(spark, table):
    before = _files(table)
    n = delete_rows(spark, table, F.col("bucket") == 2)
    assert n >= 1
    back = spark.read.parquet(table)
    assert back.filter(F.col("bucket") == 2).count() == 0
    assert back.count() == 75
    # untouched files survive in place (file-granular copy-on-write)
    after = _files(table)
    assert len(set(before) & set(after)) == len(before) - n


def test_delete_noop_when_no_match(spark, table):
    before = _files(table)
    assert delete_rows(spark, table, F.col("bucket") == 99) == 0
    assert _files(table) == before
    assert spark.read.parquet(table).count() == 100


def test_update_rows_patches_only_matches(spark, table):
    n = update_rows(
        spark, table, {"v": F.col("v") * 10}, F.col("bucket") == 1
    )
    assert n >= 1
    back = spark.read.parquet(table)
    # matched rows patched, type preserved
    got = {r.id: r.v for r in back.collect()}
    for i in range(100):
        assert got[i] == (i * 10.0 if i % 4 == 1 else float(i))
    assert dict(back.dtypes)["v"] == "double"


def test_dml_with_pinned_schema_identical(spark, table):
    """r10: callers that hold the table schema pass it through so no
    footer-inference job runs — results must be identical to the
    infer-per-call path, including the all-delete schema-pin case."""
    schema = spark.read.parquet(table).schema
    n = delete_rows(spark, table, F.col("bucket") == 2, schema=schema)
    assert n >= 1
    back = spark.read.parquet(table)
    assert back.filter(F.col("bucket") == 2).count() == 0
    assert back.count() == 75
    assert back.schema == schema
    update_rows(
        spark, table, {"v": F.col("v") * 10}, F.col("bucket") == 1,
        schema=schema,
    )
    back = spark.read.parquet(table)
    assert back.schema == schema
    assert back.filter(F.col("bucket") == 1).agg(
        F.min((F.col("v") == F.col("id") * 10.0).cast("int"))
    ).collect()[0][0] == 1
    with pytest.raises(ValueError, match="unknown columns"):
        update_rows(
            spark, table, {"zz": F.lit(1)}, F.col("bucket") == 1,
            schema=schema,
        )


def test_session_schema_pin_cleared_by_flush(spark, table):
    """CALL system.flush_metadata_cache drops the pinned DML schemas, and
    DML keeps working (re-pins) afterwards."""
    from verax_spark.sql import PrestoSession

    sess = PrestoSession(spark)
    sess.register_table("t_pin", table)
    assert table in sess._pinned
    sess.sql("delete from t_pin where bucket = 3")
    assert sess.sql("select count(*) as n from t_pin").collect()[0].n == 75
    sess.sql("call system.flush_metadata_cache()")
    assert sess._pinned == {}
    sess.sql("update t_pin set v = v + 1 where bucket = 0")
    assert table in sess._pinned  # re-pinned on first post-flush read
    assert sess.sql(
        "select cast(sum(v) as double) as s from t_pin where bucket = 0"
    ).collect()[0].s == sum(float(i) + 1 for i in range(100) if i % 4 == 0)


def test_update_unknown_column_raises(spark, table):
    with pytest.raises(ValueError, match="unknown columns"):
        update_rows(spark, table, {"nope": F.lit(1)}, F.col("bucket") == 0)


def test_update_casts_back_to_column_type(spark, table):
    # assignment yields int; column is double — must come back as double
    update_rows(spark, table, {"v": F.lit(7)}, F.col("bucket") == 3)
    back = spark.read.parquet(table)
    assert dict(back.dtypes)["v"] == "double"
    assert back.filter(F.col("bucket") == 3).select(F.min("v")).collect()[0][0] == 7.0


def test_transaction_rollback_and_commit(spark, sf_dir):
    """START TRANSACTION / COMMIT / ROLLBACK (reference
    AstStatements.h:687-713): ROLLBACK restores the exact pre-transaction
    contents via the file-metadata undo log; COMMIT makes mutations
    permanent and drops the undo state."""
    import os
    import tempfile
    import uuid

    import pyspark.sql.functions as F

    from verax_spark.catalog import Catalog
    from verax_spark.sql import PrestoSession

    cat = Catalog(spark, sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"verax_txn_{uuid.uuid4().hex[:8]}")
    (
        cat.nation.select("n_nationkey", "n_name", "n_regionkey")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(path)
    )
    sess = PrestoSession(spark, sf_dir)
    sess.register_table("txn_t", path)

    def state():
        return sorted(
            (r.n_nationkey, r.n_name, r.n_regionkey)
            for r in sess.sql("select * from txn_t").collect()
        )

    original = state()

    # rollback restores everything: insert + delete + update undone
    sess.sql("start transaction")
    sess.sql("insert into txn_t select 990, 'X', 9 ")
    sess.sql("delete from txn_t where n_regionkey = 2")
    sess.sql("update txn_t set n_name = 'ZZZ' where n_regionkey = 0")
    assert state() != original  # mutations visible inside the transaction
    sess.sql("rollback")
    assert state() == original

    # commit makes mutations permanent and cleans the undo dirs
    sess.sql("start transaction")
    sess.sql("delete from txn_t where n_regionkey = 2")
    sess.sql("commit")
    after = state()
    assert len(after) == len(original) - 5
    assert not [d for d in os.listdir(path) if d.startswith("_txn_undo")]

    # error surface
    import pytest as _pytest

    with _pytest.raises(ValueError, match="outside a transaction"):
        sess.sql("commit")
    sess.sql("begin")
    with _pytest.raises(ValueError, match="already in progress"):
        sess.sql("start transaction")
    sess.sql("rollback")
    assert state() == after


def test_transaction_fuzz_against_model(spark, sf_dir):
    """Model-based transaction fuzz: a random sequence of INSERT / DELETE /
    UPDATE / BEGIN / COMMIT / ROLLBACK against the COW table must agree
    with a pure-Python list-of-rows model after every statement."""
    import os
    import random
    import tempfile
    import uuid

    import pyspark.sql.functions as F

    from verax_spark.catalog import Catalog
    from verax_spark.sql import PrestoSession

    rng = random.Random(20260814)
    cat = Catalog(spark, sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"verax_txnfz_{uuid.uuid4().hex[:8]}")
    (
        cat.nation.select("n_nationkey", "n_regionkey")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(path)
    )
    sess = PrestoSession(spark, sf_dir)
    sess.register_table("fz", path)

    model = sorted(
        (r.n_nationkey, r.n_regionkey)
        for r in spark.read.parquet(path).collect()
    )
    saved = None  # model snapshot at BEGIN
    next_id = 1000

    def real():
        return sorted(
            (r.n_nationkey, r.n_regionkey)
            for r in sess.sql("select * from fz").collect()
        )

    for step in range(40):
        op = rng.choice(["ins", "del", "upd", "begin", "commit", "rollback"])
        if op == "ins":
            sess.sql(f"insert into fz select {next_id}, {next_id % 5}")
            model = sorted(model + [(next_id, next_id % 5)])
            next_id += 1
        elif op == "del":
            k = rng.randint(0, 4)
            sess.sql(f"delete from fz where n_regionkey = {k}")
            model = [t for t in model if t[1] != k]
        elif op == "upd":
            k = rng.randint(0, 4)
            sess.sql(
                f"update fz set n_nationkey = n_nationkey + 100 "
                f"where n_regionkey = {k}"
            )
            model = sorted(
                (a + 100, b) if b == k else (a, b) for a, b in model
            )
        elif op == "begin":
            if saved is None:
                sess.sql("begin")
                saved = list(model)
        elif op == "commit":
            if saved is not None:
                sess.sql("commit")
                saved = None
        else:  # rollback
            if saved is not None:
                sess.sql("rollback")
                model, saved = saved, None
        assert real() == sorted(model), f"divergence after step {step} ({op})"
    if saved is not None:
        sess.sql("rollback")
        model = saved
        assert real() == sorted(model)


def test_orphaned_transaction_recovery(spark, sf_dir):
    """A process dying between BEGIN and COMMIT must not silently commit:
    register_table() rolls back leftover _txn_undo_* state (added files
    deleted via the on-disk manifest, superseded files restored)."""
    import os
    import tempfile
    import uuid

    from verax_spark.catalog import Catalog
    from verax_spark.sql import PrestoSession

    cat = Catalog(spark, sf_dir)
    path = os.path.join(
        tempfile.gettempdir(), f"verax_orph_{uuid.uuid4().hex[:8]}"
    )
    (
        cat.nation.select("n_nationkey", "n_name", "n_regionkey")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(path)
    )
    sess = PrestoSession(spark, sf_dir)
    sess.register_table("orph_t", path)
    original = sorted(
        (r.n_nationkey, r.n_regionkey)
        for r in sess.sql("select n_nationkey, n_regionkey from orph_t").collect()
    )
    sess.sql("start transaction")
    sess.sql("insert into orph_t select 990, 'X', 9")
    sess.sql("delete from orph_t where n_regionkey = 2")
    # simulate a crash: drop the session without COMMIT/ROLLBACK; the undo
    # dirs (with the added-file manifest) stay on disk
    undo_dirs = [n for n in os.listdir(path) if n.startswith("_txn_undo_")]
    assert undo_dirs, "transaction should have left undo state"
    del sess

    sess2 = PrestoSession(spark, sf_dir)
    sess2.register_table("orph_t", path)  # recovery happens here
    assert not any(n.startswith("_txn_undo_") for n in os.listdir(path))
    recovered = sorted(
        (r.n_nationkey, r.n_regionkey)
        for r in sess2.sql(
            "select n_nationkey, n_regionkey from orph_t"
        ).collect()
    )
    assert recovered == original


def test_drop_table_inside_transaction_forbidden(spark, sf_dir):
    """DROP TABLE of a table mutated in the open transaction is rejected
    (its directory holds the undo files a later ROLLBACK needs)."""
    import os
    import tempfile
    import uuid

    import pytest as _pytest

    from verax_spark.catalog import Catalog
    from verax_spark.sql import PrestoSession

    cat = Catalog(spark, sf_dir)
    path = os.path.join(
        tempfile.gettempdir(), f"verax_droptxn_{uuid.uuid4().hex[:8]}"
    )
    cat.nation.select("n_nationkey", "n_regionkey").write.mode(
        "overwrite"
    ).parquet(path)
    sess = PrestoSession(spark, sf_dir)
    sess.register_table("droptxn_t", path)
    sess.sql("start transaction")
    sess.sql("delete from droptxn_t where n_regionkey = 1")
    with _pytest.raises(ValueError, match="open transaction"):
        sess.sql("drop table droptxn_t")
    sess.sql("rollback")  # still consistent: rollback works after the refusal
    assert sess.sql("select count(*) as c from droptxn_t").collect()[0].c == 25
    sess.sql("drop table droptxn_t")  # allowed once the txn is closed
