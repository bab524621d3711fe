"""Time travel: FOR (TIMESTAMP|VERSION) (AS OF|BEFORE) over writable
tables (ref TableVersionExpression, axiom/sql/presto/ast/AstFunctions.h:535;
grammar axiom/sql/presto/grammar/PrestoSql.g4:561-567), backed by the
file-manifest version log in sources/versions.py."""

import os
import time
import uuid

import pytest

from verax_spark.sources import versions
from verax_spark.sql import PrestoSession


@pytest.fixture()
def sess(spark, sf_dir, tmp_path):
    s = PrestoSession(spark, sf_dir)
    path = str(tmp_path / f"tt_{uuid.uuid4().hex[:8]}")
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(10)], "id int, name string"
    ).repartition(2).write.parquet(path)
    s.register_table("tt", path)
    return s, path


def test_version_log_snapshots_each_dml(sess):
    s, path = sess
    assert versions.current_version(path) == 0
    s.sql("insert into tt values (100, 'x'), (101, 'y')")
    s.sql("delete from tt where id < 5")
    s.sql("update tt set name = 'zzz' where id = 100")
    assert versions.current_version(path) == 3
    n = lambda q: s.sql(q).collect()[0].n
    assert n("select count(*) as n from tt") == 7
    assert n("select count(*) as n from tt for version as of 0") == 10
    assert n("select count(*) as n from tt for version as of 1") == 12
    assert n("select count(*) as n from tt for version as of 2") == 7
    # BEFORE = strictly older than the bound
    assert n("select count(*) as n from tt for version before 1") == 10
    # the update is visible only from v3
    name = lambda v: s.sql(
        f"select name from tt for version as of {v} where id = 100"
    ).collect()[0].name
    assert name(2) == "x" and name(3) == "zzz"


def test_timestamp_as_of_and_version_diff(sess):
    s, path = sess
    s.sql("insert into tt values (100, 'x')")
    t_mid = time.time()
    time.sleep(0.05)
    s.sql("delete from tt where id >= 100")
    assert (
        s.sql(
            f"select count(*) as n from tt for timestamp as of {t_mid}"
        ).collect()[0].n
        == 11
    )
    # two snapshots of the same table in one query
    gone = s.sql(
        "select id from tt for version as of 1 "
        "except select id from tt for version as of 2 order by id"
    ).collect()
    assert [r.id for r in gone] == [100]


def test_transaction_commits_one_version_rollback_none(sess):
    s, path = sess
    s.sql("start transaction")
    s.sql("delete from tt where id = 0")
    s.sql("insert into tt values (200, 'w')")
    s.sql("commit")
    # two DMLs, ONE snapshot: the txn is atomic in the history
    assert versions.current_version(path) == 1
    assert (
        s.sql("select count(*) as n from tt for version as of 1").collect()[0].n
        == 10
    )
    assert (
        s.sql("select count(*) as n from tt for version as of 0").collect()[0].n
        == 10
    )
    s.sql("start transaction")
    s.sql("delete from tt where id = 200")
    s.sql("rollback")
    assert versions.current_version(path) == 1
    assert s.sql("select count(*) as n from tt").collect()[0].n == 10


def test_vacuum_bounds_history(sess):
    s, path = sess
    s.sql("delete from tt where id < 3")
    s.sql("delete from tt where id < 6")
    assert versions.current_version(path) == 2
    s.sql("call system.vacuum('tt', 1)")
    # newest snapshot stays readable; vacuumed ones error loudly
    assert (
        s.sql("select count(*) as n from tt for version as of 2").collect()[0].n
        == 4
    )
    with pytest.raises(Exception, match="not in history"):
        s.sql("select * from tt for version as of 0").collect()
    # retired files not referenced by the survivor are gone from disk
    retired = os.path.join(path, "_versions", "retired")
    assert all(
        f in versions.files_at(path, version=2)
        or not f.endswith(".parquet")
        for f in (os.path.join(retired, n) for n in os.listdir(retired))
    )


def test_unversioned_transpile_raises(sf_dir):
    from verax_spark.sql.parser import parse

    stmt = parse("select * from t for version as of 1")
    with pytest.raises(NotImplementedError, match="version log"):
        stmt.sql()
