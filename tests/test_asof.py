"""As-of join (operators/asof.py, T35) vs DuckDB's native ASOF JOIN.

DuckDB implements the textbook semantics (latest right row with
r.ts <= l.ts per key, LEFT OUTER), so it is a true independent oracle:
same inputs, different engine, different algorithm (DuckDB plans a
specialized asof operator; ours is a union-merge window carry)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.asof import asof_join
from tests.conftest import SF001, canon_rows, duck


def _t(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def toy(spark):
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "ts": [_t(5), _t(8), _t(8), _t(3), _t(9), _t(1)],
            "ev": ["a", "b", "c", "d", "e", "f"],
        }
    )
    # a right row with a NULL value column (y) is still a MATCH for
    # later left rows — the struct carry must not skip past it
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 9],
            "ts": [_t(5), _t(7), _t(4), _t(0)],
            "val": [10.0, None, 30.0, 99.0],
            "tag": ["x", "y", "z", "w"],
        }
    )
    return left, right, spark.createDataFrame(left), spark.createDataFrame(right)


def _duck_asof(left, right, op: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.register("L", left)
    con.register("R", right)
    return con.execute(
        f"""
SELECT L.k AS k, L.ts AS ts, L.ev AS ev,
       R.ts AS matched_ts, R.val AS val, R.tag AS tag
FROM L ASOF LEFT JOIN R ON L.k = R.k AND L.ts {op} R.ts"""
    ).df()


def test_backward_inclusive_matches_duckdb(toy):
    left, right, l, r = toy
    out = asof_join(l, r, ["k"], "ts", "ts", ["val", "tag"]).toPandas()
    assert canon_rows(out) == canon_rows(_duck_asof(left, right, ">="))


def test_strict_matches_duckdb(toy):
    left, right, l, r = toy
    out = asof_join(
        l, r, ["k"], "ts", "ts", ["val", "tag"], allow_exact_matches=False
    ).toPandas()
    assert canon_rows(out) == canon_rows(_duck_asof(left, right, ">"))


def test_tolerance_nulls_stale_matches(toy):
    _, _, l, r = toy
    out = (
        asof_join(l, r, ["k"], "ts", "ts", ["val"], tolerance_s=1.0)
        .orderBy("k", "ts", "ev")
        .toPandas()
    )
    by_ev = {row.ev: row for row in out.itertuples()}
    # k=1 ts=5: marker at ts=5 (age 0 <= 1s) -> kept
    assert by_ev["a"].matched_ts == _t(5) and by_ev["a"].val == 10.0
    # k=1 ts=8: latest marker ts=7, age 1s -> kept (inclusive bound)
    assert by_ev["b"].matched_ts == _t(7)
    # k=2 ts=9: latest marker ts=4, age 5s > 1s -> nulled
    assert pd.isnull(by_ev["e"].matched_ts) and pd.isnull(by_ev["e"].val)
    # never-matched row stays null
    assert pd.isnull(by_ev["f"].matched_ts)


def test_null_right_value_is_still_a_match(toy):
    _, _, l, r = toy
    out = asof_join(l, r, ["k"], "ts", "ts", ["val", "tag"]).toPandas()
    row = out[out.ev == "b"].iloc[0]
    # the ts=7 marker has val=NULL: the match must be THAT row (tag y,
    # val null), not the older ts=5 row with a non-null val
    assert row.matched_ts == _t(7)
    assert pd.isnull(row.val)
    assert row.tag == "y"


def test_column_collision_raises(toy):
    _, _, l, r = toy
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r.withColumnRenamed("val", "ev"), ["k"], "ts", "ts", ["ev"])


def test_default_right_cols_and_plan_shape(toy, spark):
    _, _, l, r = toy
    out = asof_join(l, r, ["k"])  # right_cols inferred: val, tag
    assert out.columns == ["k", "ts", "ev", "matched_ts", "val", "tag"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange on the keys (union-merge), never a join/cartesian
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_events_asof_vs_duckdb_sf0001(spark):
    """The registered q_events_asof shape at sf0.001 against DuckDB's
    ASOF JOIN over the same parquet bytes (the sf0.01 run is the
    driver's correctness gate; this is the in-suite pin)."""
    import __spark_entry__ as entry

    out = entry.queries()["q_events_asof"](spark, SF001).toPandas()
    ref = duck(SF001).execute(entry.oracle_sql()["q_events_asof"]).df()
    assert canon_rows(out) == canon_rows(ref)
