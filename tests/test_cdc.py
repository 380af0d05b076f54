"""Row-level change feed (catalog.changes_between, T40).

Semantics bar: the feed between snapshots A and B must equal the
multiset difference of the two table states — inserts = B∖A, deletes =
A∖B — regardless of HOW the files churned (append, copy-on-write
delete/merge rewrites, compaction)."""

import pytest
from pyspark.sql import functions as F

from logzilla_spark.sources.catalog import LocalCatalog
from tests.conftest import SF001, canon_rows


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture()
def cat(spark, docs, tmp_path):
    c = LocalCatalog(str(tmp_path / "wh"))
    c.overwrite(docs.repartition(8), "docs", cluster_by=["doc_id"])
    return c


def _feed(spark, cat, frm, to=None):
    df = cat.changes_between(spark, "docs", frm, to).toPandas()
    ins = df[df._change_type == "insert"].drop(columns="_change_type")
    del_ = df[df._change_type == "delete"].drop(columns="_change_type")
    return ins, del_


def test_append_only_feed_is_pure_inserts(spark, docs, cat):
    added = docs.withColumn("doc_id", F.col("doc_id") + 10_000)
    cat.append(added.repartition(4), "docs")
    ins, dels = _feed(spark, cat, 1)
    assert len(dels) == 0
    assert canon_rows(ins) == canon_rows(added.toPandas())


def test_delete_feed_is_exactly_the_deleted_rows(spark, docs, cat):
    cat.delete_where(spark, "docs", "doc_id % 5 = 0")
    ins, dels = _feed(spark, cat, 1)
    # rows the rewrite merely copied through MUST cancel
    assert len(ins) == 0
    assert canon_rows(dels) == canon_rows(
        docs.filter("doc_id % 5 = 0").toPandas()
    )


def test_update_surfaces_as_delete_insert_pair(spark, docs, cat):
    recrawl = (
        docs.filter("doc_id % 7 = 0")
        .withColumn("text", F.concat(F.lit("v2: "), F.col("text")))
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    cat.merge_upsert(spark, recrawl, "docs", keys=["doc_id"])
    ins, dels = _feed(spark, cat, 1)
    assert canon_rows(ins) == canon_rows(recrawl.toPandas())
    assert canon_rows(dels) == canon_rows(
        docs.filter("doc_id % 7 = 0").toPandas()
    )


def test_compaction_yields_empty_feed(spark, docs, cat):
    for i in range(3):
        cat.append(
            docs.filter(f"doc_id % 3 = {i}").withColumn(
                "doc_id", F.col("doc_id") + 20_000
            ),
            "docs",
        )
    frm = cat.last_snapshot_id("docs")
    cat.compact(spark, "docs")
    feed = cat.changes_between(spark, "docs", frm)
    assert feed.count() == 0


def test_identical_snapshots_empty_and_schema(spark, cat):
    sid = cat.last_snapshot_id("docs")
    feed = cat.changes_between(spark, "docs", sid, sid)
    assert feed.count() == 0
    assert feed.columns[-1] == "_change_type"


def test_feed_equals_state_diff_after_arbitrary_churn(spark, docs, cat):
    """The invariant, end-to-end: after a mixed sequence the feed IS
    the state diff."""
    state0 = cat.read(spark, "docs").toPandas()
    cat.delete_where(spark, "docs", "lang = 'de'")
    cat.append(
        docs.filter("doc_id < 50").withColumn("doc_id", F.col("doc_id") + 30_000),
        "docs",
    )
    recrawl = docs.filter("doc_id % 11 = 0").withColumn(
        "source", F.lit("recrawl")
    )
    cat.merge_upsert(spark, recrawl, "docs", keys=["doc_id"])
    stateN = cat.read(spark, "docs").toPandas()

    ins, dels = _feed(spark, cat, 1)
    c0, cN = canon_rows(state0), canon_rows(stateN)
    assert canon_rows(ins) == cN - c0
    assert canon_rows(dels) == c0 - cN
