"""Live template table (streaming/templates.py).

Differential contract: a multi-trigger stream lands (a) EXACT batch
counts and examples (mine_templates), and (b) a variant estimate
BIT-IDENTICAL to the batch HLL sketch over the same lines — max-merge
associativity makes the trigger split invisible. Plus replay safety
(the count merge is additive, so the committed-map guard is load-
bearing here, unlike the idempotent pure-sketch sink).
"""

from __future__ import annotations

import os

from logzilla_spark.operators.parse import explode_lines
from logzilla_spark.operators.sketches import (
    hll_estimate_from_registers,
    hll_registers,
)
from logzilla_spark.operators.templates import mine_templates
from logzilla_spark.schemas import PAGES_SCHEMA
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.templates import (
    read_templates,
    start_templates_stream,
    upsert_templates_batch,
)

from .test_streaming import staged_pages  # noqa: F401 (fixture reuse)

import pyspark.sql.functions as F


def _batch_expect(spark, in_dir):
    lines = explode_lines(spark.read.schema(PAGES_SCHEMA).parquet(in_dir))
    exact = {
        (r["template"], r["n_tokens"]): (r["n"], r["example"])
        for r in mine_templates(lines).collect()
    }
    masked = lines.select(
        F.array_join(
            F.transform(
                F.split("line", " ", -1),
                lambda t: F.when(t.rlike("[0-9]"), F.lit("<*>")).otherwise(t),
            ),
            " ",
        ).alias("template"),
        F.size(F.split("line", " ", -1)).cast("bigint").alias("n_tokens"),
        F.col("line"),
    )
    est = {
        (r["template"], r["n_tokens"]): r["est_distinct"]
        for r in hll_estimate_from_registers(
            hll_registers(masked, ["template", "n_tokens"], "line"),
            ["template", "n_tokens"],
        ).collect()
    }
    return exact, est


def test_stream_matches_batch_bit_exactly(spark, staged_pages):  # noqa: F811
    base, in_dir = staged_pages
    wh = os.path.join(base, "wh_templates")
    q = start_templates_stream(
        spark,
        in_dir,
        wh,
        os.path.join(base, "ckpt_templates"),
        max_files_per_trigger=1,  # 3 micro-batches
    )
    q.awaitTermination(timeout=300)

    got = {
        (r["template"], r["n_tokens"]): (r["n"], r["example"], r["est_variants"])
        for r in read_templates(spark, LocalCatalog(wh)).collect()
    }
    exact, est = _batch_expect(spark, in_dir)
    assert set(got) == set(exact)
    for k, (n, example, est_variants) in got.items():
        assert (n, example) == exact[k]
        # HLL estimate: BIT-identical doubles, not approximately equal
        assert est_variants == est[k]


def test_replayed_epoch_does_not_double_count(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    lines = spark.createDataFrame(
        [("a 1",), ("a 2",), ("b",)], ["line"]
    )
    assert upsert_templates_batch(spark, cat, lines, 0) is True
    assert upsert_templates_batch(spark, cat, lines, 0) is False  # replay
    got = {
        r["template"]: (r["n"], r["est_variants"])
        for r in read_templates(spark, cat).collect()
    }
    assert got["a <*>"][0] == 2 and got["b"][0] == 1

    # a genuinely new epoch merges: counts add, variants dedup
    lines2 = spark.createDataFrame([("a 1",), ("a 9",)], ["line"])
    assert upsert_templates_batch(spark, cat, lines2, 1) is True
    got = {
        r["template"]: (r["n"], r["example"])
        for r in read_templates(spark, cat).collect()
    }
    assert got["a <*>"] == (4, "a 1")
