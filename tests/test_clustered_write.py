"""Clustered writes (catalog cluster_by / route cluster_by): the
MergeTree ORDER BY / Iceberg write.sort-order analog, for real.

Gates:
- cluster_by produces parquet files whose footer min/max ranges on the
  cluster key are pairwise DISJOINT (that disjointness IS the file-
  skipping guarantee for range reads); the unclustered control write
  of the same rows overlaps, so the assertion has teeth;
- row content is unchanged (clustering reorders, never rewrites);
- the single-pass route fan-out composes with clustering: per-sink
  files disjoint on (source, timestamp), union set-equality intact.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.parse import parse_records
from logzilla_spark.operators.route import (
    read_all_sinks,
    route_to_sinks_single_pass,
    sink_name,
)
from logzilla_spark.schemas import CATEGORIES
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.testdata import ensure_pages, pages_parquet

SF001 = "/root/testdata/sf0.001"


def _footer_ranges(files: list[str], col: str) -> list[tuple]:
    """(min, max) of ``col`` per parquet file, from footer stats only."""
    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        # parquet leaf columns flatten nested types (the metadata map),
        # so locate the leaf by path, not by arrow field index
        idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == col
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def _overlaps(ranges: list[tuple]) -> int:
    r = sorted(ranges)
    return sum(1 for a, b in zip(r, r[1:]) if b[0] < a[1])


@pytest.fixture(scope="module")
def records(spark):
    ensure_pages(SF001)
    df = parse_records(
        spark.read.parquet(pages_parquet(SF001)), impl="arrow"
    )
    # >1 output file so disjointness is a real property
    return df.repartition(8)


def test_cluster_by_makes_footer_ranges_disjoint(
    spark, tmp_path, records, small_advisory
):
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.overwrite(records, "plain")
    cat.overwrite(records, "clustered", cluster_by=["timestamp"])

    plain_files = [
        f.removeprefix("file:") for f in cat.read(spark, "plain").inputFiles()
    ]
    plain = _footer_ranges(plain_files, "timestamp")
    clus_files = [
        f.removeprefix("file:") for f in cat.read(spark, "clustered").inputFiles()
    ]
    clus = _footer_ranges(clus_files, "timestamp")
    assert len(clus) > 1, "clustered table wrote a single file"
    assert _overlaps(clus) == 0, f"clustered ranges overlap: {clus}"
    # control: the unclustered write of the same rows overlaps, so the
    # zero above is not vacuous
    assert _overlaps(plain) > 0, "control write unexpectedly disjoint"


def test_cluster_by_preserves_content(spark, tmp_path, records):
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.overwrite(records, "clustered", cluster_by=["timestamp"])
    got = sorted(r["id"] for r in cat.read(spark, "clustered").select("id").collect())
    want = sorted(r["id"] for r in records.select("id").collect())
    assert got == want


def test_single_pass_route_with_clustering(
    spark, tmp_path, records, small_advisory
):
    cat = LocalCatalog(str(tmp_path / "wh"))
    route_to_sinks_single_pass(
        records, cat, run_id="t", cluster_by=["source", "timestamp"]
    )
    # set equality: union of sinks == input (the G3 invariant survives)
    got = {r["id"] for r in read_all_sinks(spark, cat).select("id").collect()}
    want = {r["id"] for r in records.select("id").collect()}
    assert got == want
    # per-sink files disjoint on source (the leading sort key)
    for c in CATEGORIES:
        if not cat.exists(sink_name(c)):
            continue
        files = [
            f.removeprefix("file:")
            for f in cat.read(spark, sink_name(c)).inputFiles()
        ]
        if len(files) < 2:
            continue
        ranges = _footer_ranges(files, "source")
        assert _overlaps(ranges) == 0, (c, ranges)
