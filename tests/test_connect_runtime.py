"""Spark Connect execution proof (VERDICT r4 next-round #3).

The package is ``.rdd``-free by lint (tests/test_plan_lint.py walks
every registered query), which *claims* Connect-safety; this module
*proves* it by executing a representative operator slice against a
``spark.remote`` session — pyspark 4 ships a local Connect server
(spark-connect_2.13 jar is in the wheel), so no cluster is needed.

Infeasibility note (2026-08-20, this sandbox): the Python Connect
client hard-requires ``grpcio >= 1.48.1`` (pyspark/sql/connect/utils
.py raises PACKAGE_NOT_INSTALLED), grpcio is not baked into the
container, and both ``pip install grpcio`` and ``pip download grpcio``
fail with "no matching distribution" (no network egress). The server
jar is present; only the client transport is missing. These tests are
therefore written to RUN WHEREVER grpcio exists and to skip with this
documented reason here — add grpcio and the proof executes unchanged:

    python -m pytest tests/test_connect_runtime.py -q
"""

import importlib.util

import pytest

HAVE_GRPC = importlib.util.find_spec("grpc") is not None

pytestmark = pytest.mark.skipif(
    not HAVE_GRPC,
    reason="grpcio absent and uninstallable offline (see module "
    "docstring, dated note) — the local Connect server jar ships with "
    "pyspark but the Python client cannot start without grpc",
)


@pytest.fixture(scope="module")
def cspark():
    """A Spark Connect session against the in-process local server."""
    import os

    os.environ.setdefault("SPARK_CONNECT_MODE_ENABLED", "1")
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.remote("local[4]")
        .appName("logzilla-connect-proof")
        .getOrCreate()
    )
    # the operator suite assumes UTC and a modest shuffle width, same
    # as logzilla_spark.session.get_spark
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s
    s.stop()


def _is_connect(spark) -> bool:
    return "connect" in type(spark).__module__


def test_session_is_connect(cspark):
    assert _is_connect(cspark)


def test_parse_records_runs_under_connect(cspark):
    """The Arrow-UDF parse stage — the hot path — must execute over
    the Connect protocol (it is pure DataFrame + pandas UDF, no _jdf,
    no .rdd)."""
    from logzilla_spark.operators.parse import parse_records
    from logzilla_spark.testdata import ensure_pages

    d = ensure_pages("/root/testdata/sf0.001")
    pages = cspark.read.parquet(f"{d}/pages.parquet")
    rec = parse_records(pages, impl="arrow")
    n = rec.count()
    assert n > 0
    assert rec.filter("category = 'unparsed'").count() < n


def test_registry_slice_matches_classic(cspark, spark):
    """A cross-family slice of queries() executes under Connect and
    returns the same sorted value multiset as the classic session —
    covering window functions, broadcast joins, sketches, search, and
    range queries."""
    import __spark_entry__ as entry

    from .conftest import SF001, canon_rows

    qs = entry.queries()
    for name in [
        "q_pipeline_window_agg",
        "q_join_revenue_by_segment",
        "q_sketch_hll_users",
        "q_search_dsl",
        "q_range_rate",
        "q_dedup_exact",
    ]:
        got = canon_rows(qs[name](cspark, SF001).toPandas())
        want = canon_rows(qs[name](spark, SF001).toPandas())
        assert got == want, name
