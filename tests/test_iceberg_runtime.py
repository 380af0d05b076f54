"""Real-Iceberg deployment swap test (VERDICT r4 next-round #4).

``LocalCatalog`` implements the Iceberg subset the engine needs
(snapshot commits, time travel, incremental/CDC reads, stats/bloom
manifests) and ``iceberg_ddl`` (sources/catalog.py) emits real DDL;
this module proves the swap by running that DDL plus one
append → read → time-travel → delete cycle against a genuine
iceberg-spark runtime and asserting LocalCatalog agrees on content.

Infeasibility note (2026-08-20, this sandbox): no
``iceberg-spark-runtime`` jar exists anywhere on disk (verified with a
filesystem-wide find), pyspark's bundled jars contain no Iceberg
classes, and the container has no network egress (``pip download``
returns "no matching distribution"; Maven coordinates via
``spark.jars.packages`` would need Maven Central). The attempted
mechanisms, in order: (1) locate a vendored jar under the pyspark
wheel / ~/.ivy2 / ~/.m2 — none; (2) pip install pyiceberg — offline
failure; (3) spark.jars.packages org.apache.iceberg:... — requires
egress. These tests therefore RUN WHEREVER a runtime jar is provided
(drop one at ``$SPARK_ICEBERG_JAR`` or into pyspark's jars dir) and
skip with this documented reason here.
"""

import glob
import os

import pytest


def _iceberg_jar() -> str | None:
    env = os.environ.get("SPARK_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hits = glob.glob(os.path.join(jars, "iceberg-spark-runtime*.jar"))
    return hits[0] if hits else None


JAR = _iceberg_jar()

pytestmark = pytest.mark.skipif(
    JAR is None,
    reason="no iceberg-spark-runtime jar on disk and no network to "
    "fetch one (see module docstring, dated note); set "
    "SPARK_ICEBERG_JAR to run the swap proof",
)


@pytest.fixture(scope="module")
def ispark(tmp_path_factory):
    from pyspark.sql import SparkSession

    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    s = (
        SparkSession.builder.master("local[4]")
        .appName("logzilla-iceberg-proof")
        .config("spark.jars", JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.local",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", wh)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_ddl_and_lifecycle_matches_localcatalog(ispark, tmp_path):
    """iceberg_ddl's statements must be valid against the real
    runtime, and an append/read/time-travel/delete cycle must agree
    with LocalCatalog over the same rows."""
    from pyspark.sql import functions as F

    from logzilla_spark.sources.catalog import LocalCatalog, iceberg_ddl
    from logzilla_spark.testdata import ensure_pages

    ispark.sql("CREATE NAMESPACE IF NOT EXISTS local.logzilla")
    for stmt in iceberg_ddl().values():
        ispark.sql(stmt)

    d = ensure_pages("/root/testdata/sf0.001")
    pages = ispark.read.parquet(f"{d}/pages.parquet")
    half = pages.filter(F.xxhash64("url") % 2 == 0)
    rest = pages.filter(F.xxhash64("url") % 2 != 0)

    lcat = LocalCatalog(str(tmp_path / "wh"))

    # append twice -> two snapshots in both engines
    half.writeTo("local.logzilla.pages").append()
    lcat.append(half, "pages")
    rest.writeTo("local.logzilla.pages").append()
    lcat.append(rest, "pages")

    n_all = ispark.table("local.logzilla.pages").count()
    assert n_all == lcat.read(ispark, "pages").count() == pages.count()

    # time travel to the first snapshot
    snaps = ispark.sql(
        "SELECT snapshot_id FROM local.logzilla.pages.snapshots "
        "ORDER BY committed_at"
    ).collect()
    assert len(snaps) == 2
    first = ispark.read.option("snapshot-id", snaps[0].snapshot_id).table(
        "local.logzilla.pages"
    )
    assert first.count() == half.count() == lcat.read(ispark, "pages", 1).count()

    # row-level delete agrees
    some_url = half.select("url").orderBy("url").first().url
    ispark.sql(
        f"DELETE FROM local.logzilla.pages WHERE url = '{some_url}'"
    )
    lcat.delete_where(ispark, "pages", f"url = '{some_url}'")
    assert (
        ispark.table("local.logzilla.pages").count()
        == lcat.read(ispark, "pages").count()
        == n_all - 1
    )
