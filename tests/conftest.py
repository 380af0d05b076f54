import duckdb
import pytest

from logzilla_spark.session import get_spark

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, shuffle_partitions=8, app_name="logzilla_tests")
    yield s
    s.stop()


def duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the driver's pre-registered views."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck01():
    return duck(SF01)


@pytest.fixture(scope="session")
def records_sf0001(spark):
    """Parsed records relation over the sf0.001 pages corpus."""
    from logzilla_spark.operators.parse import parse_records
    from logzilla_spark.testdata import ensure_pages

    d = ensure_pages(SF001)
    return parse_records(spark.read.parquet(f"{d}/pages.parquet"))


def canon_rows(pdf):
    """Driver-style canonicalization: sort columns by name, stringify."""
    from collections import Counter

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(lambda v: repr(v) if isinstance(v, float) else str(v))
    return Counter(map(tuple, pdf.values.tolist()))


@pytest.fixture()
def small_advisory(spark):
    """AQE sizes range exchanges (cluster_by staging) to ~64 MB
    partitions; toy corpora then coalesce to ONE file (correct at
    scale, vacuous in a test). Shrink the advisory so clustered writes
    span several files and disjointness/pruning are real properties."""
    keys = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16k",
    }
    old = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        spark.conf.set(k, v)
