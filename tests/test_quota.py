"""Per-key ingest quotas (operators/quota.py, T77)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.quota import (
    ingest_quota,
    ingest_quota_sql,
    quota_summary,
)

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def toy(spark):
    rows = []
    # svcA: 10 rows/hour for 2 hours (hot); svcB: 2 rows/hour
    for h in range(2):
        for i in range(10):
            rows.append(
                (f"a{h:02d}{i:02d}", T0 + dt.timedelta(hours=h, minutes=i),
                 "svcA", f"m{i}")
            )
        for i in range(2):
            rows.append(
                (f"b{h:02d}{i:02d}", T0 + dt.timedelta(hours=h, minutes=i),
                 "svcB", f"m{i}")
            )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "timestamp", "source", "message"]),
        schema="id string, timestamp timestamp, source string, message string",
    )


def test_first_n_admitted_per_key_window(toy):
    got = ingest_quota(toy, 3).toPandas()
    assert len(got) == len(toy.toPandas())  # never-drop: tag only
    a0 = got[(got.source == "svcA")
             & (got.timestamp < T0 + dt.timedelta(hours=1))]
    admitted = set(a0[~a0.over_quota].id)
    assert admitted == {"a0000", "a0001", "a0002"}  # first 3 by (ts, id)
    # quota resets each window
    a1 = got[(got.source == "svcA")
             & (got.timestamp >= T0 + dt.timedelta(hours=1))]
    assert (~a1.over_quota).sum() == 3
    # under-quota key untouched
    b = got[got.source == "svcB"]
    assert not b.over_quota.any()


def test_timestamp_tie_breaks_on_id(spark):
    rows = [(f"x{i}", T0, "s", "m") for i in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "timestamp", "source", "message"]),
        schema="id string, timestamp timestamp, source string, message string",
    )
    got = ingest_quota(df, 2).toPandas()
    assert set(got[~got.over_quota].id) == {"x0", "x1"}


def test_prebound_phase_is_transparent(toy):
    """The two-phase plan equals the naive one-phase global rule for
    EVERY partitioning of the input."""
    want = ingest_quota(toy.coalesce(1), 3).toPandas()
    want = want.sort_values("id").reset_index(drop=True)
    for parts in (2, 7):
        got = (
            ingest_quota(toy.repartition(parts), 3)
            .toPandas().sort_values("id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_salt_fanout_is_result_transparent_and_conf_driven(toy):
    """VERDICT r4 nit: N_SALTS as a constant forced 64-way pre-rank
    groups on small deployments. The width is now a parameter / conf;
    the admitted set must be identical at any value."""
    from logzilla_spark.operators.quota import N_SALTS_CONF

    want = ingest_quota(toy, 3).toPandas().sort_values("id").reset_index(drop=True)
    for n in (1, 4, 128):
        got = (
            ingest_quota(toy, 3, n_salts=n)
            .toPandas().sort_values("id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    spark = toy.sparkSession
    spark.conf.set(N_SALTS_CONF, "4")
    try:
        got = (
            ingest_quota(toy, 3)
            .toPandas().sort_values("id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    finally:
        spark.conf.unset(N_SALTS_CONF)
    with pytest.raises(ValueError, match="n_salts"):
        ingest_quota(toy, 3, n_salts=0)


def test_twin_parity(toy, tmp_path):
    import duckdb

    pq = str(tmp_path / "toy.parquet")
    toy.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW r AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    got = (
        ingest_quota(toy.repartition(3), 4)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    want = (
        con.execute(ingest_quota_sql("r", 4)).df()
        .sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_summary_and_validation(toy):
    s = quota_summary(ingest_quota(toy, 3)).toPandas().set_index("source")
    assert s.loc["svcA"].n_admitted == 6 and s.loc["svcA"].n_over == 14
    assert s.loc["svcB"].n_admitted == 4 and s.loc["svcB"].n_over == 0
    with pytest.raises(ValueError, match="quota"):
        ingest_quota(toy, 0)
    with pytest.raises(ValueError, match="window"):
        ingest_quota(toy, 1, window="fortnight")


# -- T79: config-declared quota in the pipeline ------------------------


def test_pipeline_routes_overflow_to_throttled(spark, tmp_path):
    import textwrap

    from logzilla_spark.config import build_pipeline, load_config
    from logzilla_spark.operators.parse import parse_records
    from logzilla_spark.operators.quota import ingest_quota
    from logzilla_spark.sources.catalog import LocalCatalog
    from logzilla_spark.testdata import ensure_pages

    from .conftest import SF001

    d = ensure_pages(SF001)
    cfgp = tmp_path / "c.toml"
    cfgp.write_text(textwrap.dedent(f"""
        [pipeline]
        warehouse = "{tmp_path}/wh"
        parse_impl = "native"

        [source]
        pages = "{d}/pages.parquet"

        [quota]
        quota = 1
        window = "hour"
    """))
    pipe = build_pipeline(spark, load_config(str(cfgp)))
    assert "throttled" in pipe.categories
    pipe.run()
    cat = LocalCatalog(f"{tmp_path}/wh")
    throttled = cat.read(spark, "sink_throttled")
    n_throttled = throttled.count()
    # differential: the pipeline's throttled set == the batch operator
    # applied to the same parsed records
    rec = parse_records(spark.read.parquet(f"{d}/pages.parquet"), impl="native")
    want = ingest_quota(
        rec.select("id", "timestamp", "source"), 1
    ).filter("over_quota")
    assert n_throttled == want.count()
    want_ids = {r.id for r in want.select("id").collect()}
    got_ids = {r.id for r in throttled.select("id").collect()}
    assert got_ids == want_ids
    # the admitted sinks are over-quota-free and the union is complete
    from logzilla_spark.sources.catalog import SnapshotError

    def _n(c):
        try:
            return cat.read(spark, f"sink_{c}").count()
        except SnapshotError:
            return 0  # category saw no rows (schema-only snapshot)

    total = sum(_n(c) for c in pipe.categories)
    assert total == rec.count()
    # aggregation covers the throttled sink like any category
    assert cat.read(spark, "agg_throttled").count() > 0


def test_pipeline_quota_spend_persists_across_runs(spark, tmp_path):
    """ADVICE r4: the config-declared pipeline quota ranked only the
    current run's delta, so a (key, window) spanning N incremental
    runs admitted N x quota rows. The spend ledger
    (pipeline_quota_counts) must bound TOTAL admissions per (key,
    bucket) at quota across runs."""
    from logzilla_spark.plans.pipeline import (
        QUOTA_COUNTS_TABLE,
        Pipeline,
    )
    from logzilla_spark.sources.catalog import LocalCatalog, SnapshotError
    from logzilla_spark.testdata import ensure_pages

    from .conftest import SF001

    QUOTA = 2
    cat = LocalCatalog(str(tmp_path / "wh"))
    pipe = Pipeline(
        spark, cat, parse_impl="native",
        quota={"quota": QUOTA, "window": "day"},
    )
    d = ensure_pages(SF001)
    pages = spark.read.parquet(f"{d}/pages.parquet")
    half = pages.filter(F.xxhash64("url") % 2 == 0)
    rest = pages.filter(F.xxhash64("url") % 2 != 0)
    pipe.ingest_pages(half)
    pipe.run(run_id="r1")
    pipe.ingest_pages(rest)
    pipe.run(run_id="r2")

    def _read(c):
        try:
            return cat.read(spark, sink_name(c))
        except SnapshotError:
            return None

    from logzilla_spark.operators.route import sink_name

    admitted = None
    total = 0
    for c in pipe.categories:
        df = _read(c)
        if df is None:
            continue
        total += df.count()
        if c != "throttled":
            sel = df.select("id", "source", "timestamp")
            admitted = sel if admitted is None else admitted.unionByName(sel)
    # never-drop: every parsed record landed in exactly one sink
    from logzilla_spark.operators.parse import parse_records

    rec = parse_records(pages, impl="native")
    assert total == rec.count()
    # the bound: per (source, hour) admissions across BOTH runs <= quota
    per_bucket = (
        admitted.groupBy(
            "source", F.date_trunc("day", "timestamp").alias("b")
        )
        .count()
        .collect()
    )
    assert per_bucket and max(r["count"] for r in per_bucket) <= QUOTA
    # without the ledger a split bucket admits up to 2x quota — prove at
    # least one bucket was split across the runs (the regression bites)
    h1 = parse_records(half, impl="native").select(
        "source", F.date_trunc("day", "timestamp").alias("b")
    ).distinct()
    h2 = parse_records(rest, impl="native").select(
        "source", F.date_trunc("day", "timestamp").alias("b")
    ).distinct()
    assert h1.join(h2, ["source", "b"]).count() > 0
    # the ledger equals the admitted counts (replay-auditable)
    ledger = (
        cat.read(spark, QUOTA_COUNTS_TABLE)
        .groupBy("key", "bucket")
        .agg(F.sum("n_admitted").alias("n"))
        .collect()
    )
    want = {(r["source"], r["b"]): r["count"] for r in per_bucket}
    got = {(r["key"], r["bucket"]): r["n"] for r in ledger}
    assert got == want


def test_pipeline_quota_crash_resume_is_idempotent(spark, tmp_path):
    """Crash after the spend-ledger append but before checkpoint: the
    resume protocol must roll the ledger back with the sinks, or the
    replayed run double-charges its own spend."""
    from logzilla_spark.plans.pipeline import Pipeline
    from logzilla_spark.sources.catalog import LocalCatalog, SnapshotError
    from logzilla_spark.operators.route import sink_name
    from logzilla_spark.testdata import ensure_pages

    from .conftest import SF001

    d = ensure_pages(SF001)
    pages = spark.read.parquet(f"{d}/pages.parquet")
    half = pages.filter(F.xxhash64("url") % 2 == 0)
    rest = pages.filter(F.xxhash64("url") % 2 != 0)

    def _run(name, crash):
        cat = LocalCatalog(str(tmp_path / name))
        pipe = Pipeline(
            spark, cat, parse_impl="native",
            quota={"quota": 2, "window": "day"},
        )
        pipe.ingest_pages(half)
        pipe.run(run_id="r1")
        pipe.ingest_pages(rest)
        if crash:
            with pytest.raises(RuntimeError, match="injected"):
                pipe.run(run_id="r2a", fail_after_stage="aggregate")
        pipe.run(run_id="r2")
        state = {}
        for c in pipe.categories:
            try:
                state[c] = sorted(
                    r.id for r in cat.read(spark, sink_name(c)).collect()
                )
            except SnapshotError:
                state[c] = []
        return state

    assert _run("crash", True) == _run("clean", False)


def test_quota_config_validation(tmp_path):
    import textwrap

    from logzilla_spark.config import ConfigError, load_config

    def _load(body):
        p = tmp_path / "q.toml"
        p.write_text(textwrap.dedent(body))
        return load_config(str(p))

    base = '[pipeline]\nwarehouse = "/tmp/wh"\n'
    with pytest.raises(ConfigError, match="integer >= 1"):
        _load(base + "[quota]\nquota = 0\n")
    with pytest.raises(ConfigError, match="window"):
        _load(base + '[quota]\nquota = 5\nwindow = "week"\n')
    with pytest.raises(ConfigError, match="unknown key"):
        _load(base + "[quota]\nquota = 5\nbogus = 1\n")
    cfg = _load(base + '[quota]\nquota = 7\nkey = "source"\n')
    assert cfg.quota == {"quota": 7, "key": "source", "window": "hour"}


def test_salt_is_deterministic_per_row(spark):
    """The pre-rank split is a function of the ROW (hash of id), not
    of physical partitioning: the same frame under wildly different
    partitionings yields the identical tag assignment — the stage-
    retry / branch-recompute safety the operator documents."""
    rows = [(f"x{i:03d}", T0 + dt.timedelta(seconds=i % 7), "s", "m")
            for i in range(300)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "timestamp", "source", "message"]),
        schema="id string, timestamp timestamp, source string, message string",
    )
    outs = []
    for variant in (df.coalesce(1), df.repartition(13), df.repartition(64, "id")):
        outs.append(
            ingest_quota(variant, 10).toPandas()
            .sort_values("id").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
