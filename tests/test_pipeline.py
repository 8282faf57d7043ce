"""GH-Archive pipeline parity tests — the representative correctness cases
from SURVEY.md §5.3, over a synthetic fixture shaped like the reference's
batch input (FIXTURES.md §4).
"""

from __future__ import annotations

import json

import pytest

from gh_archive_data_pipeline_spark.pipeline import stages
from gh_archive_data_pipeline_spark.pipeline.runner import Pipeline, gh_archive_pipeline


def _event(eid, actor_id, repo_id, org=None, created="2015-01-01T15:00:01Z",
           typ="PushEvent"):
    ev = {
        "id": str(eid),
        "created_at": created,
        "type": typ,
        "public": True,
        "repo": {"id": repo_id, "name": f"owner/repo{repo_id}",
                 "url": f"https://api.github.com/repos/owner/repo{repo_id}"},
        "actor": {"id": actor_id, "login": f"user{actor_id}",
                  "gravatar_id": "", "avatar_url": "https://a/u.png",
                  "url": f"https://api.github.com/users/user{actor_id}"},
        "payload": json.dumps({"push_id": eid, "commits": [{"sha": "x"}]}),
    }
    if org is not None:
        ev["org"] = {"id": org, "login": f"org{org}", "gravatar_id": "",
                     "avatar_url": "https://a/o.png",
                     "url": f"https://api.github.com/orgs/org{org}"}
    return ev


@pytest.fixture(scope="module")
def bronze_path(tmp_path_factory):
    """Synthetic hour file: duplicate actors/repos, null orgs, duplicate
    event ids, hour-crossing timestamps (FIXTURES.md §4 cases a-d)."""
    rows = [
        _event(1, actor_id=10, repo_id=100, org=900),
        _event(2, actor_id=10, repo_id=100, org=900,     # dup actor+repo+org
               created="2015-01-01T15:30:00Z"),
        _event(3, actor_id=11, repo_id=101),             # no org
        _event(3, actor_id=11, repo_id=101,              # dup event id, later ts
               created="2015-01-01T16:10:00Z"),
        _event(4, actor_id=12, repo_id=102, org=901,
               created="2015-01-01T16:00:00Z", typ="WatchEvent"),
    ]
    path = tmp_path_factory.mktemp("bronze") / "2015-01-01-15.json"
    path.write_text("\n".join(json.dumps(r) for r in rows))
    return str(path)


@pytest.fixture(scope="module")
def silver(spark, bronze_path):
    return stages.to_silver(stages.read_bronze(spark, bronze_path))


def test_silver_drops_payload_and_parses_timestamps(silver):
    assert "payload" not in silver.columns and "other" not in silver.columns
    assert dict(silver.dtypes)["created_at"] == "timestamp_ntz"
    dates = {str(r.event_date) for r in silver.select("event_date").collect()}
    assert dates == {"2015-01-01"}
    hours = sorted(r[0] for r in
                   silver.selectExpr("hour(created_at)").distinct().collect())
    assert hours == [15, 16]  # hour-crossing rows preserved


def test_gold_users_dedup(silver):
    users = stages.gold_users(silver).collect()
    assert sorted(r.id for r in users) == [10, 11, 12]


def test_gold_repos_dedup(silver):
    repos = stages.gold_repos(silver).collect()
    assert sorted(r.id for r in repos) == [100, 101, 102]


def test_gold_orgs_exclude_null(silver):
    orgs = stages.gold_organizations(silver).collect()
    assert sorted(r.id for r in orgs) == [900, 901]  # org-less events excluded


def test_gold_events_key_dedup_keeps_earliest(silver):
    events = stages.gold_events(silver)
    rows = {r.id: r for r in events.collect()}
    assert len(rows) == 4  # 5 input rows, one duplicate id collapsed
    # duplicate id=3: earliest (15:xx) kept, not the 16:10 re-delivery
    assert rows["3"].created_at.hour == 15
    assert rows["1"].actor_id == 10 and rows["1"].repo_name == "owner/repo100"
    assert rows["3"].org_id is None


def test_silver_write_partitioned_and_idempotent(spark, silver, tmp_path):
    out = str(tmp_path / "silver")
    stages.write_silver(silver, out)
    stages.write_silver(silver, out)  # re-run: overwrite is idempotent
    back = spark.read.parquet(out)
    assert back.count() == 5
    assert "event_date=2015-01-01" in [
        p.name for p in (tmp_path / "silver").iterdir() if p.is_dir()
    ]


REAL_SAMPLE = ("/root/reference/resources/sample_data/"
               "2015-01-01-15/2015-01-01-15-1.json")


@pytest.mark.skipif(not __import__("os").path.exists(REAL_SAMPLE),
                    reason="reference sample data not present")
def test_real_reference_sample_hour_bronze_to_gold(spark, tmp_path):
    """Parity against the reference's ONLY real data artifact: its
    checked-in sample hour (one pretty-printed PushEvent — id 2489651112,
    actor greatfire, repo greatfire/wiki, no org; reference semantics at
    load_data_task.py:117-145,174-191). Pins the payload/other drop, the
    created_at parse, the missing-org behaviors (null org_id in the events
    fact; zero rows in the organizations dim after na.drop), and the gold
    projections, end-to-end from the real file."""
    import datetime as dt

    silver = stages.to_silver(
        stages.read_bronze(spark, REAL_SAMPLE, multi_line=True))
    assert silver.count() == 1
    assert "payload" not in silver.columns and "other" not in silver.columns
    row = silver.collect()[0]
    assert row.created_at == dt.datetime(2015, 1, 1, 15, 0, 8)
    assert str(row.event_date) == "2015-01-01"

    users = stages.gold_users(silver).collect()
    assert len(users) == 1
    assert users[0].id == 6158630 and users[0].login == "greatfire"
    repos = stages.gold_repos(silver).collect()
    assert len(repos) == 1
    assert repos[0].id == 15100395 and repos[0].name == "greatfire/wiki"
    # org-less event: the organizations dim is empty (na.drop removes the
    # all-null struct expansion, reference load_data_task.py:190-191)
    assert stages.gold_organizations(silver).count() == 0
    events = stages.gold_events(silver).collect()
    assert len(events) == 1
    ev = events[0]
    assert ev.id == "2489651112" and ev.type == "PushEvent" and ev.public
    assert ev.actor_id == 6158630 and ev.org_id is None
    assert ev.repo_id == 15100395 and ev.repo_name == "greatfire/wiki"

    # and the silver lake write round-trips with date partitioning
    out = str(tmp_path / "silver_real")
    stages.write_silver(silver, out)
    back = spark.read.parquet(out)
    assert back.count() == 1
    assert str(back.collect()[0].event_date) == "2015-01-01"


def test_full_pipeline_runner(spark, bronze_path, tmp_path):
    pipe = gh_archive_pipeline(spark, bronze_path,
                               str(tmp_path / "silver"), str(tmp_path / "gold"))
    results = pipe.run()
    gold = results["gold"]
    assert set(gold) == {"users", "repos", "organizations", "events"}
    assert gold["events"].count() == 4
    assert gold["users"].count() == 3


def test_runner_topology_and_context():
    order = []
    pipe = (Pipeline()
            .add("a", lambda: order.append("a") or 1)
            .add("c", lambda b: order.append("c") or b + 1, upstream=("b",))
            .add("b", lambda a: order.append("b") or a + 1, upstream=("a",)))
    results = pipe.run()
    assert order == ["a", "b", "c"]
    assert results["c"] == 3


def test_write_delta_raises_clear_error_without_jars(spark, tmp_path):
    """The sandbox has no delta-spark jars (verified: no module, no jar,
    installs forbidden) — the Delta gate must fail loudly, not corrupt."""
    from gh_archive_data_pipeline_spark.sources.writers import write_delta

    df = spark.range(3)
    with pytest.raises(RuntimeError, match="delta-spark jars"):
        write_delta(df, str(tmp_path / "d"))


def test_orc_roundtrip(spark, tmp_path):
    """ORC write/read round trip with partition pruning intact."""
    from gh_archive_data_pipeline_spark.sources.writers import write_orc

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, grp string, v double")
    out = str(tmp_path / "orc")
    write_orc(df, out, partition_by=["grp"])
    back = spark.read.orc(out)
    assert back.count() == 3
    assert {r.id for r in back.filter("grp = 'a'").collect()} == {1, 3}


def test_clustered_write_disjoint_sorted_files(spark, tmp_path):
    """write_clustered must produce files with disjoint key ranges (the
    min/max-pruning precondition) and sorted content within each file."""
    import glob

    from pyspark.sql import functions as F

    from gh_archive_data_pipeline_spark.sources.writers import write_clustered

    df = spark.range(10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"), F.col("id").alias("v"))
    out = str(tmp_path / "clustered")
    write_clustered(df, out, cluster_by=["k"], num_files=4)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        ks = [r.k for r in spark.read.parquet(f).collect()]
        assert ks == sorted(ks), "file content not sorted"
        ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"overlapping file ranges: {ranges}"


def test_gharchive_python_datasource(spark, tmp_path):
    """Custom Python DataSource: one input partition per hour file, gzip and
    plain files mixed, nested actor/repo/org flattened to analytic columns."""
    import gzip
    import json

    from gh_archive_data_pipeline_spark.sources import gharchive_source

    def ev(i, hour, login="alice"):
        return {"id": str(i), "type": "PushEvent",
                "actor": {"id": 10 + i, "login": login},
                "repo": {"id": 100 + i, "name": f"r/{i}"},
                "org": {"id": 900, "login": "org"} if i % 2 == 0 else None,
                "created_at": f"2015-01-01T{hour:02d}:00:00Z"}

    f1 = tmp_path / "2015-01-01-15.json.gz"
    with gzip.open(f1, "wt") as fh:
        fh.write("\n".join(json.dumps(ev(i, 15)) for i in range(3)))
    f2 = tmp_path / "2015-01-01-16.json"
    f2.write_text("\n".join(json.dumps(ev(i + 3, 16)) for i in range(2)))

    gharchive_source.register(spark)
    df = (spark.read.format("gharchive")
          .option("path", str(tmp_path)).load())
    assert df.rdd.getNumPartitions() == 2      # one per hour file
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 5
    assert rows["0"].actor_login == "alice" and rows["0"].org_login == "org"
    assert rows["1"].org_login is None         # null org flattens to NULL
    assert rows["3"].repo_name == "r/3"
    # source composes with the existing silver stage transformations
    from pyspark.sql import functions as F
    hours = (df.select(F.substring("created_at", 12, 2).alias("h"))
             .groupBy("h").count().collect())
    assert {r.h: r["count"] for r in hours} == {"15": 3, "16": 2}


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    """Small-file compaction: 50 tiny files → 1, content identical."""
    from gh_archive_data_pipeline_spark.sources.writers import compact

    out = str(tmp_path / "many")
    spark.range(5000).repartition(50).write.parquet(out)
    import glob
    assert len(glob.glob(f"{out}/*.parquet")) == 50
    n = compact(spark, out, target_file_bytes=1 << 30)
    assert n == 1
    back = spark.read.parquet(out)
    assert back.count() == 5000
    assert back.agg({"id": "sum"}).collect()[0][0] == 5000 * 4999 // 2


def test_incremental_ingestor_resumes_after_crash(tmp_path):
    from gh_archive_data_pipeline_spark.pipeline.incremental_ingest import (
        IncrementalIngestor,
    )

    bm = str(tmp_path / "bookmark.json")
    units = [f"2024-01-01-{h}" for h in range(5)]
    processed = []

    def boom(u):
        if u == units[2]:
            raise RuntimeError("transient failure")
        processed.append(u)
        return u

    ing = IncrementalIngestor(bm)
    try:
        ing.run(units, boom)
    except RuntimeError:
        pass
    # two units committed before the crash; the failed one NOT bookmarked
    assert processed == units[:2]
    assert ing.pending(units) == units[2:]

    # recovery run processes only the remainder (no double processing)
    done_now = ing.run(units, lambda u: processed.append(u) or u)
    assert list(done_now) == units[2:]
    assert processed == units[:2] + units[2:]
    assert ing.pending(units) == []

    # late-discovered backfill hole is picked up on the next run
    assert ing.pending(units + ["2023-12-31-23"]) == ["2023-12-31-23"]

    # targeted reprocess
    ing.bookmark.reset([units[1]])
    assert ing.pending(units) == [units[1]]


def test_incremental_ingestor_max_units_batching(tmp_path):
    from gh_archive_data_pipeline_spark.pipeline.incremental_ingest import (
        IncrementalIngestor,
    )

    ing = IncrementalIngestor(str(tmp_path / "bm.json"))
    units = [str(i) for i in range(7)]
    assert set(ing.run(units, lambda u: u, max_units=3)) == {"0", "1", "2"}
    assert set(ing.run(units, lambda u: u, max_units=3)) == {"3", "4", "5"}
    assert set(ing.run(units, lambda u: u)) == {"6"}


def test_versioned_lake_time_travel(spark, tmp_path):
    from gh_archive_data_pipeline_spark.sources import versioned as V

    path = str(tmp_path / "tbl")
    v0 = V.write_version(spark.range(3).selectExpr("id", "id * 10 AS x"), path)
    v1 = V.write_version(spark.range(5).selectExpr("id", "id * 20 AS x"), path)
    assert (v0, v1) == (0, 1)
    assert V.current_version(path) == 1
    # published read sees the latest version
    assert V.read_version(spark, path).count() == 5
    # time travel reads the old snapshot unchanged
    old = V.read_version(spark, path, version=0)
    assert old.count() == 3
    assert {r.x for r in old.collect()} == {0, 10, 20}
    # a third write + vacuum(keep_last=2) drops only v0
    V.write_version(spark.range(7), path)
    assert V.vacuum(path, keep_last=2) == [0]
    assert V.list_versions(path) == [1, 2]
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        V.read_version(spark, path, version=0)
    # published version still intact after vacuum
    assert V.read_version(spark, path).count() == 7


def test_versioned_lake_publish_is_atomic(spark, tmp_path):
    from gh_archive_data_pipeline_spark.sources import versioned as V

    path = str(tmp_path / "tbl")
    V.write_version(spark.range(4), path)
    # a reader holding the old manifest keeps a consistent view while a new
    # version is being written (immutability of v= dirs)
    before = V.current_version(path)
    df_old = V.read_version(spark, path, version=before)
    V.write_version(spark.range(9), path)
    assert df_old.count() == 4  # unchanged by the concurrent publish
    assert V.read_version(spark, path).count() == 9


def test_load_s3a_config_lands_on_hadoop_conf(spark):
    """Reference parity (spark_context_manager.py:28-48): the s3a/MinIO
    settings must land on the LIVE JVM hadoopConfiguration — the layer
    Spark's FileSystem resolution actually consults — including on a
    session this engine did not build."""
    from gh_archive_data_pipeline_spark.session import load_s3a_config

    load_s3a_config(spark, endpoint="http://minio.local:9000",
                    access_key="ak", secret_key="sk",
                    extra={"fs.s3a.attempts.maximum": "1"})
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://minio.local:9000"
    assert hconf.get("fs.s3a.access.key") == "ak"
    assert hconf.get("fs.s3a.secret.key") == "sk"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.connection.ssl.enabled") == "false"
    assert hconf.get("fs.s3a.attempts.maximum") == "1"


def test_appended_generations_with_evolved_schema_read_as_union(spark,
                                                               tmp_path):
    """Schema evolution across append generations — the reference's hourly
    GH Archive ingest (dags/gh_archive_dag.py) appends every hour forever,
    and the event payload schema drifts across GitHub API versions. The
    lakehouse recipe: later generations may ADD nullable columns; readers
    pass mergeSchema to see the union, with nulls where a generation
    predates a column. (Column REMOVAL is the same read path — the old
    column survives as nullable — and type CHANGES are a rebuild, not an
    append.)"""
    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "alice")], "id long, login string").write.parquet(p)
    spark.createDataFrame(
        [(2, "bob", "org1")],
        "id long, login string, org string").write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "login", "org"}
    rows = {r.id: r.org for r in merged.collect()}
    assert rows == {1: None, 2: "org1"}
    # without mergeSchema the footer-sampled schema may miss the new column
    # -> the option is load-bearing, not a default


def test_read_binary_files_globs_and_loads_content(spark, tmp_path):
    """S-surface: binaryFile ingest — one row per file with content bytes,
    pathGlobFilter pruning at listing time, partition-directory discovery."""
    from gh_archive_data_pipeline_spark.sources.readers import (
        read_binary_files)

    root = tmp_path / "assets"
    (root / "dt=2024-01-01").mkdir(parents=True)
    (root / "dt=2024-01-02").mkdir(parents=True)
    (root / "dt=2024-01-01" / "a.img").write_bytes(b"\x89IMG" + b"a" * 10)
    (root / "dt=2024-01-02" / "b.img").write_bytes(b"\x89IMG" + b"b" * 20)
    (root / "dt=2024-01-02" / "skip.txt").write_bytes(b"nope")
    df = read_binary_files(spark, str(root), glob="*.img")
    rows = {r.length: bytes(r.content) for r in df.collect()}
    assert set(rows) == {14, 24}
    assert rows[14].startswith(b"\x89IMG")
    assert "dt" in df.columns  # partition discovery
    one_day = df.filter("dt = '2024-01-02'")
    assert one_day.count() == 1


def test_read_text_lines_and_whole_file(spark, tmp_path):
    from gh_archive_data_pipeline_spark.sources.readers import (
        read_text_lines)

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "d1.txt").write_text("line one\nline two\n")
    (p / "d2.txt").write_text("solo\n")
    lines = read_text_lines(spark, str(p))
    assert sorted(r.value for r in lines.collect()) == [
        "line one", "line two", "solo"]
    docs = read_text_lines(spark, str(p), whole_file=True)
    texts = sorted(r.value for r in docs.collect())
    assert texts == ["line one\nline two\n", "solo\n"]


def test_gold_dim_parity_on_multi_event_file(spark, tmp_path):
    """q392's dim-summary parity beyond the one-event sample: a crafted
    JSON-lines hour exercising every divergence the five-field semantics
    must handle — the same actor (id, login) appearing with two different
    avatar_urls (2 distinct users, not 1), an org struct with a missing
    field (dropped by na.drop AND by the oracle's five-field null filter),
    a full org (kept), and a duplicate event id (fact dedup keeps the
    earliest). Spark's gold_dim_summary and the DuckDB oracle must agree
    on every (n_rows, id_sum, detail-md5) triple."""
    import json

    import duckdb

    from gh_archive_data_pipeline_spark.pipeline.stages import (
        dim_summary_oracle, gold_dim_summary)

    def ev(eid, created, av, org):
        return {
            "id": eid, "type": "PushEvent", "public": True,
            "created_at": created,
            "actor": {"id": 1, "login": "a", "gravatar_id": "",
                      "avatar_url": av, "url": "ua"},
            "repo": {"id": 7, "name": "a/r", "url": "ru"},
            **({"org": org} if org else {}),
        }

    full_org = {"id": 9, "login": "o", "gravatar_id": "",
                "avatar_url": "oa", "url": "ou"}
    partial_org = {"id": 10, "login": "p", "avatar_url": "pa", "url": "pu"}
    events = [
        ev("100", "2015-01-01T15:00:01Z", "x", full_org),
        ev("101", "2015-01-01T15:00:02Z", "x2", partial_org),  # 2nd user
        ev("100", "2015-01-01T15:00:05Z", "x", None),  # dup id, later ts
    ]
    path = str(tmp_path / "hour.json")
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    sp = {r.gold_table: (r.n_rows, r.id_sum, r.detail)
          for r in gold_dim_summary(spark, path, multi_line=False).collect()}
    du = {r[0]: (r[1], r[2], r[3])
          for r in duckdb.connect().execute(
              dim_summary_oracle(path)).fetchall()}
    assert sp == du
    # the semantics themselves, not just engine agreement
    assert sp["users"][0] == 2        # avatar_url differs -> 2 users
    assert sp["organizations"][0] == 1  # partial org na.drop'd
    assert sp["events"][0] == 2      # duplicate id dedup'd, earliest kept


def test_cli_demo_end_to_end(spark, tmp_path):
    """The newcomer command (`python -m gh_archive_data_pipeline_spark
    demo`): bronze -> silver -> gold -> profile -> manifest over the
    checked-in reference sample, offline, with the round-trip self-check.
    Runs in-process against this session (main() must NOT stop a session
    it didn't create)."""
    import json
    import os

    from gh_archive_data_pipeline_spark.__main__ import main

    out = str(tmp_path / "demo")
    assert main(["demo", "--out", out]) == 0
    with open(f"{out}/manifest.json") as f:
        manifest = json.load(f)
    assert manifest["silver_rows"] == 1
    assert manifest["gold"]["events"]["n_rows"] == 1
    assert manifest["gold"]["users"]["n_rows"] == 1
    assert manifest["gold"]["organizations"]["n_rows"] == 0  # sample has none
    assert os.path.isdir(f"{out}/gold/events")
    # the shared session survived main()'s teardown guard
    assert spark.range(1).count() == 1
