"""Round integration of the domain host-explosion guard
(config.host_explosion_max): cut hosts defer, never drop."""

from pyspark.sql import functions as F

from bathyscaphe_spark.config import CrawlConfig
from bathyscaphe_spark.pipeline.driver import bootstrap
from bathyscaphe_spark.pipeline.round import run_round
from bathyscaphe_spark.pipeline.synth import build_host_status
from bathyscaphe_spark.state.tables import TableCatalog

N = 120


def _universe(spark):
    """60 pages on minted subdomains s0..s11.farm.com, 60 on honest
    single-host domains h0..h3.onion; every page links to two others."""
    d = spark.range(N).select(F.col("id").cast("long").alias("i"))
    host = (
        F.when(
            F.col("i") % 2 == 0,
            F.concat(F.lit("s"), ((F.col("i") / 2).cast("long") % 12).cast("string"),
                     F.lit(".farm.com")),
        ).otherwise(
            F.concat(F.lit("h"), (F.col("i") % 4).cast("string"), F.lit(".onion"))
        )
    )
    url = F.concat(F.lit("http://"), host, F.lit("/p"), F.col("i").cast("string"),
                   F.lit(".html"))

    def purl(col):
        h = (
            F.when(col % 2 == 0,
                   F.concat(F.lit("s"), ((col / 2).cast("long") % 12).cast("string"),
                            F.lit(".farm.com")))
            .otherwise(F.concat(F.lit("h"), (col % 4).cast("string"), F.lit(".onion")))
        )
        return F.concat(F.lit("http://"), h, F.lit("/p"), col.cast("string"),
                        F.lit(".html"))

    body = F.concat(
        F.lit('<a href="'), purl((F.col("i") * 7 + 3) % N),
        F.lit('">a</a> <a href="'), purl((F.col("i") * 13 + 11) % N),
        F.lit('">b</a>'),
    )
    return d.select(
        url.alias("url"),
        host.alias("host"),
        F.to_timestamp(F.lit("2020-10-29 12:00:00")).alias("warc_ts"),
        body.cast("binary").alias("html"),
        F.create_map(F.lit("Content-Type"), F.lit("text/html")).alias("headers"),
        F.lit(200).cast("int").alias("status"),
        F.col("i"),
    )


def test_explosion_cut_defers_never_drops(spark, tmp_path):
    univ = _universe(spark)
    seeds = univ.where("i % 3 = 0").select("url", "host")  # many farm hosts
    cfg = CrawlConfig(
        bloom_enabled=False, per_host_budget=1_000_000,
        host_explosion_max=3,
    )
    cat = TableCatalog(spark, str(tmp_path / "s"))
    bootstrap(cat, seeds, cfg)
    hs = build_host_status(univ)
    run_round(cat, univ, hs, cfg, 0)

    f0 = cat.read_round("frontier", 0).select("url_hash", "host", "priority")
    f1 = cat.read_round("frontier", 1)
    sched_hosts = {
        r["h"]
        for r in cat.read_deltas("resources")
        .select(F.parse_url("url", F.lit("HOST")).alias("h"))
        .distinct()
        .collect()
    }
    farm_sched = {h for h in sched_hosts if h.endswith(".farm.com")}
    assert len(farm_sched) == 3, farm_sched
    assert all(not h.endswith(".farm.com") or h in farm_sched for h in sched_hosts)
    # honest domains untouched (each its own eTLD+1)
    assert {h for h in sched_hosts if h.endswith(".onion")}

    # defer-never-drop: every round-0 frontier row either scheduled
    # (became a resource/timeout) or reappears verbatim in frontier 1
    f0_rows = {(r["url_hash"], r["host"]) for r in f0.collect()}
    f1_rows = {
        (r["url_hash"], r["host"], r["priority"]) for r in f1.collect()
    }
    carried = {(h, host) for (h, host, _p) in f1_rows}
    for (uh, host) in f0_rows:
        assert host in sched_hosts or (uh, host) in carried

    # deferred farm rows keep their base priority (seeds bootstrap at
    # the same priority, so any deferred row's priority matches its
    # round-0 row)
    f0_prio = {r["url_hash"]: r["priority"] for r in f0.collect()}
    for (uh, host, p) in f1_rows:
        if uh in f0_prio:
            assert p == f0_prio[uh], (uh, host, p, f0_prio[uh])


def test_explosion_off_is_default_path(spark, tmp_path):
    univ = _universe(spark)
    seeds = univ.where("i % 3 = 0").select("url", "host")
    base = dict(bloom_enabled=False, per_host_budget=1_000_000)
    outs = []
    for name, cfg in [
        ("off", CrawlConfig(**base)),
        ("zero", CrawlConfig(host_explosion_max=0, **base)),
    ]:
        cat = TableCatalog(spark, str(tmp_path / name))
        bootstrap(cat, seeds, cfg)
        run_round(cat, univ, build_host_status(univ), cfg, 0)
        outs.append(
            sorted(r["url_hash"] for r in cat.read_round("frontier", 1).collect())
        )
    assert outs[0] == outs[1] and len(outs[0]) > 0
