"""dispatch_schedule (operators/politeness.py): the per-host fetch
serialization recurrence emit_i = max(arrival_i, emit_{i-1} + delay),
computed by the window closed form — pinned against a literal
sequential fold."""

import random

from pyspark.sql import functions as F

from bathyscaphe_spark.operators.politeness import dispatch_schedule


def _sequential_mirror(rows, delays, default):
    """Literal recurrence, host by host, in dispatch order."""
    out = {}
    hosts = {}
    for r in rows:
        hosts.setdefault(r[1], []).append(r)
    for h, rs in hosts.items():
        rs = sorted(rs, key=lambda r: (-r[2], r[0]))  # priority desc, hash
        d = delays.get(h, default)
        emit = None
        for i, r in enumerate(rs):
            avail = r[3]
            emit = avail if emit is None else max(avail, emit + d)
            out[r[0]] = (i, emit)
    return out


def _rows(seed, n=400, n_hosts=13):
    rng = random.Random(seed)
    return [
        (
            i,  # url_hash (unique)
            f"h{rng.randrange(n_hosts)}.onion",
            rng.randrange(5),  # priority with plenty of ties
            1_000_000 + rng.randrange(50_000),  # arrival_ms
        )
        for i in range(n)
    ]


def test_window_form_equals_sequential_fold(spark):
    for seed in (1, 2, 3):
        rows = _rows(seed)
        delays = {f"h{i}.onion": 200 + 150 * i for i in range(0, 13, 3)}
        df = spark.createDataFrame(
            rows, "url_hash long, host string, priority int, arrival_ms long"
        )
        ddf = spark.createDataFrame(
            list(delays.items()), "host string, delay_ms long"
        )
        got = {
            r.url_hash: (r.seq, r.dispatch_ms)
            for r in dispatch_schedule(df, ddf, default_delay_ms=1000).collect()
        }
        assert got == _sequential_mirror(rows, delays, 1000)


def test_no_delays_uses_default(spark):
    rows = _rows(7, n=60, n_hosts=3)
    df = spark.createDataFrame(
        rows, "url_hash long, host string, priority int, arrival_ms long"
    )
    got = {
        r.url_hash: (r.seq, r.dispatch_ms)
        for r in dispatch_schedule(df, None, default_delay_ms=333).collect()
    }
    assert got == _sequential_mirror(rows, {}, 333)


def test_spacing_invariant(spark):
    """Consecutive dispatches within a host are never closer than the
    host's delay, and never before the URL's arrival."""
    rows = _rows(11)
    df = spark.createDataFrame(
        rows, "url_hash long, host string, priority int, arrival_ms long"
    )
    out = dispatch_schedule(df, None, default_delay_ms=400).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
        assert r.dispatch_ms >= r.arrival_ms
    for rs in by_host.values():
        rs.sort(key=lambda r: r.seq)
        for a, b in zip(rs, rs[1:]):
            assert b.dispatch_ms - a.dispatch_ms >= 400


def test_parallelism_invariance(spark):
    rows = _rows(5)
    df = spark.createDataFrame(
        rows, "url_hash long, host string, priority int, arrival_ms long"
    )
    one = sorted(
        tuple(r) for r in dispatch_schedule(df.coalesce(1), None).collect()
    )
    many = sorted(
        tuple(r)
        for r in dispatch_schedule(df.repartition(16), None).collect()
    )
    assert one == many


def test_zero_udf_plan(spark):
    rows = _rows(9, n=50)
    df = spark.createDataFrame(
        rows, "url_hash long, host string, priority int, arrival_ms long"
    )
    plan = (
        dispatch_schedule(df, None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
