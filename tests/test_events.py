"""Stream-shaped operators: tumbling window, as-of join, range join."""

import numpy as np
import pyarrow as pa
import pytest


def test_tumbling_window_unit(ray_session):
    import ray.data

    from maskmypy_ray.stages.events import tumbling_window

    us = 3_600_000_000
    ev = pa.table({
        "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
        "ts": pa.array([10, us - 1, us + 5, 20], type=pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0]),
    })
    out = tumbling_window(ray.data.from_arrow(ev)).to_pandas() \
        .sort_values(["user_id", "window_id"]).reset_index(drop=True)
    assert out.values.tolist() == [
        [1, 0, 2, 3.0],   # user 1 window 0: events at 10 and us-1
        [1, 1, 1, 4.0],   # user 1 window 1
        [2, 0, 1, 8.0],
    ]


def test_asof_join_unit(ray_session):
    import ray.data

    from maskmypy_ray.stages.events import asof_join_orders

    day = 86_400_000_000
    orders = pa.table({
        "o_orderkey": pa.array([10, 11, 12, 20], type=pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], type=pa.int64()),
        "o_orderdate": pa.array([day, 2 * day, 2 * day, 5 * day],
                                type=pa.timestamp("us")),
    })
    ev = pa.table({
        "event_id": pa.array([100, 101, 102, 103, 104], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 3], type=pa.int64()),
        "ts": pa.array([0, day, 3 * day, 4 * day, day], type=pa.timestamp("us")),
    })
    out = asof_join_orders(ray.data.from_arrow(ev), orders).to_pandas() \
        .sort_values("event_id")["last_orderkey"].tolist()
    # ev100: before any order -> -1; ev101: order 10 (== ts inclusive);
    # ev102: date tie at 2*day -> max orderkey 12; ev103: cust 2 has only
    # a later order -> -1; ev104: unknown customer -> -1
    assert out == [-1, 10, 12, -1, -1]


def test_range_join_unit(ray_session):
    import ray.data

    from maskmypy_ray.stages.events import range_join_parts

    part = pa.table({"p_retailprice": pa.array([905.0, 910.0, 915.0, 950.0])})
    ev = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "value": pa.array([50.0, 0.0]),  # centers 910 and 900
    })
    out = range_join_parts(ray.data.from_arrow(ev), part, half_band=10.0) \
        .to_pandas().sort_values("event_id")["n_parts"].tolist()
    # center 910 +-10 -> [900,920] catches 905,910,915; center 900 -> 905,910
    assert out == [3, 2]


def test_exact_median_distributed(ray_session):
    import ray.data

    from maskmypy_ray.analysis.aggregates import exact_median_distributed

    rng = np.random.default_rng(5)
    for n in (9, 10, 5001):
        v = rng.normal(0, 1000, n)
        ds = ray.data.from_arrow(pa.table({"v": v}))
        assert exact_median_distributed(ds, "v", max_collect=64) == float(np.median(v))


def test_median_nan_consistency(ray_session):
    """NaN policy (ADVICE r02): both median paths skip NaNs like pandas
    .median(), so the result is independent of which path ran."""
    import ray.data

    from maskmypy_ray.analysis.aggregates import (exact_median_distributed,
                                                  summarize_column)

    rng = np.random.default_rng(11)
    v = rng.normal(0, 100, 501)
    v[::7] = np.nan
    ds = ray.data.from_arrow(pa.table({"v": v}))
    expect = float(np.nanmedian(v))
    assert exact_median_distributed(ds, "v", max_collect=16) == expect
    assert summarize_column(ds, "v")["median"] == expect


def test_summarize_column_distributed_median(ray_session, monkeypatch):
    """Above MEDIAN_COLLECT_LIMIT summarize_column must use the
    distributed kernel and still return the exact numpy median."""
    import ray.data

    from maskmypy_ray.analysis import aggregates

    rng = np.random.default_rng(6)
    v = rng.normal(50, 10, 4001)
    ds = ray.data.from_arrow(pa.table({"v": v}))
    monkeypatch.setattr(aggregates, "MEDIAN_COLLECT_LIMIT", 100)
    # the collect path goes through ds.select_columns(...).to_pandas();
    # the distributed kernel never calls select_columns on the input
    monkeypatch.setattr(ds, "select_columns",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("full-column collect on big input")))
    s = aggregates.summarize_column(ds, "v")
    assert s["median"] == float(np.median(v))
    assert s["count"] == 4001


def test_sessionize_unit(ray_session):
    import ray.data

    from maskmypy_ray.stages.events import sessionize

    m = 60_000_000  # one minute in us
    ts = pa.array(np.array([0, 10 * m, 50 * m, 55 * m, 0, 40 * m],
                           dtype="datetime64[us]"))
    ev = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
        "ts": ts,
    })
    out = sessionize(ray.data.from_arrow(ev), gap_us=30 * m).to_pandas() \
        .sort_values("event_id")
    # user 1: 0,10 (session 0), 50,55 (gap 40 min -> session 1)
    # user 2: 0 (session 0), 40 (gap 40 min -> session 1)
    assert out["session_seq"].tolist() == [0, 0, 1, 1, 0, 1]


def test_sessionize_partition_count_independence(ray_session):
    """The coarse user_id % P shuffle is an implementation detail: any
    partition count (including P=1, every user in one kernel call, and a
    P larger than the user count) yields identical assignments."""
    import ray.data

    from maskmypy_ray.stages.events import sessionize

    rng = np.random.default_rng(17)
    n = 3000
    ev = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 97, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 3_600_000_000_000, n)
                       .astype("datetime64[us]")),
    })
    ds = ray.data.from_arrow(ev).repartition(6)
    base = sessionize(ds, partitions=64).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    for p in (1, 7, 1024):
        got = sessionize(ds, partitions=p).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert got.equals(base)


def test_session_stats_unit(ray_session):
    import ray.data

    from maskmypy_ray.stages.events import session_stats

    gap = 1_800_000_000
    ev = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 9], type=pa.int64()),
        # user 7: two events 10us apart, gap, one event; user 9: one event
        "ts": pa.array([0, 10, gap + 20, gap + 30, 50],
                       type=pa.timestamp("us")),
        "value": pa.array([1.5, 2.25, 4.0, 8.0, 16.0]),
    })
    out = session_stats(ray.data.from_arrow(ev)).to_pandas() \
        .sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    assert out.values.tolist() == [
        [7, 0, 2, 10, 3.75],
        [7, 1, 2, 10, 12.0],
        [9, 0, 1, 0, 16.0],
    ]


def test_event_funnel_unit(ray_session):
    import ray.data

    from maskmypy_ray.stages.events import event_funnel

    ev = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 4, 4], type=pa.int64()),
        "ts": pa.array([100, 150, 200, 100, 90, 100, 100, 100 + 10_000],
                       type=pa.timestamp("us")),
        "event_type": pa.array(["view", "purchase", "purchase",  # u1
                                "view", "purchase",              # u2: B before A
                                "purchase",                      # u3: no A
                                "view", "purchase"]),            # u4: B too late
    })
    out = event_funnel(ray.data.from_arrow(ev), within_us=5_000) \
        .to_pandas().sort_values("user_id").values.tolist()
    # u1 converts with FIRST qualifying purchase (150, not 200);
    # u2's purchase precedes the view; u3 never views; u4's is outside
    # the window.
    assert out == [[1, 100, 150]]


def test_session_stats_and_funnel_partition_independence(ray_session):
    import ray.data

    from maskmypy_ray.stages.events import event_funnel, session_stats

    rng = np.random.default_rng(7)
    n = 400
    ev = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(0, 25, n), type=pa.int64()),
        "ts": pa.array(np.sort(rng.integers(0, 3_000_000_000_000, n)),
                       type=pa.timestamp("us")),
        "value": pa.array(np.round(rng.uniform(0, 50, n), 2)),
        "event_type": pa.array(rng.choice(["view", "purchase", "click"], n)),
    })
    ds = ray.data.from_arrow(ev)

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    s1 = canon(session_stats(ds, partitions=3).to_pandas())
    s2 = canon(session_stats(ds.repartition(11), partitions=64).to_pandas())
    assert s1.equals(s2)
    f1 = canon(event_funnel(ds, partitions=3).to_pandas())
    f2 = canon(event_funnel(ds.repartition(11), partitions=64).to_pandas())
    assert f1.equals(f2)
    assert len(f1) > 0


def test_tumbling_window_partition_count_independence(ray_session):
    """The coarse hash(user, window) % P shuffle that finishes the
    per-(user, window) partials is an implementation detail: any
    partition count yields the identical aggregate."""
    import ray.data

    from maskmypy_ray.stages.events import tumbling_window

    rng = np.random.default_rng(23)
    n = 4000
    ev = pa.table({
        "user_id": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 40 * 3_600_000_000, n)
                       .astype("datetime64[us]")),
        "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
    })
    ds = ray.data.from_arrow(ev).repartition(6)
    key = ["user_id", "window_id"]
    base = tumbling_window(ds, partitions=64).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    assert len(base) > 100
    for p in (1, 7, 1024):
        got = tumbling_window(ds, partitions=p).to_pandas() \
            .sort_values(key).reset_index(drop=True)
        assert got.equals(base)


def test_window_anomaly_oracle_parity(ray_session, sf_dir):
    """window_anomaly equals the DuckDB twin exactly (identical float
    expression order for the z-score)."""
    import duckdb
    import ray.data

    from maskmypy_ray.stages.events import window_anomaly, window_anomaly_sql

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"],
                               override_num_blocks=4)
    eng = window_anomaly(ev).to_pandas() \
        .sort_values(["event_type", "window_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    orc = con.execute(window_anomaly_sql()).df() \
        .sort_values(["event_type", "window_id"]).reset_index(drop=True)
    for c in ("event_type", "window_id", "n_events", "z", "is_anomaly"):
        assert eng[c].tolist() == orc[c].tolist(), c
    assert eng["is_anomaly"].sum() > 0  # the fixture has real spikes


def test_window_anomaly_constant_type(ray_session):
    """A type with identical counts in every window has var 0 -> z 0;
    a clear spike scores |z| > 2."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.stages.events import WINDOW_US, window_anomaly

    rows = []
    # 'flat': one event per window for 10 windows
    for w in range(10):
        rows.append(("flat", w * WINDOW_US + 5))
    # 'spiky': one event per window, but 40 in window 7
    for w in range(10):
        for _ in range(40 if w == 7 else 1):
            rows.append(("spiky", w * WINDOW_US + 5))
    t = pa.table({
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "event_type": pa.array([r[0] for r in rows]),
    })
    out = window_anomaly(ray.data.from_arrow(t)).to_pandas()
    flat = out[out.event_type == "flat"]
    assert (flat["z"] == 0.0).all() and (flat["is_anomaly"] == 0).all()
    spike = out[(out.event_type == "spiky") & (out.window_id == 7)]
    assert (spike["is_anomaly"] == 1).all()


def test_late_events_brute_force_and_partition_independence(ray_session, sf_dir):
    """late_events matches a per-user brute force (arrival order =
    event_id; wm = cummax(earlier ts) - delay) and is independent of
    the partition count."""
    import numpy as np
    import pyarrow.parquet as pq

    from maskmypy_ray import rng
    from maskmypy_ray.pipelines import SEED, q_late_events
    from maskmypy_ray.stages.events import (
        LATE_ARRIVAL_STREAM,
        LATE_DELAY_US,
        late_events,
    )

    got = q_late_events(sf_dir).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["arr"] = rng.uniform01(
        ev["event_id"].to_numpy() & 0xFFFFFFFF, SEED, LATE_ARRIVAL_STREAM)
    exp = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["arr", "event_id"])
        ts = g["ts_us"].to_numpy()
        cm = np.maximum.accumulate(ts)
        wm = np.empty(len(ts), dtype=np.int64)
        wm[0] = -(1 << 62)
        wm[1:] = cm[:-1] - LATE_DELAY_US
        for e_id, t, w in zip(g["event_id"], ts, wm):
            exp[e_id] = max(int(w) - int(t), 0)
    lateness = got.set_index("event_id")["lateness_us"].to_dict()
    assert lateness == exp
    assert ((got["lateness_us"] > 0) == (got["is_late"] == 1)).all()
    assert got["is_late"].sum() > 0  # fixture actually has late events

    import ray.data
    ev3 = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                columns=["event_id", "user_id", "ts"])
    alt = late_events(ev3, seed=SEED, partitions=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert alt.equals(got)
