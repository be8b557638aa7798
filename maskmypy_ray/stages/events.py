"""Stream-shaped operators over the ``events`` table.

The reference is pure batch (SURVEY.md §2.5 "Streaming-only concerns:
none"), but the engine ships the custom operators a web-scale pipeline
needs (task brief: "as-of join, range join, windowed aggregate"): the
events table is treated as an ordered, partitioned log.

* tumbling window — integer-arithmetic window key (epoch_us // width)
  with per-batch partial aggregation before the ``groupby`` (the
  pre-aggregate pattern: one row per (user, window) per batch enters the
  shuffle, not one per event).
* as-of join — each event matched to the latest order of the same
  customer at or before its timestamp. The (small) order side is
  compiled into per-customer arrays sorted by (date, orderkey) and
  broadcast; each batch answers with one ``searchsorted`` per event.
  Tie on date -> max orderkey (deterministic, mirrored in the oracle).
* range join — each event counts parts whose retail price falls in a
  band derived from the event value; the sorted price array is broadcast
  and the count is two ``searchsorted`` calls per batch (fully
  vectorized).

All three are bit-exact against DuckDB oracles (integer window keys,
integer keys/counts; the float band bounds are computed with identical
expressions on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

WINDOW_US = 3_600_000_000  # 1 hour


def _ts_us(batch: pa.Table, col: str = "ts") -> np.ndarray:
    return batch.column(col).cast(pa.int64()).to_numpy(zero_copy_only=False)


def _value_cents(b: pa.Table) -> np.ndarray:
    """events.value is 2-dp fixed precision stored as double; int64 cents
    make every partial sum order-independent (ADVICE r03: float partials
    combined in nondeterministic order could cross the oracle's 6-dp
    rounding boundary — same fix relational.py uses for money columns)."""
    v = b.column("value").to_numpy(zero_copy_only=False)
    return np.round(v * 100).astype(np.int64)


def tumbling_window(events_ds, window_us: int = WINDOW_US,
                    partitions: int = 64):
    """(user_id, window_id) -> n_events, sum_value (rounded 6).

    Distinct (user, window) keys scale with the EVENT count (sf0.1:
    95,583 keys on 100k events), so a per-key
    ``groupby([...]).aggregate`` pays Ray's ~24 us/distinct-key
    machinery on nearly every row (round-5 fine-key rule). Partials
    are pre-combined per batch as before, then ONE coarse
    ``hash(user, window) % P`` shuffle finishes each key inside a
    single vectorized pandas kernel — a key's partials all route to
    the same partition, so the result is exact and partition-count
    independent."""
    def partial(b: pa.Table) -> pa.Table:
        w = _ts_us(b) // window_us
        df = pd.DataFrame({
            "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
            "window_id": w,
            "value_c": _value_cents(b),
        })
        g = df.groupby(["user_id", "window_id"], sort=False).agg(
            n_events=("value_c", "size"), sum_c=("value_c", "sum")).reset_index()
        g["pk"] = (g["user_id"].to_numpy(dtype=np.int64) * 1_000_003
                   + g["window_id"].to_numpy(dtype=np.int64)) % partitions
        return pa.Table.from_pandas(g, preserve_index=False)

    def sum_part(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["user_id", "window_id"], sort=False).agg(
            n_events=("n_events", "sum"), sum_c=("sum_c", "sum")).reset_index()
        return pa.table({
            "user_id": pa.array(s["user_id"].to_numpy(dtype=np.int64)),
            "window_id": pa.array(s["window_id"].to_numpy(dtype=np.int64)),
            "n_events": pa.array(s["n_events"].to_numpy(dtype=np.int64)),
            "sum_value": pa.array(
                np.round(s["sum_c"].to_numpy(dtype=np.int64) / 100.0, 6),
                type=pa.float64()),
        })

    return events_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pk").map_groups(sum_part, batch_format="pandas")


HOP_US = WINDOW_US // 4  # 15 minutes


def hopping_window(events_ds, window_us: int = WINDOW_US, hop_us: int = HOP_US):
    """Overlapping (hopping/sliding) windows: size ``window_us``, start
    every ``hop_us`` — each event lands in ``window_us / hop_us``
    windows. Returns (window_start [us], event_type, n_events,
    sum_value rounded 6).

    Scale shape: the k-fold replication happens INSIDE the partial
    kernel (np.repeat) and is immediately pre-aggregated to
    per-(window, type) partial sums before the single global
    ``groupby`` — the shuffle moves one row per distinct
    (window, type) per batch, not k rows per event."""
    assert window_us % hop_us == 0
    k = window_us // hop_us
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = _ts_us(b)
        # window starts (t // hop - i) * hop for i in 0..k-1 all satisfy
        # start <= t < start + window
        base = t // hop_us
        starts = ((np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64),
                                                len(t))) * hop_us)
        df = pd.DataFrame({
            "window_start": starts,
            "event_type": np.repeat(
                b.column("event_type").to_numpy(zero_copy_only=False), k),
            "value_c": np.repeat(_value_cents(b), k),
        })
        g = df.groupby(["window_start", "event_type"], sort=False).agg(
            n_events=("value_c", "size"), sum_c=("value_c", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = events_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]).aggregate(
            Sum("n_events", alias_name="n_events_sum"),
            Sum("sum_c", alias_name="sum_c_sum"))
    return out.map_batches(
        lambda b: pa.table({
            "window_start": b.column("window_start"),
            "event_type": b.column("event_type"),
            "n_events": pa.array(
                b.column("n_events_sum").to_numpy(zero_copy_only=False),
                type=pa.int64()),
            "sum_value": pa.array(
                np.round(b.column("sum_c_sum").to_numpy(zero_copy_only=False)
                         / 100.0, 6),
                type=pa.float64()),
        }),
        batch_format="pyarrow")


def window_distinct_users(events_ds, window_us: int = WINDOW_US):
    """Exact distinct-user count per tumbling window: (window_id,
    n_users).

    The canonical exact count-distinct shape: per-batch local dedup of
    (window, user) pairs, a coarse ``hash(window, user) % P`` partition
    whose kernel global-dedups every pair and pre-counts per window
    (distinct pairs scale with the event count, so a per-pair
    ``groupby([...]).aggregate`` would pay Ray's per-distinct-key
    machinery on nearly every row — round-5 fine-key rule), then a
    small per-window partial sum — no per-window row lists ever
    materialize anywhere."""
    from ray.data.aggregate import Sum

    partitions = 64

    def pairs(b: pa.Table) -> pa.Table:
        w = _ts_us(b) // window_us
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([w, u], axis=1), axis=0)
        return pa.table({
            "window_id": pa.array(uniq[:, 0]),
            "user_id": pa.array(uniq[:, 1]),
            "pk": pa.array((uniq[:, 0] * 1_000_003 + uniq[:, 1])
                           % partitions),
        })

    def count_part(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["window_id", "user_id"])
        s = d.groupby("window_id", sort=False).size().rename("n") \
            .reset_index()
        return pa.table({
            "window_id": pa.array(s["window_id"].to_numpy(dtype=np.int64)),
            "n": pa.array(s["n"].to_numpy(dtype=np.int64)),
        })

    out = events_ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("pk").map_groups(count_part, batch_format="pandas") \
        .groupby("window_id").aggregate(Sum("n", alias_name="n_users"))
    return out.map_batches(
        lambda b: pa.table({
            "window_id": b.column("window_id"),
            "n_users": pa.array(
                b.column("n_users").to_numpy(zero_copy_only=False),
                type=pa.int64()),
        }),
        batch_format="pyarrow")


def window_top_types(events_ds, window_us: int = WINDOW_US, k: int = 3,
                     partitions: int = 64):
    """Trending event types: top-``k`` types per tumbling window by
    count (ties -> lexicographically smaller type): (window_id,
    event_type, n_events, rank 1..k).

    Counts come from the pre-aggregated tumbling shape; the rank step
    shuffles on ``window_id % P`` and ranks every window in a partition
    with one vectorized pandas sort + groupby.head — not a per-window
    apply."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        w = _ts_us(b) // window_us
        df = pd.DataFrame({
            "window_id": w,
            "event_type": b.column("event_type").to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["window_id", "event_type"], sort=False) \
            .size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = events_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["window_id", "event_type"]).aggregate(
            Sum("n", alias_name="n_events"))

    def add_pw(b: pa.Table) -> pa.Table:
        w = b.column("window_id").to_numpy(zero_copy_only=False)
        return b.append_column("pw", pa.array(w % partitions))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["window_id", "n_events", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby("window_id", sort=False).head(k).copy()
        top["rank"] = top.groupby("window_id", sort=False).cumcount() + 1
        top["n_events"] = top["n_events"].astype(np.int64)
        return top[["window_id", "event_type", "n_events", "rank"]]

    return counts.map_batches(add_pw, batch_format="pyarrow") \
        .groupby("pw").map_groups(rank_part, batch_format="pandas")


SESSION_GAP_US = 1_800_000_000  # 30 minutes


def sessionize(events_ds, gap_us: int = SESSION_GAP_US,
               partitions: int = 64):
    """Gap-based sessionization: per user, events sorted by
    (ts, event_id) belong to the same session until a gap > ``gap_us``
    opens a new one; ``session_seq`` is the 0-based session index within
    the user.

    ONE shuffle on the coarse key ``user_id % P`` (VERDICT r03 #3:
    per-user ``map_groups`` pays Ray's ~0.4 ms Python apply per TINY
    group — millions of ~10-row applies at scale; the coarse partition
    runs one vectorized lexsort + diff + segmented-cumsum kernel over
    thousands of users at once, mirroring window_top_types' ``pw``
    pattern). Mirrored exactly by the SQL lag/sum window oracle."""
    def add_pu(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("pu", pa.array(u % partitions))

    def assign_part(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        u = g["user_id"].to_numpy()
        e = g["event_id"].to_numpy()
        order = np.lexsort((e, ts, u))
        u, ts, e = u[order], ts[order], e[order]
        n = len(u)
        new = np.zeros(n, dtype=np.int64)
        first = np.zeros(n, dtype=bool)
        if n:
            first[0] = True
            if n > 1:
                same_user = u[1:] == u[:-1]
                first[1:] = ~same_user
                new[1:] = (same_user & (np.diff(ts) > gap_us)).astype(np.int64)
        # segmented cumsum: global cumsum minus the value carried in at
        # each user's first row (cumsum is nondecreasing, so a running
        # max of the first-row snapshots forward-fills the per-user base)
        cs = np.cumsum(new)
        base = np.maximum.accumulate(np.where(first, cs, 0))
        return pd.DataFrame({
            "event_id": e,
            "user_id": u,
            "session_seq": cs - base,
        })

    return events_ds.select_columns(["event_id", "user_id", "ts"]) \
        .map_batches(add_pu, batch_format="pyarrow") \
        .groupby("pu").map_groups(assign_part, batch_format="pandas")


def compile_orders_asof(orders_table: pa.Table):
    """Composite-key arrays for a fully vectorized as-of lookup
    (VERDICT r02 #5 — replaces the per-event Python searchsorted loop).

    Rows are sorted by (custkey, date, orderkey) and collapsed into ONE
    monotonic int64 key ``cust * S + dense_date_rank`` (S = number of
    distinct dates + 1), so a whole event batch resolves with a single
    global ``searchsorted``: the element just before the insertion point
    of ``uid * S + rank_of(ts)`` is exactly the customer's latest
    qualifying order (max date, then max orderkey)."""
    cust = orders_table.column("o_custkey").to_numpy(zero_copy_only=False)
    date = orders_table.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
    okey = orders_table.column("o_orderkey").to_numpy(zero_copy_only=False)
    order = np.lexsort((okey, date, cust))
    cust, date, okey = cust[order], date[order], okey[order]
    uniq_dates = np.unique(date)
    span = np.int64(len(uniq_dates) + 1)
    if len(cust) and int(cust.max()) >= (1 << 62) // int(span):
        raise ValueError("as-of composite key would overflow int64; "
                         "re-partition the order side by customer range")
    keys = cust * span + np.searchsorted(uniq_dates, date)
    return cust, okey, keys, uniq_dates, span


class AsofOrderJoiner:
    def __init__(self, compiled_ref):
        import ray

        self.cust, self.okey, self.keys, self.uniq_dates, self.span = (
            ray.get(compiled_ref) if not isinstance(compiled_ref, tuple) else compiled_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = _ts_us(batch)
        # rank_of(ts) = number of distinct order dates <= ts; any order of
        # this customer with a smaller date-rank sorts strictly below the
        # probe key, so pos-1 is the as-of match iff it belongs to uid.
        thr = np.searchsorted(self.uniq_dates, ts, side="right")
        pos = np.searchsorted(self.keys, uid * self.span + thr, side="left")
        prev = np.maximum(pos - 1, 0)
        hit = (pos > 0) & (self.cust[prev] == uid)
        out = np.where(hit, self.okey[prev], np.int64(-1))
        return pa.table({
            "event_id": batch.column("event_id"),
            "last_orderkey": pa.array(out, type=pa.int64()),
        })


def asof_join_orders(events_ds, orders_table: pa.Table):
    """Dataset[(event_id, last_orderkey)]; -1 when the customer has no
    order at or before the event (left as-of join semantics)."""
    import ray

    ref = ray.put(compile_orders_asof(orders_table))

    def join(batch: pa.Table) -> pa.Table:
        return AsofOrderJoiner(ref)(batch)

    return events_ds.map_batches(join, batch_format="pyarrow")


def range_join_parts(events_ds, part_table: pa.Table, half_band: float = 10.0):
    """Dataset[(event_id, n_parts)] — parts with
    p_retailprice in [900 + value/5 - half_band, 900 + value/5 + half_band]
    (inclusive both ends; identical arithmetic in the oracle)."""
    import ray

    prices = np.sort(part_table.column("p_retailprice").to_numpy(zero_copy_only=False))
    ref = ray.put(prices)

    def join(batch: pa.Table) -> pa.Table:
        p = ray.get(ref)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        center = 900.0 + v / 5.0
        lo = np.searchsorted(p, center - half_band, side="left")
        hi = np.searchsorted(p, center + half_band, side="right")
        return pa.table({
            "event_id": batch.column("event_id"),
            "n_parts": pa.array(hi - lo, type=pa.int64()),
        })

    return events_ds.map_batches(join, batch_format="pyarrow")


def _empty_frame(**cols) -> pd.DataFrame:
    """Zero-row frame with EXPLICIT dtypes: pandas defaults empty lists
    to float64, which poisons the Dataset schema (ADVICE r03 on typed
    empty blocks) and breaks the driver's schema compare."""
    return pd.DataFrame({k: np.array([], dtype=t) for k, t in cols.items()})


def session_stats(events_ds, gap_us: int = SESSION_GAP_US,
                  partitions: int = 64):
    """Per-session aggregates over the gap-based sessions of
    :func:`sessionize`: (user_id, session_seq) -> n_events,
    duration_us (last ts - first ts), sum_value (rounded 6).

    Same single coarse ``user_id % P`` shuffle as sessionize — a
    partition holds EVERY event of its users, so the session assignment
    AND its aggregate are both final within the partition (no second
    shuffle, unlike a naive sessionize -> groupby(session) chain).
    Values are summed as int64 cents so partial order can't cross the
    oracle's rounding (same rule as tumbling_window).
    """
    def add_pu(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("pu", pa.array(u % partitions))

    def stats_part(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        u = g["user_id"].to_numpy()
        e = g["event_id"].to_numpy()
        vc = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        order = np.lexsort((e, ts, u))
        u, ts, vc = u[order], ts[order], vc[order]
        n = len(u)
        if not n:
            return _empty_frame(user_id=np.int64, session_seq=np.int64,
                                n_events=np.int64, duration_us=np.int64,
                                sum_value=np.float64)
        new = np.zeros(n, dtype=np.int64)
        first = np.zeros(n, dtype=bool)
        first[0] = True
        if n > 1:
            same_user = u[1:] == u[:-1]
            first[1:] = ~same_user
            new[1:] = (same_user & (np.diff(ts) > gap_us)).astype(np.int64)
        cs = np.cumsum(new)
        base = np.maximum.accumulate(np.where(first, cs, 0))
        seq = cs - base
        # segment boundaries: first row of each (user, session)
        seg_start = first | (new == 1)
        seg_id = np.cumsum(seg_start) - 1
        n_seg = seg_id[-1] + 1
        n_events = np.bincount(seg_id, minlength=n_seg)
        sum_c = np.bincount(seg_id, weights=vc.astype(np.float64),
                            minlength=n_seg).astype(np.int64)
        starts = np.flatnonzero(seg_start)
        ends = np.append(starts[1:], n) - 1
        return pd.DataFrame({
            "user_id": u[starts],
            "session_seq": seq[starts],
            "n_events": n_events.astype(np.int64),
            "duration_us": ts[ends] - ts[starts],
            "sum_value": np.round(sum_c / 100.0, 6),
        })

    return events_ds.select_columns(["event_id", "user_id", "ts", "value"]) \
        .map_batches(add_pu, batch_format="pyarrow") \
        .groupby("pu").map_groups(stats_part, batch_format="pandas")


FUNNEL_WINDOW_US = 24 * WINDOW_US  # 24 hours


def event_funnel(events_ds, first_type: str = "view",
                 then_type: str = "purchase",
                 within_us: int = FUNNEL_WINDOW_US,
                 partitions: int = 64):
    """Conversion funnel: per user, the FIRST ``first_type`` event and
    the FIRST ``then_type`` event strictly after it within ``within_us``.
    Returns Dataset[(user_id, a_ts, b_ts)] for converted users only
    (both timestamps as int64 epoch-us).

    Scale shape: the batch kernel pre-reduces each block to per-user
    min-A partials plus the (filtered) B events, so the single coarse
    ``user_id % P`` shuffle carries one A row per (user, batch) and only
    ``then_type`` events — never the full log. The per-partition finish
    is one lexsort + searchsorted over thousands of users at once.
    """
    def partial(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        ts = _ts_us(b)
        am = et == first_type
        bm = et == then_type
        rows_u, rows_ts, rows_side = [], [], []
        if am.any():
            au, ats = u[am], ts[am]
            order = np.lexsort((ats, au))
            au, ats = au[order], ats[order]
            keep = np.ones(len(au), dtype=bool)
            keep[1:] = au[1:] != au[:-1]  # per-user min (sorted by ts)
            rows_u.append(au[keep])
            rows_ts.append(ats[keep])
            rows_side.append(np.zeros(int(keep.sum()), dtype=np.int8))
        if bm.any():
            rows_u.append(u[bm])
            rows_ts.append(ts[bm])
            rows_side.append(np.ones(int(bm.sum()), dtype=np.int8))
        if not rows_u:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "ts_us": pa.array([], type=pa.int64()),
                             "side": pa.array([], type=pa.int8()),
                             "pu": pa.array([], type=pa.int64())})
        uu = np.concatenate(rows_u)
        return pa.table({
            "user_id": pa.array(uu, type=pa.int64()),
            "ts_us": pa.array(np.concatenate(rows_ts), type=pa.int64()),
            "side": pa.array(np.concatenate(rows_side), type=pa.int8()),
            "pu": pa.array(uu % partitions, type=pa.int64()),
        })

    def finish_part(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        side = g["side"].to_numpy()
        a = side == 0
        if not a.any():
            return _empty_frame(user_id=np.int64, a_ts=np.int64,
                                b_ts=np.int64)
        au, ats = u[a], ts[a]
        order = np.lexsort((ats, au))
        au, ats = au[order], ats[order]
        keep = np.ones(len(au), dtype=bool)
        keep[1:] = au[1:] != au[:-1]
        au, ats = au[keep], ats[keep]  # per-user global min A
        bu, bts = u[~a], ts[~a]
        # for each B event, its user's a_ts (or miss)
        pos = np.searchsorted(au, bu)
        pos = np.minimum(pos, len(au) - 1)
        hit = au[pos] == bu
        a_of_b = ats[pos]
        ok = hit & (bts > a_of_b) & (bts <= a_of_b + within_us)
        if not ok.any():
            return _empty_frame(user_id=np.int64, a_ts=np.int64,
                                b_ts=np.int64)
        cu, cts = bu[ok], bts[ok]
        order = np.lexsort((cts, cu))
        cu, cts = cu[order], cts[order]
        keep = np.ones(len(cu), dtype=bool)
        keep[1:] = cu[1:] != cu[:-1]  # first qualifying B per user
        cu, cts = cu[keep], cts[keep]
        pos = np.searchsorted(au, cu)
        return pd.DataFrame({
            "user_id": cu.astype(np.int64),
            "a_ts": ats[pos].astype(np.int64),
            "b_ts": cts.astype(np.int64),
        })

    return events_ds.select_columns(["user_id", "ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("pu").map_groups(finish_part, batch_format="pandas")


def window_anomaly(events_ds, window_us: int = WINDOW_US,
                   z_thresh: float = 2.0):
    """Per-(event_type, window) anomaly z-scores ->
    ``(event_type, window_id, n_events, z, is_anomaly)``.

    A window's count is scored against ITS TYPE's distribution over the
    corpus's whole window span (quiet windows count as zero via the
    span normalization, so z is the population z-score over W =
    max_window - min_window + 1 windows): z = (n - S/W) / sqrt(SS/W -
    (S/W)^2), rounded to 6 dp; constant-count types score 0.

    Scale shape: per-batch partial counts pre-combine before one
    ``groupby(event_type, window_id)`` over a SMALL key space (types x
    windows — the pre-combined-few-keys case where a plain aggregate
    is right); per-type (S, SS) fold into a tiny broadcast map and the
    z pass is stateless. The float expression is written identically
    in the SQL twin, so the driver compare is exact."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        w = _ts_us(b) // window_us
        df = pd.DataFrame({
            "event_type": b.column("event_type")
            .to_numpy(zero_copy_only=False),
            "window_id": w,
        })
        g = df.groupby(["event_type", "window_id"], sort=False) \
            .size().rename("n").reset_index()
        return pa.table({
            "event_type": pa.array(g["event_type"].to_numpy(dtype=object),
                                   type=pa.string()),
            "window_id": pa.array(g["window_id"].to_numpy(dtype=np.int64)),
            "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
        })

    counts = events_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "window_id"]) \
        .aggregate(Sum("n", alias_name="n")).materialize()
    span = counts.aggregate(Min("window_id"), Max("window_id"))
    W = int(span["max(window_id)"]) - int(span["min(window_id)"]) + 1

    def sq(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type"),
            "s": b.column("n"),
            "ss": pa.array(n * n),
        })

    st_rows = counts.map_batches(sq, batch_format="pyarrow") \
        .groupby("event_type").aggregate(Sum("s", alias_name="s"),
                                         Sum("ss", alias_name="ss")) \
        .take_all()  # bounded: one row per event type
    st = {r["event_type"]: (int(r["s"]), int(r["ss"])) for r in st_rows}
    st_ref = ray.put(st)

    def score(b: pa.Table) -> pa.Table:
        stats: dict = ray.get(st_ref)
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.array([stats[t][0] for t in et], dtype=np.float64)
        ss = np.array([stats[t][1] for t in et], dtype=np.float64)
        mean = s / W
        var = ss / W - mean * mean
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(var > 0, (n - mean) / np.sqrt(var), 0.0)
        z = np.round(z, 6)
        return pa.table({
            "event_type": b.column("event_type"),
            "window_id": b.column("window_id"),
            "n_events": b.column("n"),
            "z": pa.array(z, type=pa.float64()),
            "is_anomaly": pa.array((np.abs(z) > z_thresh).astype(np.int64)),
        })

    return counts.map_batches(score, batch_format="pyarrow")


def window_anomaly_sql(window_us: int = WINDOW_US,
                       z_thresh: float = 2.0) -> str:
    """DuckDB twin of :func:`window_anomaly` over the events view —
    the z expression is written in the same operation order."""
    return f"""WITH ev AS (
  SELECT event_type, epoch_us(ts) // {window_us} AS window_id FROM events),
c AS (SELECT event_type, window_id, CAST(count(*) AS BIGINT) AS n
      FROM ev GROUP BY 1, 2),
span AS (SELECT max(window_id) - min(window_id) + 1 AS w FROM c),
st AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS s,
              CAST(sum(n * n) AS BIGINT) AS ss
       FROM c GROUP BY 1),
z AS (
  SELECT c.event_type, c.window_id, c.n AS n_events,
         CASE WHEN (CAST(st.ss AS DOUBLE) / sp.w
                    - (CAST(st.s AS DOUBLE) / sp.w)
                      * (CAST(st.s AS DOUBLE) / sp.w)) > 0
              THEN round((CAST(c.n AS DOUBLE)
                          - CAST(st.s AS DOUBLE) / sp.w)
                         / sqrt(CAST(st.ss AS DOUBLE) / sp.w
                                - (CAST(st.s AS DOUBLE) / sp.w)
                                  * (CAST(st.s AS DOUBLE) / sp.w)), 6)
              ELSE 0.0 END AS z
  FROM c JOIN st USING (event_type), span sp)
SELECT event_type, window_id, n_events, z,
       CAST(CASE WHEN abs(z) > {z_thresh} THEN 1 ELSE 0 END AS BIGINT)
         AS is_anomaly
FROM z"""


# ---------------------------------------------------------------------------
# Event-time watermark / late-data accounting (round 5): the one
# streaming-taxonomy concern (SURVEY §2.5 "streaming-only concerns")
# the engine did not yet expose. Arrival order is a deterministic
# counter-RNG jitter of the append sequence (the fixture's events are
# perfectly time-ordered, so without simulated network reordering the
# rule is vacuous); the watermark after each arrival is the running
# max event time minus the allowed delay, and an event is LATE if it
# arrives after the watermark already passed its timestamp — exactly
# the Beam/Flink allowed-lateness rule, evaluated deterministically in
# batch. No reference counterpart (pure-batch reference).
# ---------------------------------------------------------------------------

LATE_DELAY_US = 2 * 3_600_000_000  # 2 hours allowed lateness
LATE_ARRIVAL_STREAM = 919  # counter-RNG stream for the arrival jitter


def late_events(events_ds, delay_us: int = LATE_DELAY_US, seed: int = 42,
                partitions: int = 64):
    """Dataset[(event_id, user_id, is_late, lateness_us)] — per-user
    watermark accounting over a JITTERED arrival order (ascending
    ``(uniform01(event_id, seed, 919), event_id)`` within each user):
    ``wm = cummax(ts over earlier arrivals) - delay_us``;
    ``is_late = ts < wm``; ``lateness_us = max(0, wm - ts)``.

    ONE coarse ``user_id % P`` shuffle (same plan as sessionize); the
    per-partition kernel is one lexsort + two C-level pandas groupby
    scans (cummax, shift) over all of the partition's users at once.
    First arrival per user is never late (no watermark yet). The
    jitter key mirrors into SQL bit-for-bit (rng.sql_uniform01).
    """
    from .. import rng

    def add_pu(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("pu", pa.array(u % partitions))

    def late_part(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        u = g["user_id"].to_numpy()
        e = g["event_id"].to_numpy()
        arr = rng.uniform01(e & 0xFFFFFFFF, seed, LATE_ARRIVAL_STREAM)
        order = np.lexsort((e, arr, u))  # arrival order within each user
        u, ts, e = u[order], ts[order], e[order]
        if not len(u):
            return _empty_frame(event_id=np.int64, user_id=np.int64,
                                is_late=np.int64, lateness_us=np.int64)
        s = pd.DataFrame({"u": u, "ts": ts})
        prev_max = s.groupby("u", sort=False)["ts"].cummax() \
            .groupby(s["u"], sort=False).shift(1)
        # all-integer watermark: epoch-us values (~1.7e15) round-trip
        # the NaN-bearing float64 exactly (< 2^53); first arrivals get
        # a -2^62 sentinel so their lateness clamps to 0
        wm = prev_max.fillna(float(-(1 << 62))).to_numpy() \
            .astype(np.int64) - delay_us
        lateness = np.maximum(wm - ts, 0)
        return pd.DataFrame({
            "event_id": e,
            "user_id": u,
            "is_late": (lateness > 0).astype(np.int64),
            "lateness_us": lateness,
        })

    return events_ds.select_columns(["event_id", "user_id", "ts"]) \
        .map_batches(add_pu, batch_format="pyarrow") \
        .groupby("pu").map_groups(late_part, batch_format="pandas")
