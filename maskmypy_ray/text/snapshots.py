"""Cross-snapshot crawl delta (incremental recrawl processing).

At 100 TB you never reprocess the whole crawl: each refresh is diffed
against the previous snapshot and only added/changed pages flow into
the downstream pipeline. This module computes that diff:

* :func:`snapshot_delta` — per-URL status (0 unchanged, 1 changed,
  2 added, 3 removed) by content fingerprint.
* :func:`snapshot_delta_stats` — per-(host, status) counts, the
  recrawl health report.

The fixture corpus has one snapshot, so — like the PII / near-dup /
line fixtures — :func:`with_snapshots` derives the second snapshot
deterministically: pages with ``doc_id % 13 == 0`` are dropped
(removed), ``% 7 == 0`` get their text mutated (changed), ``% 11 == 0``
also appear under ``url || '?v=2'`` (added). Both snapshots are emitted
from ONE scan of the pages table (side 0/1 rows), so the diff costs a
single read.

Scale shape: fingerprints (md5 hex, mirrored by DuckDB's ``md5``) are
computed per batch; rows are routed by ``hash(url) % partitions`` and
each coarse partition resolves its URLs with one vectorized pandas
merge — a URL appears at most once per side, so groups are 1-2 rows
and a fine-key groupby would pay Ray's per-distinct-key overhead on
every page (the exact_dedup rule). The host rollup pre-counts per
batch before a tiny ``groupby(host, status)``.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pandas as pd
import pyarrow as pa

STATUS_UNCHANGED = 0
STATUS_CHANGED = 1
STATUS_ADDED = 2
STATUS_REMOVED = 3

_REMOVE_MOD = 13
_CHANGE_MOD = 7
_ADD_MOD = 11


def with_snapshots(pages_ds, text_col: str = "text"):
    """(url, side, h) rows for BOTH snapshots from one scan: side 0 =
    old (every page), side 1 = new (removed/changed/added per the
    deterministic doc_id rules above); h = md5 hex of the page text."""

    def derive(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        urls = b.column("url").to_pylist()
        texts = b.column(text_col).to_pylist()
        u_out: list[str] = []
        s_out: list[int] = []
        h_out: list[str] = []
        for d, u, t in zip(ids, urls, texts):
            h = md5(t.encode()).hexdigest()
            u_out.append(u)
            s_out.append(0)
            h_out.append(h)
            if d % _REMOVE_MOD != 0:
                nt = t + " updated" if d % _CHANGE_MOD == 0 else t
                u_out.append(u)
                s_out.append(1)
                h_out.append(md5(nt.encode()).hexdigest()
                             if d % _CHANGE_MOD == 0 else h)
            if d % _ADD_MOD == 0:
                u_out.append(u + "?v=2")
                s_out.append(1)
                h_out.append(h)
        return pa.table({
            "url": pa.array(u_out, type=pa.string()),
            "side": pa.array(np.asarray(s_out, dtype=np.int64)),
            "h": pa.array(h_out, type=pa.string()),
        })

    return pages_ds.select_columns(["doc_id", "url", text_col]) \
        .map_batches(derive, batch_format="pyarrow")


def snapshot_delta(pages_ds, partitions: int = 64,
                   text_col: str = "text"):
    """Per-URL delta -> Dataset[(url, status)] with status 0..3."""
    rows = with_snapshots(pages_ds, text_col)

    def with_part(b: pa.Table) -> pa.Table:
        p = np.array([int(md5(u.encode()).hexdigest()[:15], 16) % partitions
                      for u in b.column("url").to_pylist()], dtype=np.int64)
        return b.append_column("p", pa.array(p))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["side"] == 0][["url", "h"]]
        new = g[g["side"] == 1][["url", "h"]]
        m = old.merge(new, on="url", how="outer", suffixes=("_o", "_n"))
        has_o = m["h_o"].notna().to_numpy()
        has_n = m["h_n"].notna().to_numpy()
        status = np.where(
            ~has_o, STATUS_ADDED,
            np.where(~has_n, STATUS_REMOVED,
                     np.where(m["h_o"].to_numpy() != m["h_n"].to_numpy(),
                              STATUS_CHANGED, STATUS_UNCHANGED)))
        return pd.DataFrame({"url": m["url"].to_numpy(),
                             "status": status.astype(np.int64)})

    def to_arrow(d: pd.DataFrame) -> pa.Table:
        return pa.table({
            "url": pa.array(d["url"].to_numpy(), type=pa.string()),
            "status": pa.array(d["status"].to_numpy(), type=pa.int64()),
        })

    return rows.map_batches(with_part, batch_format="pyarrow") \
        .groupby("p").map_groups(resolve, batch_format="pandas") \
        .map_batches(to_arrow, batch_format="pandas")


def snapshot_delta_stats(pages_ds, partitions: int = 64,
                         text_col: str = "text"):
    """Per-(host, status) page counts -> Dataset[(host, status, n)] —
    partial counts per batch before one tiny groupby (hosts x 4 keys)."""
    from ray.data.aggregate import Sum

    from .corpus import _host_of

    delta = snapshot_delta(pages_ds, partitions, text_col)

    def partial(b: pa.Table) -> pa.Table:
        idx, hosts = _host_of(b)
        h = np.asarray(hosts, dtype=object)[idx]
        st = b.column("status").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"host": h, "status": st})
        g = df.groupby(["host", "status"], as_index=False).size()
        return pa.table({
            "host": pa.array(g["host"].to_numpy(), type=pa.string()),
            "status": pa.array(g["status"].to_numpy().astype(np.int64)),
            "n": pa.array(g["size"].to_numpy().astype(np.int64)),
        })

    return delta.map_batches(partial, batch_format="pyarrow") \
        .groupby(["host", "status"]).aggregate(Sum("n", alias_name="n"))


def snapshot_delta_sql(pages_cte: str, per_host: bool = False) -> str:
    """DuckDB twin of :func:`snapshot_delta` (or, with ``per_host``,
    of :func:`snapshot_delta_stats`) over a preceding pages CTE."""
    body = f"""WITH {pages_cte},
old AS (SELECT url, md5(text) AS h FROM pages),
new AS (
  SELECT url, md5(CASE WHEN doc_id % {_CHANGE_MOD} = 0
                       THEN text || ' updated' ELSE text END) AS h
  FROM pages WHERE doc_id % {_REMOVE_MOD} != 0
  UNION ALL
  SELECT url || '?v=2' AS url, md5(text) AS h
  FROM pages WHERE doc_id % {_ADD_MOD} = 0),
d AS (
  SELECT coalesce(o.url, n.url) AS url,
         CAST(CASE WHEN o.url IS NULL THEN {STATUS_ADDED}
                   WHEN n.url IS NULL THEN {STATUS_REMOVED}
                   WHEN o.h != n.h THEN {STATUS_CHANGED}
                   ELSE {STATUS_UNCHANGED} END AS BIGINT) AS status
  FROM old o FULL OUTER JOIN new n ON o.url = n.url)"""
    if not per_host:
        return body + "\nSELECT url, status FROM d"
    return body + f"""
SELECT coalesce(nullif(regexp_extract(url, '^https?://([^/]+)', 1), ''),
                '<no-host>') AS host,
       status, CAST(count(*) AS BIGINT) AS n
FROM d GROUP BY 1, 2"""
