"""Host-level PageRank over the crawl link graph — the classic
host-quality signal for web-corpus curation (seed/domain ranking à la
Common Crawl host ranks; damping 0.85, fixed iteration count).

Fixture link rule (FIXTURES-style deterministic synthesis, like the
messy-URL refetches and mutated near-dup copies): page ``doc_id``
links to pages ``((doc_id%n)^2 % n * 7 + doc_id*31 + 97*j + 1) % n``
for ``j < L`` (exact self-links dropped; the quadratic term makes the
host in-degree distribution SKEWED — quadratic residues are uneven
across the ``doc_id % n_sources`` host classes — so the fixture ranks
genuinely separate and the oracle check is not vacuous), and the
graph is projected to hosts.

Scale shape:

* **Edge-host resolution** is TWO coarse hash-partition joins (the
  fact-fact pattern from ``relational.py``): link rows routed by
  ``dst_doc % P`` meet ``(doc_id, host)`` rows routed by
  ``doc_id % P``; the half-resolved edges re-route by ``src_doc % P``
  to meet the host rows again. The corpus-sized doc→host map is never
  broadcast and never visits the driver.
* **The host graph is aggregated per src-partition** (every edge of a
  src host lands in one ``hash(src) % P`` partition, so weights AND
  out-degrees are exact with one vectorized pandas kernel) and
  materialized — bounded by distinct (src_host, dst_host) pairs, the
  same mass every iteration must read anyway.
* **Iterations stream the edge table**: the rank vector (one int64
  per host — bounded; ~80 MB at 10^7 hosts) is broadcast each round,
  one ``map_batches`` over the edges emits integer contributions, and
  a small ``groupby(dst).sum`` (few distinct keys — the pre-combined-
  partials regime) plus a driver-side H-row collect closes the round.

Exactness: ranks are int64 micro-units (scale 10^12). Per round,
``r' (h) = (15*INIT)//100 + (85 * Σ_in (r(src) // outdeg(src)) * w)
// 100`` — every operation is integer, so sums are order-independent
and the DuckDB oracle (10 unrolled CTE rounds of the same arithmetic)
matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

LINKS_PER_DOC = 3
RANK_SCALE = 10**12
DAMP_PCT = 85  # damping d = 0.85 as the exact rational 85/100
RANK_ITERS = 10
MAX_HOSTS = 50_000_000  # driver-side rank-vector bound (~400 MB)
SMALL_EDGES = 1 << 22  # host-graph edges below this iterate driver-side

from .corpus import HOST_RE  # noqa: E402  (shared host extraction)


def _host_of_url(batch: pa.Table) -> np.ndarray:
    import pyarrow.compute as pc

    ex = pc.extract_regex(batch.column("url"), HOST_RE)
    h = pc.fill_null(pc.struct_field(ex, "host"), "<no-host>")
    return np.asarray(h.to_pylist(), dtype=object)


def _host_edges(pages_ds, n_docs: int, links: int, partitions: int):
    """Dataset[(src, dst, w, ow)] — the aggregated host graph with
    exact per-src out-degrees. ONE coarse partition join (a link row
    originates from its src page, so it carries src_host locally; only
    the dst side needs the doc→host resolution) — the corpus-sized
    doc→host map is never broadcast and never visits the driver."""

    def tag_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        hosts = _host_of_url(b)
        # host rows keyed by own doc_id (the dst-resolution side)
        key = [ids]
        hh = [hosts]
        tag = [np.ones(len(ids), dtype=np.int8)]
        # link rows keyed by dst_doc, already carrying src_host
        for j in range(links):
            dn = ids % n_docs
            dst = ((dn * dn) % n_docs * 7 + ids * 31 + 97 * j + 1) % n_docs
            keep = dst != ids  # drop exact self-links
            key.append(dst[keep])
            hh.append(hosts[keep])
            tag.append(np.zeros(int(keep.sum()), dtype=np.int8))
        key = np.concatenate(key)
        return pa.table({
            "key": pa.array(key, type=pa.int64()),
            "host": pa.array(np.concatenate(hh), type=pa.string()),
            "is_host": pa.array(np.concatenate(tag)),
            "p": pa.array(key % partitions),
        })

    tagged = pages_ds.select_columns(["doc_id", "url"]) \
        .map_batches(tag_rows, batch_format="pyarrow")

    def resolve_dst(g: pd.DataFrame) -> pd.DataFrame:
        hosts = g.loc[g["is_host"] == 1, ["key", "host"]] \
            .rename(columns={"host": "dst_host"})
        lnk = g.loc[g["is_host"] == 0, ["key", "host"]] \
            .rename(columns={"host": "src_host"})
        m = lnk.merge(hosts, on="key", how="inner")
        src = m["src_host"].to_numpy(dtype=object)
        codes = pd.util.hash_array(src.astype("U")).astype(np.int64)
        return pd.DataFrame({
            "src": src, "dst": m["dst_host"],
            "pq": np.abs(codes) % partitions,
        })

    edges = tagged.repartition(32) \
        .groupby("p").map_groups(resolve_dst, batch_format="pandas")

    def agg_part(g: pd.DataFrame) -> pd.DataFrame:
        """Weights per (src, dst) + exact out-degree per src — all of a
        src host's edges live in this partition (routed by src hash)."""
        w = g.groupby(["src", "dst"], sort=True).size() \
            .rename("w").reset_index()
        ow = w.groupby("src", sort=False)["w"].transform("sum")
        w["ow"] = ow
        return w

    def agg_arrow(d: pd.DataFrame) -> pa.Table:
        return pa.table({
            "src": pa.array(d["src"].to_numpy(dtype=object),
                            type=pa.string()),
            "dst": pa.array(d["dst"].to_numpy(dtype=object),
                            type=pa.string()),
            "w": pa.array(d["w"].to_numpy(dtype=np.int64)),
            "ow": pa.array(d["ow"].to_numpy(dtype=np.int64)),
        })

    # Materialized: T iterations re-read this table (dual-consumer
    # rule); bounded by distinct (src_host, dst_host) pairs.
    return edges.groupby("pq").map_groups(agg_part,
                                          batch_format="pandas") \
        .map_batches(agg_arrow, batch_format="pandas").materialize()


def host_rank(pages_ds, iters: int = RANK_ITERS,
              links: int = LINKS_PER_DOC, partitions: int = 64):
    """Dataset[(host, rank_micro)] — integer-exact PageRank over the
    synthesized host link graph after ``iters`` rounds."""
    import ray

    n_docs = max(int(pages_ds.count()), 1)
    ew = _host_edges(pages_ds, n_docs, links, partitions)

    # bounded host list: distinct hosts of the graph + isolated hosts
    def hosts_part(b: pa.Table) -> pa.Table:
        hosts = np.unique(_host_of_url(b))
        return pa.table({"host": pa.array(hosts, type=pa.string())})

    hosts = pages_ds.select_columns(["doc_id", "url"]) \
        .map_batches(hosts_part, batch_format="pyarrow") \
        .groupby("host").count().select_columns(["host"]).take_all()
    hl = np.sort(np.asarray([r["host"] for r in hosts], dtype=object))
    H = len(hl)
    assert H <= MAX_HOSTS, f"{H} hosts exceed the rank-vector bound"
    init = RANK_SCALE // max(H, 1)
    base = (15 * init) // 100
    ranks = np.full(H, init, dtype=np.int64)

    # Small-graph fast path: below the bound, collect the aggregated
    # host graph ONCE and run the identical integer loop locally —
    # 10 Ray rounds on a tiny edge table are pure job overhead. The
    # distributed rounds below are the >5M-edge scale path; both
    # compute the exact same int64 arithmetic.
    n_edges = ew.count()
    if n_edges <= SMALL_EDGES:
        edf = ew.to_pandas()
        si = np.searchsorted(hl, edf["src"].to_numpy(dtype=object))
        di = np.searchsorted(hl, edf["dst"].to_numpy(dtype=object))
        w = edf["w"].to_numpy(dtype=np.int64)
        ow = edf["ow"].to_numpy(dtype=np.int64)
        for _ in range(iters):
            c = (ranks[si] // ow) * w
            insum = np.zeros(H, dtype=np.int64)
            np.add.at(insum, di, c)
            ranks = base + (DAMP_PCT * insum) // 100
    else:
        for _ in range(iters):
            ref = ray.put((hl, ranks))

            def contrib(b: pa.Table, ref=ref) -> pa.Table:
                hl_, r_ = ray.get(ref)  # zero-copy plasma read per task
                src = np.asarray(b.column("src").to_pylist(), dtype=object)
                idx = np.searchsorted(hl_, src)
                w = b.column("w").to_numpy(zero_copy_only=False)
                ow = b.column("ow").to_numpy(zero_copy_only=False)
                c = (r_[idx] // ow) * w
                return pa.table({"dst": b.column("dst"),
                                 "c": pa.array(c, type=pa.int64())})

            from ray.data.aggregate import Sum

            rows = ew.map_batches(contrib, batch_format="pyarrow") \
                .groupby("dst").aggregate(Sum("c", alias_name="c")) \
                .take_all()
            new = np.full(H, base, dtype=np.int64)
            if rows:
                dsts = np.asarray([r["dst"] for r in rows], dtype=object)
                cs = np.asarray([int(r["c"]) for r in rows],
                                dtype=np.int64)
                new[np.searchsorted(hl, dsts)] = \
                    base + (DAMP_PCT * cs) // 100
            ranks = new

    out = pa.table({"host": pa.array(hl, type=pa.string()),
                    "rank_micro": pa.array(ranks, type=pa.int64())})
    import ray.data

    return ray.data.from_arrow(out)


# ---------------------------------------------------------------------------
# Host connected components (web-graph communities over the same graph)
# ---------------------------------------------------------------------------

_H63 = (1 << 63) - 1


def _hash63(hosts) -> np.ndarray:
    """First 8 md5 bytes per host masked to 63 bits — int64-safe on
    both sides (SQL: ``md5_number_upper(host) & (2^63 - 1)``), so the
    min-label propagation order agrees bit-for-bit."""
    from .corpus import _host_hash64

    return (_host_hash64(list(hosts))
            & np.uint64(_H63)).astype(np.int64)


def host_components(pages_ds, links: int = LINKS_PER_DOC,
                    partitions: int = 64):
    """Connected components of the host link graph ->
    ``(host, component)`` with component = min 63-bit host hash in the
    component — the web-graph community labeling that pairs with
    :func:`host_rank` (same synthesized edge rule, same one-join
    resolution).

    Scale shape: hosts enter the BSP min-label propagation
    (:func:`maskmypy_ray.text.clusters.connected_components` — one
    fused coarse shuffle per round, Pregel delta messaging) as content
    hashes, so no driver-side host dictionary exists at any point; the
    final hash->host attachment is one coarse partition merge over the
    (host, hash) map rows."""
    from .clusters import connected_components

    n_docs = pages_ds.count()
    edges = _host_edges(pages_ds, n_docs, links, partitions)

    def edge_ids(b: pa.Table) -> pa.Table:
        src = b.column("src").to_pylist()
        dst = b.column("dst").to_pylist()
        return pa.table({
            "doc_a": pa.array(_hash63(src)),
            "doc_b": pa.array(_hash63(dst)),
        })

    def node_map(b: pa.Table) -> pa.Table:
        # distinct within the partition-local batch; cross-batch dups
        # are dropped in the attach merge below
        hosts = sorted(set(b.column("src").to_pylist())
                       | set(b.column("dst").to_pylist()))
        h = _hash63(hosts)
        return pa.table({
            "host": pa.array(hosts, type=pa.string()),
            "node": pa.array(h),
            "p": pa.array(h % partitions),
        })

    eid = edges.map_batches(edge_ids, batch_format="pyarrow")
    nmap = edges.map_batches(node_map, batch_format="pyarrow")

    # connected_components needs UNIQUE node rows: per-partition
    # first-wins over the (host, hash) map rows; the same deduped rows
    # feed the final attach merge.
    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["node", "host"], kind="mergesort")
        return g[~g["node"].duplicated().to_numpy()][["host", "node", "p"]]

    uniq = nmap.groupby("p").map_groups(dedupe, batch_format="pandas") \
        .map_batches(lambda b: pa.table({
            "host": b.column("host"), "node": b.column("node"),
            "p": b.column("p")}), batch_format="pyarrow").materialize()
    nodes = uniq.map_batches(
        lambda b: pa.table({"node": b.column("node")}),
        batch_format="pyarrow")
    cc = connected_components(nodes, eid, node_col="node")

    def cc_part(b: pa.Table) -> pa.Table:
        n = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": b.column("node"),
            "cluster_id": b.column("cluster_id"),
            "p": pa.array(n % partitions),
        })

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # sentinel -1 tags the map side: a nullable column would force
        # pandas to float64 and silently round the int63 hash labels
        m = g[g["cluster_id"] == -1][["node", "host"]]
        c = g[g["cluster_id"] != -1][["node", "cluster_id"]]
        j = m.merge(c, on="node", how="inner")
        return pd.DataFrame({
            "host": j["host"].to_numpy(),
            "component": j["cluster_id"].to_numpy().astype(np.int64),
        })

    side_m = uniq.map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "host": b.column("host"),
            "cluster_id": pa.array([-1] * len(b), type=pa.int64()),
            "p": b.column("p"),
        }), batch_format="pyarrow")
    side_c = cc.map_batches(cc_part, batch_format="pyarrow").map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "host": pa.array([""] * len(b), type=pa.string()),
            "cluster_id": b.column("cluster_id"),
            "p": b.column("p"),
        }), batch_format="pyarrow")

    def to_arrow(d: pd.DataFrame) -> pa.Table:
        return pa.table({
            "host": pa.array(d["host"].to_numpy(dtype=object),
                             type=pa.string()),
            "component": pa.array(d["component"].to_numpy(),
                                  type=pa.int64()),
        })

    return side_m.union(side_c).groupby("p") \
        .map_groups(attach, batch_format="pandas") \
        .map_batches(to_arrow, batch_format="pandas")


def host_degrees(pages_ds, links: int = LINKS_PER_DOC,
                 partitions: int = 64):
    """Dataset[(host, metric, v)] — per-host link-graph degree profile
    over the SAME synthesized edge table host_rank streams (and that
    :mod:`maskmypy_ray.text.html`'s extract_links recovers from the
    html column): metrics ``out_d``/``in_d`` (distinct out/in
    neighbors), ``out_w``/``in_w`` (link counts), ``recip`` (edges
    whose reverse edge exists).

    Long form so consumers (and the merged panel row) need one value
    slot. Reciprocity pairs (a,b)/(b,a) inside ONE partition via a
    symmetric routing key; degree partials stream off the bounded
    aggregated edge table; the final sum is a fused-key groupby over
    hosts x 5 rows (few distinct keys — plain aggregate is right)."""
    from ray.data.aggregate import Sum

    n_docs = max(int(pages_ds.count()), 1)
    ew = _host_edges(pages_ds, n_docs, links, partitions)

    def add_sym(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy(zero_copy_only=False)
        dst = b.column("dst").to_numpy(zero_copy_only=False)
        lo = np.minimum(src, dst).astype("U")
        hi = np.maximum(src, dst).astype("U")
        code = pd.util.hash_array(np.char.add(np.char.add(lo, "\t"), hi))
        return b.append_column(
            "sp", pa.array((code % np.uint64(partitions)).astype(np.int64)))

    def recip_part(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, left_on=["src", "dst"], right_on=["dst", "src"],
                    suffixes=("", "_r"))
        if not len(m):
            return pd.DataFrame({"key": pd.Series([], dtype=object),
                                 "v": pd.Series([], dtype=np.int64)})
        c = m.groupby("src", sort=True).size()
        return pd.DataFrame({"key": "recip\t" + c.index.astype(object),
                             "v": c.to_numpy(dtype=np.int64)})

    recip = ew.map_batches(add_sym, batch_format="pyarrow") \
        .groupby("sp").map_groups(recip_part, batch_format="pandas")

    def deg_partials(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy(zero_copy_only=False)
        dst = b.column("dst").to_numpy(zero_copy_only=False)
        w = b.column("w").to_numpy(zero_copy_only=False)
        one = np.ones(len(src), dtype=np.int64)
        key = np.concatenate([
            np.char.add("out_d\t", src.astype("U")),
            np.char.add("out_w\t", src.astype("U")),
            np.char.add("in_d\t", dst.astype("U")),
            np.char.add("in_w\t", dst.astype("U"))])
        v = np.concatenate([one, w, one, w])
        return pa.table({"key": pa.array(key.astype(object),
                                         type=pa.string()),
                         "v": pa.array(v, type=pa.int64())})

    def to_arrow(d: pd.DataFrame) -> pa.Table:
        return pa.table({
            "key": pa.array(d["key"].to_numpy(dtype=object),
                            type=pa.string()),
            "v": pa.array(d["v"].to_numpy(dtype=np.int64)),
        })

    longrows = ew.map_batches(deg_partials, batch_format="pyarrow") \
        .union(recip.map_batches(to_arrow, batch_format="pandas"))

    def split(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = pc.split_pattern(b.column("key"), "\t", max_splits=1)
        return pa.table({
            "host": pc.list_element(parts, 1),
            "metric": pc.list_element(parts, 0),
            "v": b.column("sum(v)"),
        })

    return longrows.groupby("key").aggregate(Sum("v")) \
        .map_batches(split, batch_format="pyarrow")


def host_triangles(pages_ds, links: int = LINKS_PER_DOC,
                   partitions: int = 64):
    """Dataset[(host, deg, n_tri, clust_micro)] — per-host triangle
    counts and local clustering coefficients over the simple undirected
    host graph (same synthesized link rule as :func:`host_rank` /
    :func:`host_components`): ``n_tri`` = triangles containing the
    host, ``deg`` = simple-graph degree, ``clust_micro`` = the
    all-integer ``(2_000_000 * n_tri) // (deg * (deg - 1))`` (0 for
    deg < 2) — no floats anywhere, so the SQL twin is bit-exact.

    Scale shape — the standard degree-ordered node-iterator plan
    (Schank & Wagner 2005; each triangle is counted exactly once on
    its lowest-(deg, id) vertex, which bounds wedge fan-out by graph
    arboricity instead of max degree, taming hub skew):

    1. canonical simple edges: one coarse pair-hash partition dedup;
    2. degrees: endpoint explode + per-node-partition counts;
    3. orientation: two coarse partition merges attach (deg_a, deg_b),
       each edge points from the lexicographically smaller (deg, id);
    4. wedges: out-neighbor pairs per source, emitted ordered by the
       same total order, routed by the (v XOR w) pair hash;
    5. closing probe: one partition merge of wedges against oriented
       edges — a match is a triangle, counted on all 3 members;
    6. final: host map + degree + triangle counts meet in one fused
       node-partition merge. Nothing visits the driver at any size.
    """
    n_docs = pages_ds.count()
    edges = _host_edges(pages_ds, n_docs, links, partitions)

    # Adaptive coarseness (same rule as connected_components): every
    # stage below shuffles in-blocks x P objects, so a tiny host graph
    # at the caller's full P pays hundreds of near-empty-object fixed
    # costs per stage. The result is partition-count independent
    # (pytest-pinned); the count is free (edges just materialized).
    partitions = min(partitions, max(4, edges.count() // 2048 + 1))

    # -- 1. canonical undirected simple edges + host/node map rows --------
    def canon(b: pa.Table) -> pa.Table:
        hs = _hash63(b.column("src").to_pylist())
        hd = _hash63(b.column("dst").to_pylist())
        a = np.minimum(hs, hd)
        bb = np.maximum(hs, hd)
        keep = a != bb
        a, bb = a[keep], bb[keep]
        return pa.table({
            "a": pa.array(a), "b": pa.array(bb),
            "pp": pa.array((a ^ bb) % partitions),
        })

    def node_map(b: pa.Table) -> pa.Table:
        hosts = sorted(set(b.column("src").to_pylist())
                       | set(b.column("dst").to_pylist()))
        h = _hash63(hosts)
        return pa.table({
            "host": pa.array(hosts, type=pa.string()),
            "node": pa.array(h),
            "p": pa.array(h % partitions),
        })

    def dedup_edges(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["a", "b"], kind="mergesort") \
            .drop_duplicates(["a", "b"])[["a", "b"]]

    # bounded checkpoint (distinct host pairs); 3 consumers: degrees,
    # orientation, and the host map below reuses the raw edge table
    uedges = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby("pp").map_groups(dedup_edges, batch_format="pandas") \
        .map_batches(lambda d: pa.table({
            "a": pa.array(d["a"].to_numpy(dtype="int64")),
            "b": pa.array(d["b"].to_numpy(dtype="int64"))}),
            batch_format="pandas").materialize()

    nmap = edges.map_batches(node_map, batch_format="pyarrow")

    # -- 2. degrees ---------------------------------------------------------
    def endpoints(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy(zero_copy_only=False)
        bb = b.column("b").to_numpy(zero_copy_only=False)
        n = np.concatenate([a, bb])
        return pa.table({"node": pa.array(n),
                         "p": pa.array(n % partitions)})

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("node", sort=True).size().rename("deg").reset_index()
        return c

    deg = uedges.map_batches(endpoints, batch_format="pyarrow") \
        .groupby("p").map_groups(count_part, batch_format="pandas") \
        .map_batches(lambda d: pa.table({
            "node": pa.array(d["node"].to_numpy(dtype="int64")),
            "deg": pa.array(d["deg"].to_numpy(dtype="int64"))}),
            batch_format="pandas").materialize()

    # -- 3. orientation: attach deg to both ends (two partition merges) ----
    def side(ds_in, cols, route_col):
        def fn(b: pa.Table) -> pa.Table:
            k = b.column(route_col).to_numpy(zero_copy_only=False)
            out = {c: b.column(src) for c, src in cols.items()}
            out["mp"] = pa.array(k % partitions, type=pa.int64())
            return pa.table(out)
        return ds_in.map_batches(fn, batch_format="pyarrow")

    dside = side(deg, {"node": "node", "deg": "deg"}, "node")

    e1 = side(uedges, {"a": "a", "b": "b"}, "a")

    def attach_da(g: pd.DataFrame) -> pd.DataFrame:
        dd = g.loc[g["tag"] == 1, ["node", "deg"]]
        ee = g.loc[g["tag"] == 0, ["a", "b"]]
        j = ee.merge(dd, left_on="a", right_on="node", how="inner")
        return pd.DataFrame({"a": j["a"].to_numpy(dtype="int64"),
                             "b": j["b"].to_numpy(dtype="int64"),
                             "da": j["deg"].to_numpy(dtype="int64")})

    # union trick: -1 SENTINELS for the absent columns, never nulls —
    # a nullable int64 forces pandas to float64 and silently rounds
    # the 63-bit node hashes (same rule as host_components' attach).
    # Fixed column order so the two union sides share one schema.
    def pad(b: pa.Table, order: list, tag: int) -> pa.Table:
        n = len(b)
        cols = {}
        for c in order:
            cols[c] = (b.column(c) if c in b.column_names
                       else pa.array(np.full(n, -1, dtype=np.int64)))
        cols["tag"] = pa.array(np.full(n, tag, dtype=np.int64))
        return pa.table(cols)

    _ORD1 = ["a", "b", "node", "deg", "mp"]
    e1p = e1.map_batches(lambda b: pad(b, _ORD1, 0),
                         batch_format="pyarrow")
    d1p = dside.map_batches(lambda b: pad(b, _ORD1, 1),
                            batch_format="pyarrow")
    ed_a = e1p.union(d1p).groupby("mp") \
        .map_groups(attach_da, batch_format="pandas") \
        .map_batches(lambda d: pa.table({
            c: pa.array(d[c].to_numpy(dtype="int64"))
            for c in ("a", "b", "da")}), batch_format="pandas")

    e2 = side(ed_a, {"a": "a", "b": "b", "da": "da"}, "b")

    def attach_db_orient(g: pd.DataFrame) -> pd.DataFrame:
        dd = g.loc[g["tag"] == 1, ["node", "deg"]]
        ee = g.loc[g["tag"] == 0, ["a", "b", "da"]]
        j = ee.merge(dd, left_on="b", right_on="node", how="inner")
        a = j["a"].to_numpy(dtype="int64")
        b = j["b"].to_numpy(dtype="int64")
        da = j["da"].to_numpy(dtype="int64")
        db = j["deg"].to_numpy(dtype="int64")
        fwd = (da < db) | ((da == db) & (a < b))  # (deg, id) lex order
        return pd.DataFrame({
            "u": np.where(fwd, a, b), "v": np.where(fwd, b, a),
            "du": np.where(fwd, da, db), "dv": np.where(fwd, db, da)})

    _ORD2 = ["a", "b", "da", "node", "deg", "mp"]
    e2p = e2.map_batches(lambda b: pad(b, _ORD2, 0),
                         batch_format="pyarrow")
    d2p = dside.map_batches(lambda b: pad(b, _ORD2, 1),
                            batch_format="pyarrow")
    # bounded checkpoint (|E| rows); 2 consumers: wedges + closing probe
    oriented = e2p.union(d2p).groupby("mp") \
        .map_groups(attach_db_orient, batch_format="pandas") \
        .map_batches(lambda d: pa.table({
            c: pa.array(d[c].to_numpy(dtype="int64"))
            for c in ("u", "v", "du", "dv")}),
            batch_format="pandas").materialize()

    # -- 4. wedges per source, ordered by the same (deg, id) total order ---
    def route_u(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        return b.append_column("wp", pa.array(u % partitions,
                                              type=pa.int64()))

    def wedge_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "dv", "v"], kind="mergesort")
        u = g["u"].to_numpy(dtype="int64")
        v = g["v"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        xs, ys, zs = [], [], []
        for s, e in zip(starts, ends):
            d = e - s
            if d < 2:
                continue
            i, j = np.triu_indices(d, k=1)
            xs.append(np.full(len(i), u[s], dtype=np.int64))
            ys.append(v[s + i])  # (dv, v)-sorted => wedge is ordered
            zs.append(v[s + j])
        if not xs:
            return pd.DataFrame({c: pd.array([], dtype="int64")
                                 for c in ("x", "y", "z")})
        return pd.DataFrame({"x": np.concatenate(xs),
                             "y": np.concatenate(ys),
                             "z": np.concatenate(zs)})

    wedges = oriented.map_batches(route_u, batch_format="pyarrow") \
        .groupby("wp").map_groups(wedge_part, batch_format="pandas") \
        .map_batches(lambda d: pa.table({
            c: pa.array(d[c].to_numpy(dtype="int64"))
            for c in ("x", "y", "z")}), batch_format="pandas")

    # -- 5. closing-edge probe: triangles ----------------------------------
    def wedge_rows(b: pa.Table) -> pa.Table:
        y = b.column("y").to_numpy(zero_copy_only=False)
        z = b.column("z").to_numpy(zero_copy_only=False)
        return pa.table({
            "x": b.column("x"), "y": b.column("y"), "z": b.column("z"),
            "is_edge": pa.array(np.zeros(len(b), dtype=np.int64)),
            "cp": pa.array((y ^ z) % partitions, type=pa.int64())})

    def edge_rows(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        return pa.table({
            "x": pa.array(np.zeros(len(b), dtype=np.int64)),
            "y": b.column("u"), "z": b.column("v"),
            "is_edge": pa.array(np.ones(len(b), dtype=np.int64)),
            "cp": pa.array((u ^ v) % partitions, type=pa.int64())})

    def close_part(g: pd.DataFrame) -> pd.DataFrame:
        ee = g.loc[g["is_edge"] == 1, ["y", "z"]]
        ww = g.loc[g["is_edge"] == 0, ["x", "y", "z"]]
        j = ww.merge(ee, on=["y", "z"], how="inner")
        n = np.concatenate([j["x"].to_numpy(dtype="int64"),
                            j["y"].to_numpy(dtype="int64"),
                            j["z"].to_numpy(dtype="int64")])
        return pd.DataFrame({"node": n})

    members = wedges.map_batches(wedge_rows, batch_format="pyarrow") \
        .union(oriented.map_batches(edge_rows, batch_format="pyarrow")) \
        .groupby("cp").map_groups(close_part, batch_format="pandas") \
        .map_batches(lambda d: pa.table({
            "node": pa.array(d["node"].to_numpy(dtype="int64"))}),
            batch_format="pandas")

    # -- 6. final fused merge: host map + deg + triangle counts ------------
    def tri_rows(b: pa.Table) -> pa.Table:
        n = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": b.column("node"),
            "host": pa.array([""] * len(b), type=pa.string()),
            "kind": pa.array(np.full(len(b), 2, dtype=np.int64)),
            "val": pa.array(np.ones(len(b), dtype=np.int64)),
            "fp": pa.array(n % partitions, type=pa.int64())})

    def deg_rows(b: pa.Table) -> pa.Table:
        n = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": b.column("node"),
            "host": pa.array([""] * len(b), type=pa.string()),
            "kind": pa.array(np.ones(len(b), dtype=np.int64)),
            "val": b.column("deg"),
            "fp": pa.array(n % partitions, type=pa.int64())})

    def map_rows(b: pa.Table) -> pa.Table:
        n = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": b.column("node"),
            "host": b.column("host"),
            "kind": pa.array(np.zeros(len(b), dtype=np.int64)),
            "val": pa.array(np.zeros(len(b), dtype=np.int64)),
            "fp": pa.array(n % partitions, type=pa.int64())})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        m = g.loc[g["kind"] == 0, ["node", "host"]] \
            .sort_values(["node", "host"], kind="mergesort") \
            .drop_duplicates("node")
        dd = g.loc[g["kind"] == 1, ["node", "val"]] \
            .rename(columns={"val": "deg"})
        tc = g.loc[g["kind"] == 2].groupby("node", as_index=False)["val"] \
            .sum().rename(columns={"val": "n_tri"})
        j = dd.merge(m, on="node", how="inner") \
            .merge(tc, on="node", how="left")
        degv = j["deg"].to_numpy(dtype="int64")
        ntri = j["n_tri"].fillna(0.0).to_numpy(dtype="float64") \
            .astype(np.int64)  # counts < 2^53: exact round-trip
        cm = np.zeros(len(j), dtype=np.int64)
        ok = degv >= 2
        cm[ok] = (2_000_000 * ntri[ok]) // (degv[ok] * (degv[ok] - 1))
        return pd.DataFrame({"host": j["host"], "deg": degv,
                             "n_tri": ntri, "clust_micro": cm})

    return nmap.map_batches(map_rows, batch_format="pyarrow") \
        .union(deg.map_batches(deg_rows, batch_format="pyarrow")) \
        .union(members.map_batches(tri_rows, batch_format="pyarrow")) \
        .groupby("fp").map_groups(finalize, batch_format="pandas") \
        .map_batches(lambda d: pa.table({
            "host": pa.array(d["host"].to_numpy(dtype=object),
                             type=pa.string()),
            "deg": pa.array(d["deg"].to_numpy(dtype="int64")),
            "n_tri": pa.array(d["n_tri"].to_numpy(dtype="int64")),
            "clust_micro": pa.array(d["clust_micro"].to_numpy(
                dtype="int64"))}), batch_format="pandas")
