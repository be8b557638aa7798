"""Mergeable sketches — HyperLogLog approximate count-distinct.

The reference has no sketches (SURVEY.md §2.5 "No distinct/sketches in
reference"); at 100 TB an exact count-distinct of a high-cardinality key
(users, hosts, query strings) is a full shuffle of every distinct value,
while an HLL register array is a few hundred BYTES per group and merges
with an elementwise max — the canonical partial-aggregate shape
(Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm").

Determinism contract: the hash is the engine's mix32 avalanche
(rng.py), so bucket indices and rank values are integers that DuckDB
reproduces bit-for-bit (``sql_mix32`` + ``length(bin(v))``); the
register table, the zero-bucket count and the integer-quantized
denominator ``inv_sum_num = Σ 2^(25-reg)`` are therefore hash-exact.
The float estimate applies the standard bias correction with the same
double arithmetic in both engines; only ``ln`` in the small-range
correction may differ by 1 ulp between numpy and DuckDB, which the 6-dp
rounding absorbs except on measure-zero boundaries (documented risk,
same class as the accepted ``round(sum(value), 6)`` boundary in
stages/events.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .rng import mix32

HLL_B = 8                     # bucket bits
HLL_M = 1 << HLL_B            # 256 registers
HLL_VAL_BITS = 32 - HLL_B     # 24 bits feed the rank
HLL_MAX_RHO = HLL_VAL_BITS + 1
# alpha_256 * m^2 * 2^25 — the whole numerator folded into one double,
# emitted verbatim into the SQL twin so both sides perform ONE division.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_EST_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_MAX_RHO)


def hll_partial_batch(batch: pa.Table, key_col: str,
                      group_col: str) -> pa.Table:
    """Per-batch partial registers: (group, bucket) -> max rank.

    One mix32 over the key column, bucket = low ``HLL_B`` bits, rank =
    leading-zero count of the remaining bits + 1 (via ``np.frexp`` —
    exact for integers < 2^53). The batch is pre-reduced to at most
    |groups| x 256 rows before the shuffle.
    """
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    h = mix32(keys)
    bucket = h & (HLL_M - 1)
    v = h >> HLL_B
    # bit length: frexp exponent (v = mant * 2^exp, mant in [0.5, 1))
    bitlen = np.frexp(v.astype(np.float64))[1]
    rho = np.where(v == 0, HLL_MAX_RHO, HLL_MAX_RHO - bitlen).astype(np.int64)
    df = pd.DataFrame({
        "grp": batch.column(group_col).to_numpy(zero_copy_only=False),
        "bucket": bucket,
        "reg": rho,
    })
    g = df.groupby(["grp", "bucket"], sort=False)["reg"].max().reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


def _finish_group(g: pd.DataFrame) -> pd.DataFrame:
    """One merged register array -> the HLL estimate row."""
    reg = np.zeros(HLL_M, dtype=np.int64)
    reg[g["bucket"].to_numpy()] = g["reg"].to_numpy()
    n_zero = int((reg == 0).sum())
    inv_sum_num = int((np.int64(1) << (HLL_MAX_RHO - reg)).sum())
    est = HLL_EST_NUM / inv_sum_num
    if est <= 2.5 * HLL_M and n_zero > 0:
        est = HLL_M * np.log(HLL_M / n_zero)
    return pd.DataFrame({
        "grp": [g["grp"].iloc[0]],
        "n_zero": np.array([n_zero], dtype=np.int64),
        "inv_sum_num": np.array([inv_sum_num], dtype=np.int64),
        "estimate": [round(float(est), 6)],
    })


def hll_distinct(ds, key_col: str, group_col: str):
    """Dataset[(grp, n_zero, inv_sum_num, estimate)] — one HLL-256
    cardinality sketch of ``key_col`` per ``group_col`` value.

    Shape: per-batch partial registers (≤ |groups|·256 rows/batch enter
    the shuffle regardless of batch size) -> one small
    ``groupby(grp, bucket).max`` -> per-group finish. The finish is a
    FEW-BIG-GROUPS ``map_groups`` (one group per distinct ``group_col``
    value — the pattern reserved for exactly this case, BASELINE.md §6).
    """
    partials = ds.select_columns([key_col, group_col]).map_batches(
        lambda b: hll_partial_batch(b, key_col, group_col),
        batch_format="pyarrow")
    return _hll_from_partials(partials)


def hll_sql(table: str, key_expr: str, group_col: str) -> str:
    """DuckDB twin of :func:`hll_distinct` — identical registers via
    ``sql_mix32`` + ``length(bin(v))``, identical integer denominator,
    identical one-division estimate arithmetic."""
    from .rng import sql_mix32

    h = sql_mix32(f"({key_expr}) & 4294967295")
    est = f"{HLL_EST_NUM!r} / inv_sum_num"
    corr = f"{float(HLL_M)!r} * ln({float(HLL_M)!r} / n_zero)"
    return f"""WITH hh AS (
  SELECT {group_col} AS grp, {h} AS h FROM {table}),
hb AS (SELECT grp, h & {HLL_M - 1} AS bucket, h >> {HLL_B} AS v FROM hh),
regs AS (
  SELECT grp, bucket,
         max(CASE WHEN v = 0 THEN {HLL_MAX_RHO}
                  ELSE {HLL_MAX_RHO} - length(bin(v)) END) AS reg
  FROM hb GROUP BY 1, 2),
agg AS (
  SELECT grp,
         CAST({HLL_M} - count(*) AS BIGINT) AS n_zero,
         CAST(sum(CAST(1 AS BIGINT) << ({HLL_MAX_RHO} - reg))
              + ({HLL_M} - count(*)) * {1 << HLL_MAX_RHO} AS BIGINT)
           AS inv_sum_num
  FROM regs GROUP BY 1)
SELECT grp, n_zero, inv_sum_num,
       round(CASE WHEN {est} <= {2.5 * HLL_M!r} AND n_zero > 0
                  THEN {corr} ELSE {est} END, 6) AS estimate
FROM agg"""


# ---------------------------------------------------------------------------
# Count-min sketch — approximate heavy-hitter counts (Cormode &
# Muthukrishnan 2005). Like the HLL above, registers are derived from
# the engine's mix32 hash so DuckDB rebuilds the identical sketch and
# every estimate is an INTEGER min — hash-exact end to end.
# ---------------------------------------------------------------------------

CMS_D = 4      # hash rows
CMS_W = 1024   # counters per row
CMS_SALTS = (0x1F2C, 0x3A99, 0x5B10, 0x77E3)


def _cms_bucket(codes: np.ndarray, d: int) -> np.ndarray:
    return mix32(np.bitwise_xor(codes, np.int64(CMS_SALTS[d]))) & (CMS_W - 1)


def cms_partial_batch(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch partial CMS over the batch's TOKENS: (d, bucket, cnt)
    rows, pre-aggregated (≤ d·w rows per batch regardless of token
    count). Token codes are the shared 32-bit md5 codes (text.grams),
    so the sketch agrees with every other token-level operator."""
    from .text.grams import token_codes_batch

    texts = batch.column(text_col).to_pylist()
    codes, _ = token_codes_batch(texts)
    if not len(codes):
        return pa.table({"d": pa.array([], type=pa.int64()),
                         "bucket": pa.array([], type=pa.int64()),
                         "cnt": pa.array([], type=pa.int64())})
    ds_, bs_, cs_ = [], [], []
    for d in range(CMS_D):
        b = _cms_bucket(codes, d)
        cnt = np.bincount(b, minlength=CMS_W)
        nz = np.nonzero(cnt)[0]
        ds_.append(np.full(len(nz), d, dtype=np.int64))
        bs_.append(nz.astype(np.int64))
        cs_.append(cnt[nz].astype(np.int64))
    return pa.table({
        "d": pa.array(np.concatenate(ds_), type=pa.int64()),
        "bucket": pa.array(np.concatenate(bs_), type=pa.int64()),
        "cnt": pa.array(np.concatenate(cs_), type=pa.int64()),
    })


def _token_code(token: str) -> int:
    from hashlib import md5

    return int.from_bytes(md5(token.encode()).digest()[:4], "little")


def probe_buckets(tokens: list[str]) -> list[tuple[str, int, int]]:
    """(token, d, bucket) probe coordinates — plain Python on the tiny
    probe list; the SQL twin embeds the same constant-folded triples."""
    out = []
    for t in tokens:
        c = np.int64(_token_code(t))
        for d in range(CMS_D):
            out.append((t, d, int(_cms_bucket(np.array([c]), d)[0])))
    return out


def cms_token_counts(ds, probe_tokens: list[str], text_col: str = "text"):
    """CMS estimate (an upper bound, exact-ish for heavy hitters) of the
    corpus-wide occurrence count of each probe token. Returns
    pa.Table[(token, est_count)].

    Shape: one tokenize+bincount pass per batch -> ONE small
    ``groupby(d, bucket).sum`` (≤ 4096 groups) -> the probe lookup
    touches ≤ |probes|·4 register rows (bounded driver-side collect,
    same class as the quantile finish)."""
    from ray.data.aggregate import Sum

    regs = ds.map_batches(lambda b: cms_partial_batch(b, text_col),
                          batch_format="pyarrow") \
        .groupby(["d", "bucket"]).aggregate(Sum("cnt", alias_name="cnt"))
    probes = probe_buckets(probe_tokens)
    want = {(d, b) for _, d, b in probes}

    def pick(b: pa.Table) -> pa.Table:
        dd = b.column("d").to_numpy(zero_copy_only=False)
        bb = b.column("bucket").to_numpy(zero_copy_only=False)
        keep = np.fromiter(((d, w) in want for d, w in zip(dd, bb)),
                           dtype=bool, count=len(dd))
        return b.filter(pa.array(keep))

    got = regs.map_batches(pick, batch_format="pyarrow").to_pandas()
    reg_of = {(int(r.d), int(r.bucket)): int(r.cnt)
              for r in got.itertuples()}
    toks, ests = [], []
    for t in probe_tokens:
        est = min(reg_of.get((d, b), 0) for tt, d, b in probes if tt == t)
        toks.append(t)
        ests.append(est)
    return pa.table({
        "token": pa.array(toks, type=pa.string()),
        "est_count": pa.array(np.array(ests, dtype=np.int64),
                              type=pa.int64()),
    })


def cms_sql(table: str, probe_tokens: list[str],
            text_col: str = "text") -> str:
    """DuckDB twin of :func:`cms_token_counts`: identical registers via
    ``md5_number_upper`` token codes + ``sql_mix32`` buckets, identical
    integer min over the same constant-folded probe coordinates."""
    from .rng import sql_mix32

    salts = ", ".join(f"({d}, {CMS_SALTS[d]})" for d in range(CMS_D))
    bucket = sql_mix32("xor(tc.c, s.salt)")
    probes = ", ".join(f"('{t}', {d}, {b})"
                       for t, d, b in probe_buckets(probe_tokens))
    return f"""WITH tl AS (
  SELECT regexp_extract_all(lower({text_col}), '[a-z0-9]+') AS l FROM {table}),
tok AS (SELECT unnest(l) AS t FROM tl),
tc AS (SELECT CAST(md5_number_upper(t) & 4294967295 AS BIGINT) AS c FROM tok),
salts(d, salt) AS (SELECT * FROM (VALUES {salts})),
regs AS (
  SELECT s.d, ({bucket}) & {CMS_W - 1} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM tc CROSS JOIN salts s GROUP BY 1, 2),
probes(token, d, bucket) AS (SELECT * FROM (VALUES {probes}))
SELECT p.token, CAST(min(coalesce(r.cnt, 0)) AS BIGINT) AS est_count
FROM probes p LEFT JOIN regs r ON r.d = p.d AND r.bucket = p.bucket
GROUP BY p.token"""


def _hll_from_partials(partials):
    """merge (grp, bucket, reg) partials -> per-group HLL finish."""
    from ray.data.aggregate import Max

    merged = partials.groupby(["grp", "bucket"]).aggregate(
        Max("reg", alias_name="reg"))
    return merged.groupby("grp").map_groups(_finish_group,
                                            batch_format="pandas")


def source_token_hll(ds, text_col: str = "text",
                     source_col: str = "source"):
    """Approximate DISTINCT-TOKEN count per source (vocabulary richness
    / type-token profile) — the keyed-sketch instantiation of the HLL:
    token md5 codes (the SQL-mirrored 32-bit codes of
    :mod:`maskmypy_ray.text.grams`) explode inside the partial kernel,
    so the shuffle still carries at most |sources| x 256 register rows
    per batch no matter how many tokens a batch holds.

    SQL twin: :func:`source_token_hll_sql` (register-exact)."""
    from .text.grams import token_codes_batch

    def explode_partial(b: pa.Table) -> pa.Table:
        codes, bounds = token_codes_batch(b.column(text_col).to_pylist())
        srcs = b.column(source_col).to_numpy(zero_copy_only=False)
        grp = np.repeat(srcs, np.diff(bounds))
        t = pa.table({"k": pa.array(codes, type=pa.int64()),
                      "grp": pa.array(grp, type=pa.string())})
        return hll_partial_batch(t, "k", "grp")

    return _hll_from_partials(
        ds.select_columns([source_col, text_col]).map_batches(
            explode_partial, batch_format="pyarrow"))


def source_token_hll_sql() -> str:
    """DuckDB twin of :func:`source_token_hll` over the documents view."""
    inner = ("(SELECT source, "
             "CAST(md5_number_upper(tok) & 4294967295 AS BIGINT) AS code "
             "FROM (SELECT source, "
             "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok "
             "FROM documents)) tt")
    return hll_sql(inner, "tt.code", "tt.source")


# ---------------------------------------------------------------------------
# Integer column histogram — the mergeable distribution sketch
# (completes the sketch family: HLL distincts, CMS counts, histogram
# distributions). All-integer bucket rule so merges are exact and the
# SQL twin is bit-identical at any parallelism.
# ---------------------------------------------------------------------------

HIST_BINS = 64


def int_histogram(ds, col: str, bins: int = HIST_BINS):
    """Exact fixed-width integer histogram of an int64 column:
    ``bin = (v - lo) * bins // (hi - lo + 1)`` over the observed
    [lo, hi] — all-integer, so per-batch partial counts merge exactly
    and the DuckDB twin reproduces every count bit-for-bit.

    Two passes (min/max stats, then pre-combined per-batch bincounts →
    one ``groupby(bin).sum`` of at most bins x blocks rows). Empty bins
    are emitted with count 0 so the output shape is always ``bins``
    rows: (bin, lo_edge, count) with lo_edge the smallest value
    mapping into the bin (integer ceil of the inverse rule).
    """
    import pyarrow as pa
    from ray.data.aggregate import Max, Min, Sum

    def stats(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False)
        return pa.table({
            "lo": pa.array([int(v.min()) if len(v) else 2**62],
                           type=pa.int64()),
            "hi": pa.array([int(v.max()) if len(v) else -2**62],
                           type=pa.int64()),
        })

    agg = ds.map_batches(stats, batch_format="pyarrow").aggregate(
        Min("lo"), Max("hi"))
    lo, hi = int(agg["min(lo)"]), int(agg["max(hi)"])
    width = hi - lo + 1

    def part(b: pa.Table, lo=lo, width=width) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = (v - lo) * bins // width
        return pa.table({
            "bin": pa.array(np.arange(bins, dtype=np.int64)),
            "count": pa.array(np.bincount(idx, minlength=bins)
                              .astype(np.int64)),
        })

    got = ds.map_batches(part, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("count", alias_name="count")) \
        .to_pandas().set_index("bin")["count"] \
        .reindex(range(bins), fill_value=0)
    # lo_edge: smallest v with (v - lo) * bins // width == b, i.e.
    # lo + ceil(b * width / bins)
    edges = [lo + -((-b * width) // bins) for b in range(bins)]
    return pa.table({
        "bin": pa.array(np.arange(bins, dtype=np.int64)),
        "lo_edge": pa.array(np.asarray(edges, dtype=np.int64)),
        "count": pa.array(got.to_numpy().astype(np.int64)),
    })


def int_histogram_sql(table: str, col: str, bins: int = HIST_BINS) -> str:
    """DuckDB twin of :func:`int_histogram` (same integer bucket rule;
    empty bins ride in via a generate_series scaffold)."""
    return (
        f"WITH st AS (SELECT min({col}) AS lo, max({col}) AS hi, "
        f"max({col}) - min({col}) + 1 AS w FROM {table}), "
        f"b AS (SELECT ({col} - (SELECT lo FROM st)) * {bins} "
        f"// (SELECT w FROM st) AS bin, count(*) AS c FROM {table} "
        "GROUP BY 1), "
        f"g AS (SELECT unnest(generate_series(0, {bins - 1})) AS gbin) "
        "SELECT g.gbin AS bin, (SELECT lo FROM st) "
        f"+ (g.gbin * (SELECT w FROM st) + {bins - 1}) // {bins} "
        "AS lo_edge, "
        "CAST(COALESCE(b.c, 0) AS BIGINT) AS count "
        "FROM g LEFT JOIN b ON g.gbin = b.bin")
