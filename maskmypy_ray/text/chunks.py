"""Chunk-level (paragraph-style) dedup: drop repeated sub-document spans.

CCNet-style curation: split each doc into consecutive ``size``-token
chunks, drop every chunk whose exact text already occurred earlier in
the corpus (first occurrence by ``(doc_id, chunk_idx)`` wins), and
reassemble the surviving chunks into a cleaned document. Unlike
whole-doc `exact_dedup` this removes boilerplate shared ACROSS
otherwise-distinct documents (headers, navigation, license blocks).

Scale shape — two bounded hash-partitioned shuffles, no driver collect:

1. ``map_batches`` explodes docs to ``(doc_id, chunk_idx, ctext, h)``
   rows (h = md5 of the chunk text). Empty docs emit a sentinel row
   (``chunk_idx = -1``, unique hash) so they survive to the output.
2. ``groupby(hash(h) % P)`` co-locates every copy of a chunk in one of
   P coarse partitions; the per-partition kernel is ONE vectorized
   sort + ``duplicated()`` marking first occurrences — NOT a
   per-chunk-group ``map_groups`` (Ray's per-group Python apply costs
   ~0.4 ms/group, which dominates when groups are 1-2 rows; the coarse
   partition amortizes it over thousands of rows — measured 10.1 s →
   1.9 s on 5k docs).
3. ``groupby(doc_id % P)`` reassembles docs the same way: vectorized
   per-partition sort + pandas groupby-join.

Chunk text rides through both shuffles (~2x corpus bytes moved twice);
a hash-only variant would save the first pass's bytes but needs a
third shuffle to re-join text, so this is the cheaper plan for
text-sized payloads. P defaults to 64 and should scale ~ with cluster
cores; results are partition-count independent.

The DuckDB oracle (pipelines `chunk_dedup`) mirrors the exact same
window semantics with ``row_number() OVER (PARTITION BY md5(ctext)
ORDER BY doc_id, chunk_idx)``.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import TOKEN_RE

CHUNK_TOKENS = 16
DEFAULT_PARTITIONS = 64


def explode_chunks_batch(batch: pa.Table, size: int = CHUNK_TOKENS,
                         text_col: str = "text",
                         partitions: int = DEFAULT_PARTITIONS) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    out_id: list[int] = []
    out_idx: list[int] = []
    out_txt: list[str] = []
    out_h: list[str] = []
    for d, t in zip(ids, texts):
        toks = TOKEN_RE.findall(t.lower())
        if not toks:
            out_id.append(int(d))
            out_idx.append(-1)
            out_txt.append("")
            out_h.append(f"empty:{int(d)}")  # unique -> always the winner
            continue
        for i in range(0, len(toks), size):
            c = " ".join(toks[i:i + size])
            out_id.append(int(d))
            out_idx.append(i // size)
            out_txt.append(c)
            out_h.append(md5(c.encode()).hexdigest())
    # coarse shuffle key: top-15-hex of the chunk hash mod P (the full h
    # string is still the dedup identity inside the partition); empty-doc
    # sentinels route by doc_id — their hash is unique anyway
    p = np.array([int(h[:15], 16) % partitions if i >= 0 else d % partitions
                  for h, i, d in zip(out_h, out_idx, out_id)],
                 dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(out_id, type=pa.int64()),
        "chunk_idx": pa.array(out_idx, type=pa.int64()),
        "ctext": pa.array(out_txt, type=pa.string()),
        "h": pa.array(out_h, type=pa.string()),
        "p": pa.array(p),
    })


def _mark_winners_part(g: pd.DataFrame, partitions: int) -> pd.DataFrame:
    """One hash partition: first (doc_id, chunk_idx) per chunk hash
    survives — a single vectorized sort + duplicated() pass."""
    g = g.sort_values(["h", "doc_id", "chunk_idx"], kind="mergesort")
    keep = ~g["h"].duplicated().to_numpy()
    out = g[["doc_id", "chunk_idx", "ctext"]].copy()
    out["keep"] = keep
    out["q"] = out["doc_id"].to_numpy() % partitions
    return out


def _reassemble_part(g: pd.DataFrame) -> pd.DataFrame:
    """One doc partition: vectorized reassembly of every doc in it."""
    g = g.sort_values(["doc_id", "chunk_idx"], kind="mergesort")
    real = g[g["chunk_idx"] >= 0]
    kept = real[real["keep"]]
    docs = pd.Index(g["doc_id"].unique(), name="doc_id")
    n_chunks = real.groupby("doc_id").size().reindex(docs, fill_value=0)
    n_kept = kept.groupby("doc_id").size().reindex(docs, fill_value=0)
    txt = kept.groupby("doc_id")["ctext"].agg(" ".join) \
        .reindex(docs, fill_value="")
    return pd.DataFrame({
        "doc_id": docs.to_numpy(),
        "clean_text": txt.to_numpy(),
        "n_chunks": n_chunks.to_numpy().astype(np.int64),
        "n_dropped": (n_chunks - n_kept).to_numpy().astype(np.int64),
    })


def chunk_dedup(ds, size: int = CHUNK_TOKENS, text_col: str = "text",
                partitions: int = DEFAULT_PARTITIONS):
    """Corpus with cross-document duplicate ``size``-token chunks removed.

    Returns ``(doc_id, clean_text, n_chunks, n_dropped)`` for EVERY
    input doc (empty/token-less docs included with empty text)."""
    ch = ds.map_batches(
        lambda b: explode_chunks_batch(b, size=size, text_col=text_col,
                                       partitions=partitions),
        batch_format="pyarrow")
    flagged = ch.groupby("p").map_groups(
        lambda g: _mark_winners_part(g, partitions), batch_format="pandas")
    return flagged.groupby("q").map_groups(_reassemble_part,
                                           batch_format="pandas")
