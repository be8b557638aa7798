"""PII detection and redaction over a text corpus.

The webtext twin of the geomasking stages: where `stages/donut.py`
perturbs sensitive *coordinates*, these operators find and mask
sensitive *strings* (emails, IPv4 addresses, phone numbers) in the
`text` column — the standard pre-training curation step alongside
quality filtering and dedup.

Scale shape: stateless vectorized `map_batches` over Arrow batches;
every kernel is a single RE2 call (`pyarrow.compute
.count_substring_regex` / `.replace_substring_regex`) per pattern per
batch — no per-row Python, no shuffle, no state. DuckDB's regex engine
is the same RE2, so the oracles are bit-exact (same patterns, same
leftmost-first non-overlapping semantics).

The synthetic documents corpus contains no PII, so the registered
queries run over :func:`with_pii` — a deterministic injection
(mirrored in SQL) that appends an email + IP + phone clause to every
``every``-th doc, exactly like ``with_mutated_copies`` seeds the dedup
queries with known duplicates.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe and byte-identical between pyarrow.compute and DuckDB.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

# Redaction applies in this fixed order; EMAIL first so its local part
# cannot be re-matched, IP before PHONE (disjoint alphabets otherwise).
_REDACTIONS = ((EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>"))


def with_pii(ds, every: int = 5):
    """Append a deterministic PII clause to every ``every``-th doc.

    doc_id d (d % every == 0) gains
    `` contact user{d}@example.com at 10.{d%256}.{(7d)%256}.{(13d)%256} or 555-{d%900:03d}-{d%9000:04d}``
    — pure integer arithmetic on doc_id, so the SQL mirror
    (:func:`maskmypy_ray.oracle.pii_docs_cte`) reproduces it exactly.
    """
    def inject(b: pa.Table) -> pa.Table:
        import numpy as np

        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        hit = d % every == 0
        texts = b.column("text").to_pylist()
        for i in np.flatnonzero(hit):
            k = int(d[i])
            texts[i] = (
                f"{texts[i]} contact user{k}@example.com at "
                f"10.{k % 256}.{k * 7 % 256}.{k * 13 % 256} or "
                f"555-{k % 900:03d}-{k % 9000:04d}")
        return b.set_column(b.schema.get_field_index("text"), "text",
                            pa.array(texts, type=pa.string()))

    return ds.map_batches(inject, batch_format="pyarrow")


def pii_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    t = batch.column(text_col)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_email": pc.cast(pc.count_substring_regex(t, EMAIL_RE), pa.int64()),
        "n_ipv4": pc.cast(pc.count_substring_regex(t, IPV4_RE), pa.int64()),
        "n_phone": pc.cast(pc.count_substring_regex(t, PHONE_RE), pa.int64()),
    })


def pii_stats(ds, text_col: str = "text"):
    """Per-doc PII match counts (emails / IPv4 / phones)."""
    return ds.map_batches(lambda b: pii_stats_batch(b, text_col),
                          batch_format="pyarrow")


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    t = batch.column(text_col)
    red = t
    for pat, rep in _REDACTIONS:
        red = pc.replace_substring_regex(red, pat, rep)
    n = pa.array(
        [0] * len(batch), type=pa.int64()) if len(batch) == 0 else pc.cast(
        pc.add(pc.add(pc.count_substring_regex(t, EMAIL_RE),
                      pc.count_substring_regex(t, IPV4_RE)),
               pc.count_substring_regex(t, PHONE_RE)), pa.int64())
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text": red,
        "n_redacted": n,
    })


def pii_redact(ds, text_col: str = "text"):
    """Redacted corpus: PII spans replaced by ``<EMAIL>``/``<IP>``/
    ``<PHONE>`` typed tokens, plus the per-doc redaction count."""
    return ds.map_batches(lambda b: pii_redact_batch(b, text_col),
                          batch_format="pyarrow")
