"""HTML text/link extraction over the ``html:binary`` column.

The input_hint table carries ``html:binary`` (BASELINE.json); the base
corpus derivation wraps ``text`` in a bare ``<html><body>`` shell. This
module derives the RICH page variant — ``<head>`` with title + script
block, a ``<nav>`` of deterministic anchor links (the SAME closed-form
dst arithmetic as :mod:`maskmypy_ray.text.rank`'s synthesized host
graph), and an entity-encoded body — and implements the extraction
kernels a crawl pipeline actually runs:

* :func:`html_extract` — boilerplate-block removal (head, nav), tag
  stripping, entity decode; the recovered body text must be
  **byte-identical to the source ``text`` per url** (the graft's core
  invariant, north_rule). The oracle is the round-trip identity itself.
* :func:`extract_links` — href recovery from the anchor tags; the
  oracle replays the closed-form dst arithmetic, so a single mangled
  byte in synthesis OR extraction flips the value hash.

No reference counterpart (graft addition, SURVEY §2.6); the reference's
closest concern is byte-preserving passthrough of non-geometry columns
(`/root/reference/maskmypy/masks/donut.py:71` copy-on-entry).

Scale shape: every kernel is a fixed chain of Arrow RE2 / plain-string
replace calls per batch — stateless ``map_batches``, no shuffle, no
driver state. The only scalar input is ``n_docs`` (parquet metadata
count). At 10^12 rows this stage is embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .rank import LINKS_PER_DOC

# Entity encoding: & first (else it re-encodes the entities we emit);
# decode is the exact reverse — &lt;/&gt; first, &amp; LAST (a literal
# "&lt;" in the source encodes to "&amp;lt;" and must decode back).
_ENC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]


def _s(col) -> pa.ChunkedArray:
    return pc.cast(col, pa.string())


def _link_dsts(ids: np.ndarray, n_docs: int) -> list[np.ndarray]:
    """Per-slot destination doc_ids — identical arithmetic to
    rank._host_edges (tag_rows), so the nav anchors ARE the host
    graph's edges (self-links included here; rank drops them)."""
    dn = ids % n_docs
    return [((dn * dn) % n_docs * 7 + ids * 31 + 97 * j + 1) % n_docs
            for j in range(LINKS_PER_DOC)]


def rich_html_batch(batch: pa.Table, n_docs: int) -> pa.ChunkedArray:
    """String array of rich HTML pages for a webpages batch
    (needs ``doc_id`` + ``text``). Pure Arrow kernels."""
    enc = batch.column("text")
    for lit, ent in _ENC:
        enc = pc.replace_substring(enc, pattern=lit, replacement=ent)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    id_s = _s(batch.column("doc_id"))
    nav = None
    for j, dst in enumerate(_link_dsts(ids, n_docs)):
        a = pc.binary_join_element_wise(
            pa.scalar(f'<a rel="l{j}" href="/page/'),
            _s(pa.array(dst, type=pa.int64())),
            pa.scalar('">go</a>'), "")
        nav = a if nav is None else pc.binary_join_element_wise(nav, a, "")
    return pc.binary_join_element_wise(
        pa.scalar("<html><head><title>Doc "), id_s,
        pa.scalar("</title><script>var p="), id_s,
        pa.scalar(';</script></head><body class="doc" id="d'), id_s,
        pa.scalar('"><nav>'), nav,
        pa.scalar("</nav><p>"), enc,
        pa.scalar("</p></body></html>"), "")


def extract_text_kernel(html) -> pa.ChunkedArray:
    """html (string array) -> body text: drop the head and nav blocks
    whole (RE2 non-greedy; the synthesized blocks never span newlines),
    strip remaining tags, decode entities."""
    t = pc.replace_substring_regex(html, pattern="<head>.*?</head>",
                                   replacement="")
    t = pc.replace_substring_regex(t, pattern="<nav>.*?</nav>",
                                   replacement="")
    t = pc.replace_substring_regex(t, pattern="<[^>]*>", replacement="")
    for lit, ent in reversed(_ENC):
        t = pc.replace_substring(t, pattern=ent, replacement=lit)
    return t


def html_extract(pages_ds, n_docs: int):
    """Dataset[(doc_id, text, identical)] — text re-extracted from the
    rich html; ``identical`` flags byte-equality with the source text
    column (must be 1 everywhere: north_rule invariant)."""

    def fn(b: pa.Table) -> pa.Table:
        html = pc.cast(rich_html_batch(b, n_docs), pa.binary())
        ext = extract_text_kernel(pc.cast(html, pa.string()))
        same = pc.cast(pc.equal(ext, b.column("text")), pa.int8())
        return pa.table({"doc_id": b.column("doc_id"), "text": ext,
                         "identical": same})

    return pages_ds.select_columns(["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow")


def extract_links(pages_ds, n_docs: int):
    """Dataset[(doc_id, slot, dst_doc)] — hrefs recovered from the nav
    anchors, one row per (page, link slot). LINKS_PER_DOC bounded
    vectorized RE2 extracts per batch (slots are distinguished by their
    ``rel`` attribute, so no list-explode machinery is needed)."""

    def fn(b: pa.Table) -> pa.Table:
        html = pc.cast(rich_html_batch(b, n_docs), pa.string())
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(b)
        dsts = []
        for j in range(LINKS_PER_DOC):
            ex = pc.extract_regex(
                html, f'rel="l{j}" href="/page/(?P<d>[0-9]+)"')
            d = pc.cast(pc.struct_field(ex, "d"), pa.int64())
            dsts.append(d.to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": pa.array(np.tile(ids, LINKS_PER_DOC),
                               type=pa.int64()),
            "slot": pa.array(np.repeat(
                np.arange(LINKS_PER_DOC, dtype=np.int64), n)),
            "dst_doc": pa.array(np.concatenate(dsts), type=pa.int64()),
        })

    return pages_ds.select_columns(["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow")
