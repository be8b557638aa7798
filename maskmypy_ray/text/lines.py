"""Line-level corpus filtering (the C4 / RefinedWeb intra-document
stage): drop lines without terminal punctuation, lines with fewer than
3 words, and boilerplate lines ("javascript"/"cookie" notices), then
reassemble the cleaned document. This is the structural filter that
runs BETWEEN the doc-level quality gates and dedup in the standard
pretraining pipeline (C4: Raffel et al. 2020 §2.2).

The fixture corpus is single-line, so — like the PII and near-dup
fixtures (`text/pii.py:with_pii`, `text/dedup.py:with_mutated_copies`)
— :func:`with_lines` first derives a deterministic multi-line corpus:
8-token lines, counter-RNG (stream 916) terminal punctuation on ~2/3 of
lines, and a boilerplate line injected at ~1/17 — all reproduced
bit-for-bit by the SQL twin (:func:`line_filter_sql`).

Both stages are stateless ``map_batches`` passes: no shuffle, no
driver state, nothing corpus-global — the 100-TB shape is trivially
right (each doc transforms alone; pandas vectorized string kernels do
the per-line work batch-wide).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..rng import sql_substream, substream
from .grams import TOKEN_RE

LINES_STREAM = 916  # rng stream registry: line-structure derivation
WORDS_PER_LINE = 8
MIN_WORDS = 3
BOILERPLATE = "please enable javascript and cookies."
_BOILER_MOD = 17
_PUNCT_MOD = 3


def with_lines(ds, seed: int = 0, text_col: str = "text"):
    """Derive the multi-line fixture: split each doc's token stream
    into 8-token lines; line l of doc d gets h = substream(d*65536+l):
    the boilerplate line if h % 17 == 0, a terminal '.' if h % 3 != 0,
    no terminal punctuation otherwise. Lines joined by '\\n'."""

    def derive(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        out = []
        for d, t in zip(ids, b.column(text_col).to_pylist()):
            toks = TOKEN_RE.findall(t.lower())
            lines = []
            for l in range(0, (len(toks) + WORDS_PER_LINE - 1)
                           // WORDS_PER_LINE):
                h = int(substream(int(d) * 65536 + l, seed, LINES_STREAM))
                if h % _BOILER_MOD == 0:
                    lines.append(BOILERPLATE)
                    continue
                txt = " ".join(
                    toks[l * WORDS_PER_LINE:(l + 1) * WORDS_PER_LINE])
                lines.append(txt + "." if h % _PUNCT_MOD != 0 else txt)
            out.append("\n".join(lines))
        cols = {n: b.column(n) for n in b.column_names if n != text_col}
        cols[text_col] = pa.array(out, type=pa.string())
        return pa.table(cols)

    return ds.map_batches(derive, batch_format="pyarrow")


def line_filter(ds, text_col: str = "text"):
    """Per-doc line filter -> ``(doc_id, n_lines, n_kept, text)``:
    keep a line iff it ends with '.', has >= MIN_WORDS words, and
    contains neither 'javascript' nor 'cookie'; ``text`` is the kept
    lines rejoined by '\\n' ('' when none survive). One stateless
    vectorized batch pass (pandas string kernels over the exploded
    line array — never a Python loop per line)."""

    def filt(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        texts = b.column(text_col).to_pylist()
        n_lines_per = np.empty(len(ids), dtype=np.int64)
        all_lines: list[str] = []
        for i, t in enumerate(texts):
            ls = t.split("\n") if t else []
            n_lines_per[i] = len(ls)
            all_lines.extend(ls)
        s = pd.Series(all_lines, dtype=object)
        if len(s):
            keep = (s.str.endswith(".")
                    & (s.str.count(TOKEN_RE.pattern) >= MIN_WORDS)
                    & ~s.str.contains("javascript", regex=False)
                    & ~s.str.contains("cookie", regex=False)).to_numpy()
        else:
            keep = np.zeros(0, dtype=bool)
        bounds = np.concatenate([np.zeros(1, dtype=np.int64),
                                 np.cumsum(n_lines_per)])
        if len(keep):
            # clip: a zero-line doc's start offset may equal len(keep)
            starts = np.minimum(bounds[:-1], len(keep) - 1)
            n_kept = np.add.reduceat(keep.astype(np.int64), starts)
            n_kept = np.where(n_lines_per > 0, n_kept, 0)
        else:
            n_kept = np.zeros(len(ids), dtype=np.int64)
        arr = s.to_numpy()
        out_text = ["\n".join(arr[bounds[i]:bounds[i + 1]][
            keep[bounds[i]:bounds[i + 1]]]) for i in range(len(ids))]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_lines": pa.array(n_lines_per),
            "n_kept": pa.array(n_kept.astype(np.int64)),
            "text": pa.array(out_text, type=pa.string()),
        })

    return ds.map_batches(filt, batch_format="pyarrow")


def line_filter_sql(seed: int = 0,
                    docs_cte: str =
                    "docs AS (SELECT doc_id, text FROM documents)") -> str:
    """DuckDB twin of ``line_filter(with_lines(ds, seed))`` — derives
    the same multi-line fixture (same counter-RNG stream) and applies
    the same keep rules, bit-for-bit."""
    sub = sql_substream(f"d.doc_id * 65536 + (t.i - 1)", seed, LINES_STREAM)
    return f"""WITH {docs_cte},
tl AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
       FROM docs),
ln AS (
  SELECT d.doc_id, t.i,
         CASE WHEN ({sub}) % {_BOILER_MOD} = 0 THEN '{BOILERPLATE}'
              WHEN ({sub}) % {_PUNCT_MOD} != 0 THEN
                array_to_string(list_slice(d.l, (t.i - 1) * {WORDS_PER_LINE} + 1,
                                           least(t.i * {WORDS_PER_LINE}, len(d.l))), ' ') || '.'
              ELSE
                array_to_string(list_slice(d.l, (t.i - 1) * {WORDS_PER_LINE} + 1,
                                           least(t.i * {WORDS_PER_LINE}, len(d.l))), ' ')
         END AS line
  FROM tl d, unnest(generate_series(1, CAST(ceil(len(d.l) / {WORDS_PER_LINE}.0) AS BIGINT))) AS t(i)),
kp AS (
  SELECT doc_id, i, line,
         (ends_with(line, '.')
          AND len(regexp_extract_all(line, '[a-z0-9]+')) >= {MIN_WORDS}
          AND NOT contains(line, 'javascript')
          AND NOT contains(line, 'cookie')) AS keep
  FROM ln),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
         coalesce(string_agg(line, chr(10) ORDER BY i)
                  FILTER (WHERE keep), '') AS text
  FROM kp GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_lines, 0) AS n_lines,
       coalesce(a.n_kept, 0) AS n_kept, coalesce(a.text, '') AS text
FROM docs d LEFT JOIN agg a ON a.doc_id = d.doc_id"""
