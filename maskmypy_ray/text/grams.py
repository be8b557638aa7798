"""Batch-vectorized positional word-n-gram hashing — the shared kernel
of the near-dup family (MinHash shingles, duplicated spans, winnowing).

VERDICT r03 #5: the old scheme ran one Python ``hashlib.md5`` call per
gram per doc (``md5(" ".join(toks[i:i+n]))``) — the hot inner loop of
minhash/spans at scale. The new scheme hashes each DISTINCT token once
(the batch vocabulary is tiny next to the token stream) and derives
every gram hash with pure int64-vectorized numpy:

    code(tok)    = md5(tok)[:4 bytes, little]              (32-bit)
    gram(i, m)   = XOR_{j < m} mix32(code[i+j] XOR POS[j]) (32-bit)

where ``POS[j] = mix32(j + 0x9E37)`` bakes the token's position within
the gram in, keeping the hash order-sensitive. Both building blocks are
bit-exact in DuckDB (``md5_number_upper(tok) & 0xFFFFFFFF`` and
``rng.sql_mix32``), so the SQL oracles mirror every gram hash — see
:func:`maskmypy_ray.oracle.sql_gram_list_expr`.

Rolling structure: for the full token stream the j-th term of every
window is one vectorized ``mix32`` over a shifted slice, so an n-gram
pass costs n array ops regardless of document count.
"""

from __future__ import annotations

import re
from hashlib import md5

import numpy as np
import pandas as pd

from ..rng import mix32

TOKEN_RE = re.compile(r"[a-z0-9]+")

_POS_SALT = 0x9E37
MAX_GRAM = 64
#: position constants, mirrored as a literal list in the SQL emitter
POS = mix32(np.arange(MAX_GRAM, dtype=np.int64) + _POS_SALT)
_BAND_SALT = 0x51AB


def token_codes_batch(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(codes, bounds): 32-bit md5 code per token over all docs of the
    batch concatenated; doc d's tokens are ``codes[bounds[d]:bounds[d+1]]``.
    md5 runs once per DISTINCT token in the batch (factorize + gather)."""
    toks_per_doc = [TOKEN_RE.findall(t.lower()) for t in texts]
    lens = np.fromiter((len(x) for x in toks_per_doc), dtype=np.int64,
                       count=len(toks_per_doc))
    bounds = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])
    flat = [w for toks in toks_per_doc for w in toks]
    if not flat:
        return np.array([], dtype=np.int64), bounds
    idx, uniq = pd.factorize(np.asarray(flat, dtype=object))
    uh = np.fromiter(
        (int.from_bytes(md5(t.encode()).digest()[:4], "little") for t in uniq),
        dtype=np.int64, count=len(uniq))
    return uh[idx], bounds


def gram_hashes_batch(codes: np.ndarray, bounds: np.ndarray, n: int,
                      short_doc: str = "single") -> tuple[np.ndarray, np.ndarray]:
    """Positional n-gram hashes per doc: (grams, gbounds) with doc d's
    gram hashes at ``grams[gbounds[d]:gbounds[d+1]]`` in position order.

    ``short_doc``: docs with 0 < tokens < n contribute ONE whole-doc
    gram (``"single"`` — the MinHash-shingle / winnow rule) or nothing
    (``"skip"`` — the duplicated-spans rule). Empty docs contribute
    nothing either way."""
    if n > MAX_GRAM:
        raise ValueError(f"gram size {n} > MAX_GRAM {MAX_GRAM}")
    D = len(bounds) - 1
    lens = np.diff(bounds)
    L = len(codes)
    if short_doc == "single":
        nw = np.where(lens == 0, 0, np.maximum(lens - (n - 1), 1))
    elif short_doc == "skip":
        nw = np.maximum(lens - (n - 1), 0)
    else:
        raise ValueError(short_doc)
    gbounds = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(nw)])
    out = np.zeros(int(gbounds[-1]), dtype=np.int64)
    if not len(out):
        return out, gbounds

    doc_of = np.repeat(np.arange(D, dtype=np.int64), lens)
    if L >= n:
        # rolling full windows: j-th term is one mix32 over a shifted slice
        acc = mix32(codes[:L - n + 1] ^ POS[0])
        for j in range(1, n):
            acc = acc ^ mix32(codes[j:L - n + 1 + j] ^ POS[j])
        valid = doc_of[:L - n + 1] == doc_of[n - 1:]
        starts = np.nonzero(valid)[0]
        d = doc_of[starts]
        out[gbounds[d] + (starts - bounds[d])] = acc[starts]
    if short_doc == "single":
        # docs shorter than n (rare): one whole-doc gram each
        for s in np.nonzero((lens > 0) & (lens < n))[0]:
            seg = codes[bounds[s]:bounds[s + 1]]
            out[gbounds[s]] = np.bitwise_xor.reduce(mix32(seg ^ POS[:len(seg)]))
    return out, gbounds


def distinct_per_doc(grams: np.ndarray,
                     gbounds: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-distinct gram hashes per doc (set semantics for Jaccard /
    MinHash): one batch-wide lexsort + neighbor-diff, no per-doc loop."""
    D = len(gbounds) - 1
    lens = np.diff(gbounds)
    doc_idx = np.repeat(np.arange(D, dtype=np.int64), lens)
    order = np.lexsort((grams, doc_idx))
    g, d = grams[order], doc_idx[order]
    keep = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        keep[1:] = (g[1:] != g[:-1]) | (d[1:] != d[:-1])
    g, d = g[keep], d[keep]
    new_lens = np.bincount(d, minlength=D)
    nb = np.concatenate([np.zeros(1, dtype=np.int64),
                         np.cumsum(new_lens)]).astype(np.int64)
    return g, nb


def minhash_signatures(grams: np.ndarray, gbounds: np.ndarray,
                       perms: np.ndarray) -> np.ndarray:
    """(D, n_perm) MinHash minima per doc over the (distinct) gram
    hashes; gram-less docs get the all-0xFFFFFFFF signature. The
    (grams, n_perm) permutation matrix is built in bounded slabs and
    reduced per doc with one ``np.minimum.reduceat``."""
    from ..rng import mix32_inplace

    D = len(gbounds) - 1
    n_perm = len(perms)
    sig = np.full((D, n_perm), 0xFFFFFFFF, dtype=np.int64)
    if not len(grams):
        return sig
    lens = np.diff(gbounds)
    nonempty = np.nonzero(lens > 0)[0]
    max_grams = max(1, 4_000_000 // n_perm)  # ~32 MB int64 slab
    # one slab + one scratch, reused across every slab iteration: the
    # expression form of mix32 allocates ~9 slab temporaries per call,
    # and first-touch page faults dominate the kernel on this host class
    buf = np.empty((min(max_grams, len(grams)), n_perm), dtype=np.int64)
    tmp = np.empty_like(buf)
    i = 0
    while i < len(nonempty):
        j = i + 1
        a = gbounds[nonempty[i]]
        while j < len(nonempty) and gbounds[nonempty[j] + 1] - a <= max_grams:
            j += 1
        docs = nonempty[i:j]
        b = gbounds[docs[-1] + 1]
        v = buf[:b - a]
        np.bitwise_xor(grams[a:b, None], perms[None, :], out=v)
        mix32_inplace(v, tmp[:b - a])
        sig[docs] = np.minimum.reduceat(v, gbounds[docs] - a, axis=0)
        i = j
    return sig


def band_keys(sig: np.ndarray, n_bands: int, rows_per_band: int) -> np.ndarray:
    """(D, n_bands) int64 fold of each band's minima tuple into a 64-bit
    bucket key (two independent mix32 chains). The key is only the
    engine's shuffle proxy for tuple equality — equal tuples always
    collide, unequal ones collide at ~2^-64 and any false candidate is
    removed by the exact-Jaccard verify (the SQL twin joins on the tuple
    itself)."""
    D = sig.shape[0]
    out = np.empty((D, n_bands), dtype=np.int64)
    for b in range(n_bands):
        seg = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
        k1 = mix32(seg[:, 0] ^ np.int64(_BAND_SALT + b))
        k2 = mix32(seg[:, 0] ^ np.int64((_BAND_SALT + b) * 2654435761 % (1 << 32)))
        for r in range(1, rows_per_band):
            k1 = mix32(k1 ^ seg[:, r])
            k2 = mix32(k2 ^ mix32(seg[:, r] + np.int64(r)))
        out[:, b] = (k1 << np.int64(32)) | k2
    return out
