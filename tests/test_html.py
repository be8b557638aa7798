"""HTML synthesis/extraction kernels (text/html.py): byte-exact
round-trip on adversarial bodies, href recovery vs the closed-form
host-graph arithmetic, and Ray-level identity at fixture scale.

The registered `webpages` panel row (parts extract/links) is
oracle-diffed by test_driver_contract.py; these tests pin the kernel
semantics directly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from maskmypy_ray.text.html import (
    LINKS_PER_DOC,
    _link_dsts,
    extract_text_kernel,
    rich_html_batch,
)

ADVERSARIAL = [
    "plain text",
    "",  # empty body
    "a & b < c > d",
    "pre &lt;kept&gt; &amp;amp; double-encoded entities",
    "line1\nline2 <script>alert('x')</script> tail",
    "unicode é 中文 — & <nav>not a real nav</nav>",
    '<a rel="l0" href="/page/7">spoofed anchor</a>',
    "</p></body></html> premature closers",
]


def _batch(texts):
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    })


def test_extraction_round_trip_byte_exact():
    b = _batch(ADVERSARIAL)
    html = rich_html_batch(b, n_docs=len(ADVERSARIAL))
    out = extract_text_kernel(html).to_pylist()
    assert out == ADVERSARIAL  # byte-identical, incl. spoofed markup


def test_rich_html_is_well_formed_and_binary_safe():
    b = _batch(ADVERSARIAL)
    html = rich_html_batch(b, n_docs=len(ADVERSARIAL)).to_pylist()
    for h in html:
        assert h.startswith("<html><head><title>Doc ")
        assert h.endswith("</p></body></html>")
        assert h.count('<a rel="l') == LINKS_PER_DOC
    # the binary cast used by the html column round-trips
    enc = pa.array(html, type=pa.string()).cast(pa.binary())
    assert enc.cast(pa.string()).to_pylist() == html


def test_extract_links_matches_closed_form(ray_session, sf_dir):
    from maskmypy_ray.pipelines import _n_docs, q_extract_links

    n = _n_docs(sf_dir)
    got = q_extract_links(sf_dir).to_pandas() \
        .sort_values(["doc_id", "slot"]).reset_index(drop=True)
    ids = np.unique(got["doc_id"].to_numpy())
    exp = _link_dsts(np.repeat(ids, LINKS_PER_DOC), n)
    # _link_dsts returns per-slot arrays over the repeated ids; pick
    # slot j's value for each (id, j) row instead
    dn = got["doc_id"].to_numpy() % n
    j = got["slot"].to_numpy()
    expect = ((dn * dn) % n * 7 + got["doc_id"].to_numpy() * 31
              + 97 * j + 1) % n
    assert np.array_equal(got["dst_doc"].to_numpy(), expect)
    assert len(got) == len(ids) * LINKS_PER_DOC
    assert exp is not None


def test_html_extract_identity_flag(ray_session, sf_dir):
    from maskmypy_ray.pipelines import q_html_extract

    got = q_html_extract(sf_dir).to_pandas()
    assert (got["identical"] == 1).all()
