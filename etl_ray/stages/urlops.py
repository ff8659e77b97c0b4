"""URL parsing + per-domain rollups for Common-Crawl-style page tables.

Target-added webtext operators (no reference analogue; the reference's
only URL handling is passing topic names around).  All parsing is
vectorized Arrow (`pc.extract_regex` — RE2, one pass over the column, no
Python per row); the domain rollup follows the repo's bounded-shuffle
pattern: hash-bucket the domain key (256 groups regardless of domain
cardinality — web corpora have 10^7+ registered domains, and Ray's
groupby costs ~100us per distinct group), then dictionary-encode +
bincount inside each bucket at C speed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashutil import hash_bucket

_URL_RE = r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^/?#]+)(?P<path>[/?#].*)?$"
_REG_RE = r"(?P<reg_domain>[^.]+\.[^.]+)$"


def add_url_parts(t: pa.Table, url_col: str = "url") -> pa.Table:
    """Append scheme / host / path / reg_domain columns parsed from
    ``url_col``.  Malformed URLs yield nulls (kept, not dropped — the
    caller decides).  reg_domain is the last two host labels
    (d3.example.com -> example.com); a public-suffix list would slot in
    here unchanged, it is just a bigger vectorized lookup."""
    url = t.column(url_col)
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    parts = pc.extract_regex(url, _URL_RE)
    scheme = pc.struct_field(parts, "scheme")
    host = pc.struct_field(parts, "host")
    path = pc.struct_field(parts, "path")
    reg = pc.struct_field(pc.extract_regex(host, _REG_RE), "reg_domain")
    return (
        t.append_column("scheme", scheme)
        .append_column("host", host)
        .append_column("path", path)
        .append_column("reg_domain", reg)
    )


def domain_counts(ds, url_col: str = "url", key: str = "reg_domain", num_buckets: int = 256):
    """Rows-per-domain over a pages Dataset.  Returns a Dataset of
    (domain, n_pages), one row per distinct domain, fully distributed:
    only (bucket, domain) pairs shuffle, counts reduce inside 256
    vectorized bucket groups."""

    def project(t: pa.Table) -> pa.Table:
        p = add_url_parts(t.select([url_col]), url_col)
        dom = p.column(key)
        out = pa.table({"domain": dom})
        return out.append_column("bucket", hash_bucket(out.column("domain"), num_buckets))

    def count_bucket(g: pa.Table) -> pa.Table:
        # drop malformed-URL nulls before encoding (null indices would
        # force a float numpy conversion)
        arr = g.column("domain").combine_chunks().drop_null().dictionary_encode()
        idx = arr.indices.to_numpy(zero_copy_only=False)
        counts = np.bincount(idx, minlength=len(arr.dictionary))
        return pa.table(
            {
                "domain": arr.dictionary,
                "n_pages": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pyarrow")
    )


def top_domains(ds, k: int = 10, url_col: str = "url", key: str = "reg_domain"):
    """Top-k domains by page count, deterministic tie-break on domain
    name.  The sort runs over the aggregated (domain, n) table — one row
    per domain, narrow — never over the pages."""
    counts = domain_counts(ds, url_col=url_col, key=key)
    return counts.sort(["n_pages", "domain"], descending=[True, False]).limit(k)


_PRE_RE = r"^(?P<pre>[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)(?P<rest>[\s\S]*)$"


def canonicalize_urls(
    t: pa.Table, url_col: str = "url", out_col: str = "url_canon"
) -> pa.Table:
    """Append a canonical form of ``url_col``: fragment stripped,
    ``utm_*`` tracking params removed (first-param promotion when the
    leading param was dropped), default ports (:80 http / :443 https)
    elided, scheme+host lowercased, dangling ``?`` trimmed.  Rows that
    don't look like URLs pass through unchanged.

    Fully vectorized: every step is a pyarrow.compute RE2 kernel — the
    SAME regex engine DuckDB uses, so the oracle runs the identical
    pattern chain with no cross-engine regex-dialect risk."""
    orig = t.column(url_col)
    if isinstance(orig, pa.ChunkedArray):
        orig = orig.combine_chunks()
    u = pc.replace_substring_regex(orig, r"#.*$", "")
    u = pc.replace_substring_regex(u, r"[?&]utm_[a-z_]*=[^&#]*", "")
    # the removed utm param may have been the FIRST one: promote the next
    # '&' to '?' (only when no '?' survived)
    needs_promote = pc.and_(
        pc.invert(pc.match_substring(u, "?")), pc.match_substring(u, "&")
    )
    u = pc.if_else(
        needs_promote,
        pc.replace_substring(u, "&", "?", max_replacements=1),
        u,
    )
    u = pc.replace_substring_regex(
        u, r"^([hH][tT][tT][pP]://[^/:?#]+):80([/?#]|$)", r"\1\2"
    )
    u = pc.replace_substring_regex(
        u, r"^([hH][tT][tT][pP][sS]://[^/:?#]+):443([/?#]|$)", r"\1\2"
    )
    parts = pc.extract_regex(u, _PRE_RE)
    pre = pc.struct_field(parts, "pre")
    rest = pc.struct_field(parts, "rest")
    lowered = pc.binary_join_element_wise(pc.utf8_lower(pre), rest, "")
    u = pc.if_else(pc.is_valid(pre), lowered, u)
    # drop ALL dangling separators in one pass (a lone trailing '?' must
    # not expose a new '&'-promotion on a second application — the chain
    # is IDEMPOTENT, pinned by a hypothesis property test)
    u = pc.replace_substring_regex(u, r"[?&]+$", "")
    # non-URL rows pass through COMPLETELY unchanged
    u = pc.if_else(pc.match_substring(orig, "://"), u, orig)
    return t.append_column(out_col, u)
