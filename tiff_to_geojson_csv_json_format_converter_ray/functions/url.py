"""Vectorized URL parsing over Arrow string arrays.

Web-corpus rows are keyed by ``url`` (the reference's pages are keyed
by file path / layer name; a Common-Crawl-style corpus is keyed by
URL), and the pipeline operators a training-data engine needs --
per-domain statistics, per-domain document caps (RefinedWeb-style),
host-level dedup keys -- all start from the same parse.

Every field is extracted with ONE RE2 pattern per field via
``pyarrow.compute.extract_regex`` (no Python loop over rows).  DuckDB's
``regexp_extract`` is also RE2, so the SQL oracle mirrors use the same
pattern strings verbatim and the two engines agree bit-for-bit --
including on malformed inputs, where both return no-match.

The registered-domain rule is the standard 2-label heuristic with a
3-label carve-out for compound public suffixes (``co.uk``-style second
levels in :data:`COMPOUND_2LD`).  It is deliberately a small frozen
set, not the full public-suffix list (no network, and the oracle must
replicate it in SQL); swap :data:`COMPOUND_2LD` for the PSL offline
snapshot in production.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# second-level labels under which a third label is required to form a
# registered domain (co.uk, com.au, gov.in, ...)
COMPOUND_2LD = ("co", "com", "net", "org", "ac", "gov", "edu")

# one RE2 pattern per field; group name is always `v`.  Kept as plain
# strings so oracle_sql() can embed them verbatim in regexp_extract.
URL_PATTERNS: dict[str, str] = {
    "scheme": r"^(?P<v>[A-Za-z][A-Za-z0-9+.\-]*)://",
    "host": r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?(?P<v>[^/?#:]+)",
    "port": r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?[^/?#:]+:(?P<v>[0-9]+)",
    "path": r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(?P<v>/[^?#]*)",
    "query": r"\?(?P<v>[^#]*)",
    "fragment": r"#(?P<v>.*)$",
}

_RD3 = (
    r"(?P<v>[^.]+\.(?:" + "|".join(COMPOUND_2LD) + r")\.[^.]+)$"
)
_RD2 = r"(?P<v>[^.]+\.[^.]+)$"
_TLD = r"(?P<v>[^.]+)$"


def _extract(arr: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    """extract_regex -> the single named group, null when no match.
    Empty matches ('?#' urls) also null -- keeps the engine aligned
    with the SQL mirror's NULLIF(regexp_extract(...), '')."""
    v = pc.struct_field(pc.extract_regex(arr, pattern), "v")
    return pc.if_else(pc.equal(v, ""), pa.scalar(None, pa.string()), v)


def registered_domain(host: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Registered domain of a hostname: last two labels, or last three
    when the second-to-last is a compound public-suffix label; the host
    itself when it has no dot."""
    r3 = _extract(host, _RD3)
    r2 = _extract(host, _RD2)
    return pc.coalesce(r3, r2, host)


def parse_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Table:
    """Parse a string array of URLs into one column per component.

    Returns columns ``scheme host port path query fragment
    registered_domain tld`` -- null where the component is absent or
    the URL is malformed.  Fully vectorized (one RE2 pass per field).
    """
    cols: dict[str, pa.Array] = {
        name: _extract(urls, pat) for name, pat in URL_PATTERNS.items()
    }
    host = cols["host"]
    cols["registered_domain"] = registered_domain(host)
    cols["tld"] = _extract(host, _TLD)
    return pa.table(cols)


_DEFAULT_PORTS = (("https", "443"), ("http", "80"))


def _sorted_query(query: pa.Array) -> pa.Array:
    """Sort '&'-separated query params lexicographically per row
    (vectorized: one flatten, one lexsort, one rebuild -- no per-row
    Python loop).  Null rows stay null."""
    import numpy as np

    if isinstance(query, pa.ChunkedArray):
        query = query.combine_chunks()
    la = pc.split_pattern(query, "&")
    flat = pc.list_flatten(la)
    if len(flat) == 0:
        return query
    parents = pc.list_parent_indices(la).to_numpy(zero_copy_only=False)
    vals = np.asarray(flat.to_pylist(), dtype=object)
    order = np.lexsort((vals, parents))
    counts = pc.list_value_length(la)
    cnp = counts.to_numpy(zero_copy_only=False)
    cnp = np.where(np.isnan(cnp.astype(np.float64)), 0, cnp).astype(np.int64) \
        if counts.null_count else cnp.astype(np.int64)
    offsets = np.r_[np.int64(0), np.cumsum(cnp)]
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.array(vals[order], pa.string()),
    )
    joined = pc.binary_join(lists, "&")
    return pc.if_else(pc.is_valid(query), joined, query)


def canonicalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Canonical form for URL-level dedup: lowercase scheme and host,
    drop default ports (https:443 / http:80), default the path to '/',
    sort query params, drop the fragment.  Null for malformed URLs
    (no parseable host).  Mirrored bit-for-bit by
    :func:`sql_canonical_expr` (tests pin it)."""
    p = parse_urls(urls)
    scheme = pc.utf8_lower(p["scheme"])
    host = pc.utf8_lower(p["host"])
    port = p["port"]
    default = pc.or_(
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
    )
    keep_port = pc.and_(pc.is_valid(port), pc.fill_null(pc.invert(default), True))
    port_part = pc.if_else(
        keep_port,
        pc.binary_join_element_wise(":", pc.fill_null(port, ""), ""),
        "",
    )
    path_part = pc.fill_null(p["path"], "/")
    q = _sorted_query(p["query"])
    query_part = pc.if_else(
        pc.is_valid(q),
        pc.binary_join_element_wise("?", pc.fill_null(q, ""), ""),
        "",
    )
    canon = pc.binary_join_element_wise(
        pc.fill_null(scheme, ""), "://", pc.fill_null(host, ""),
        port_part, path_part, query_part, "",
    )
    return pc.if_else(pc.is_valid(host), canon, pa.scalar(None, pa.string()))


def sql_canonical_expr(url_expr: str) -> str:
    """DuckDB expression mirroring :func:`canonicalize_urls`."""
    p = sql_url_exprs(url_expr)
    scheme, host, port = p["scheme"], p["host"], p["port"]
    path, query = p["path"], p["query"]
    defaults = " OR ".join(
        f"(lower({scheme}) = '{s}' AND {port} = '{pt}')"
        for s, pt in _DEFAULT_PORTS
    )
    return (
        f"CASE WHEN {host} IS NOT NULL THEN "
        f"lower({scheme}) || '://' || lower({host}) || "
        f"CASE WHEN {port} IS NOT NULL AND NOT ({defaults}) "
        f"THEN ':' || {port} ELSE '' END || "
        f"COALESCE({path}, '/') || "
        f"CASE WHEN {query} IS NOT NULL THEN '?' || "
        f"array_to_string(list_sort(string_split({query}, '&')), '&') "
        f"ELSE '' END END"
    )


def sql_url_exprs(url_expr: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`parse_urls` for a given SQL
    url expression -- the same RE2 patterns via regexp_extract (which
    returns '' on no match; NULLIF restores the null semantics)."""

    def rex(pat: str) -> str:
        p = pat.replace("(?P<v>", "(").replace("'", "''")
        return f"NULLIF(regexp_extract({url_expr}, '{p}', 1), '')"

    host = rex(URL_PATTERNS["host"])
    out = {name: rex(pat) for name, pat in URL_PATTERNS.items()}
    rd3 = _RD3.replace("(?P<v>", "(").replace("'", "''")
    rd2 = _RD2.replace("(?P<v>", "(").replace("'", "''")
    tld = _TLD.replace("(?P<v>", "(").replace("'", "''")
    out["registered_domain"] = (
        f"COALESCE(NULLIF(regexp_extract({host}, '{rd3}', 1), ''), "
        f"NULLIF(regexp_extract({host}, '{rd2}', 1), ''), {host})"
    )
    out["tld"] = f"NULLIF(regexp_extract({host}, '{tld}', 1), '')"
    return out
