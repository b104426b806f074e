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
