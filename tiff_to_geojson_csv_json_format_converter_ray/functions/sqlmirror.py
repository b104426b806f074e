"""DuckDB SQL expression builders mirroring the engine's 64-bit
hashing kernels bit-for-bit (functions/hashing.py, functions/sketch.py).

These exist so `__ray_entry__.oracle_sql()` can express the sketch /
fingerprint operators (HyperLogLog, SimHash, MinHash) as INDEPENDENT
SQL programs the driver can replay -- the SQL recomputes the published
constructions from the raw tables; it never embeds engine output.

All 64-bit wraparound arithmetic runs in HUGEINT (int128):

- ``a * c (mod 2**64)`` for a constant ``c >= 2**63`` is split into
  32-bit halves (``mul64_sql``) so every partial stays < 2**97;
- a constant ``c < 2**63`` multiplies directly (product < 2**127);
- XOR and shifts work natively on HUGEINT in DuckDB 1.0.

UTF-8 bytes of a VARCHAR are recovered via ``hex(encode(s))`` + 2-char
slices (DuckDB has no BLOB subscript), and per-byte folds (FNV-1a) run
through ``list_reduce`` lambdas -- native-speed, no recursive CTE.
"""

from __future__ import annotations

M64 = "18446744073709551616::HUGEINT"
FNV_OFFSET = 14695981039346656037  # 0xCBF29CE484222325
FNV_PRIME = 1099511628211  # 0x100000001B3  (< 2**63: direct multiply)


def _hexval(hx: str, pos: str) -> str:
    """Value 0-15 of the 1-based hex char at ``pos`` (uppercase hex)."""
    c = f"unicode(substring({hx}, CAST({pos} AS INTEGER), 1))"
    return f"(CASE WHEN {c} >= 65 THEN {c} - 55 ELSE {c} - 48 END)"


def bytes_list_sql(texpr: str) -> str:
    """LIST(HUGEINT) of the utf-8 bytes of ``texpr`` (VARCHAR)."""
    hx = f"hex(encode({texpr}))"
    b = f"(16 * {_hexval(hx, '2*i-1')} + {_hexval(hx, '2*i')})::HUGEINT"
    return (
        f"list_transform(range(1, "
        f"CAST(octet_length(encode({texpr})) AS BIGINT) + 1), i -> {b})"
    )


def fnv1a_sql(texpr: str) -> str:
    """FNV-1a 64 of ``texpr``'s utf-8 bytes; bit-equal to
    functions/hashing.py::fnv1a_array (empty string -> offset basis)."""
    return (
        f"list_reduce(list_prepend({FNV_OFFSET}::HUGEINT, "
        f"{bytes_list_sql(texpr)}), "
        f"(h, b) -> (xor(h, b) * {FNV_PRIME}::HUGEINT) % {M64})"
    )


def mul64_sql(a: str, c: int) -> str:
    """``(a * c) mod 2**64`` for HUGEINT expr ``a`` (< 2**64) and a
    64-bit constant ``c``, split into 32-bit halves of ``c``."""
    if c < (1 << 63):
        return f"((({a}) * {c}::HUGEINT) % {M64})"
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (
        f"(((((({a}) * {hi}::HUGEINT) % 4294967296::HUGEINT) "
        f"* 4294967296::HUGEINT) + (({a}) * {lo}::HUGEINT)) % {M64})"
    )


def fmix64_steps(col: str = "h") -> list[str]:
    """MurmurHash3 64-bit finalizer (functions/sketch.py::_fmix64) as a
    list of chained SELECT expressions -- each entry transforms column
    ``col`` of the previous stage, so callers emit them as stacked CTEs
    and the expression tree stays linear."""
    return [
        f"xor({col}, ({col}) >> 33)",
        mul64_sql(col, 0xFF51AFD7ED558CCD),
        f"xor({col}, ({col}) >> 33)",
        mul64_sql(col, 0xC4CEB9FE1A85EC53),
        f"xor({col}, ({col}) >> 33)",
    ]


def fmix64_ctes(src: str, prefix: str = "fx") -> tuple[str, str]:
    """CTE chain applying fmix64 to relation ``src`` (one HUGEINT
    column ``h`` plus any carried columns referenced as ``* EXCLUDE``
    is NOT used -- ``src`` must expose exactly the columns it wants to
    keep plus ``h``).  Returns (cte_sql, final_name)."""
    parts = []
    prev = src
    for i, step in enumerate(fmix64_steps("h")):
        name = f"{prefix}{i}"
        parts.append(
            f"{name} AS (SELECT * REPLACE (({step}) AS h) FROM {prev})"
        )
        prev = name
    return ", ".join(parts), prev


def hll_estimate_sql(hashes_rel: str, p: int = 12) -> str:
    """Scalar-subquery SQL computing the HyperLogLog estimate of
    relation ``hashes_rel`` (one HUGEINT column ``h`` of raw 64-bit
    hashes), bit-matching functions/sketch.py::HyperLogLog: fmix64,
    top-p register index, rho = leading-1 position of the remaining
    bits (capped 64-p+1), alpha*m^2 / sum(2^-reg) with the linear-
    counting fallback below 2.5m."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m) if p >= 7 else 0.673
    fx, last = fmix64_ctes(f"(SELECT h FROM {hashes_rel})", prefix="hfx")
    cap = 64 - p + 1
    return (
        f"(WITH {fx}, "
        f"hreg AS (SELECT (h >> {64 - p}) AS idx, "
        f"  ((h << {p}) % {M64}) AS rest FROM {last}), "
        f"hrho AS (SELECT idx, CASE WHEN rest = 0 THEN {cap} "
        f"  ELSE (SELECT MIN(r.b) + 1 FROM range(0, {64 - p}) r(b) "
        f"        WHERE ((rest >> (63 - r.b)) % 2) = 1) END AS rho "
        f"  FROM hreg), "
        f"hmax AS (SELECT idx, MAX(rho) AS rho FROM hrho GROUP BY idx), "
        f"hsum AS (SELECT COUNT(*) AS k, "
        f"  SUM(POWER(2.0, -rho)) AS s FROM hmax), "
        f"hest AS (SELECT CAST({alpha!r} AS DOUBLE) * {m}.0 * {m}.0 "
        f"  / (({m} - k) * 1.0 + COALESCE(s, 0.0)) AS est, {m} - k AS zeros "
        f"  FROM hsum) "
        f"SELECT CASE WHEN est <= 2.5 * {m} AND zeros > 0 "
        f"  THEN {m}.0 * LN({m}.0 / zeros) ELSE est END FROM hest)"
    )


def hll_grouped_estimate_sql(rel: str, group_col: str = "g",
                             p: int = 12, ndigits: int = 6) -> str:
    """Per-group HyperLogLog estimates of relation ``rel`` exposing
    (``group_col``, ``h``): the grouped form of
    :func:`hll_estimate_sql`, mirroring
    stages/sketch.py::grouped_approx_distinct (per-group register max
    then the standard estimate).  Emits a full SELECT returning
    (``group_col``, approx_n ROUNDed to ``ndigits``)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m) if p >= 7 else 0.673
    fx, last = fmix64_ctes(f"(SELECT {group_col}, h FROM {rel})",
                           prefix="gfx")
    cap = 64 - p + 1
    return (
        f"WITH {fx}, "
        f"greg AS (SELECT {group_col}, (h >> {64 - p}) AS idx, "
        f"  ((h << {p}) % {M64}) AS rest FROM {last}), "
        f"grho AS (SELECT {group_col}, idx, "
        f"  CASE WHEN rest = 0 THEN {cap} "
        f"  ELSE (SELECT MIN(r.b) + 1 FROM range(0, {64 - p}) r(b) "
        f"        WHERE ((rest >> (63 - r.b)) % 2) = 1) END AS rho "
        f"  FROM greg), "
        f"gmax AS (SELECT {group_col}, idx, MAX(rho) AS rho FROM grho "
        f"  GROUP BY {group_col}, idx), "
        f"gsum AS (SELECT {group_col}, COUNT(*) AS k, "
        f"  SUM(POWER(2.0, -rho)) AS s FROM gmax GROUP BY {group_col}), "
        f"gest AS (SELECT {group_col}, CAST({alpha!r} AS DOUBLE) "
        f"  * {m}.0 * {m}.0 / (({m} - k) * 1.0 + COALESCE(s, 0.0)) AS est, "
        f"  {m} - k AS zeros FROM gsum) "
        f"SELECT {group_col}, ROUND(CASE WHEN est <= 2.5 * {m} "
        f"  AND zeros > 0 THEN {m}.0 * LN({m}.0 / zeros) ELSE est END, "
        f"  {ndigits}) AS approx_n FROM gest"
    )


def round_half_away_sql(x: str, ndigits: int) -> str:
    """DuckDB ROUND(x, d) textual form (ties away from zero) -- the
    engine mirrors it via functions/rounding.py::round_like_sql."""
    return f"ROUND({x}, {ndigits})"


def simhash64_sql(doc_rel: str, id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Per-document Charikar SimHash over whitespace tokens, bit-equal
    to functions/hashing.py::simhash_batch with fnv1a token hashes:
    bit i of the output is 1 iff strictly more than half the doc's
    tokens (counting duplicates) have bit i set.  Output is the
    engine's int64 VIEW of the uint64 word (wraps negative).  Emits a
    full SELECT returning ({id_col}, simhash64)."""
    return (
        f"WITH sdocs AS (SELECT {id_col}, "
        f"  list_filter(string_split(COALESCE({text_col}, ''), ' '), "
        f"              t -> t <> '') AS toks FROM {doc_rel}), "
        f"stoks AS (SELECT {id_col}, unnest(toks) AS tok FROM sdocs), "
        f"shash AS (SELECT {id_col}, {fnv1a_sql('tok')} AS h FROM stoks), "
        f"svotes AS (SELECT {id_col}, r.b AS bit, "
        f"  SUM(CASE WHEN ((h >> r.b) % 2) = 1 THEN 1 ELSE 0 END) AS ones, "
        f"  COUNT(*) AS n FROM shash, range(0, 64) r(b) "
        f"  GROUP BY {id_col}, r.b), "
        f"sword AS (SELECT {id_col}, "
        f"  SUM(CASE WHEN 2 * ones > n THEN (1::HUGEINT << bit) "
        f"      ELSE 0::HUGEINT END) AS w FROM svotes GROUP BY {id_col}) "
        f"SELECT d.{id_col}, CAST(CASE WHEN COALESCE(s.w, 0::HUGEINT) >= "
        f"  9223372036854775808::HUGEINT "
        f"  THEN COALESCE(s.w, 0::HUGEINT) - {M64} "
        f"  ELSE COALESCE(s.w, 0::HUGEINT) END AS BIGINT) AS simhash64 "
        f"FROM sdocs d LEFT JOIN sword s ON s.{id_col} = d.{id_col}"
    )
