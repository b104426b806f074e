"""Query implementations, part 11 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
    grouped_by_key as _grouped_by_key,
)

from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
    round_half_away,
    scaled_int,
)
from .part01 import (  # noqa: F401
    OG_KNN_OUTSIDE_PROBES,
    OG_KNN_PROBES,
    OG_POLYGONS,
    _halfplane_sql,
)
from .part06 import (  # noqa: F401
    _MARKOV_STATES,
)
from .part07 import (  # noqa: F401
    _ASSIGN_PROBES,
    _HITS_ITERS,
    _HITS_SCALE,
    _KRIG_PROBES,
)
from .part10 import (  # noqa: F401
    _quality_features_oracle_sql,
)


def _boundary_distance_oracle_sql() -> str:
    """Mirror of _q_boundary_distance: per edge, the clamped
    projection t and squared offset with engine-identical float
    constants (dx, dy, denom precomputed in Python and inlined, so
    both sides multiply the same doubles); LEAST over edges, one
    SQRT, ROUND 6."""
    probes = [(i, p) for i, p in enumerate(OG_KNN_PROBES)]
    probes += [(100 + i, p) for i, p in enumerate(OG_KNN_OUTSIDE_PROBES)]
    values = ", ".join(
        f"(CAST({i} AS BIGINT), {p[0]!r}, {p[1]!r})" for i, p in probes
    )
    parts = []
    for pid, pts in sorted(OG_POLYGONS.items()):
        terms = []
        n = len(pts)
        for e in range(n):
            ax, ay = float(pts[e][0]), float(pts[e][1])
            bx, by = float(pts[(e + 1) % n][0]), float(pts[(e + 1) % n][1])
            dx, dy = bx - ax, by - ay
            denom = dx * dx + dy * dy
            t = (
                f"LEAST(GREATEST((((lon - {ax!r}) * {dx!r} "
                f"+ (lat - {ay!r}) * {dy!r}) / {denom!r}), 0.0), 1.0)"
            )
            terms.append(
                f"((lon - ({ax!r} + {t} * {dx!r})) "
                f"* (lon - ({ax!r} + {t} * {dx!r})) "
                f"+ (lat - ({ay!r} + {t} * {dy!r})) "
                f"* (lat - ({ay!r} + {t} * {dy!r})))"
            )
        parts.append(
            f"SELECT probe_id, '{pid}' AS polygon_id, "
            f"ROUND(SQRT(LEAST({', '.join(terms)})), 6) AS dist_boundary "
            f"FROM (SELECT * FROM (VALUES {values}) "
            f"AS t(probe_id, lon, lat))"
        )
    return " UNION ALL ".join(parts)


def _polygon_coverage_oracle_sql(res: int = 7, ss: int = 8) -> str:
    """Mirror of _q_polygon_coverage: per polygon, the identical
    subpoint lattice (cell index + (i+0.5)/ss offsets, exact cell
    size 360/2^(res+8)) and the identical strict half-plane test."""
    import numpy as np

    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        cell_size,
    )

    s = cell_size(res)
    parts = []
    for pid, pts in sorted(OG_POLYGONS.items()):
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        ix0 = int(np.floor((min(xs) + 180.0) / s))
        ix1 = int(np.floor((max(xs) + 180.0) / s))
        iy0 = int(np.floor((min(ys) + 90.0) / s))
        iy1 = int(np.floor((max(ys) + 90.0) / s))
        parts.append(
            f"SELECT '{pid}' AS polygon_id, "
            f"(CAST({res} AS BIGINT) << 56) | (iy << 28) | ix AS cell, "
            f"ROUND(CAST(cnt AS DOUBLE) / {float(ss * ss)!r}, 6) AS coverage "
            f"FROM (SELECT ix, iy, SUM(hit) AS cnt FROM ("
            f"SELECT x.range AS ix, y.range AS iy, "
            f"CASE WHEN {{hp}} THEN 1 ELSE 0 END AS hit FROM ("
            f"SELECT x.range, "
            f"-180.0 + (CAST(x.range AS DOUBLE) "
            f"+ (CAST(i.range AS DOUBLE) + 0.5) / {float(ss)!r}) * {s!r} AS lon "
            f"FROM range({ix0}, {ix1 + 1}) x, range(0, {ss}) i) x, ("
            f"SELECT y.range, "
            f"-90.0 + (CAST(y.range AS DOUBLE) "
            f"+ (CAST(j.range AS DOUBLE) + 0.5) / {float(ss)!r}) * {s!r} AS lat "
            f"FROM range({iy0}, {iy1 + 1}) y, range(0, {ss}) j) y"
            f") GROUP BY ix, iy) WHERE cnt > 0".format(hp=_halfplane_sql(pts))
        )
    return " UNION ALL ".join(parts)


def _geofence_oracle_sql() -> str:
    """Mirror of _q_geofence_transitions: per-polygon membership via
    the strict-interior half-plane test (equivalent to the engine's
    even-odd ray cast for these convex CCW fixtures off the lattice),
    LAG per user ordered by (ts, event_id), a row per flip."""
    geocode = (
        "SELECT user_id, ts, event_id, "
        "77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon, "
        "28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat "
        "FROM events"
    )
    in_cols = ", ".join(
        f"CASE WHEN {_halfplane_sql(poly)} THEN 1 ELSE 0 END AS in_{pid}"
        for pid, poly in OG_POLYGONS.items()
    )
    lag_cols = ", ".join(
        f"in_{pid}, LAG(in_{pid}) OVER "
        f"(PARTITION BY user_id ORDER BY ts, event_id) AS p_{pid}"
        for pid in OG_POLYGONS
    )
    parts = [
        f"SELECT '{pid}' AS polygon_id, user_id, event_id, "
        f"CASE WHEN in_{pid} = 1 THEN 'enter' ELSE 'exit' END AS transition "
        f"FROM l WHERE p_{pid} IS NOT NULL AND in_{pid} <> p_{pid}"
        for pid in OG_POLYGONS
    ]
    return (
        f"WITH g AS ({geocode}), "
        f"m AS (SELECT user_id, ts, event_id, {in_cols} FROM g), "
        f"l AS (SELECT user_id, ts, event_id, {lag_cols} FROM m) "
        + " UNION ALL ".join(parts)
    )


def _stay_points_oracle_sql(eps: float = 0.3, min_dur: float = 3600.0) -> str:
    """Mirror of _q_stay_points (Li et al. 2008 kernel,
    functions/geometry.py::stay_points): the sequential anchor scan as
    a linear recursive CTE -- each step finds the first fix past eps of
    the anchor (squared-distance compare, identical float ops on both
    sides), emits a stay when the dwell reaches min_dur, and advances
    the anchor.  Users advance independently; recursion depth = longest
    track.  Verified bit-exact (incl. the rounded dwell sums) at
    sf0.01 and sf0.1."""
    eps2 = repr(eps * eps)
    return f"""
WITH RECURSIVE g AS (
  SELECT user_id, ts, event_id,
         77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon,
         28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat
  FROM events),
p AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
         lon, lat, epoch_us(ts) / 1000000.0 AS t FROM g),
ext AS (SELECT user_id, COUNT(*) AS n FROM p GROUP BY user_id),
rec(user_id, i, stays, dwell) AS (
  SELECT user_id, 0, CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE) FROM ext
  UNION ALL
  SELECT s.user_id,
         CASE WHEN s.stay THEN s.jb ELSE s.i + 1 END,
         s.stays + CAST(s.stay AS BIGINT),
         s.dwell + CASE WHEN s.stay THEN s.tleave - s.tarr ELSE 0.0 END
  FROM (
    SELECT u.user_id, u.i, u.stays, u.dwell, u.jb, u.tarr, tl.t AS tleave,
           (tl.t - u.tarr >= {min_dur!r} AND u.jb - 1 > u.i) AS stay
    FROM (
      SELECT rec.user_id, rec.i, rec.stays, rec.dwell, pa.t AS tarr,
             COALESCE(MIN(q.i), ext.n) AS jb
      FROM rec
      JOIN ext ON ext.user_id = rec.user_id
      JOIN p pa ON pa.user_id = rec.user_id AND pa.i = rec.i
      LEFT JOIN p q ON q.user_id = rec.user_id AND q.i > rec.i
        AND (q.lon - pa.lon)*(q.lon - pa.lon)
            + (q.lat - pa.lat)*(q.lat - pa.lat) > {eps2}
      WHERE rec.i < ext.n
      GROUP BY rec.user_id, rec.i, rec.stays, rec.dwell, pa.t, ext.n
    ) u
    JOIN p tl ON tl.user_id = u.user_id AND tl.i = u.jb - 1
  ) s
)
SELECT r.user_id, r.stays AS n_stays, ROUND(r.dwell, 6) AS total_dwell_s
FROM rec r JOIN ext e ON e.user_id = r.user_id
WHERE r.i >= e.n
"""


def _track_simplify_oracle_sql(tol: float = 0.02) -> str:
    """Mirror of _q_track_simplify: Douglas-Peucker as a recursive CTE.

    DP's keep-set is independent of split-processing order, so the
    recursion is a segment work-list: each pending (a, b) finds its
    max-perpendicular-distance interior point (same |cross|/sqrt(seg2)
    formula as functions/geometry.py::simplify_dp, ROW_NUMBER tiebreak =
    np.argmax first-index) and splits while dmax > tol.  Kept vertices =
    all segment endpoints of the recursion's closure.

    DuckDB 1.0 quirk: inside a WITH RECURSIVE list, a plain ``UNION``
    between two SELECTs dedups per-branch only -- the kept CTE needs the
    explicit outer DISTINCT over UNION ALL."""
    return (
        "WITH RECURSIVE g AS ("
        "  SELECT user_id, ts, event_id,"
        "         77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01 AS lon,"
        "         28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01 AS lat"
        "  FROM events),"
        " p AS ("
        "  SELECT user_id,"
        "         ROW_NUMBER() OVER (PARTITION BY user_id"
        "                            ORDER BY ts, event_id) - 1 AS i,"
        "         lon, lat FROM g),"
        " ext AS (SELECT user_id, MAX(i) AS last, COUNT(*) AS n"
        "         FROM p GROUP BY user_id),"
        " seg(user_id, a, b) AS ("
        "  SELECT user_id, 0, last FROM ext"
        "  UNION ALL"
        "  SELECT v.user_id, v.na, v.nb FROM ("
        "    SELECT u.user_id, u.a, u.b, u.m, u.d,"
        "           ROW_NUMBER() OVER (PARTITION BY u.user_id, u.a, u.b"
        "                              ORDER BY u.d DESC, u.m ASC) AS rn"
        "    FROM ("
        "      SELECT seg.user_id, seg.a, seg.b, q.i AS m,"
        "             CASE WHEN (pb.lon - pa.lon)*(pb.lon - pa.lon)"
        "                       + (pb.lat - pa.lat)*(pb.lat - pa.lat) = 0.0"
        "                  THEN SQRT((q.lon - pa.lon)*(q.lon - pa.lon)"
        "                            + (q.lat - pa.lat)*(q.lat - pa.lat))"
        "                  ELSE ABS((q.lon - pa.lon)*(pb.lat - pa.lat)"
        "                           - (q.lat - pa.lat)*(pb.lon - pa.lon))"
        "                       / SQRT((pb.lon - pa.lon)*(pb.lon - pa.lon)"
        "                              + (pb.lat - pa.lat)*(pb.lat - pa.lat))"
        "             END AS d"
        "      FROM seg"
        "      JOIN p pa ON pa.user_id = seg.user_id AND pa.i = seg.a"
        "      JOIN p pb ON pb.user_id = seg.user_id AND pb.i = seg.b"
        "      JOIN p q  ON q.user_id = seg.user_id"
        "                AND q.i > seg.a AND q.i < seg.b"
        "    ) u"
        "  ) t, LATERAL (VALUES (t.user_id, t.a, t.m),"
        "                       (t.user_id, t.m, t.b)) v(user_id, na, nb)"
        f"  WHERE t.rn = 1 AND t.d > {tol!r}"
        " ),"
        " kept AS ("
        "  SELECT DISTINCT user_id, i FROM ("
        "    SELECT user_id, a AS i FROM seg"
        "    UNION ALL SELECT user_id, b AS i FROM seg)),"
        " o AS ("
        "  SELECT k.user_id, p.i, p.lon, p.lat,"
        "         LAG(p.lon) OVER w AS plon, LAG(p.lat) OVER w AS plat"
        "  FROM kept k JOIN p ON p.user_id = k.user_id AND p.i = k.i"
        "  WINDOW w AS (PARTITION BY k.user_id ORDER BY p.i)),"
        " res AS ("
        "  SELECT user_id,"
        "         COALESCE(SUM(SQRT((lon - plon)*(lon - plon)"
        "                           + (lat - plat)*(lat - plat))), 0.0)"
        "           AS len,"
        "         COUNT(*) AS n_kept"
        "  FROM o GROUP BY user_id)"
        " SELECT r.user_id, CAST(e.n AS BIGINT) AS n_raw,"
        "        CAST(r.n_kept AS BIGINT) AS n_kept,"
        "        ROUND(r.len, 6) AS simplified_len"
        " FROM res r JOIN ext e ON e.user_id = r.user_id"
    )


def _pagerank_sql(iters: int = 10) -> str:
    """Unrolled fixed-iteration PageRank mirror of _q_word_pagerank
    (recursive CTEs cannot aggregate over their own reference, so the
    10 rounds unroll as chained CTEs)."""
    head = (
        "WITH tok AS (SELECT DISTINCT source AS w "
        "FROM documents WHERE LEN(source) >= 4), "
        "e AS (SELECT a.w AS w1, b.w AS w2 FROM tok a JOIN tok b "
        "ON a.w < b.w AND ABS(LEN(a.w) - LEN(b.w)) <= 1 "
        "AND LEVENSHTEIN(a.w, b.w) = 1), "
        "sym AS (SELECT w1, w2 FROM e UNION ALL SELECT w2, w1 FROM e), "
        "deg AS (SELECT w1 AS w, CAST(COUNT(*) AS DOUBLE) AS d "
        "FROM sym GROUP BY w1), "
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg), "
        "pr0 AS (SELECT deg.w, 1.0 / nn.n AS r FROM deg, nn)"
    )
    parts = [head]
    for k in range(1, iters + 1):
        parts.append(
            f", s{k} AS (SELECT sym.w2 AS w, "
            f"SUM(pr{k-1}.r / deg.d) AS inc FROM sym "
            f"JOIN pr{k-1} ON pr{k-1}.w = sym.w1 "
            f"JOIN deg ON deg.w = sym.w1 GROUP BY sym.w2), "
            f"pr{k} AS (SELECT deg.w, "
            f"(1.0 - 0.85) / nn.n + 0.85 * COALESCE(s{k}.inc, 0.0) AS r "
            f"FROM deg CROSS JOIN nn "
            f"LEFT JOIN s{k} ON s{k}.w = deg.w)"
        )
    parts.append(
        f" SELECT w AS word, ROUND(r, 6) AS rank FROM pr{iters} "
        "ORDER BY ROUND(r, 6) DESC, w LIMIT 15"
    )
    return "".join(parts)


_ROLL_POWS = [1, 1099511628211, 956575116354345, 624165263380053675,
              11527715348014283921]  # B^0..B^4 mod 2**64 (hashing.py)


def _minhash_core_sql() -> str:
    """Shared CTE list (no WITH keyword) recomputing the full MinHash
    LSH pipeline (stages/dedup.py::minhash_lsh_dedup) in pure SQL:
    documents -> char-5-shingle Rabin-Karp rolling hashes (explicit
    5-term polynomial, the closed form of the engine's rolling update)
    -> 64 frozen universal-hash permutations (MinHasher seed 42; the
    (a_j, b_j) table is data-independent config, like the
    marching-squares segment table) -> per-doc per-perm MIN -> 8-band
    FNV band keys -> bucket-capped candidate pairs -> signature
    similarity >= 0.8 verify.  Ends with `ver(a, b)`.  Scope: mirrors
    the k=5 shingle path (every sf document is >= 44 bytes; the
    engine's short-text fallback shrinks k only below 5 bytes).
    DISTINCT shingles are value-safe (MIN ignores duplicates).  The
    2044-position grid bounds doc length; sf maxlen is 577."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.hashing import (
        MinHasher,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sqlmirror import (
        FNV_OFFSET, FNV_PRIME, M64, _hexval,
    )

    mh = MinHasher(64, 42)
    perm_vals = ", ".join(
        f"({j}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
        for j, (a, b) in enumerate(zip(mh.a, mh.b))
    )

    def byte(pos: str) -> str:
        return (
            f"(16 * {_hexval('db.hx', f'2*({pos})-1')} "
            f"+ {_hexval('db.hx', f'2*({pos})')})::HUGEINT"
        )

    shingle = " + ".join(
        f"{byte(f'i+{j}')} * {_ROLL_POWS[4-j]}::HUGEINT" for j in range(5)
    )
    return (
        f"perms(j, a, b) AS (VALUES {perm_vals}), "
        "db AS MATERIALIZED (SELECT doc_id, hex(encode(text)) AS hx, "
        "octet_length(encode(text)) AS n FROM documents), "
        "pos AS (SELECT i FROM range(1, 2045) t(i)), "
        "sh AS MATERIALIZED (SELECT DISTINCT doc_id, "
        f"(({shingle}) % {M64}) AS h "
        "FROM db JOIN pos t ON t.i <= db.n - 4), "
        "sig AS MATERIALIZED (SELECT doc_id, p.j, "
        f"MIN((h * p.a + p.b) % {M64}) AS s "
        "FROM sh, perms p GROUP BY doc_id, p.j), "
        "sigl AS MATERIALIZED (SELECT doc_id, list(s ORDER BY j) AS sl "
        "FROM sig GROUP BY doc_id), "
        "bk AS MATERIALIZED (SELECT doc_id, bb.band, "
        f"xor(list_reduce(list_prepend({FNV_OFFSET}::HUGEINT, "
        "sl[bb.band*8+1 : bb.band*8+8]), "
        f"(h, x) -> (xor(h, x) * {FNV_PRIME}::HUGEINT) % {M64}), "
        "(bb.band::HUGEINT << 56)) AS key "
        "FROM sigl, range(0, 8) bb(band)), "
        "bsz AS MATERIALIZED (SELECT band, key, COUNT(*) AS g FROM bk "
        "GROUP BY band, key), "
        "cand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib "
        "FROM bk x JOIN bk y ON y.band = x.band AND y.key = x.key "
        "AND y.doc_id > x.doc_id "
        "JOIN bsz ON bsz.band = x.band AND bsz.key = x.key "
        "WHERE bsz.g BETWEEN 2 AND 1000), "
        "ver AS MATERIALIZED (SELECT c.ia AS a, c.ib AS b "
        "FROM cand c JOIN sig s1 ON s1.doc_id = c.ia "
        "JOIN sig s2 ON s2.doc_id = c.ib AND s2.j = s1.j "
        "GROUP BY c.ia, c.ib "
        "HAVING (SUM(CASE WHEN s1.s = s2.s THEN 1 ELSE 0 END) / 64.0) "
        ">= 0.8)"
    )


def _cluster_tail_sql(src: str = "ver") -> str:
    """Recursive min-label transitive closure over a pair list
    `src(a, b)` -> (doc_id, cluster_rep): the SQL form of the engine's
    label propagation / union-find (identical min-id reps,
    non-singleton components only since every node is in a pair)."""
    return (
        f"nodes AS (SELECT a AS n FROM {src} UNION SELECT b FROM {src}), "
        f"edges AS (SELECT a, b FROM {src} "
        f"UNION SELECT b AS a, a AS b FROM {src}), "
        "reach(n, r) AS (SELECT n, n FROM nodes UNION "
        "SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r) "
        "SELECT n AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY n"
    )


def _winnow_dedup_oracle_sql() -> str:
    """Mirror of _q_winnow_dedup (stages/dedup.py::winnow_dedup): the
    8-term rolling-shingle polynomial, full-window sliding MIN (window
    16; docs with <= 16 shingles collapse to their global min exactly
    like the engine's short-text branch), DISTINCT fingerprints,
    postings in [2, 500], shared counts, containment overlap as the
    identical single int/int division (bit-exact, no rounding
    needed)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sqlmirror import (
        M64, _hexval,
    )

    pows, p = [], 1
    for _ in range(8):
        pows.append(p)
        p = (p * 1099511628211) % (1 << 64)

    def byte(pos: str) -> str:
        return (
            f"(16 * {_hexval('db.hx', f'2*({pos})-1')} "
            f"+ {_hexval('db.hx', f'2*({pos})')})::HUGEINT"
        )

    shingle = " + ".join(
        f"{byte(f'i+{j}')} * {pows[7-j]}::HUGEINT" for j in range(8)
    )
    return (
        "WITH db AS MATERIALIZED (SELECT doc_id, hex(encode(text)) AS hx, "
        "octet_length(encode(text)) AS n FROM documents), "
        "pos AS (SELECT i FROM range(1, 2045) t(i)), "
        "sh AS MATERIALIZED (SELECT doc_id, t.i AS i, "
        f"(({shingle}) % {M64}) AS h "
        "FROM db JOIN pos t ON t.i <= db.n - 7), "
        "cnt AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id), "
        "w AS (SELECT sh.doc_id, sh.i, MIN(sh.h) OVER "
        "(PARTITION BY sh.doc_id ORDER BY sh.i "
        "ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS wmin FROM sh), "
        "fps AS MATERIALIZED ("
        "SELECT DISTINCT w.doc_id, w.wmin AS fp FROM w "
        "JOIN cnt ON cnt.doc_id = w.doc_id "
        "WHERE cnt.ns > 16 AND w.i >= 16 "
        "UNION "
        "SELECT sh.doc_id, MIN(sh.h) AS fp FROM sh "
        "JOIN cnt ON cnt.doc_id = sh.doc_id WHERE cnt.ns <= 16 "
        "GROUP BY sh.doc_id), "
        "post AS (SELECT fp, COUNT(*) AS g FROM fps GROUP BY fp), "
        "pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, "
        "CAST(COUNT(*) AS BIGINT) AS shared "
        "FROM fps x JOIN fps y ON y.fp = x.fp AND y.doc_id > x.doc_id "
        "JOIN post ON post.fp = x.fp "
        "WHERE post.g BETWEEN 2 AND 500 GROUP BY x.doc_id, y.doc_id), "
        "sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS m FROM fps "
        "GROUP BY doc_id) "
        "SELECT p.a, p.b, p.shared, "
        "p.shared / CAST(LEAST(sa.m, sb.m) AS DOUBLE) AS overlap "
        "FROM pairs p JOIN sz sa ON sa.doc_id = p.a "
        "JOIN sz sb ON sb.doc_id = p.b "
        "WHERE p.shared / CAST(LEAST(sa.m, sb.m) AS DOUBLE) >= 0.5"
    )


def _passage_dedup_oracle_sql(chunk: int = 10) -> str:
    """Mirror of _q_passage_dedup: disjoint token spans via list
    slicing, winner = MIN (doc_id, span_idx) per span STRING (grouping
    by the span text equals grouping by its fnv1a hash absent a 64-bit
    collision), exact int/int ratio."""
    return (
        "WITH tok AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), t -> t <> '') AS toks "
        "FROM documents), "
        f"ns AS (SELECT doc_id, toks, ARRAY_LENGTH(toks) // {chunk} AS n "
        "FROM tok), "
        "spans AS (SELECT doc_id, j AS span_idx, "
        f"array_to_string(toks[j*{chunk}+1 : j*{chunk}+{chunk}], ' ') AS s "
        "FROM ns, range(0, 205) t(j) WHERE j < ns.n), "
        "w AS (SELECT doc_id, span_idx, s, "
        "CASE WHEN ROW_NUMBER() OVER (PARTITION BY s "
        "ORDER BY doc_id, span_idx) = 1 THEN 0 ELSE 1 END AS dup "
        "FROM spans) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, "
        "CAST(SUM(dup) AS BIGINT) AS n_dup, "
        "SUM(dup) / CAST(COUNT(*) AS DOUBLE) AS dup_ratio "
        "FROM w GROUP BY doc_id"
    )


def _minhash_dedup_oracle_sql() -> str:
    """Mirror of _q_minhash_dedup; verified value-equal at
    sf0.001/0.01/0.1 (45/47/... rows)."""
    return f"WITH RECURSIVE {_minhash_core_sql()}, {_cluster_tail_sql()}"


def _simhash_dedup_oracle_sql() -> str:
    """Mirror of _q_simhash_dedup (stages/dedup.py::simhash_dedup):
    the pure-SQL SimHash (sqlmirror), four 16-bit pigeonhole band
    buckets, exact Hamming verify via bit_count(xor), same closure."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sqlmirror import (
        M64, simhash64_sql,
    )

    return (
        f"WITH RECURSIVE shx AS ({simhash64_sql('documents')}), "
        "shu AS MATERIALIZED (SELECT doc_id, CASE WHEN simhash64 < 0 "
        f"THEN simhash64::HUGEINT + {M64} "
        "ELSE simhash64::HUGEINT END AS h FROM shx), "
        "bku AS MATERIALIZED (SELECT doc_id, h, "
        "CAST(bb.band * 65536 + ((h >> (bb.band * 16)) % 65536) "
        "AS BIGINT) AS gk FROM shu, range(0, 4) bb(band)), "
        "bsz AS MATERIALIZED (SELECT gk, COUNT(*) AS g FROM bku "
        "GROUP BY gk), "
        "ver AS MATERIALIZED (SELECT DISTINCT x.doc_id AS a, "
        "y.doc_id AS b "
        "FROM bku x JOIN bku y ON y.gk = x.gk AND y.doc_id > x.doc_id "
        "JOIN bsz ON bsz.gk = x.gk "
        "WHERE bsz.g BETWEEN 2 AND 1000 "
        "AND bit_count(xor(x.h, y.h)) <= 3), "
        f"{_cluster_tail_sql()}"
    )


def _jaccard_pairs_oracle_sql() -> str:
    """Mirror of _q_jaccard_pairs: the minhash pipeline's clusters ->
    first 20 (rep, doc) pairs ordered by doc_id (the engine's
    to_pylist order: label propagation emits rows sorted by doc_id) ->
    exact word-3-gram Jaccard over DISTINCT grams (set Jaccard over
    identical-fnv1a-hash grams equals set Jaccard over the gram
    strings absent a 64-bit collision)."""
    grams = (
        "CASE WHEN COALESCE(ARRAY_LENGTH(toks), 0) < 3 "
        "THEN (CASE WHEN COALESCE(ARRAY_LENGTH(toks), 0) = 0 THEN [] "
        "ELSE [array_to_string(toks, ' ')] END) "
        "ELSE list_transform(range(1, ARRAY_LENGTH(toks) - 1), "
        "i -> toks[i] || chr(31) || toks[i+1] || chr(31) || toks[i+2]) "
        "END"
    )
    return (
        f"WITH RECURSIVE {_minhash_core_sql()}, "
        "nodes AS (SELECT a AS n FROM ver UNION SELECT b FROM ver), "
        "edges AS (SELECT a, b FROM ver "
        "UNION SELECT b AS a, a AS b FROM ver), "
        "reach(n, r) AS (SELECT n, n FROM nodes UNION "
        "SELECT reach.n, e.b FROM reach JOIN edges e ON e.a = reach.r), "
        "clus AS MATERIALIZED (SELECT n AS doc_id, MIN(r) AS rep "
        "FROM reach GROUP BY n), "
        "pick AS MATERIALIZED (SELECT rep AS a, doc_id AS b FROM clus "
        "WHERE doc_id <> rep ORDER BY doc_id LIMIT 20), "
        "tok AS MATERIALIZED (SELECT doc_id, "
        "list_filter(string_split(text, ' '), "
        "t -> t <> '') AS toks FROM documents "
        "WHERE doc_id IN (SELECT a FROM pick UNION SELECT b FROM pick)), "
        "gr AS MATERIALIZED (SELECT doc_id, "
        f"unnest(list_distinct({grams})) AS g FROM tok), "
        "sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS m FROM gr "
        "GROUP BY doc_id), "
        "inter AS MATERIALIZED (SELECT p.a, p.b, COUNT(*) AS i "
        "FROM pick p "
        "JOIN gr ga ON ga.doc_id = p.a "
        "JOIN gr gb ON gb.doc_id = p.b AND gb.g = ga.g "
        "GROUP BY p.a, p.b) "
        "SELECT p.a, p.b, "
        "COALESCE(i.i, 0) / CAST(sa.m + sb.m - COALESCE(i.i, 0) "
        "AS DOUBLE) AS jaccard, "
        "(COALESCE(i.i, 0) / CAST(sa.m + sb.m - COALESCE(i.i, 0) "
        "AS DOUBLE)) >= 0.8 AS is_dup "
        "FROM pick p "
        "JOIN sz sa ON sa.doc_id = p.a "
        "JOIN sz sb ON sb.doc_id = p.b "
        "LEFT JOIN inter i ON i.a = p.a AND i.b = p.b"
    )


def _quantiles_oracle_sql(bins: int = 512) -> str:
    """Mirror of _q_quantiles (stages/sketch.py::quantile_histogram):
    the equi-width histogram sketch is partitioning-invariant (counts
    add), so the SQL recomputes the identical sketch -- one min/max
    pass, truncating bin index with the same clip, cumulative counts
    over ALL bins, searchsorted-left containing bin, linear
    interpolation with the identical float expression order; both
    sides round 2 dp with the DuckDB kernel."""
    nb = bins
    return (
        "WITH mm AS (SELECT MIN(l_extendedprice) AS lo, "
        "MAX(l_extendedprice) AS hi, COUNT(*) AS n FROM lineitem), "
        "par AS (SELECT lo, hi, n, CASE WHEN hi > lo "
        f"THEN (hi - lo) / {nb} ELSE 1.0 END AS width FROM mm), "
        "binned AS (SELECT LEAST(GREATEST(CAST(TRUNC((l_extendedprice "
        f"- p.lo) / p.width) AS BIGINT), 0), {nb - 1}) AS b "
        "FROM lineitem, par p), "
        "counts AS (SELECT b, COUNT(*) AS c FROM binned GROUP BY b), "
        f"grid AS (SELECT i AS b FROM range(0, {nb}) t(i)), "
        "cum0 AS (SELECT g.b, COALESCE(c.c, 0) AS c, "
        "SUM(COALESCE(c.c, 0)) OVER (ORDER BY g.b) AS cs "
        "FROM grid g LEFT JOIN counts c ON c.b = g.b), "
        "cum AS (SELECT b, c, cs, "
        "COALESCE(LAG(cs) OVER (ORDER BY b), 0) AS prev_cs FROM cum0), "
        "qs AS (SELECT CAST(v.q AS DOUBLE) AS q FROM (VALUES (0.25), "
        "(0.5), (0.75), (0.95)) v(q)), "
        "pick AS (SELECT qs.q, qs.q * p.n AS target, "
        "LEAST(COALESCE(MIN(CASE WHEN cum.cs >= qs.q * p.n "
        f"THEN cum.b END), {nb - 1}), {nb - 1}) AS b "
        "FROM qs, par p, cum GROUP BY qs.q, p.n) "
        "SELECT pick.q, ROUND(p.lo + (pick.b + "
        "CASE WHEN cb.c > 0 THEN (pick.target - "
        "cb.prev_cs) / cb.c ELSE 0.0 END) * p.width, 2) "
        "AS estimate "
        "FROM pick CROSS JOIN par p "
        "JOIN cum cb ON cb.b = pick.b"
    )


def _approx_distinct_oracle_sql() -> str:
    """Mirror of _q_approx_distinct: the HyperLogLog estimate recomputed
    in pure SQL (functions/sqlmirror.py) -- FNV-1a over utf-8 bytes via
    list_reduce, fmix64 in HUGEINT with 32-bit-split wraparound
    multiplies, register max per top-12-bit index, alpha*m^2/sum(2^-reg)
    with the linear-counting fallback.  Engine and SQL both round to
    1 dp (ties-away), absorbing the float-sum-order ulp."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions import (
        sqlmirror as SM,
    )

    parts = []
    for col in ("lang", "source", "text"):
        rel = f"(SELECT {SM.fnv1a_sql(col)} AS h FROM documents)"
        parts.append(
            f"SELECT '{col}' AS \"column\", "
            f"ROUND({SM.hll_estimate_sql(rel)}, 1) AS estimate"
        )
    return " UNION ALL ".join(parts)


def _approx_distinct_by_type_oracle_sql() -> str:
    """Mirror of _q_approx_distinct_by_type
    (stages/sketch.py::grouped_approx_distinct): per-group register max
    equals the engine's blob merge, so the grouped SQL estimate is the
    same construction keyed by event_type; both sides round to 6 dp."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions import (
        sqlmirror as SM,
    )

    rel = (
        f"(SELECT event_type, "
        f"{SM.fnv1a_sql('CAST(user_id AS VARCHAR)')} AS h FROM events)"
    )
    return SM.hll_grouped_estimate_sql(rel, "event_type")


def _quality_scores_oracle_sql() -> str:
    """Mirror of _q_quality: the oracled quality expression
    (_quality_features_oracle_sql) joined to the pure-SQL SimHash
    (functions/sqlmirror.py::simhash64_sql -- FNV-1a token hashes,
    per-bit majority vote, int64 view)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sqlmirror import (
        simhash64_sql,
    )

    return (
        f"WITH qf AS ({_quality_features_oracle_sql()}), "
        f"sh AS ({simhash64_sql('documents')}) "
        "SELECT qf.doc_id, qf.quality, sh.simhash64 "
        "FROM qf JOIN sh ON sh.doc_id = qf.doc_id"
    )




def _geohash_expr_for_events() -> str:
    """Geohash-6 of the events lattice geocode (the identical integer
    bit-interleave + base32 substring as functions/cells.py, no
    precomputed table)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.cells import (
        geohash_sql_expr,
    )

    return geohash_sql_expr(
        "(77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01)",
        "(28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01)",
        6,
    )


def _convex_hull_oracle_sql(K: int = 32) -> str:
    """Mirror of _q_convex_hull without replaying the engine: the
    strict-hull-vertex predicate evaluated in pure SQL.  K directional
    extreme points form a sound prune polygon (a hull vertex is never
    strictly inside the convex hull of ANY point subset, so libm
    cos/sin value differences between numpy and DuckDB cannot change
    the result, only the prune's tightness); the surviving O(100)
    candidates then pass the exact supporting-edge test: p is a strict
    hull vertex iff some q gives a directed line p->q with every other
    candidate strictly right of it, allowing collinear points only
    strictly BETWEEN p and q -- this reproduces the monotone chain's
    drop-collinear-vertices semantics (stages/stats.py::convex_hull).
    Verified bit-equal to the engine at sf0.001/0.01/0.1."""
    cr = "((q.x - c.x)*(r.y - c.y) - (q.y - c.y)*(r.x - c.x))"
    dt = "((r.x - c.x)*(q.x - c.x) + (r.y - c.y)*(q.y - c.y))"
    dd = "((q.x - c.x)*(q.x - c.x) + (q.y - c.y)*(q.y - c.y))"
    return (
        "WITH pts AS ("
        "  SELECT DISTINCT"
        "    (77.0 + CAST(event_id % 96 AS DOUBLE) * 0.01)"
        "      + CAST((event_id * 2654435761) % 997 AS DOUBLE) / 99700.0 AS x,"
        "    (28.05 + CAST((event_id // 96) % 96 AS DOUBLE) * 0.01)"
        "      + CAST((event_id * 40503) % 991 AS DOUBLE) / 99100.0 AS y"
        "  FROM events),"
        f" dirs AS (SELECT i, COS(2.0 * PI() * i / {K}.0) AS dx,"
        f"                 SIN(2.0 * PI() * i / {K}.0) AS dy"
        f"          FROM range({K}) t(i)),"
        " ext AS (SELECT DISTINCT x, y FROM ("
        "   SELECT d.i, p.x, p.y, ROW_NUMBER() OVER ("
        "     PARTITION BY d.i ORDER BY p.x*d.dx + p.y*d.dy DESC, p.x, p.y"
        "   ) AS rn FROM dirs d CROSS JOIN pts p) WHERE rn = 1),"
        " ctr AS (SELECT AVG(x) AS cx, AVG(y) AS cy FROM ext),"
        " poly AS (SELECT x, y, ROW_NUMBER() OVER ("
        "   ORDER BY ATAN2(y - ctr.cy, x - ctr.cx)) - 1 AS k FROM ext, ctr),"
        " edges AS (SELECT a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by2"
        "   FROM poly a JOIN poly b"
        "   ON b.k = (a.k + 1) % (SELECT COUNT(*) FROM poly)),"
        " cand AS (SELECT p.x, p.y FROM pts p WHERE EXISTS ("
        "   SELECT 1 FROM edges e WHERE"
        "   (e.bx - e.ax)*(p.y - e.ay) - (e.by2 - e.ay)*(p.x - e.ax) <= 0))"
        " SELECT c.x, c.y FROM cand c WHERE EXISTS ("
        "   SELECT 1 FROM cand q WHERE (q.x <> c.x OR q.y <> c.y)"
        "   AND NOT EXISTS ("
        "     SELECT 1 FROM cand r"
        "     WHERE (r.x <> c.x OR r.y <> c.y) AND (r.x <> q.x OR r.y <> q.y)"
        f"    AND NOT ({cr} < 0.0"
        f"             OR ({cr} = 0.0 AND {dt} > 0.0 AND {dt} < {dd}))))"
    )


def _dbscan_oracle_sql() -> str:
    """Mirror of _q_dbscan_clusters (stages/ann.py::grid_dbscan) in
    pure SQL: eps-cell bucketing with the identical FLOOR(x * (1/eps))
    arithmetic, dense cells (count >= max(8, n//2000)), 8-connected
    components as a recursive-CTE transitive closure over the DENSE
    cell table (bounded by cells, never points), component labels
    numbered by the component's minimum (cy, cx) cell exactly like the
    engine's lexsort first-seen numbering, and border cells joining a
    cluster only when adjacent to exactly one.  Verified bit-equal to
    the engine at sf0.001/0.01/0.1."""
    return (
        "WITH RECURSIVE base AS ("
        "  SELECT CAST(event_id % 4 AS DOUBLE) AS blob,"
        "         ((event_id // 4) % 2) = 0 AS in_blob,"
        "         CAST((event_id * 2654435761) % 997 AS DOUBLE) / 997.0 AS jx,"
        "         CAST((event_id * 40503) % 991 AS DOUBLE) / 991.0 AS jy"
        "  FROM events),"
        " p AS (SELECT"
        "   CASE WHEN in_blob THEN blob * 10.0 + jx * 0.5 ELSE jx * 40.0 END AS x,"
        "   CASE WHEN in_blob THEN blob * 5.0 + jy * 0.5 ELSE jy * 20.0 END AS y"
        "  FROM base),"
        " pc AS (SELECT x, y,"
        "   CAST(FLOOR(x * (1.0 / 0.6)) AS BIGINT) AS cx,"
        "   CAST(FLOOR(y * (1.0 / 0.6)) AS BIGINT) AS cy FROM p),"
        " mc AS (SELECT GREATEST(8, COUNT(*) // 2000) AS min_count FROM pc),"
        " cells AS (SELECT cx, cy, COUNT(*) AS n FROM pc GROUP BY 1, 2),"
        " dense AS (SELECT c.cx, c.cy FROM cells c, mc WHERE c.n >= mc.min_count),"
        " reach(cx, cy, rx, ry) AS ("
        "   SELECT cx, cy, cx, cy FROM dense"
        "   UNION"
        "   SELECT r.cx, r.cy, d.cx, d.cy FROM reach r JOIN dense d"
        "     ON ABS(d.cx - r.rx) <= 1 AND ABS(d.cy - r.ry) <= 1),"
        " roots AS (SELECT cx, cy, MIN(ry * 100000 + rx) AS rootkey"
        "           FROM reach GROUP BY 1, 2),"
        " dlab AS (SELECT cx, cy,"
        "   DENSE_RANK() OVER (ORDER BY rootkey) - 1 AS label FROM roots),"
        " blab AS ("
        "   SELECT c.cx, c.cy, CASE WHEN COUNT(DISTINCT d.label) = 1"
        "     THEN MIN(d.label) ELSE -1 END AS label"
        "   FROM (SELECT cells.cx, cells.cy FROM cells, mc"
        "         WHERE cells.n < mc.min_count) c"
        "   LEFT JOIN dlab d ON d.cx BETWEEN c.cx - 1 AND c.cx + 1"
        "     AND d.cy BETWEEN c.cy - 1 AND c.cy + 1"
        "   GROUP BY 1, 2),"
        " lab AS (SELECT * FROM dlab UNION ALL SELECT * FROM blab),"
        " pl AS (SELECT pc.x, pc.y, l.label FROM pc"
        "   JOIN lab l ON l.cx = pc.cx AND l.cy = pc.cy)"
        " SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,"
        "   ROUND(MIN(x), 6) AS x_min, ROUND(MAX(x), 6) AS x_max,"
        "   ROUND(MIN(y), 6) AS y_min, ROUND(MAX(y), 6) AS y_max"
        " FROM pl GROUP BY 1"
    )


def _det4_sql(m: list[list[str]]) -> str:
    """4x4 determinant of SQL expressions by permutation expansion
    (24 signed product terms) -- mirrors _det4 exactly."""
    from itertools import permutations

    terms = []
    for perm in permutations(range(4)):
        sign = 1
        for i in range(4):
            for j in range(i + 1, 4):
                if perm[i] > perm[j]:
                    sign = -sign
        prod = " * ".join(f"({m[i][perm[i]]})" for i in range(4))
        terms.append(("+ " if sign > 0 else "- ") + prod)
    return "(0 " + " ".join(terms) + ")"


def _kriging_oracle_sql() -> str:
    """Mirror of _q_kriging_probes: 3-nearest pivot per probe, linear
    Manhattan variogram, generated Cramer 4x4 determinant strings."""
    probes = ", ".join(
        f"({p}, {px}, {py})" for p, (px, py) in enumerate(_KRIG_PROBES)
    )
    A = [
        ["0", "g12", "g13", "1"],
        ["g12", "0", "g23", "1"],
        ["g13", "g23", "0", "1"],
        ["1", "1", "1", "0"],
    ]
    b = ["gp1", "gp2", "gp3", "1"]
    den = _det4_sql(A)
    nums = []
    for i in range(3):
        Ai = [row[:] for row in A]
        for r in range(4):
            Ai[r][i] = b[r]
        nums.append(f"z{i + 1} * {_det4_sql(Ai)}")
    num = "(" + " + ".join(nums) + ")"
    piv = ", ".join(
        f"MAX(CASE WHEN rn = {r} THEN {c} END) AS {c}{r}"
        for r in (1, 2, 3)
        for c in ("x", "y", "z")
    )
    return (
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "top8 AS (SELECT cell, n FROM cc ORDER BY n DESC, cell LIMIT 8), "
        "nd AS (SELECT cell, n AS z, cell % 96 AS x, cell // 96 AS y "
        "FROM top8), "
        f"pr AS (SELECT * FROM (VALUES {probes}) AS v(p, px, py)), "
        "rk AS (SELECT pr.p, pr.px, pr.py, nd.x, nd.y, nd.z, "
        "ROW_NUMBER() OVER (PARTITION BY pr.p "
        "ORDER BY ABS(nd.x - pr.px) + ABS(nd.y - pr.py), nd.cell) "
        "AS rn FROM pr, nd), "
        "nb AS (SELECT p, MIN(px) AS px, MIN(py) AS py, "
        + piv
        + " FROM rk WHERE rn <= 3 GROUP BY p), "
        "g AS (SELECT p, px, py, z1, z2, z3, "
        "ABS(x1 - x2) + ABS(y1 - y2) AS g12, "
        "ABS(x1 - x3) + ABS(y1 - y3) AS g13, "
        "ABS(x2 - x3) + ABS(y2 - y3) AS g23, "
        "ABS(x1 - px) + ABS(y1 - py) AS gp1, "
        "ABS(x2 - px) + ABS(y2 - py) AS gp2, "
        "ABS(x3 - px) + ABS(y3 - py) AS gp3 FROM nb), "
        f"d AS (SELECT p, px, py, CAST({num} AS BIGINT) AS est_num, "
        f"CAST({den} AS BIGINT) AS est_den FROM g) "
        "SELECT CAST(p AS BIGINT) AS probe, CAST(px AS BIGINT) AS px, "
        "CAST(py AS BIGINT) AS py, est_num, est_den, "
        "ROUND(CAST(est_num AS DOUBLE) / CAST(est_den AS DOUBLE), 6) "
        "AS estimate FROM d ORDER BY 1"
    )


def _detn_sql(m: list[list[str]]) -> str:
    """nxn determinant of SQL expressions by permutation expansion --
    mirrors _detn exactly (120 signed terms for n=5)."""
    from itertools import permutations

    n = len(m)
    terms = []
    for perm in permutations(range(n)):
        sign = 1
        for i in range(n):
            for j in range(i + 1, n):
                if perm[i] > perm[j]:
                    sign = -sign
        prod = " * ".join(f"({m[i][perm[i]]})" for i in range(n))
        terms.append(("+ " if sign > 0 else "- ") + prod)
    return "(0 " + " ".join(terms) + ")"


def _colley_oracle_sql() -> str:
    """Mirror of _q_colley_rating: pairwise daily-count preference
    counts, the 5x5 Colley matrix pivoted into one row, generated
    Cramer determinant strings."""
    k = len(_MARKOV_STATES)
    tvals = ", ".join(
        f"('{t}', {i})" for i, t in enumerate(_MARKOV_STATES)
    )
    cpiv = ", ".join(
        f"MAX(CASE WHEN i = {i} AND j = {j} THEN v END) AS c{i}{j}"
        for i in range(k)
        for j in range(k)
    )
    bpiv = ", ".join(
        f"MAX(CASE WHEN i = {i} THEN b END) AS b{i}" for i in range(k)
    )
    C = [[f"c{i}{j}" for j in range(k)] for i in range(k)]
    dc = _detn_sql(C)
    numsel = []
    for i in range(k):
        Ci = [row[:] for row in C]
        for r in range(k):
            Ci[r][i] = f"b{r}"
        numsel.append(f"CAST({_detn_sql(Ci)} AS BIGINT) AS n{i}")
    finals = " UNION ALL ".join(
        f"SELECT '{t}' AS event_type, "
        f"(SELECT w FROM wl WHERE i = {i}) AS wins, "
        f"(SELECT l FROM ll WHERE i = {i}) AS losses, "
        f"det.n{i} AS r_num, 2 * det.dc AS r_den, "
        f"ROUND(CAST(det.n{i} AS DOUBLE) "
        "/ CAST(2 * det.dc AS DOUBLE), 6) AS rating FROM det"
        for i, t in enumerate(_MARKOV_STATES)
    )
    return (
        "WITH c0 AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "event_type AS t, CAST(COUNT(*) AS BIGINT) AS c FROM events "
        "GROUP BY 1, 2), "
        "dd AS (SELECT DISTINCT d FROM c0), "
        f"tn AS (SELECT * FROM (VALUES {tvals}) AS v(t, idx)), "
        "dn AS (SELECT dd.d, tn.t, tn.idx, COALESCE(c0.c, 0) AS c "
        "FROM dd CROSS JOIN tn LEFT JOIN c0 ON c0.d = dd.d "
        "AND c0.t = tn.t), "
        "pidx AS (SELECT a.idx AS i, b.idx AS j, "
        "CAST(SUM(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n FROM dn a JOIN dn b ON b.d = a.d AND a.idx <> b.idx "
        "GROUP BY 1, 2), "
        "gm AS (SELECT a.i, a.j, a.n + b.n AS g FROM pidx a "
        "JOIN pidx b ON b.i = a.j AND b.j = a.i), "
        "tt2 AS (SELECT i, CAST(SUM(g) AS BIGINT) AS t FROM gm "
        "GROUP BY 1), "
        "wl AS (SELECT i, CAST(SUM(n) AS BIGINT) AS w FROM pidx "
        "GROUP BY 1), "
        "ll AS (SELECT j AS i, CAST(SUM(n) AS BIGINT) AS l FROM pidx "
        "GROUP BY 1), "
        "ce AS (SELECT gm.i, gm.j, -gm.g AS v FROM gm "
        "UNION ALL SELECT tt2.i, tt2.i, 2 + tt2.t FROM tt2), "
        "bb AS (SELECT wl.i, 2 + wl.w - ll.l AS b FROM wl "
        "JOIN ll ON ll.i = wl.i), "
        f"cm AS (SELECT {cpiv} FROM ce), "
        f"bv AS (SELECT {bpiv} FROM bb), "
        f"det AS (SELECT CAST({dc} AS BIGINT) AS dc, "
        + ", ".join(numsel)
        + " FROM cm, bv) "
        + finals
        + " ORDER BY 1"
    )


def _hits_oracle_sql() -> str:
    """Mirror of _q_hits_scores: 12 unrolled HITS rounds, each a
    weighted matvec + truncating 1e6-tick renorm (all-positive, so no
    sign split is needed), generated as materialized CTE chains."""
    steps = []
    for i in range(1, _HITS_ITERS + 1):
        prev = f"a{i - 1}"
        steps.append(
            f"h{i} AS MATERIALIZED (SELECT cnt.u, "
            f"CAST(SUM(cnt.c * {prev}.a) AS HUGEINT) AS h "
            f"FROM cnt JOIN {prev} ON {prev}.t = cnt.t GROUP BY 1), "
            f"hm{i} AS (SELECT MAX(h) AS m FROM h{i}), "
            f"hn{i} AS MATERIALIZED (SELECT u, "
            f"(h * {_HITS_SCALE}) // m AS h FROM h{i}, hm{i}), "
            f"aa{i} AS MATERIALIZED (SELECT cnt.t, "
            f"CAST(SUM(cnt.c * hn{i}.h) AS HUGEINT) AS a "
            f"FROM cnt JOIN hn{i} ON hn{i}.u = cnt.u GROUP BY 1), "
            f"am{i} AS (SELECT MAX(a) AS m FROM aa{i}), "
            f"a{i} AS MATERIALIZED (SELECT t, "
            f"(a * {_HITS_SCALE}) // m AS a FROM aa{i}, am{i})"
        )
    last = f"a{_HITS_ITERS}"
    return (
        "WITH cnt AS MATERIALIZED (SELECT user_id AS u, "
        "event_type AS t, CAST(COUNT(*) AS HUGEINT) AS c FROM events "
        "GROUP BY 1, 2), "
        "a0 AS (SELECT DISTINCT event_type AS t, "
        f"CAST({_HITS_SCALE} AS HUGEINT) AS a FROM events), "
        + ", ".join(steps)
        + f" SELECT t AS event_type, CAST(a AS BIGINT) AS auth_q, "
        "CAST(ROW_NUMBER() OVER (ORDER BY a DESC, t) AS BIGINT) "
        f"AS auth_rank FROM {last} ORDER BY event_type"
    )


def _mst_oracle_sql() -> str:
    """Mirror of _q_mst_cells: 9 unrolled Prim steps, each an
    ORDER-BY-(d,i,j)-LIMIT-1 crossing-edge pick plus a visited-bitmask
    update, over integer Manhattan distances on the top-10 cells."""
    steps = []
    for s in range(1, 10):
        prev = f"st{s - 1}"
        steps.append(
            f"pk{s} AS MATERIALIZED (SELECT d.d, d.i, d.j "
            f"FROM dist d, {prev} "
            f"WHERE (({prev}.mask >> d.i) & 1) = 1 "
            f"AND (({prev}.mask >> d.j) & 1) = 0 "
            "ORDER BY d.d, d.i, d.j LIMIT 1), "
            f"st{s} AS (SELECT {prev}.mask | (1 << pk{s}.j) AS mask "
            f"FROM {prev}, pk{s})"
        )
    sel = " UNION ALL ".join(
        f"SELECT {s} AS step, pk{s}.i, pk{s}.j, pk{s}.d FROM pk{s}"
        for s in range(1, 10)
    )
    return (
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "top10 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 10), "
        "nd AS MATERIALIZED (SELECT cell, "
        "CAST(ROW_NUMBER() OVER (ORDER BY cell) - 1 AS BIGINT) AS j, "
        "cell % 96 AS x, cell // 96 AS y FROM top10), "
        "dist AS MATERIALIZED (SELECT a.j AS i, b.j AS j, "
        "CAST(ABS(a.x - b.x) + ABS(a.y - b.y) AS BIGINT) AS d "
        "FROM nd a, nd b WHERE a.j <> b.j), "
        "st0 AS (SELECT CAST(1 AS BIGINT) AS mask), "
        + ", ".join(steps)
        + f", edges AS ({sel}) "
        "SELECT CAST(edges.step AS BIGINT) AS step, "
        "na.cell AS a_cell, nb.cell AS b_cell, edges.d FROM edges "
        "JOIN nd na ON na.j = edges.i JOIN nd nb ON nb.j = edges.j "
        "ORDER BY 1"
    )


def _assignment_oracle_sql() -> str:
    """Mirror of _q_assignment_min_cost: the per-facility subset-DP
    levels unrolled as generated grouped-min CTEs over demand masks."""
    probes = ", ".join(
        f"({j}, {px}, {py})" for j, (px, py) in enumerate(_ASSIGN_PROBES)
    )
    steps = []
    for i in range(6):
        prev = f"d{i}"
        steps.append(
            f"d{i + 1} AS MATERIALIZED (SELECT "
            f"p.mask | (1 << cst.j) AS mask, "
            f"MIN(p.cost + cst.c) AS cost FROM {prev} p "
            f"JOIN cst ON cst.i = {i} "
            "AND ((p.mask >> cst.j) & 1) = 0 GROUP BY 1)"
        )
    return (
        "WITH cc AS (SELECT event_id % 96 + (event_id // 96 % 96) * 96 "
        "AS cell, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "top6 AS (SELECT cell FROM cc ORDER BY n DESC, cell LIMIT 6), "
        "nd AS (SELECT cell, "
        "CAST(ROW_NUMBER() OVER (ORDER BY cell) - 1 AS BIGINT) AS i, "
        "cell % 96 AS x, cell // 96 AS y FROM top6), "
        f"pb AS (SELECT * FROM (VALUES {probes}) AS v(j, px, py)), "
        "cst AS MATERIALIZED (SELECT nd.i, pb.j, "
        "CAST(ABS(nd.x - pb.px) + ABS(nd.y - pb.py) AS BIGINT) AS c "
        "FROM nd, pb), "
        "d0 AS (SELECT 0 AS mask, CAST(0 AS BIGINT) AS cost), "
        + ", ".join(steps)
        + " SELECT CAST(6 AS BIGINT) AS n_facilities, "
        "(SELECT cost FROM d6 WHERE mask = 63) AS min_cost"
    )
