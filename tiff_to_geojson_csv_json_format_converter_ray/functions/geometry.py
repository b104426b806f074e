"""Vector-geometry kernels: bbox, point-in-polygon, STRtree, buffer, union.

From-scratch NumPy replacements for the reference's shapely /
rasterio.mask / turf usage:

- bbox construction + rectangle-overlap semi-join
  (test2.py:96-105, completePixleOutput.py:422-427, slope.js:389-392)
- polygon mask / clip = bbox crop + point-in-polygon test
  (rasterio.mask.mask at test2.py:1272, get_raster_stats_clean.py:148)
- geometry buffer(0.001) (test2.py:275-278)
- multi-feature union (slope.js:404-427) -- kept as a *bag* of rings,
  which is exactly what even-odd PIP over all rings computes
- GeoJSON parsing of the 4 accepted shapes (test2.py:250-272)

PIP uses even-odd ray casting, vectorized over points per ring; holes
and MultiPolygon parts fall out of the even-odd rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


# ---------------------------------------------------------------- polygons
@dataclass
class Polygon:
    """One polygon: shell + holes (even-odd), with precomputed bbox."""

    polygon_id: str
    rings: list[np.ndarray]  # each (n, 2) float64 [lon, lat], closed or open
    bbox: tuple[float, float, float, float] = field(default=None)  # type: ignore[assignment]

    def __post_init__(self) -> None:
        self.rings = [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in self.rings]
        if self.bbox is None:
            shell = np.vstack(self.rings)
            self.bbox = (
                float(shell[:, 0].min()),
                float(shell[:, 1].min()),
                float(shell[:, 0].max()),
                float(shell[:, 1].max()),
            )

    def contains(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Vectorized even-odd PIP over all rings; bbox pre-filter included."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        minx, miny, maxx, maxy = self.bbox
        cand = (lon >= minx) & (lon <= maxx) & (lat >= miny) & (lat <= maxy)
        out = np.zeros(lon.shape, dtype=bool)
        if not cand.any():
            return out
        cl, ca = lon[cand], lat[cand]
        inside = np.zeros(cl.shape, dtype=bool)
        for ring in self.rings:
            x, y = ring[:, 0], ring[:, 1]
            x2, y2 = np.roll(x, -1), np.roll(y, -1)
            for j in range(len(x)):
                x1j, y1j, x2j, y2j = x[j], y[j], x2[j], y2[j]
                if y1j == y2j:
                    continue
                crosses = ((y1j > ca) != (y2j > ca)) & (
                    cl < (x2j - x1j) * (ca - y1j) / (y2j - y1j) + x1j
                )
                inside ^= crosses
        out[cand] = inside
        return out


def parse_geojson(geom: dict | list | str) -> list[Polygon]:
    """Accept the reference's 4 geometry shapes (test2.py:250-272):
    FeatureCollection (first feature), Feature, bare geometry, and the
    nonstandard Canvas ``[geometry, bounds]`` list."""
    import json

    if isinstance(geom, str):
        geom = json.loads(geom)
    if isinstance(geom, list):  # Canvas format [geometry, bounds]
        geom = geom[0]
    if geom.get("type") == "FeatureCollection":
        geom = geom["features"][0]["geometry"]
    elif geom.get("type") == "Feature":
        geom = geom["geometry"]

    gtype = geom["type"]
    coords = geom["coordinates"]
    if gtype == "Polygon":
        return [Polygon("p0", [np.asarray(r) for r in coords])]
    if gtype == "MultiPolygon":
        return [
            Polygon(f"p{i}", [np.asarray(r) for r in part])
            for i, part in enumerate(coords)
        ]
    raise ValueError(f"unsupported geometry type: {gtype}")


def bbox_polygon(
    minx: float, miny: float, maxx: float, maxy: float, polygon_id: str = "bbox"
) -> Polygon:
    """Closed 5-point ring from a bbox (test2.py:96-105 semantics)."""
    ring = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
    )
    return Polygon(polygon_id, [ring], bbox=(minx, miny, maxx, maxy))


def buffer_polygon(poly: Polygon, dist: float) -> Polygon:
    """Approximate outward buffer: dilate each shell vertex along its
    angle-bisector normal by ``dist`` (documented approximation of
    shapely ``buffer`` at test2.py:275-278; adequate for the pruning /
    inclusive-clip role the reference uses it for)."""
    new_rings = []
    for k, ring in enumerate(poly.rings):
        pts = ring
        if np.all(pts[0] == pts[-1]):
            pts = pts[:-1]
        prev = np.roll(pts, 1, axis=0)
        nxt = np.roll(pts, -1, axis=0)
        e1 = pts - prev
        e2 = nxt - pts
        n1 = np.stack([e1[:, 1], -e1[:, 0]], axis=1)
        n2 = np.stack([e2[:, 1], -e2[:, 0]], axis=1)
        for n in (n1, n2):
            norm = np.linalg.norm(n, axis=1, keepdims=True)
            norm[norm == 0] = 1.0
            n /= norm
        bis = n1 + n2
        norm = np.linalg.norm(bis, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        bis /= norm
        # Right-hand edge normal (e.y, -e.x) points outward on CCW rings.
        # Shell (ring 0) grows outward; holes shrink (offset inward).
        sign = -1.0 if _ring_is_cw(pts) else 1.0
        if k > 0:
            sign = -sign
        moved = pts + sign * dist * bis
        new_rings.append(np.vstack([moved, moved[:1]]))
    return Polygon(poly.polygon_id, new_rings)


def _ring_is_cw(pts: np.ndarray) -> bool:
    x, y = pts[:, 0], pts[:, 1]
    return float(np.sum((np.roll(x, -1) - x) * (np.roll(y, -1) + y))) > 0.0


def union_bag(polys: list[Polygon], polygon_id: str = "union") -> Polygon:
    """Union as an even-odd ring bag: a point is inside the union iff it
    is inside any part (exact for non-overlapping parts -- the slope.js
    reduce-union use case of adjacent admin features)."""
    rings: list[np.ndarray] = []
    for p in polys:
        rings.extend(p.rings)
    boxes = np.array([p.bbox for p in polys])
    bbox = (
        float(boxes[:, 0].min()),
        float(boxes[:, 1].min()),
        float(boxes[:, 2].max()),
        float(boxes[:, 3].max()),
    )
    return Polygon(polygon_id, rings, bbox=bbox)


def signed_ring_area(ring: np.ndarray) -> float:
    """Shoelace signed area of one ring (positive = CCW); the closing
    vertex may be present or absent."""
    pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def polygon_area(poly: Polygon) -> float:
    """Planar area in squared degrees: |shell| minus the hole rings
    (ring 0 is the shell, as in parse_geojson / GeoJSON order)."""
    areas = [abs(signed_ring_area(r)) for r in poly.rings]
    return areas[0] - sum(areas[1:]) if areas else 0.0


def ring_centroid_quantized(
    ring, scale: float = 1e6
) -> tuple[int, int, int]:
    """Shoelace centroid accumulators of one ring, QUANTIZED: each
    per-edge term (an IEEE double, identical in any engine evaluating
    the same literals) is rounded half-away to ``scale`` ticks and
    summed in int64, so the totals are order-independent and an SQL
    oracle summing the same integers matches bit-for-bit.

    Returns (A2, CX6, CY6) scaled by ``scale``:
      area     = A2  / (2 * scale)
      centroid = (CX6 / (3 * A2), CY6 / (3 * A2))
    """
    pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    x1, y1 = pts[:, 0], pts[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    cross = x1 * y2 - x2 * y1
    cx = (x1 + x2) * cross
    cy = (y1 + y2) * cross

    def q(t: np.ndarray) -> np.ndarray:
        return np.where(
            t < 0, -np.floor(-t * scale + 0.5), np.floor(t * scale + 0.5)
        ).astype(np.int64)

    return int(q(cross).sum()), int(q(cx).sum()), int(q(cy).sum())


def clip_polygon_convex(
    subject: Polygon, clip: Polygon, polygon_id: str | None = None
) -> Polygon | None:
    """Sutherland-Hodgman clip of ``subject`` against a CONVEX clip
    polygon -- the engine-side form of the reference's Leaflet viewport
    clipping (clip.js).  Every subject ring (shell and holes) is
    clipped independently; a ring fully outside drops out; returns
    None when nothing remains.  The clip polygon must be convex and is
    taken from its shell ring only."""
    cpts = np.asarray(clip.rings[0], dtype=np.float64).reshape(-1, 2)
    if np.array_equal(cpts[0], cpts[-1]):
        cpts = cpts[:-1]
    if _ring_is_cw(cpts):
        cpts = cpts[::-1]  # normalize CCW so "inside" = left of edge

    def clip_ring(ring: np.ndarray) -> np.ndarray | None:
        pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        if len(pts) and np.array_equal(pts[0], pts[-1]):
            pts = pts[:-1]
        for e in range(len(cpts)):
            ax, ay = cpts[e]
            bx, by = cpts[(e + 1) % len(cpts)]
            ex, ey = bx - ax, by - ay
            out: list[tuple[float, float]] = []
            n = len(pts)
            if n == 0:
                return None
            for i in range(n):
                cx, cy = pts[i]
                px, py = pts[i - 1]
                cur_in = ex * (cy - ay) - ey * (cx - ax) >= 0.0
                prev_in = ex * (py - ay) - ey * (px - ax) >= 0.0
                if cur_in != prev_in:
                    # segment crosses the edge line: parametric intersect.
                    # denom == 0 means the segment is (numerically)
                    # parallel to / on the edge line and the "crossing"
                    # is a rounding artifact -- the endpoint itself is
                    # the intersection, and it is appended below when
                    # inside; emitting 0/0 here would inject NaN points.
                    denom = ex * (cy - py) - ey * (cx - px)
                    if denom != 0.0:
                        t = (ex * (ay - py) - ey * (ax - px)) / denom
                        out.append((px + t * (cx - px), py + t * (cy - py)))
                if cur_in:
                    out.append((cx, cy))
            pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
        return pts if len(pts) >= 3 else None

    rings = [r for r in (clip_ring(r) for r in subject.rings) if r is not None]
    if not rings:
        return None
    return Polygon(
        polygon_id or f"{subject.polygon_id}_clip", rings
    )


def bbox_intersects(
    boxes: np.ndarray, minx: float, miny: float, maxx: float, maxy: float
) -> np.ndarray:
    """Vectorized rectangle-overlap test; ``boxes`` is (n, 4) minx,miny,maxx,maxy.

    Same predicate as the catalog lookup (completePixleOutput.py:422-427)
    and the file semi-join (test2.py:95-107)."""
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    return ~(
        (boxes[:, 2] < minx)
        | (boxes[:, 0] > maxx)
        | (boxes[:, 3] < miny)
        | (boxes[:, 1] > maxy)
    )


# ---------------------------------------------------------------- STRtree
class STRtree:
    """Packed Sort-Tile-Recursive R-tree over bboxes (pure NumPy).

    Built once per actor (SURVEY ST5); queries return candidate indexes
    for a query point or bbox.  For the small polygon side tables the
    reference uses, this is mostly a bbox grid -- but it stays O(log n)
    for large catalogs (manifest pruning at 100 TB scale).
    """

    def __init__(self, boxes: np.ndarray, leaf_size: int = 8):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.boxes = boxes
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.leaf_starts = np.empty(0, dtype=np.int64)
            self.leaf_boxes = np.empty((0, 4))
            return
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
        # STR packing: sort by cx, slice into vertical strips, sort each by cy.
        n_leaves = int(np.ceil(self.n / leaf_size))
        n_strips = int(np.ceil(np.sqrt(n_leaves)))
        strip_cap = n_strips * leaf_size
        by_x = np.argsort(cx, kind="stable")
        order_parts = []
        for s in range(0, self.n, strip_cap):
            strip = by_x[s : s + strip_cap]
            order_parts.append(strip[np.argsort(cy[strip], kind="stable")])
        self.order = np.concatenate(order_parts)
        self.leaf_starts = np.arange(0, self.n, leaf_size, dtype=np.int64)
        lb = []
        for st in self.leaf_starts:
            idx = self.order[st : st + leaf_size]
            b = boxes[idx]
            lb.append([b[:, 0].min(), b[:, 1].min(), b[:, 2].max(), b[:, 3].max()])
        self.leaf_boxes = np.asarray(lb)
        self.leaf_size = leaf_size

    def query(
        self, minx: float, miny: float, maxx: float, maxy: float
    ) -> np.ndarray:
        """Indexes of stored boxes intersecting the query bbox."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        hit_leaves = np.nonzero(
            bbox_intersects(self.leaf_boxes, minx, miny, maxx, maxy)
        )[0]
        if len(hit_leaves) == 0:
            return np.empty(0, dtype=np.int64)
        cand_idx = np.concatenate(
            [
                self.order[self.leaf_starts[h] : self.leaf_starts[h] + self.leaf_size]
                for h in hit_leaves
            ]
        )
        mask = bbox_intersects(self.boxes[cand_idx], minx, miny, maxx, maxy)
        return cand_idx[mask]

    def query_points(self, lon: np.ndarray, lat: np.ndarray) -> list[np.ndarray]:
        """Per-stored-box boolean masks of points falling in each box --
        vectorized over points (boxes are the small side)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        out = []
        for b in self.boxes:
            out.append(
                (lon >= b[0]) & (lon <= b[2]) & (lat >= b[1]) & (lat <= b[3])
            )
        return out


def simplify_dp(x: np.ndarray, y: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification: boolean keep-mask over
    the input vertices.  Iterative stack (no recursion-depth limit on
    long GPS tracks); the perpendicular-distance scan inside each
    segment is a vectorized numpy kernel.  Endpoints always kept.
    Degenerate anchor==far segments fall back to point distance."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        xs = x[a + 1:b]
        ys = y[a + 1:b]
        dx = x[b] - x[a]
        dy = y[b] - y[a]
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d = np.hypot(xs - x[a], ys - y[a])
        else:
            # |cross| / |seg| -- distance to the infinite line; DP uses
            # the line through the anchors, the standard formulation
            d = np.abs((xs - x[a]) * dy - (ys - y[a]) * dx) / np.sqrt(seg2)
        i = int(np.argmax(d))
        if d[i] > tol:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def _monotone_chain(pts: "np.ndarray") -> "np.ndarray":
    """Exact convex hull of deduplicated points (n x 2 float64) --
    Andrew's monotone chain, CCW, no repeated first vertex.  Intended
    for PRUNED candidate sets (see convex_hull_candidates); the stack
    loop is O(k) on survivors, not on raw rows."""
    pts = np.unique(pts, axis=0)  # lexsort by (x, y) + dedup
    if len(pts) <= 2:
        return pts

    def half(p):
        stack = []
        for q in p:
            while len(stack) >= 2:
                ox, oy = stack[-2]
                ax, ay = stack[-1]
                if (ax - ox) * (q[1] - oy) - (ay - oy) * (q[0] - ox) <= 0:
                    stack.pop()
                else:
                    break
            stack.append((q[0], q[1]))
        return stack

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)


def convex_hull_candidates(x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":
    """Akl-Toussaint prune + local hull: discard points strictly
    inside the octagon of the 8 directional extremes (one vectorized
    pass), then run the exact monotone chain on the survivors.  The
    returned local hull is a superset-free set of candidate vertices:
    merging per-block hulls and hulling again yields the exact global
    hull (hull(union) = hull(union of hulls))."""
    pts = np.column_stack([x, y]).astype(np.float64)
    if len(pts) <= 8:
        return _monotone_chain(pts)
    s = x + y
    d = x - y
    anchor_idx = np.unique(
        [x.argmin(), x.argmax(), y.argmin(), y.argmax(),
         s.argmin(), s.argmax(), d.argmin(), d.argmax()]
    )
    anchors = _monotone_chain(pts[anchor_idx])
    if len(anchors) >= 3:
        # inside-test against every octagon edge, vectorized
        ax, ay = anchors[:, 0], anchors[:, 1]
        bx, by = np.roll(ax, -1), np.roll(ay, -1)
        inside = np.ones(len(pts), dtype=bool)
        for i in range(len(anchors)):
            cross = (bx[i] - ax[i]) * (y - ay[i]) - (by[i] - ay[i]) * (x - ax[i])
            inside &= cross > 0
        pts = pts[~inside]
    return _monotone_chain(pts)


def stay_points(
    x: "np.ndarray",
    y: "np.ndarray",
    t: "np.ndarray",
    eps: float,
    min_duration: float,
) -> list[tuple[float, float, float, float, int]]:
    """Stay-point detection over ONE ordered track (Li et al. 2008
    semantics): starting at anchor i, extend j while dist(anchor,
    fix_j) <= eps; if the dwell time t[j_last] - t[i] >= min_duration,
    emit the centroid of fixes i..j_last with its arrival/departure
    times, then restart AFTER the stay.  Planar distance; inputs must
    already be time-ordered.  Returns (cx, cy, t_arrive, t_leave,
    n_fixes) tuples.  O(n) per track -- intended as the per-group
    kernel behind a groupby(user) shuffle."""
    out = []
    n = len(x)
    eps2 = eps * eps
    i = 0
    while i < n:
        j = i + 1
        while j < n:
            # squared-distance compare: no sqrt/hypot, so a SQL mirror
            # ((dx*dx + dy*dy) > eps*eps) reproduces the branch
            # bit-exactly (hypot vs SQRT differ in the last ulp at
            # lattice-aligned distances exactly on the eps boundary)
            dx = x[j] - x[i]
            dy = y[j] - y[i]
            if dx * dx + dy * dy > eps2:
                break
            j += 1
        if t[j - 1] - t[i] >= min_duration and j - 1 > i:
            seg_x = x[i:j]
            seg_y = y[i:j]
            out.append(
                (
                    float(seg_x.mean()),
                    float(seg_y.mean()),
                    float(t[i]),
                    float(t[j - 1]),
                    int(j - i),
                )
            )
            i = j
        else:
            i += 1
    return out


def boundary_distance(
    lon: "np.ndarray", lat: "np.ndarray", ring: "np.ndarray"
) -> "np.ndarray":
    """Planar distance from points to a polygon RING (closed walk of
    its vertices): min over edges of the point-to-segment distance,
    computed in the exact float-op order of the SQL mirror --
    ``t = clamp(((p-a).d) / (d.d), 0, 1)``, then the squared offset
    from ``a + t*d``, one sqrt at the end.  Vectorized over points."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    best = np.full(lon.shape, np.inf)
    n = len(ring)
    for e in range(n):
        ax, ay = float(ring[e][0]), float(ring[e][1])
        bx, by = float(ring[(e + 1) % n][0]), float(ring[(e + 1) % n][1])
        dx, dy = bx - ax, by - ay
        denom = dx * dx + dy * dy
        t = ((lon - ax) * dx + (lat - ay) * dy) / denom
        t = np.minimum(np.maximum(t, 0.0), 1.0)
        ox = lon - (ax + t * dx)
        oy = lat - (ay + t * dy)
        best = np.minimum(best, ox * ox + oy * oy)
    return np.sqrt(best)
