"""Unary geometry operators — measures, extraction, shaping.

Pure-numpy kernels mirroring the reference's JTS-wrapper semantics
(cse-bristol/clj-geometry src/geometry/core.clj §2.C/2.D of SURVEY.md);
implementations are original.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from .core import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    _ring_area2,
    collection,
    empty,
    line_string,
    multi_polygon,
    normalize,
    point,
    polygon,
)

# ---------------------------------------------------------------------------
# measures (reference: core.clj:273-275 length/area; 289-295 centroid)
# ---------------------------------------------------------------------------


def length(g: Geometry) -> float:
    """Sum of segment lengths over all linework (rings included)."""
    total = 0.0
    for c in _linework(g):
        if len(c) >= 2:
            d = np.diff(c, axis=0)
            total += float(np.sqrt((d * d).sum(axis=1)).sum())
    return total


def _linework(g: Geometry) -> List[np.ndarray]:
    t = g.gtype
    if t == LINESTRING:
        return [g.parts]
    if t == POLYGON:
        return list(g.parts)
    if t == MULTILINESTRING:
        return list(g.parts)
    if t == MULTIPOLYGON:
        return [r for poly in g.parts for r in poly]
    if t == GEOMETRYCOLLECTION:
        return [c for child in g.parts for c in _linework(child)]
    return []


def area(g: Geometry) -> float:
    """Shoelace area; holes subtract."""
    t = g.gtype
    if t == POLYGON:
        return _poly_area(g.parts)
    if t == MULTIPOLYGON:
        return sum(_poly_area(rings) for rings in g.parts)
    if t == GEOMETRYCOLLECTION:
        return sum(area(c) for c in g.parts)
    return 0.0


def _poly_area(rings) -> float:
    if not rings:
        return 0.0
    a = abs(_ring_area2(rings[0])) / 2.0
    for h in rings[1:]:
        a -= abs(_ring_area2(h)) / 2.0
    return a


def centroid(g: Geometry) -> Geometry:
    """Area-weighted centroid for polygonal, length-weighted for lineal,
    mean for puntal (JTS dimension-priority semantics, core.clj:289)."""
    if g.is_empty():
        return empty(POINT, g.srid)
    if g.gtype in (POLYGON, MULTIPOLYGON) or (
        g.gtype == GEOMETRYCOLLECTION and area(g) > 0
    ):
        cx, cy, a = _centroid_area(g)
        if a != 0:
            return point(cx, cy, g.srid)
    if g.gtype in (LINESTRING, MULTILINESTRING, POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION):
        tot = length(g)
        if tot > 0:
            sx = sy = 0.0
            for c in _linework(g):
                if len(c) < 2:
                    continue
                d = np.diff(c, axis=0)
                seg_len = np.sqrt((d * d).sum(axis=1))
                mid = (c[:-1] + c[1:]) / 2.0
                sx += float((mid[:, 0] * seg_len).sum())
                sy += float((mid[:, 1] * seg_len).sum())
            return point(sx / tot, sy / tot, g.srid)
    c = g.all_coords()
    return point(float(c[:, 0].mean()), float(c[:, 1].mean()), g.srid)


def _centroid_area(g: Geometry):
    """Signed-area-weighted centroid accumulation over all rings."""
    sx = sy = sa = 0.0
    polys = []
    if g.gtype == POLYGON:
        polys = [g.parts]
    elif g.gtype == MULTIPOLYGON:
        polys = g.parts
    elif g.gtype == GEOMETRYCOLLECTION:
        for c in g.parts:
            x, y, a = _centroid_area(c)
            sx, sy, sa = sx + x * a, sy + y * a, sa + a
        if sa != 0:
            return sx / sa, sy / sa, sa
        return 0.0, 0.0, 0.0
    for rings in polys:
        for i, r in enumerate(rings):
            if len(r) < 4:
                continue
            x, y = r[:-1, 0], r[:-1, 1]
            x2, y2 = r[1:, 0], r[1:, 1]
            cross = x * y2 - x2 * y
            a2 = cross.sum()
            if a2 == 0:
                continue
            cx = ((x + x2) * cross).sum() / (3.0 * a2)
            cy = ((y + y2) * cross).sum() / (3.0 * a2)
            a = abs(a2) / 2.0
            if i > 0:
                a = -a  # holes subtract
            sx += cx * a
            sy += cy * a
            sa += a
    if sa == 0:
        return 0.0, 0.0, 0.0
    return sx / sa, sy / sa, sa


def thinness_ratio(g: Geometry) -> float:
    """4πA/P² compactness (reference: core.clj:648-652)."""
    return 4.0 * math.pi * area(g) / (length(g) ** 2)


# ---------------------------------------------------------------------------
# envelope / bbox (core.clj:310-320, 698-707)
# ---------------------------------------------------------------------------

def envelope_polygon(g: Geometry) -> Geometry:
    env = g.envelope()
    if env is None:
        return empty(POLYGON, g.srid)
    xmin, ymin, xmax, ymax = env
    return normalize(
        polygon([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]])
    )


# ---------------------------------------------------------------------------
# part extraction (core.clj:338-397, 450-475)
# ---------------------------------------------------------------------------

def parts_of(g: Geometry, want: Optional[int] = None) -> List[Geometry]:
    """Flatten to single geometries, optionally filtering by type
    (reference geometries/single-geometries, core.clj:338-364)."""
    out: List[Geometry] = []
    _flatten(g, out)
    if want is not None:
        out = [p for p in out if p.gtype == want]
    return out


def _flatten(g: Geometry, out: List[Geometry]):
    t = g.gtype
    if t in (POINT, LINESTRING, POLYGON):
        out.append(g)
    elif t == MULTIPOINT:
        for xy in g.parts:
            out.append(point(xy[0], xy[1], g.srid))
    elif t == MULTILINESTRING:
        for l in g.parts:
            out.append(Geometry(LINESTRING, l, g.srid))
    elif t == MULTIPOLYGON:
        for rings in g.parts:
            out.append(Geometry(POLYGON, rings, g.srid))
    else:
        for c in g.parts:
            _flatten(c, out)


def polygons_of(g: Geometry) -> List[Geometry]:
    return parts_of(g, POLYGON)


def line_strings_of(g: Geometry) -> List[Geometry]:
    return parts_of(g, LINESTRING)


def points_of(g: Geometry) -> List[Geometry]:
    return parts_of(g, POINT)


def holes_of(g: Geometry) -> List[Geometry]:
    """Interior rings as polygons (core.clj:469-475)."""
    out = []
    for p in polygons_of(g):
        for h in p.parts[1:]:
            out.append(Geometry(POLYGON, [h], g.srid))
    return out


def exterior_ring_of(g: Geometry) -> Geometry:
    if g.gtype != POLYGON or not g.parts:
        raise ValueError("exterior_ring_of needs a polygon")
    return Geometry(LINESTRING, g.parts[0], g.srid, ring=True)


def fill_holes(g: Geometry) -> Geometry:
    if g.gtype == POLYGON:
        return Geometry(POLYGON, g.parts[:1], g.srid)
    if g.gtype == MULTIPOLYGON:
        return Geometry(MULTIPOLYGON, [rings[:1] for rings in g.parts], g.srid)
    return g


def boundary_of(g: Geometry) -> Geometry:
    """OGC boundary (core.clj:297-305): polygon→rings, line→endpoints."""
    t = g.gtype
    if t == POLYGON:
        rings = [Geometry(LINESTRING, r, g.srid, ring=True) for r in g.parts]
        if len(rings) == 1:
            return rings[0]
        return Geometry(MULTILINESTRING, [r.parts for r in rings], g.srid)
    if t == MULTIPOLYGON:
        lines = [r for rings in g.parts for r in rings]
        return Geometry(MULTILINESTRING, lines, g.srid)
    if t == LINESTRING:
        c = g.parts
        if len(c) == 0 or np.array_equal(c[0], c[-1]):
            return empty(MULTIPOINT, g.srid)
        return Geometry(MULTIPOINT, np.vstack([c[0], c[-1]]), g.srid)
    if t == MULTILINESTRING:
        pts = []
        for l in g.parts:
            if len(l) and not np.array_equal(l[0], l[-1]):
                pts.extend([l[0], l[-1]])
        if not pts:
            return empty(MULTIPOINT, g.srid)
        return Geometry(MULTIPOINT, np.vstack(pts), g.srid)
    return empty(GEOMETRYCOLLECTION, g.srid)


def endpoints_of(g: Geometry) -> List[Geometry]:
    """First/last coordinate of a linestring (core.clj:516-520)."""
    c = g.parts
    if len(c) == 0:
        return []
    return [point(c[0, 0], c[0, 1], g.srid), point(c[-1, 0], c[-1, 1], g.srid)]


def linearize(g: Geometry) -> List[Geometry]:
    """Any geometry → its linework as linestrings (core.clj:450-461)."""
    return [Geometry(LINESTRING, c, g.srid) for c in _linework(g) if len(c) >= 2]


# ---------------------------------------------------------------------------
# shaping: interpolate / smooth / densify / change-precision
# ---------------------------------------------------------------------------

def interpolate(c1, c2, pct: float):
    """Linear interpolation; pct 0/1 return the endpoints exactly
    (reference: core.clj:661-670)."""
    if pct == 0.0:
        return (float(c1[0]), float(c1[1]))
    if pct == 1.0:
        return (float(c2[0]), float(c2[1]))
    return (
        c1[0] + (c2[0] - c1[0]) * pct,
        c1[1] + (c2[1] - c1[1]) * pct,
    )


def smooth(g: Geometry, iterations: int) -> Geometry:
    """Chaikin 25/75 corner cutting, linestrings only, endpoints kept
    (reference: core.clj:672-694; goldens core_test.clj:186-202)."""
    if g.gtype != LINESTRING:
        raise ValueError("smooth requires a linestring")
    if g.is_empty():
        return g
    c = g.parts
    for _ in range(max(0, iterations)):
        if len(c) < 3:
            break
        a, b, d = c[:-2], c[1:-1], c[2:]
        # interp(c1,c2,0.75) then interp(c2,c3,0.25), matching the
        # reference's exact expression order for bit-identical output
        p1 = a + (b - a) * 0.75
        p2 = b + (d - b) * 0.25
        mid = np.empty((2 * len(b), 2), dtype=np.float64)
        mid[0::2] = p1
        mid[1::2] = p2
        c = np.vstack([c[:1], mid, c[-1:]])
    return Geometry(LINESTRING, c, g.srid)


def densify(g: Geometry, max_len: float) -> Geometry:
    """Insert vertices so no segment exceeds max_len (core.clj:654-659)."""

    def _densify_line(c: np.ndarray) -> np.ndarray:
        if len(c) < 2:
            return c
        out = [c[:1]]
        for i in range(len(c) - 1):
            p, q = c[i], c[i + 1]
            d = math.hypot(q[0] - p[0], q[1] - p[1])
            n = max(1, math.ceil(d / max_len))
            if n > 1:
                t = np.arange(1, n) / n
                out.append(p + np.outer(t, q - p))
            out.append(q.reshape(1, 2))
        return np.vstack(out)

    return _map_coords_arrays(g, _densify_line)


def change_precision(g: Geometry, scale: float) -> Geometry:
    """Snap coordinates to a grid of 1/scale (core.clj:482-493)."""

    def snap(c: np.ndarray) -> np.ndarray:
        return np.round(c * scale) / scale

    return _map_coords_arrays(g, snap)


def _map_coords_arrays(g: Geometry, f) -> Geometry:
    t = g.gtype
    if t in (POINT, LINESTRING, MULTIPOINT):
        return Geometry(t, f(g.parts) if len(g.parts) else g.parts, g.srid, ring=g.ring)
    if t in (POLYGON, MULTILINESTRING):
        return Geometry(t, [f(c) for c in g.parts], g.srid)
    if t == MULTIPOLYGON:
        return Geometry(t, [[f(r) for r in rings] for rings in g.parts], g.srid)
    return Geometry(t, [_map_coords_arrays(c, f) for c in g.parts], g.srid)


# ---------------------------------------------------------------------------
# interior point — midpoint of the widest interior chord at mid-y
# (JTS InteriorPointArea algorithm shape; core.clj:307-308)
# ---------------------------------------------------------------------------

def interior_point(g: Geometry) -> Geometry:
    if g.is_empty():
        return empty(POINT, g.srid)
    from .predicates import INTERIOR, PreparedPolygon, _interior_sample

    if g.gtype in (POLYGON, MULTIPOLYGON):
        pp = PreparedPolygon(g)
        _, ymin, _, ymax = pp.bbox
        y = (ymin + ymax) / 2.0
        xs = np.unique(np.concatenate([pp.x1, pp.x2]))
        best = None
        # crossings of the scanline give interior intervals; take the
        # midpoint of the widest one
        cand = (xs[:-1] + xs[1:]) / 2.0 if len(xs) > 1 else xs
        widths = np.diff(xs) if len(xs) > 1 else np.array([0.0])
        loc = pp.locate_batch(cand, np.full(len(cand), y))
        good = np.nonzero(loc == INTERIOR)[0]
        if len(good):
            i = good[np.argmax(widths[good])]
            return point(float(cand[i]), y, g.srid)
    s = _interior_sample(g)
    if s is None:
        c = g.all_coords()
        return point(float(c[0, 0]), float(c[0, 1]), g.srid)
    return point(s[0], s[1], g.srid)


# ---------------------------------------------------------------------------
# minimum bounding circle — Welzl's algorithm (core.clj:333-336)
# ---------------------------------------------------------------------------

def minimum_bounding_circle(g: Geometry):
    """(center_x, center_y, radius)."""
    pts = np.unique(g.all_coords(), axis=0)
    if len(pts) == 0:
        return (math.nan, math.nan, 0.0)
    if len(pts) == 1:
        return (float(pts[0, 0]), float(pts[0, 1]), 0.0)
    # deterministic shuffle (hash order) for expected-linear Welzl
    order = np.argsort((pts[:, 0] * 73856093 + pts[:, 1] * 19349663) % 1.0, kind="stable")
    P = pts[order]

    def circle2(a, b):
        return ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2, math.hypot(a[0] - b[0], a[1] - b[1]) / 2)

    def circle3(a, b, c):
        ax, ay = a
        bx, by = b
        cx, cy = c
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if d == 0:
            return None
        ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) + (cx * cx + cy * cy) * (ay - by)) / d
        uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) + (cx * cx + cy * cy) * (bx - ax)) / d
        return (ux, uy, math.hypot(ax - ux, ay - uy))

    def inside(c, p, eps=1e-9):
        return c is not None and math.hypot(p[0] - c[0], p[1] - c[1]) <= c[2] + eps

    c = None
    for i, p in enumerate(P):
        if inside(c, p):
            continue
        c = (float(p[0]), float(p[1]), 0.0)
        for j in range(i):
            q = P[j]
            if inside(c, q):
                continue
            c = circle2(p, q)
            for k in range(j):
                r = P[k]
                if inside(c, r):
                    continue
                c3 = circle3(tuple(p), tuple(q), tuple(r))
                if c3 is not None:
                    c = c3
    return c


# ---------------------------------------------------------------------------
# convex hull — Andrew's monotone chain (core.clj:322 convex-hull-of)
# ---------------------------------------------------------------------------

def convex_hull(g: Geometry) -> Geometry:
    pts = np.unique(g.all_coords(), axis=0)
    if len(pts) == 0:
        return empty(POLYGON, g.srid)
    if len(pts) == 1:
        return point(pts[0, 0], pts[0, 1], g.srid)
    if len(pts) == 2:
        return line_string(pts, g.srid)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and _cross(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    if len(hull) < 3:
        return line_string(hull, g.srid)
    ring = np.vstack([hull, hull[:1]])
    return Geometry(POLYGON, [ring], g.srid)


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


# ---------------------------------------------------------------------------
# square grid tiling (reference: grid.clj:4-25, golden grid_test.clj:6-18)
# ---------------------------------------------------------------------------

def make_grid(g: Geometry, dimension: float) -> List[Geometry]:
    """Square grid of `dimension` cells covering g's envelope expanded by
    `dimension`, aligned to the expanded min-x/min-y."""
    env = g.envelope()
    if env is None:
        return []
    xmin, ymin, xmax, ymax = env
    xmin -= dimension
    ymin -= dimension
    xmax += dimension
    ymax += dimension
    cells = []
    xs = np.arange(xmin, xmax, dimension)
    ys = np.arange(ymin, ymax, dimension)
    for x in xs:
        for y in ys:
            cells.append(
                polygon(
                    [
                        [x, y],
                        [x + dimension, y],
                        [x + dimension, y + dimension],
                        [x, y + dimension],
                        [x, y],
                    ],
                    srid=g.srid,
                )
            )
    return cells


# ---------------------------------------------------------------------------
# line merge — union-find stitch of touching linestrings
# (reference: core.clj:463-467 via JTS LineMerger; goldens core_test.clj:122-137)
# ---------------------------------------------------------------------------

def line_merge(lines: List[Geometry]) -> List[Geometry]:
    segs = [l.parts.copy() for g in lines for l in line_strings_of(g) if len(l.parts) >= 2]
    # node-degree map over endpoints
    from collections import defaultdict

    deg = defaultdict(list)  # endpoint -> [(seg_idx, is_start)]
    for i, s in enumerate(segs):
        deg[tuple(s[0])].append((i, True))
        deg[tuple(s[-1])].append((i, False))
    used = [False] * len(segs)
    out = []
    # merge only through degree-2 nodes (JTS LineMerger semantics)
    for i in range(len(segs)):
        if used[i]:
            continue
        used[i] = True
        chain = segs[i]
        # extend forward then backward
        for forward in (True, False):
            while True:
                end = tuple(chain[-1]) if forward else tuple(chain[0])
                cands = [e for e in deg[end] if not used[e[0]]]
                if len(deg[end]) != 2 or len(cands) != 1:
                    break
                j, at_start = cands[0]
                used[j] = True
                nxt = segs[j] if at_start else segs[j][::-1]
                if forward:
                    chain = np.vstack([chain, nxt[1:]])
                else:
                    chain = np.vstack([nxt[::-1][:-1], chain])
        out.append(Geometry(LINESTRING, chain))
    return out
