"""Overlay operators: intersection / union / difference / sym-difference.

Strategy (SURVEY.md §7.6): snap-rounded arrangement overlay — node the
combined boundaries at a fixed precision, trace the atomic planar
faces, classify each face's interior against both inputs, select
faces per operator, then dissolve shared internal edges back into
rings.  Deterministic and robust by construction (the reference
reaches the same place through OverlayNGRobust + make-valid retries,
core.clj:401-448; robustness is exercised by core_test.clj:96-114).

Lineal inputs take a separate path (noding / intersection points),
matching the union/intersection goldens (core_test.clj:71-94).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import List, Optional, Sequence, Tuple

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
    collection,
    empty,
    line_string,
    multi_point,
    multi_polygon,
    point,
    polygon,
)
from .linear import line_line_intersection_points, _collinear_overlap, _orient
from .noding import node_lines, trace_faces, Pt
from .ops import line_merge, line_strings_of, linearize, parts_of
from .predicates import PreparedPolygon, EXTERIOR, INTERIOR

DEFAULT_SCALE = 1e6  # micrometre grid for metre CRSs


def _dim(g: Geometry) -> int:
    t = g.gtype
    if t in (POINT, MULTIPOINT):
        return 0
    if t in (LINESTRING, MULTILINESTRING):
        return 1
    if t in (POLYGON, MULTIPOLYGON):
        return 2
    return max((_dim(c) for c in g.parts), default=0)


def _pick_scale(a: Geometry, b: Optional[Geometry]) -> float:
    """Snap grid fine enough to be invisible at the data's magnitude
    while keeping coordinates * scale within exact-double range."""
    mags = [np.abs(a.all_coords()).max(initial=1.0)]
    if b is not None:
        mags.append(np.abs(b.all_coords()).max(initial=1.0))
    m = max(1.0, float(max(mags)))
    # keep m * scale < 2^52 for exact rounding
    return min(DEFAULT_SCALE, 2.0 ** 52 / (m * 16.0))


# ---------------------------------------------------------------------------
# area overlay
# ---------------------------------------------------------------------------

def _edge_sides(a: Geometry, b: Optional[Geometry], scale: float, eps_px: float = 1.0, noded=None):
    """Node the combined boundary arrangement; for every dissolved
    substring, classify a sample point ε to each side against a (and b).

    Returns (noded, [(coords, (inA_left, inB_left), (inA_right, inB_right))]).
    Substrings have no interior nodes, so one sample per side
    classifies the adjacent face along the whole substring.

    eps_px: sampling offset in snap pixels.  1 px clears the max snap
    displacement (0.71 px); sub-pixel features need a smaller ε —
    the caller retries over a ladder when the assembly is inconsistent
    (the same place the reference escalates through OverlayNGRobust,
    core.clj:401-412).
    """
    if noded is None:
        lines = [l.parts for l in linearize(a)]
        if b is not None:
            lines += [l.parts for l in linearize(b)]
        noded = node_lines(lines, scale)
    eps = eps_px / scale
    samples = []
    for coords, _src in noded:
        best, best_len = None, 0.0
        for i in range(len(coords) - 1):
            p, q = coords[i], coords[i + 1]
            l = math.hypot(q[0] - p[0], q[1] - p[1])
            if l > best_len:
                best_len, best = l, (p, q)
        if best is None or best_len == 0:
            samples.append(None)
            continue
        (ax, ay), (bx, by) = best
        mx, my = (ax + bx) / 2.0, (ay + by) / 2.0
        nx, ny = -(by - ay) / best_len, (bx - ax) / best_len  # left normal
        samples.append(((mx + nx * eps, my + ny * eps), (mx - nx * eps, my - ny * eps)))
    pa = PreparedPolygon(a)
    pb = PreparedPolygon(b) if b is not None else None
    pts = [p for s in samples if s for p in s]
    if not pts:
        return noded, []
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    in_a = pa.locate_batch(px, py) != EXTERIOR
    in_b = pb.locate_batch(px, py) != EXTERIOR if pb is not None else np.zeros(len(px), bool)
    out = []
    k = 0
    for (coords, _src), s in zip(noded, samples):
        if s is None:
            continue
        left = (bool(in_a[k]), bool(in_b[k]))
        right = (bool(in_a[k + 1]), bool(in_b[k + 1]))
        k += 2
        out.append((coords, left, right))
    return noded, out


def _op_select(op: str, in_a: bool, in_b: bool) -> bool:
    if op == "intersection":
        return in_a and in_b
    if op == "union":
        return in_a or in_b
    if op == "difference":
        return in_a and not in_b
    return in_a != in_b  # sym_difference


def _assemble(directed: List[List[Pt]], _stats: Optional[dict] = None) -> Geometry:
    """Trace rings from directed boundary substrings (region on the
    left) and rebuild polygons (CCW shells + CW holes).  _stats (if
    given) records {'dropped': n} edges that failed to close a ring —
    a nonzero count means the side classification was inconsistent."""
    survivors: List[Tuple[Pt, Pt]] = []
    for coords in directed:
        for i in range(len(coords) - 1):
            if coords[i] != coords[i + 1]:
                survivors.append((coords[i], coords[i + 1]))
    # cancel exact opposite duplicates (degenerate slivers)
    seg_count = defaultdict(int)
    for e in survivors:
        seg_count[e] += 1
    pruned = []
    for (p, q), n in list(seg_count.items()):
        m = seg_count.get((q, p), 0)
        for _ in range(max(0, n - m)):
            pruned.append((p, q))
    survivors = pruned
    if not survivors:
        return empty(POLYGON)
    out_edges = defaultdict(list)
    for a, b in survivors:
        out_edges[a].append(b)

    def angle(a, b):
        return math.atan2(b[1] - a[1], b[0] - a[0])

    used = set()
    rings_out = []
    survivors_set = list(dict.fromkeys(survivors))
    for start in survivors_set:
        if start in used:
            continue
        ring = [start[0]]
        edge = start
        guard = 0
        while True:
            used.add(edge)
            ring.append(edge[1])
            if edge[1] == ring[0] and len(ring) > 3:
                break
            ins = angle(edge[1], edge[0])
            cands = [c for c in out_edges[edge[1]] if (edge[1], c) not in used]
            if not cands:
                ring = None
                break
            best_c, best_d = None, None
            for c in cands:
                d = (ins - angle(edge[1], c)) % (2 * math.pi)
                if d == 0:
                    d = 2 * math.pi
                if best_d is None or d < best_d:
                    best_d, best_c = d, c
            edge = (edge[1], best_c)
            guard += 1
            if guard > len(survivors) + 2:
                ring = None
                break
        if ring:
            rings_out.append(ring)
    if _stats is not None:
        used_edges = sum(len(r) - 1 for r in rings_out)
        _stats["dropped"] = max(0, len(survivors) - used_edges)
    shells = []
    holes = []
    for r in rings_out:
        a2 = 0.0
        for i in range(len(r) - 1):
            a2 += r[i][0] * r[i + 1][1] - r[i + 1][0] * r[i][1]
        if a2 > 0:
            shells.append(r)
        elif a2 < 0:
            holes.append(r)
    polys = [[np.asarray(s, dtype=np.float64)] for s in shells]
    if holes:
        preps = [PreparedPolygon(polygon(s)) for s in shells]
        for h in holes:
            hx = np.array([p[0] for p in h[:-1]])
            hy = np.array([p[1] for p in h[:-1]])
            target, target_area = None, math.inf
            for si, pp in enumerate(preps):
                if (pp.covers_batch(hx, hy)).all():
                    ar = abs(sum(
                        shells[si][i][0] * shells[si][i + 1][1]
                        - shells[si][i + 1][0] * shells[si][i][1]
                        for i in range(len(shells[si]) - 1)
                    ))
                    if ar < target_area:
                        target, target_area = si, ar
            if target is not None:
                polys[target].append(np.asarray(h, dtype=np.float64))
    if len(polys) == 1:
        return Geometry(POLYGON, polys[0])
    return Geometry(MULTIPOLYGON, polys)


def _area_overlay(a: Geometry, b: Geometry, op: str, scale: Optional[float]) -> Geometry:
    scale = scale or _pick_scale(a, b)
    # ε retry ladder: sub-pixel features can straddle one sampling
    # offset and classify inconsistently (open rings); escalate like
    # the reference's overlay robustness fallback (core.clj:401-412)
    noded = None
    best = None
    for eps_px in (1.0, 0.25, 0.0625, 4.0):
        noded, sides = _edge_sides(a, b, scale, eps_px=eps_px, noded=noded)
        directed = []
        for coords, left, right in sides:
            keep_l = _op_select(op, *left)
            keep_r = _op_select(op, *right)
            if keep_l and not keep_r:
                directed.append(coords)
            elif keep_r and not keep_l:
                directed.append(list(reversed(coords)))
        stats: dict = {}
        geom = _assemble(directed, stats)
        dropped = stats.get("dropped", 0)
        if dropped == 0:
            return geom
        if best is None or dropped < best[0]:
            best = (dropped, geom)
    return best[1]


# ---------------------------------------------------------------------------
# lineal overlay
# ---------------------------------------------------------------------------

def union_lines(gs: Sequence[Geometry], scale: Optional[float] = None) -> Geometry:
    """Union (dissolve) of linework = full noding + dedupe
    (union golden core_test.clj:71-85)."""
    lines = [l.parts for g in gs for l in linearize(g)]
    scale = scale or _pick_scale(collection(list(gs)), None)
    noded = node_lines(lines, scale)
    segs = [line_string(c) for c, _src in noded]
    if len(segs) == 1:
        return segs[0]
    return Geometry(MULTILINESTRING, [s.parts for s in segs])


def _line_line_intersection(a: Geometry, b: Geometry) -> Geometry:
    pts: List[Pt] = []
    segs: List[np.ndarray] = []
    for la in linearize(a):
        for lb in linearize(b):
            ca, cb = la.parts, lb.parts
            for i in range(len(ca) - 1):
                for j in range(len(cb) - 1):
                    p1, p2, q1, q2 = ca[i], ca[i + 1], cb[j], cb[j + 1]
                    d1 = _orient(p1, p2, q1)
                    d2 = _orient(p1, p2, q2)
                    if d1 == 0 and d2 == 0:
                        ov = _collinear_overlap(p1, p2, q1, q2)
                        if len(ov) >= 2:
                            segs.append(np.asarray(ov[:2], dtype=np.float64))
                        elif len(ov) == 1:
                            pts.append(ov[0])
                        continue
            pts.extend(line_line_intersection_points(ca, cb))
    if segs:
        merged = line_merge([line_string(s) for s in segs])
        seg_pts = {tuple(p) for m in merged for p in m.parts}
        pts = [p for p in pts if tuple(p) not in seg_pts]
        geoms = list(merged) + [point(x, y) for x, y in dict.fromkeys(pts)]
        if len(geoms) == 1:
            return geoms[0]
        if all(g.gtype == LINESTRING for g in geoms):
            return Geometry(MULTILINESTRING, [g.parts for g in geoms])
        return collection(geoms)
    pts = list(dict.fromkeys(pts))
    if not pts:
        return empty(POINT)
    if len(pts) == 1:
        return point(pts[0][0], pts[0][1])
    return multi_point(pts)


# ---------------------------------------------------------------------------
# public API (reference: core.clj:413-448)
# ---------------------------------------------------------------------------

def union(a: Geometry, b: Optional[Geometry] = None, scale: Optional[float] = None) -> Geometry:
    """Binary union, or unary dissolve when b is None (core.clj:413-419)."""
    if b is None:
        parts = parts_of(a)
        dims = {_dim(p) for p in parts if not p.is_empty()}
        if dims == {1}:
            return union_lines(parts, scale)
        if dims == {2}:
            return _nary_area_union(parts, scale)
        return a
    da, db = _dim(a), _dim(b)
    if a.is_empty():
        return b
    if b.is_empty():
        return a
    if da == 1 and db == 1:
        return union_lines([a, b], scale)
    if da == 2 and db == 2:
        return _area_overlay(a, b, "union", scale)
    return collection([a, b])


def _nary_area_union(parts: List[Geometry], scale: Optional[float]) -> Geometry:
    mp = multi_polygon([p for g in parts for p in parts_of(g, POLYGON)])
    scale = scale or _pick_scale(mp, None)
    _, sides = _edge_sides(mp, None, scale)
    directed = []
    for coords, left, right in sides:
        if left[0] and not right[0]:
            directed.append(coords)
        elif right[0] and not left[0]:
            directed.append(list(reversed(coords)))
    return _assemble(directed)


def intersection(a: Geometry, b: Geometry, scale: Optional[float] = None) -> Geometry:
    if a.is_empty() or b.is_empty():
        return empty(a.gtype)
    da, db = _dim(a), _dim(b)
    if da == 1 and db == 1:
        # identity fast path (intersection golden core_test.clj:87-90)
        from .core import geom_eq

        if geom_eq(a, b):
            return a
        return _line_line_intersection(a, b)
    if da == 2 and db == 2:
        return _area_overlay(a, b, "intersection", scale)
    if da == 0 or db == 0:
        pts_g = a if da == 0 else b
        other = b if da == 0 else a
        from .predicates import locate_point

        hit = [
            (x, y)
            for x, y in pts_g.all_coords()
            if locate_point(other, x, y) != EXTERIOR
        ]
        if not hit:
            return empty(POINT)
        if len(hit) == 1:
            return point(hit[0][0], hit[0][1])
        return multi_point(hit)
    # mixed line/area: clip the line by the polygon
    line = a if da == 1 else b
    poly = b if da == 1 else a
    return _clip_line_by_area(line, poly, scale)


def _clip_line_by_area(
    line: Geometry, poly: Geometry, scale: Optional[float], keep: str = "inside"
) -> Geometry:
    """Pieces of the line inside (intersection) or outside (difference)
    the area."""
    scale = scale or _pick_scale(line, poly)
    pp = PreparedPolygon(poly)
    out = []
    for l in linearize(line):
        cuts: List[Pt] = []
        for pl in linearize(poly):
            cuts.extend(line_line_intersection_points(l.parts, pl.parts))
        # split l at cut points, keep pieces on the requested side
        from .linear import LengthIndexedLine

        lil = LengthIndexedLine(l.parts)
        idxs = sorted({lil.index_of(x, y) for x, y in cuts} | {0.0, lil.end_index})
        for i in range(len(idxs) - 1):
            piece = lil.extract_line(idxs[i], idxs[i + 1])
            mid = piece[(len(piece) - 1) // 2 : (len(piece) + 3) // 2].mean(axis=0)
            loc = pp.locate_batch(np.array([mid[0]]), np.array([mid[1]]))[0]
            hit = loc != EXTERIOR if keep == "inside" else loc == EXTERIOR
            if hit:
                out.append(piece)
    if not out:
        return empty(LINESTRING)
    merged = line_merge([line_string(c) for c in out])
    if len(merged) == 1:
        return merged[0]
    return Geometry(MULTILINESTRING, [m.parts for m in merged])


def difference(a: Geometry, b: Geometry, scale: Optional[float] = None) -> Geometry:
    if a.is_empty():
        return a
    if b.is_empty():
        return a
    da, db = _dim(a), _dim(b)
    if da == 2 and db == 2:
        return _area_overlay(a, b, "difference", scale)
    if da == 2 and db < 2:
        return a  # lower-dim subtrahend removes nothing from an area
    if da == 1 and db == 2:
        return _clip_line_by_area(a, b, scale, keep="outside")
    if da == 1 and db <= 1:
        return a  # point/line subtrahend leaves 1-dim measure intact
    if da == 0:
        from .predicates import locate_point

        keep = [
            (x, y) for x, y in a.all_coords() if locate_point(b, x, y) == EXTERIOR
        ]
        if not keep:
            return empty(POINT)
        return point(*keep[0]) if len(keep) == 1 else multi_point(keep)
    raise NotImplementedError(f"difference for dims ({da},{db})")


def sym_difference(a: Geometry, b: Geometry, scale: Optional[float] = None) -> Geometry:
    if a.is_empty():
        return b
    if b.is_empty():
        return a
    da, db = _dim(a), _dim(b)
    if da == 2 and db == 2:
        return _area_overlay(a, b, "sym_difference", scale)
    if da == 1 and db == 1:
        # symmetric lineal difference: each minus the shared linework
        left = _lineal_minus_lineal(a, b)
        right = _lineal_minus_lineal(b, a)
        parts = [g for g in (left, right) if g is not None and not g.is_empty()]
        if not parts:
            return empty(LINESTRING)
        if len(parts) == 1:
            return parts[0]
        lines = [l for p in parts for l in line_strings_of(p)]
        return Geometry(MULTILINESTRING, [l.parts for l in lines])
    if {da, db} == {1, 2} or {da, db} == {0, 2} or {da, db} == {0, 1}:
        # mixed dims: the lower-dim part survives outside the higher
        lo, hi = (a, b) if da < db else (b, a)
        return collection([difference(lo, hi), hi])
    raise NotImplementedError(f"sym_difference for dims ({da},{db})")


def _lineal_minus_lineal(a: Geometry, b: Geometry) -> Geometry:
    """Remove from a the segments it shares (collinearly) with b —
    crossing points don't reduce 1-dim measure, shared stretches do."""
    from .noding import node_lines

    scale = _pick_scale(a, b)
    la = [l.parts for l in linearize(a)]
    lb = [l.parts for l in linearize(b)]
    noded = node_lines(la + lb, scale)
    na = len(la)
    keep = []
    for coords, srcs in noded:
        in_a = any(s < na for s in srcs)
        in_b = any(s >= na for s in srcs)
        if in_a and not in_b:
            keep.append(np.asarray(coords, dtype=np.float64))
    if not keep:
        return empty(LINESTRING)
    merged = line_merge([line_string(c) for c in keep])
    if len(merged) == 1:
        return merged[0]
    return Geometry(MULTILINESTRING, [m.parts for m in merged])


# ---------------------------------------------------------------------------
# validity (core.clj:234-243): check + repair through the arrangement
# ---------------------------------------------------------------------------

def is_valid(g: Geometry) -> bool:
    """OGC-ish validity for polygonal geometry: rings closed, ≥4 points,
    no self-intersection of the boundary arrangement changing topology.
    Cheap check: re-running the face pipeline reproduces the same area."""
    if _dim(g) < 2:
        return True
    try:
        ar = 0.0
        for rings in _poly_rings(g):
            for i, r in enumerate(rings):
                if len(r) < 4 or not np.array_equal(r[0], r[-1]):
                    return False
        from .ops import area as _area

        a0 = _area(g)
        fixed = make_valid(g)
        a1 = _area(fixed)
        return abs(a0 - a1) <= 1e-6 * max(1.0, a0)
    except Exception:
        return False


def _poly_rings(g: Geometry):
    if g.gtype == POLYGON:
        yield g.parts
    elif g.gtype == MULTIPOLYGON:
        yield from g.parts
    elif g.gtype == GEOMETRYCOLLECTION:
        for c in g.parts:
            yield from _poly_rings(c)


def make_valid(g: Geometry, scale: Optional[float] = None) -> Geometry:
    """Repair polygonal geometry by rebuilding from its own boundary
    arrangement (reference repairs via buffer(0)/GeometryFixer,
    core.clj:238-243; same outcome: a valid cover of the interior)."""
    if _dim(g) < 2 or g.is_empty():
        return g
    scale = scale or _pick_scale(g, None)
    _, sides = _edge_sides(g, None, scale)
    directed = []
    for coords, left, right in sides:
        if left[0] and not right[0]:
            directed.append(coords)
        elif right[0] and not left[0]:
            directed.append(list(reversed(coords)))
    return _assemble(directed)
