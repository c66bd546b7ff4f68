"""Buffer — offset-curve construction + nonzero-winding arrangement.

Reference semantics (core.clj:245-264): positive/negative distance,
`quad_segs` arc quantization, end caps round/flat/square, joins
round/mitre/bevel with mitre limit (default 5.0), output passed
through make-valid.  The algorithm here is the classic raw-offset-
curve construction classified by winding number over the snapped
arrangement — original code, no GEOS/JTS.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .core import (
    Geometry,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    empty,
    polygon,
)
from .noding import node_lines, Pt
from .overlay import _assemble, _pick_scale, difference, union
from .ops import boundary_of, linearize, parts_of

TWO_PI = 2.0 * math.pi


def _disc(cx: float, cy: float, d: float, quad_segs: int) -> np.ndarray:
    n = max(4, 4 * quad_segs)
    ang = np.linspace(0, TWO_PI, n + 1)
    return np.column_stack([cx + d * np.cos(ang), cy + d * np.sin(ang)])


def _arc(cx, cy, d, a0, a1, quad_segs) -> List[Pt]:
    """Clockwise arc from angle a0 down to a1 (a1 ≤ a0 after unwrap)."""
    while a1 > a0:
        a1 -= TWO_PI
    steps = max(1, int(math.ceil((a0 - a1) / (math.pi / 2.0 / max(1, quad_segs)))))
    return [
        (cx + d * math.cos(a0 + (a1 - a0) * i / steps), cy + d * math.sin(a0 + (a1 - a0) * i / steps))
        for i in range(steps + 1)
    ]


def _offset_side(
    c: np.ndarray, d: float, quad_segs: int, join: str, mitre_limit: float,
    closed: bool = False,
) -> List[Pt]:
    """Left-offset of the path by d with joins at outward corners."""
    out: List[Pt] = []
    n = len(c)
    dirs = []
    for i in range(n - 1):
        dx, dy = c[i + 1, 0] - c[i, 0], c[i + 1, 1] - c[i, 1]
        l = math.hypot(dx, dy)
        if l == 0:
            dirs.append(None)
        else:
            dirs.append((dx / l, dy / l))
    def _join(prev_dir, next_dir, vx, vy):
        px, py = prev_dir
        ux, uy = next_dir
        crossz = px * uy - py * ux  # >0 left turn, <0 right turn
        if crossz < 0:
            # outward corner on the left side → insert join; angles of
            # the previous/next left normals
            a0 = math.atan2(px, -py)
            a1 = math.atan2(ux, -uy)
            if join == "round":
                out.extend(_arc(vx, vy, d, a0, a1, quad_segs))
            elif join == "mitre":
                mp = _mitre_point((px, py), (ux, uy), vx, vy, d)
                if mp is not None and math.hypot(mp[0] - vx, mp[1] - vy) <= abs(
                    mitre_limit * d
                ):
                    out.append(mp)
                # else bevel: the chord between the offsets
        # inward corners: raw curve self-intersects; winding fixes it

    prev_valid = None
    first_valid = None
    for i in range(n - 1):
        if dirs[i] is None:
            continue
        ux, uy = dirs[i]
        nx, ny = -uy, ux  # left normal
        p0 = (c[i, 0] + nx * d, c[i, 1] + ny * d)
        p1 = (c[i + 1, 0] + nx * d, c[i + 1, 1] + ny * d)
        if prev_valid is not None:
            _join(dirs[prev_valid], (ux, uy), c[i, 0], c[i, 1])
        else:
            first_valid = i
        out.append(p0)
        out.append(p1)
        prev_valid = i
    if closed and prev_valid is not None and first_valid is not None and prev_valid != first_valid:
        _join(dirs[prev_valid], dirs[first_valid], c[0, 0], c[0, 1])
    return out


def _mitre_point(dprev, dnext, vx, vy, d) -> Optional[Pt]:
    """Intersection of the two offset lines at a corner."""
    n1 = (-dprev[1], dprev[0])
    n2 = (-dnext[1], dnext[0])
    p1 = (vx + n1[0] * d, vy + n1[1] * d)
    p2 = (vx + n2[0] * d, vy + n2[1] * d)
    denom = dprev[0] * dnext[1] - dprev[1] * dnext[0]
    if denom == 0:
        return None
    t = ((p2[0] - p1[0]) * dnext[1] - (p2[1] - p1[1]) * dnext[0]) / denom
    return (p1[0] + dprev[0] * t, p1[1] + dprev[1] * t)


def _cap(end: Pt, u: Tuple[float, float], d: float, cap: str, quad_segs: int) -> List[Pt]:
    """Cap at line end with direction u: from left-offset endpoint
    around to right-offset endpoint."""
    nx, ny = -u[1], u[0]
    a0 = math.atan2(ny, nx)
    a1 = a0 - math.pi
    if cap == "round":
        return _arc(end[0], end[1], d, a0, a1, quad_segs)[1:-1]
    if cap == "square":
        return [
            (end[0] + nx * d + u[0] * d, end[1] + ny * d + u[1] * d),
            (end[0] - nx * d + u[0] * d, end[1] - ny * d + u[1] * d),
        ]
    return []  # flat


def _line_buffer_curves(
    c: np.ndarray, d: float, quad_segs: int, cap: str, join: str, mitre_limit: float
) -> List[np.ndarray]:
    """Closed raw offset curve(s) for a polyline."""
    closed = len(c) >= 3 and np.array_equal(c[0], c[-1])
    if closed:
        left = _offset_side(c, d, quad_segs, join, mitre_limit, closed=True)
        right = _offset_side(c[::-1].copy(), d, quad_segs, join, mitre_limit, closed=True)
        curves = []
        for side in (left, right):
            if len(side) >= 3:
                ring = side + [side[0]]
                curves.append(np.asarray(ring, dtype=np.float64))
        return curves
    left = _offset_side(c, d, quad_segs, join, mitre_limit)
    right = _offset_side(c[::-1].copy(), d, quad_segs, join, mitre_limit)
    # end cap
    u_end = _dir(c[-2], c[-1])
    u_start = _dir(c[1], c[0])
    pts = list(left)
    pts += _cap((c[-1, 0], c[-1, 1]), u_end, d, cap, quad_segs)
    pts += right
    pts += _cap((c[0, 0], c[0, 1]), u_start, d, cap, quad_segs)
    if len(pts) < 3:
        return []
    pts.append(pts[0])
    return [np.asarray(pts, dtype=np.float64)]


def _dir(a, b) -> Tuple[float, float]:
    dx, dy = b[0] - a[0], b[1] - a[1]
    l = math.hypot(dx, dy) or 1.0
    return (dx / l, dy / l)


def _winding_region(curves: List[np.ndarray], scale: float) -> Geometry:
    """Faces of the curve arrangement with nonzero winding number."""
    if not curves:
        return empty(POLYGON)
    # build winding evaluator over the *raw* curves
    P1 = np.concatenate([cv[:-1] for cv in curves])
    P2 = np.concatenate([cv[1:] for cv in curves])
    x1, y1, x2, y2 = P1[:, 0], P1[:, 1], P2[:, 0], P2[:, 1]

    def winding(px: float, py: float) -> int:
        up = (y1 <= py) & (y2 > py)
        dn = (y2 <= py) & (y1 > py)
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        return int((up & (cross > 0)).sum()) - int((dn & (cross < 0)).sum())

    noded = node_lines([cv for cv in curves], scale)
    eps = 1.0 / scale  # > max snap displacement (0.71/scale)
    directed = []
    for coords, _src in noded:
        best, best_len = None, 0.0
        for i in range(len(coords) - 1):
            p, q = coords[i], coords[i + 1]
            l = math.hypot(q[0] - p[0], q[1] - p[1])
            if l > best_len:
                best_len, best = l, (p, q)
        if not best or best_len == 0:
            continue
        (ax, ay), (bx, by) = best
        mx, my = (ax + bx) / 2.0, (ay + by) / 2.0
        nx, ny = -(by - ay) / best_len, (bx - ax) / best_len
        wl = winding(mx + nx * eps, my + ny * eps) != 0
        wr = winding(mx - nx * eps, my - ny * eps) != 0
        if wl and not wr:
            directed.append(coords)
        elif wr and not wl:
            directed.append(list(reversed(coords)))
    return _assemble(directed)


def buffer(
    g: Geometry,
    dist: float,
    quad_segs: int = 8,
    cap: str = "round",
    join: str = "round",
    mitre_limit: float = 5.0,
    scale: Optional[float] = None,
) -> Geometry:
    """Buffer any geometry; negative distances erode polygons
    (core.clj:245-264; output is made valid as in core.clj:250,258)."""
    from .overlay import make_valid

    if g.is_empty():
        return empty(POLYGON, g.srid)
    scale = scale or _pick_scale(g, None)
    dims = _dims(g)
    if dist == 0:
        return make_valid(g)
    pieces: List[Geometry] = []
    if dist > 0:
        curves: List[np.ndarray] = []
        for part in parts_of(g):
            if part.gtype == POINT:
                if len(part.parts):
                    curves.append(_disc(part.parts[0, 0], part.parts[0, 1], dist, quad_segs))
            elif part.gtype == LINESTRING:
                curves.extend(
                    _line_buffer_curves(part.parts, dist, quad_segs, cap, join, mitre_limit)
                )
            elif part.gtype == POLYGON:
                for ring in part.parts:
                    curves.extend(
                        _line_buffer_curves(ring, dist, quad_segs, cap, join, mitre_limit)
                    )
        collar = _winding_region(curves, scale)
        if 2 in dims:
            poly_parts = [p for p in parts_of(g, POLYGON)]
            base = (
                poly_parts[0]
                if len(poly_parts) == 1
                else Geometry(MULTIPOLYGON, [p.parts for p in poly_parts], g.srid)
            )
            if collar.is_empty():
                return make_valid(base)
            return union(base, collar, scale=scale)
        return collar
    # negative: erode polygons, everything else vanishes
    if 2 not in dims:
        return empty(POLYGON, g.srid)
    poly_parts = [p for p in parts_of(g, POLYGON)]
    base = (
        poly_parts[0]
        if len(poly_parts) == 1
        else Geometry(MULTIPOLYGON, [p.parts for p in poly_parts], g.srid)
    )
    curves = []
    for part in poly_parts:
        for ring in part.parts:
            curves.extend(
                _line_buffer_curves(ring, abs(dist), quad_segs, cap, join, mitre_limit)
            )
    collar = _winding_region(curves, scale)
    if collar.is_empty():
        return make_valid(base)
    return difference(base, collar, scale=scale)


def _dims(g: Geometry) -> set:
    out = set()
    for p in parts_of(g):
        if p.gtype == POINT:
            out.add(0)
        elif p.gtype == LINESTRING:
            out.add(1)
        elif p.gtype == POLYGON:
            out.add(2)
    return out
