"""DE-9IM relate (reference: relates? core.clj:271).

Computes the 9-entry dimension matrix for point/line/area combos from
the engine's location primitives (proper crossings, point location,
boundary sampling, overlay areas).  Exact for the polygonal/puntal
cases the reference exercises; lineal entries use vertex+midpoint
sampling of the noded arrangement (documented approximation — the
same places snap-rounding already quantizes).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .core import Geometry
from .ops import area, boundary_of, parts_of
from .overlay import _dim, difference, intersection
from .predicates import (
    BOUNDARY,
    EXTERIOR,
    INTERIOR,
    PreparedPolygon,
    _interior_sample,
    _interiors_intersect,
    _linework,
    has_proper_crossing,
    locate_point,
    segments_intersect_any,
)

F_DIM = -1  # empty entry


def _sample_points(g: Geometry) -> np.ndarray:
    """Vertices + segment quarter/mid/three-quarter points of g's
    linework (multiple offsets so a sample can't land exactly on every
    crossing simultaneously)."""
    pts = [g.all_coords()]
    for c in _linework(g):
        if len(c) >= 2:
            for t in (0.25, 0.5, 0.75):
                pts.append(c[:-1] + (c[1:] - c[:-1]) * t)
    return np.concatenate([p for p in pts if len(p)]) if pts else np.zeros((0, 2))


def _locate_many(g: Geometry, pts: np.ndarray) -> np.ndarray:
    if _dim(g) == 2:
        pp = PreparedPolygon(g)
        return pp.locate_batch(pts[:, 0], pts[:, 1])
    return np.array([locate_point(g, x, y) for x, y in pts], dtype=np.int8)


def _boundary(g: Geometry) -> Optional[Geometry]:
    b = boundary_of(g)
    return None if b.is_empty() else b


def _collinear_share_length(lwa, lwb) -> bool:
    """True when two lineworks share a positive-length collinear
    stretch (exact pairwise segment test, bbox-prefiltered)."""
    from .linear import _collinear_overlap, _orient

    for ca in lwa:
        for cb in lwb:
            for i in range(len(ca) - 1):
                p1, p2 = ca[i], ca[i + 1]
                lo_x, hi_x = min(p1[0], p2[0]), max(p1[0], p2[0])
                lo_y, hi_y = min(p1[1], p2[1]), max(p1[1], p2[1])
                for j in range(len(cb) - 1):
                    q1, q2 = cb[j], cb[j + 1]
                    if (
                        max(q1[0], q2[0]) < lo_x or min(q1[0], q2[0]) > hi_x
                        or max(q1[1], q2[1]) < lo_y or min(q1[1], q2[1]) > hi_y
                    ):
                        continue
                    if _orient(p1, p2, q1) == 0 and _orient(p1, p2, q2) == 0:
                        ov = _collinear_overlap(p1, p2, q1, q2)
                        if len(ov) >= 2 and (
                            ov[0][0] != ov[1][0] or ov[0][1] != ov[1][1]
                        ):
                            return True
    return False


def _relate_area_area(a: Geometry, b: Geometry, ba: Geometry, bb_: Geometry) -> str:
    """Exact DE-9IM for two area geometries via the overlay kernels —
    no sampling, so sub-segment contact stretches are never missed
    (the fixed-offset sampler skipped stretches shorter than ~10% of
    an edge; found by the driver's box relate oracle).

    For area operands the mixed entries can only be F or their full
    dimension (an open set can't meet a curve in isolated points), so
    each entry reduces to an emptiness test on an overlay result."""
    from .ops import length as _length
    from .overlay import _lineal_minus_lineal

    def _len_in_area(line: Geometry, poly: Geometry, minus: Geometry) -> bool:
        """length(difference(intersection(line, poly), minus)) > 0"""
        try:
            clipped = intersection(line, poly)
        except Exception:
            return False
        if clipped.is_empty() or _dim(clipped) < 1:
            return False
        try:
            rest = _lineal_minus_lineal(clipped, minus)
        except Exception:
            rest = clipped
        return (not rest.is_empty()) and _length(rest) > 1e-12

    ii = 2 if _interiors_intersect(a, b) else F_DIM
    ie = 2 if area(difference(a, b)) > 1e-12 else F_DIM
    ei = 2 if area(difference(b, a)) > 1e-12 else F_DIM
    # IB: ∂b inside closure(a), minus the part shared with ∂a
    ib = 1 if _len_in_area(bb_, a, ba) else F_DIM
    bi = 1 if _len_in_area(ba, b, bb_) else F_DIM
    lwa, lwb = _linework(ba), _linework(bb_)
    if _collinear_share_length(lwa, lwb):
        bb = 1
    elif any(
        segments_intersect_any(c1, c2)
        for c1 in lwa
        for c2 in lwb
        if len(c1) >= 2 and len(c2) >= 2
    ):
        bb = 0
    else:
        bb = F_DIM
    # BE/EB: any of the boundary's length outside the other's closure
    def _len_outside(line: Geometry, poly: Geometry) -> bool:
        try:
            inside = intersection(line, poly)
        except Exception:
            return True
        li = _length(inside) if not inside.is_empty() else 0.0
        return _length(line) - li > 1e-9
    be = 1 if _len_outside(ba, b) else F_DIM
    eb = 1 if _len_outside(bb_, a) else F_DIM
    entries = [ii, ib, ie, bi, bb, be, ei, eb, 2]
    return "".join("F" if e == F_DIM else str(e) for e in entries)


def relate_matrix(a: Geometry, b: Geometry) -> str:
    """DE-9IM string, row-major II IB IE / BI BB BE / EI EB EE."""
    da, db = _dim(a), _dim(b)
    ba, bb_ = _boundary(a), _boundary(b)
    if da == 2 and db == 2 and ba is not None and bb_ is not None:
        return _relate_area_area(a, b, ba, bb_)

    def dim_II() -> int:
        if a.is_empty() or b.is_empty() or not _interiors_intersect(a, b):
            return F_DIM
        if da == 2 and db == 2:
            return 2
        if min(da, db) == 0:
            return 0
        if da == 1 and db == 1:
            # crossing point vs collinear overlap
            for ca in _linework(a):
                for cb in _linework(b):
                    from .linear import _collinear_overlap, _orient

                    for i in range(len(ca) - 1):
                        for j in range(len(cb) - 1):
                            if (
                                _orient(ca[i], ca[i + 1], cb[j]) == 0
                                and _orient(ca[i], ca[i + 1], cb[j + 1]) == 0
                                and len(_collinear_overlap(ca[i], ca[i + 1], cb[j], cb[j + 1])) >= 2
                            ):
                                return 1
            return 0
        return 1  # line interior within area interior

    def dim_cross(x: Optional[Geometry], y: Optional[Geometry], want_interior: bool) -> int:
        """dim(interior-or-boundary of x ∩ boundary y-ish) via sampling."""
        if x is None or y is None:
            return F_DIM
        pts = _sample_points(y)
        if len(pts) == 0:
            return F_DIM
        loc = _locate_many(x, pts)
        target = INTERIOR if want_interior else BOUNDARY
        hits = loc == target
        if not hits.any():
            # proper crossings of y's linework through x also create
            # 0-dim intersections with x's interior/boundary
            if want_interior and has_proper_crossing(x, y):
                return 0
            return F_DIM
        # two adjacent fine offsets of one segment in-target → a
        # 1-dim stretch (≥10% of the segment; finer stretches are
        # below the engine's snap quantum in practice)
        offsets = np.linspace(0.05, 0.95, 10)
        for c in _linework(y):
            if len(c) < 2:
                continue
            hit_off = []
            for t in offsets:
                s = c[:-1] + (c[1:] - c[:-1]) * t
                hit_off.append(_locate_many(x, s) == target)
            h = np.stack(hit_off)
            if (h[:-1] & h[1:]).any():
                return 1
        return 0

    def dim_IE() -> int:
        if a.is_empty():
            return F_DIM
        if db == 0 or b.is_empty():
            return da
        if da == 2 and db == 2:
            try:
                return 2 if area(difference(a, b)) > 1e-12 else F_DIM
            except Exception:
                pass
        pts = _sample_points(a)
        loc = _locate_many(b, pts) if len(pts) else np.zeros(0)
        if len(loc) and (loc == EXTERIOR).any():
            return da
        if da == 2:
            s = _interior_sample(a)
            if s is not None and locate_point(b, s[0], s[1]) == EXTERIOR:
                return 2
        return F_DIM

    def dim_EI() -> int:
        if b.is_empty():
            return F_DIM
        if da == 0 or a.is_empty():
            return db
        if da == 2 and db == 2:
            try:
                return 2 if area(difference(b, a)) > 1e-12 else F_DIM
            except Exception:
                pass
        pts = _sample_points(b)
        loc = _locate_many(a, pts) if len(pts) else np.zeros(0)
        if len(loc) and (loc == EXTERIOR).any():
            return db
        if db == 2:
            s = _interior_sample(b)
            if s is not None and locate_point(a, s[0], s[1]) == EXTERIOR:
                return 2
        return F_DIM

    def dim_BB() -> int:
        if ba is None or bb_ is None:
            return F_DIM
        if da == 0 or db == 0:
            return F_DIM
        lwa = _linework(ba)
        lwb = _linework(bb_)
        if not lwa or not lwb:
            # at least one boundary is puntal (line endpoints)
            pa = ba.all_coords()
            pb = bb_.all_coords()
            if not lwa and not lwb:
                sa = {(x, y) for x, y in pa}
                return 0 if any((x, y) in sa for x, y in pb) else F_DIM
            pts = pb if not lwb else pa
            bnd = ba if not lwb else bb_
            hit = any(locate_point(bnd, x, y) != EXTERIOR for x, y in pts)
            return 0 if hit else F_DIM
        touch = any(
            segments_intersect_any(c1, c2)
            for c1 in lwa
            for c2 in lwb
            if len(c1) >= 2 and len(c2) >= 2
        )
        if not touch:
            return F_DIM
        # collinear shared stretch → 1 (adjacent fine offsets on ∂a)
        offsets = np.linspace(0.05, 0.95, 10)
        for cb in lwb:
            if len(cb) < 2:
                continue
            hit_off = []
            for t in offsets:
                s = cb[:-1] + (cb[1:] - cb[:-1]) * t
                hit_off.append(_locate_many_boundary(ba, s))
            h = np.stack(hit_off)
            if (h[:-1] & h[1:]).any():
                return 1
        return 0

    def _locate_many_boundary(bnd: Geometry, pts: np.ndarray) -> np.ndarray:
        out = np.zeros(len(pts), dtype=bool)
        for i, (x, y) in enumerate(pts):
            out[i] = locate_point(bnd, x, y) != EXTERIOR
        return out

    def dim_BE() -> int:
        # dim(∂a) = 1 for areas, 0 for lines (endpoints)
        if ba is None:
            return F_DIM
        pts = _sample_points(ba)
        loc = _locate_many(b, pts) if len(pts) else np.zeros(0)
        if len(loc) and (loc == EXTERIOR).any():
            return 1 if da == 2 else 0
        return F_DIM

    def dim_EB() -> int:
        if bb_ is None:
            return F_DIM
        pts = _sample_points(bb_)
        loc = _locate_many(a, pts) if len(pts) else np.zeros(0)
        if len(loc) and (loc == EXTERIOR).any():
            return 1 if db == 2 else 0
        return F_DIM

    entries = [
        dim_II(),
        dim_cross(a, bb_, want_interior=True) if bb_ is not None else F_DIM,   # IB
        dim_IE(),
        dim_cross(b, ba, want_interior=True) if ba is not None else F_DIM,     # BI
        dim_BB(),
        dim_BE(),
        dim_EI(),
        dim_EB(),
        2,  # EE
    ]
    return "".join("F" if e == F_DIM else str(e) for e in entries)


def relates(a: Geometry, b: Geometry, mask: str) -> bool:
    """Match a DE-9IM mask (T = any non-empty, F = empty, * = any,
    0/1/2 exact; core.clj:271)."""
    m = relate_matrix(a, b)
    for got, want in zip(m, mask):
        if want == "*":
            continue
        if want == "T" and got == "F":
            return False
        if want == "F" and got != "F":
            return False
        if want in "012" and got != want:
            return False
    return True
