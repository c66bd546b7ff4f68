"""Linear referencing: length-indexed lines, split-line, cut-line.

Reproduces the reference semantics bit-for-bit (core.clj:526-643):
the golden coordinates (e.g. 1.3333333333333357, core_test.clj:171)
arise from raw segment intersection → length-index projection →
point re-interpolation along the segment; we follow the same three
floating-point steps in the same order.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .core import Geometry, LINESTRING, line_string
from .ops import line_strings_of, linearize


# ---------------------------------------------------------------------------
# exact segment intersection (JTS Intersection.intersection semantics:
# midpoint-conditioned homogeneous coordinates)
# ---------------------------------------------------------------------------

def segment_intersection(p1, p2, q1, q2) -> Optional[Tuple[float, float]]:
    """Intersection point of two properly-intersecting segments, with
    the same conditioning JTS uses (so downstream goldens match)."""
    minX0, maxX0 = min(p1[0], p2[0]), max(p1[0], p2[0])
    minY0, maxY0 = min(p1[1], p2[1]), max(p1[1], p2[1])
    minX1, maxX1 = min(q1[0], q2[0]), max(q1[0], q2[0])
    minY1, maxY1 = min(q1[1], q2[1]), max(q1[1], q2[1])
    midx = (max(minX0, minX1) + min(maxX0, maxX1)) / 2.0
    midy = (max(minY0, minY1) + min(maxY0, maxY1)) / 2.0
    p1x, p1y = p1[0] - midx, p1[1] - midy
    p2x, p2y = p2[0] - midx, p2[1] - midy
    q1x, q1y = q1[0] - midx, q1[1] - midy
    q2x, q2y = q2[0] - midx, q2[1] - midy
    px, py, pw = p1y - p2y, p2x - p1x, p1x * p2y - p2x * p1y
    qx, qy, qw = q1y - q2y, q2x - q1x, q1x * q2y - q2x * q1y
    w = px * qy - qx * py
    if w == 0:
        return None
    x = (py * qw - qy * pw) / w
    y = (qx * pw - px * qw) / w
    if math.isnan(x) or math.isinf(x) or math.isnan(y) or math.isinf(y):
        return None
    return (x + midx, y + midy)


def _collinear_overlap(p1, p2, q1, q2) -> List[Tuple[float, float]]:
    """Endpoints of the overlap of two collinear segments (may be [])."""
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    len2 = dx * dx + dy * dy
    if len2 == 0:
        return []
    pts = []
    for q in (q1, q2):
        t = ((q[0] - p1[0]) * dx + (q[1] - p1[1]) * dy) / len2
        if 0.0 <= t <= 1.0:
            pts.append(tuple(q))
    for p in (p1, p2):
        t = ((p[0] - q1[0]) * (q2[0] - q1[0]) + (p[1] - q1[1]) * (q2[1] - q1[1]))
        l2q = (q2[0] - q1[0]) ** 2 + (q2[1] - q1[1]) ** 2
        if l2q > 0 and 0.0 <= t / l2q <= 1.0:
            pts.append(tuple(p))
    return list(dict.fromkeys(pts))


def line_line_intersection_points(a: np.ndarray, b: np.ndarray) -> List[Tuple[float, float]]:
    """All intersection points of two polylines; a collinear (linear)
    intersection contributes its two endpoints (cut-line contract,
    core.clj:600-606)."""
    out: List[Tuple[float, float]] = []
    for i in range(len(a) - 1):
        p1, p2 = a[i], a[i + 1]
        for j in range(len(b) - 1):
            q1, q2 = b[j], b[j + 1]
            if (
                max(p1[0], p2[0]) < min(q1[0], q2[0])
                or max(q1[0], q2[0]) < min(p1[0], p2[0])
                or max(p1[1], p2[1]) < min(q1[1], q2[1])
                or max(q1[1], q2[1]) < min(p1[1], p2[1])
            ):
                continue
            d1 = _orient(p1, p2, q1)
            d2 = _orient(p1, p2, q2)
            d3 = _orient(q1, q2, p1)
            d4 = _orient(q1, q2, p2)
            if d1 == 0 and d2 == 0:
                out.extend(_collinear_overlap(p1, p2, q1, q2))
                continue
            if ((d1 > 0) != (d2 > 0) or 0 in (d1, d2)) and (
                (d3 > 0) != (d4 > 0) or 0 in (d3, d4)
            ):
                # endpoint-on-segment cases produce the endpoint exactly
                if d1 == 0 and _between(p1, p2, q1):
                    out.append((float(q1[0]), float(q1[1])))
                elif d2 == 0 and _between(p1, p2, q2):
                    out.append((float(q2[0]), float(q2[1])))
                elif d3 == 0 and _between(q1, q2, p1):
                    out.append((float(p1[0]), float(p1[1])))
                elif d4 == 0 and _between(q1, q2, p2):
                    out.append((float(p2[0]), float(p2[1])))
                else:
                    pt = segment_intersection(p1, p2, q1, q2)
                    if pt is not None:
                        out.append(pt)
    return list(dict.fromkeys(out))


def _orient(a, b, c) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _between(a, b, c) -> bool:
    return min(a[0], b[0]) <= c[0] <= max(a[0], b[0]) and min(a[1], b[1]) <= c[1] <= max(
        a[1], b[1]
    )


# ---------------------------------------------------------------------------
# length-indexed line (JTS LengthIndexedLine semantics)
# ---------------------------------------------------------------------------

class LengthIndexedLine:
    def __init__(self, coords: np.ndarray):
        self.c = np.asarray(coords, dtype=np.float64)
        d = np.diff(self.c, axis=0)
        self.seg_len = np.sqrt((d * d).sum(axis=1))
        self.cum = np.concatenate([[0.0], np.cumsum(self.seg_len)])

    @property
    def start_index(self) -> float:
        return 0.0

    @property
    def end_index(self) -> float:
        return float(self.cum[-1])

    def index_of(self, x: float, y: float) -> float:
        """Project the point; index = cumlen(segment) + frac·seglen,
        first nearest segment wins (JTS LocationIndexOfPoint)."""
        best_d2 = math.inf
        best_idx = 0.0
        for i in range(len(self.c) - 1):
            p0, p1 = self.c[i], self.c[i + 1]
            dx, dy = p1[0] - p0[0], p1[1] - p0[1]
            len2 = dx * dx + dy * dy
            if len2 > 0:
                r = ((x - p0[0]) * dx + (y - p0[1]) * dy) / len2
                r = min(1.0, max(0.0, r))
            else:
                r = 0.0
            projx, projy = p0[0] + r * dx, p0[1] + r * dy
            d2 = (x - projx) ** 2 + (y - projy) ** 2
            if d2 < best_d2:
                best_d2 = d2
                best_idx = self.cum[i] + r * self.seg_len[i]
        return float(best_idx)

    def extract_point(self, idx: float) -> Tuple[float, float]:
        if idx <= 0:
            return (float(self.c[0, 0]), float(self.c[0, 1]))
        if idx >= self.cum[-1]:
            return (float(self.c[-1, 0]), float(self.c[-1, 1]))
        i = int(np.searchsorted(self.cum, idx, side="right")) - 1
        i = min(i, len(self.seg_len) - 1)
        frac = (idx - self.cum[i]) / self.seg_len[i] if self.seg_len[i] > 0 else 0.0
        p0, p1 = self.c[i], self.c[i + 1]
        return (p0[0] + frac * (p1[0] - p0[0]), p0[1] + frac * (p1[1] - p0[1]))

    def extract_line(self, i1: float, i2: float) -> np.ndarray:
        """Sub-line between two indices; i1 > i2 reverses orientation
        (JTS LengthIndexedLine.extractLine)."""
        if i1 > i2:
            return self.extract_line(i2, i1)[::-1].copy()
        start = self.extract_point(i1)
        end = self.extract_point(i2)
        pts = [start]
        for k in range(len(self.c)):
            if i1 < self.cum[k] < i2:
                v = (float(self.c[k, 0]), float(self.c[k, 1]))
                if v != pts[-1]:
                    pts.append(v)
        if end != pts[-1] or len(pts) == 1:
            pts.append(end)
        return np.asarray(pts, dtype=np.float64)


# ---------------------------------------------------------------------------
# split-line (core.clj:526-544)
# ---------------------------------------------------------------------------

def split_line(line: Geometry, pt: Geometry) -> List[Geometry]:
    """Split a linestring at the segment nearest to `pt`; the split
    coordinate is the *point's* coordinate (reference behavior)."""
    c = line.parts
    x, y = float(pt.parts[0, 0]), float(pt.parts[0, 1])
    best_d2, best_i = math.inf, 0
    for i in range(len(c) - 1):
        p0, p1 = c[i], c[i + 1]
        dx, dy = p1[0] - p0[0], p1[1] - p0[1]
        len2 = dx * dx + dy * dy
        r = ((x - p0[0]) * dx + (y - p0[1]) * dy) / len2 if len2 > 0 else 0.0
        r = min(1.0, max(0.0, r))
        d2 = (x - (p0[0] + r * dx)) ** 2 + (y - (p0[1] + r * dy)) ** 2
        if d2 < best_d2:
            best_d2, best_i = d2, i
    first = np.vstack([c[: best_i + 1], [[x, y]]])
    second = np.vstack([[[x, y]], c[best_i + 1 :]])
    return [line_string(first, line.srid), line_string(second, line.srid)]


# ---------------------------------------------------------------------------
# cut-line (core.clj:593-643) — bit-exact golden reproduction
# ---------------------------------------------------------------------------

def cut_line(line: Geometry, cutter: Geometry) -> List[Geometry]:
    if line.gtype != LINESTRING:
        raise ValueError("cut_line needs a linestring / linear ring")
    is_ring = line.ring
    lil = LengthIndexedLine(line.parts)
    pts: List[Tuple[float, float]] = []
    for cl in linearize(cutter):
        pts.extend(line_line_intersection_points(line.parts, cl.parts))
    indices = sorted({lil.index_of(x, y) for x, y in pts} | (
        set() if is_ring else {lil.start_index, lil.end_index}
    ))
    # reference maps (next indices) × indices => extract(idx[k+1], idx[k]),
    # i.e. every segment comes out reversed (core.clj:624-627)
    segments = [
        line_string(lil.extract_line(indices[k + 1], indices[k]), line.srid)
        for k in range(len(indices) - 1)
    ]
    if is_ring:
        if not segments:
            return [line]
        from .ops import line_merge

        wrap = line_merge(
            [
                line_string(lil.extract_line(max(indices), lil.end_index)),
                line_string(lil.extract_line(lil.start_index, min(indices))),
            ]
        )[0]
        return [wrap] + segments
    if not segments:
        return [line]
    return segments
