"""Concave hull by length ratio (reference: concave-hull-of,
core.clj:324-331 via JTS ConcaveHullByLengthRatio).

Algorithm: Bowyer-Watson Delaunay triangulation of the input points,
then erode border triangles whose longest border edge exceeds
  maxLen = minEdge + ratio · (maxEdge − minEdge)
(ratio ∈ [0,1]; 1 → convex hull, 0 → most concave), keeping the
triangulation edge-connected.  Pure numpy/python.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import List, Tuple

import numpy as np

from .core import Geometry, POLYGON, empty, polygon
from .ops import convex_hull


def _delaunay(pts: np.ndarray) -> List[Tuple[int, int, int]]:
    """Bowyer-Watson; returns triangles as vertex index triples."""
    n = len(pts)
    # super-triangle
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 10
    sup = np.array(
        [[cx - 2 * span, cy - span], [cx + 2 * span, cy - span], [cx, cy + 2 * span]]
    )
    P = np.vstack([pts, sup])
    tris = [(n, n + 1, n + 2)]

    def circum(t):
        a, b, c = P[t[0]], P[t[1]], P[t[2]]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        if d == 0:
            return (0.0, 0.0, math.inf)
        ux = (
            (a[0] ** 2 + a[1] ** 2) * (b[1] - c[1])
            + (b[0] ** 2 + b[1] ** 2) * (c[1] - a[1])
            + (c[0] ** 2 + c[1] ** 2) * (a[1] - b[1])
        ) / d
        uy = (
            (a[0] ** 2 + a[1] ** 2) * (c[0] - b[0])
            + (b[0] ** 2 + b[1] ** 2) * (a[0] - c[0])
            + (c[0] ** 2 + c[1] ** 2) * (b[0] - a[0])
        ) / d
        r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        return (ux, uy, r2)

    cc = {tuple(tris[0]): circum(tris[0])}
    for i in range(n):
        px, py = P[i]
        bad = []
        for t in tris:
            ux, uy, r2 = cc[tuple(t)]
            if (px - ux) ** 2 + (py - uy) ** 2 <= r2 * (1 + 1e-12):
                bad.append(t)
        # boundary of the bad cavity
        edge_count = defaultdict(int)
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                edge_count[tuple(sorted(e))] += 1
        for t in bad:
            tris.remove(t)
            cc.pop(tuple(t), None)
        for (u, v), cnt in edge_count.items():
            if cnt == 1:
                nt = (u, v, i)
                tris.append(nt)
                cc[nt] = circum(nt)
    # drop super-triangle triangles
    return [t for t in tris if max(t) < n]


def concave_hull(g: Geometry, length_ratio: float) -> Geometry:
    """Concave hull of g's points; length_ratio ∈ [0, 1]
    (pre-condition as in the reference)."""
    if not (0.0 <= length_ratio <= 1.0):
        raise ValueError("length_ratio must be in [0, 1]")
    pts = np.unique(g.all_coords(), axis=0)
    if len(pts) < 3:
        return convex_hull(g)
    if length_ratio >= 1.0:
        return convex_hull(g)
    tris = _delaunay(pts)
    if not tris:
        return convex_hull(g)

    def elen(u, v):
        return math.hypot(pts[u, 0] - pts[v, 0], pts[u, 1] - pts[v, 1])

    lens = [elen(u, v) for t in tris for u, v in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))]
    lo, hi = min(lens), max(lens)
    max_len = lo + length_ratio * (hi - lo)

    alive = set(range(len(tris)))
    edge_tris = defaultdict(set)
    for ti, t in enumerate(tris):
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edge_tris[tuple(sorted(e))].add(ti)

    def border_edges():
        out = []
        for e, ts in edge_tris.items():
            live = [t for t in ts if t in alive]
            if len(live) == 1:
                out.append((e, live[0]))
        return out

    changed = True
    while changed:
        changed = False
        for e, ti in sorted(
            border_edges(), key=lambda p: -elen(*p[0])
        ):
            if ti not in alive:
                continue
            if elen(*e) <= max_len:
                break
            # erode only if removal keeps every vertex used (no splinters)
            t = tris[ti]
            alive.discard(ti)
            still = set()
            for tj in alive:
                still.update(tris[tj])
            if not set(t) - set(e) <= still | set(e):
                alive.add(ti)
                continue
            changed = True
    if not alive:
        return convex_hull(g)
    # boundary trace of the union of alive triangles
    edge_count = defaultdict(int)
    for ti in alive:
        t = tris[ti]
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edge_count[tuple(sorted(e))] += 1
    border = [e for e, c in edge_count.items() if c == 1]
    nxt = defaultdict(list)
    for u, v in border:
        nxt[u].append(v)
        nxt[v].append(u)
    if not border:
        return convex_hull(g)
    start = border[0][0]
    ring = [start]
    prev = None
    cur = start
    for _ in range(len(border) + 1):
        cands = [w for w in nxt[cur] if w != prev]
        if not cands:
            break
        prev, cur = cur, cands[0]
        ring.append(cur)
        if cur == start:
            break
    if ring[-1] != start:
        return convex_hull(g)
    coords = pts[ring]
    return polygon(coords, srid=g.srid)
