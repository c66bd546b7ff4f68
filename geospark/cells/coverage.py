"""Polygon → covering cell set.

Exact cover at a level: a cell overlaps the polygon iff
  (a) a cell corner is inside/on the polygon, or
  (b) a polygon vertex is inside the cell, or
  (c) a polygon edge intersects the cell rectangle.
All three tests are vectorized over the bbox-candidate cell set.
Optionally compacted (4 siblings → parent) to keep the build-side
small for broadcast joins.
"""

from __future__ import annotations

import numpy as np

from ..geom.core import Geometry
from ..geom.predicates import PreparedPolygon
from .cellid import CellGrid, compact as compact_cells, unpack


def cover_geometry(
    g: Geometry,
    grid: CellGrid,
    level: int,
    exact: bool = True,
    do_compact: bool = False,
) -> np.ndarray:
    """Cells at `level` overlapping geometry g (int64 ids).

    exact=False returns the (conservative) bbox cover — always a
    superset; the join refine step removes false candidates either way.
    """
    env = g.envelope()
    if env is None:
        return np.empty(0, dtype=np.int64)
    cand = grid.cover_bbox(*env, level)
    if not exact or len(cand) <= 4:
        return compact_cells(cand) if do_compact else cand
    keep = _overlap_mask(g, grid, cand, level)
    out = cand[keep]
    return compact_cells(out) if do_compact else out


def _overlap_mask(g: Geometry, grid: CellGrid, cand: np.ndarray, level: int) -> np.ndarray:
    s = grid.cell_size(level)
    _, ix, iy = unpack(cand)
    cxmin = grid.x0 + ix * s
    cymin = grid.y0 + iy * s
    cxmax = cxmin + s
    cymax = cymin + s
    n = len(cand)
    keep = np.zeros(n, dtype=bool)

    pp = PreparedPolygon(g)

    # (a) any cell corner inside/on polygon — 4 vectorized PIP batches
    for dx in (0.0, s):
        for dy in (0.0, s):
            m = ~keep
            if not m.any():
                break
            loc = pp.covers_batch(cxmin[m] + dx, cymin[m] + dy)
            keep[np.nonzero(m)[0][loc]] = True

    # (b) any polygon vertex inside a cell — bucket vertices to cells
    if not keep.all():
        c = g.all_coords()
        if len(c):
            vix = np.floor((c[:, 0] - grid.x0) / s).astype(np.int64)
            viy = np.floor((c[:, 1] - grid.y0) / s).astype(np.int64)
            vkey = vix * (1 << 32) + viy
            ckey = ix * (1 << 32) + iy
            keep |= np.isin(ckey, vkey)

    # (c) polygon edge × cell rectangle intersection (slab test)
    todo = np.nonzero(~keep)[0]
    if len(todo):
        edges = []
        for arr in g.coords_iter():
            if len(arr) >= 2:
                edges.append((arr[:-1], arr[1:]))
        if edges:
            p = np.concatenate([e[0] for e in edges])
            q = np.concatenate([e[1] for e in edges])
            hit = _seg_rect_any(
                p, q, cxmin[todo], cymin[todo], cxmax[todo], cymax[todo]
            )
            keep[todo[hit]] = True
    return keep


def _seg_rect_any(p, q, rxmin, rymin, rxmax, rymax) -> np.ndarray:
    """For each rect, does any segment (p→q) intersect it?  Liang-Barsky
    clip, vectorized (E × R), chunked over edges."""
    nr = len(rxmin)
    out = np.zeros(nr, dtype=bool)
    for s in range(0, len(p), 1024):
        P = p[s : s + 1024]
        Q = q[s : s + 1024]
        x1, y1 = P[:, 0][:, None], P[:, 1][:, None]
        x2, y2 = Q[:, 0][:, None], Q[:, 1][:, None]
        dx = x2 - x1
        dy = y2 - y1
        t0 = np.zeros_like(x1 + rxmin[None, :])
        t1 = np.ones_like(t0)
        ok = np.ones_like(t0, dtype=bool)
        for pcoef, qcoef in (
            (-dx, x1 - rxmin[None, :]),
            (dx, rxmax[None, :] - x1),
            (-dy, y1 - rymin[None, :]),
            (dy, rymax[None, :] - y1),
        ):
            with np.errstate(divide="ignore", invalid="ignore"):
                r = qcoef / np.where(pcoef == 0, 1, pcoef)
            par_out = (pcoef == 0) & (qcoef < 0)
            ok &= ~par_out
            ent = (pcoef < 0)
            t0 = np.where(ok & ent, np.maximum(t0, r), t0)
            t1 = np.where(ok & (pcoef > 0), np.minimum(t1, r), t1)
        hit = ok & (t0 <= t1)
        out |= hit.any(axis=0)
        if out.all():
            break
    return out
