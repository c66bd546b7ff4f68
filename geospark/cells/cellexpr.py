"""Catalyst-native cell-id encoding: the same (morton(ix,iy) << 6) |
level packing as cellid.pack, built from shift/mask Column expressions
so point→cell assignment runs inside whole-stage codegen with no
python worker at all.

Bit-identical to the numpy encoders by construction: the float
pipeline ((x - x0) / span * 2^level, truncate-toward-zero, clip) uses
the same IEEE-754 double operations in the same order, and the Morton
spread uses the same magic-number ladder (cellid._part1by1).
Equivalence is property-tested in tests/test_cells_crs.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .cellid import MAX_LEVEL, CellGrid


def _part1by1_expr(v: Column) -> Column:
    """Spread the low 32 bits of a long across even bit positions."""
    v = v.bitwiseAND(F.lit(0x00000000FFFFFFFF))
    v = (v.bitwiseOR(F.shiftleft(v, 16))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = (v.bitwiseOR(F.shiftleft(v, 8))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = (v.bitwiseOR(F.shiftleft(v, 4))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = (v.bitwiseOR(F.shiftleft(v, 2))).bitwiseAND(F.lit(0x3333333333333333))
    v = (v.bitwiseOR(F.shiftleft(v, 1))).bitwiseAND(F.lit(0x5555555555555555))
    return v


def cell_xy_expr(x: Column, y: Column, level: int, grid: CellGrid) -> tuple:
    """(ix, iy) cell coordinates at `level` — mirrors CellGrid.cell_xy
    exactly: (x - x0)/span * 2^level, truncate toward zero (double→long
    cast, same as numpy .astype), clip to [0, 2^level)."""
    n = 1 << level
    ix = ((x - F.lit(grid.x0)) / F.lit(grid.span) * F.lit(float(n))).cast("long")
    iy = ((y - F.lit(grid.y0)) / F.lit(grid.span) * F.lit(float(n))).cast("long")
    ix = F.least(F.greatest(ix, F.lit(0)), F.lit(n - 1))
    iy = F.least(F.greatest(iy, F.lit(0)), F.lit(n - 1))
    return ix, iy


def cell_id_expr(x: Column, y: Column, level: int, grid: CellGrid) -> Column:
    """Packed Z-order cell id for a point — cellid.pack in Catalyst."""
    if level > MAX_LEVEL:
        raise ValueError(f"cell level {level} > MAX_LEVEL {MAX_LEVEL}")
    ix, iy = cell_xy_expr(x, y, level, grid)
    m = _part1by1_expr(ix).bitwiseOR(F.shiftleft(_part1by1_expr(iy), 1))
    return F.shiftleft(m, 6).bitwiseOR(F.lit(level))


def pip_covers_expr(px: Column, py: Column, edges: Column) -> Column:
    """covers(polygon, point) over an array<struct<x1,y1,x2,y2>> edge
    column — the exact PreparedPolygon._locate_many semantics
    (crossing number with explicit on-segment boundary test) as
    higher-order array expressions.  Identical IEEE double op order to
    the numpy kernel, so results are bit-identical."""

    def on_segment(e):
        cross = (e["x2"] - e["x1"]) * (py - e["y1"]) - (e["y2"] - e["y1"]) * (px - e["x1"])
        return (
            (cross == 0)
            & (px >= F.least(e["x1"], e["x2"]))
            & (px <= F.greatest(e["x1"], e["x2"]))
            & (py >= F.least(e["y1"], e["y2"]))
            & (py <= F.greatest(e["y1"], e["y2"]))
        )

    def crossing(acc, e):
        cond = ((e["y1"] <= py) & (e["y2"] > py)) | ((e["y2"] <= py) & (e["y1"] > py))
        # when cond holds, y1 != y2 — no division by zero
        xint = e["x1"] + (py - e["y1"]) * (e["x2"] - e["x1"]) / (e["y2"] - e["y1"])
        return acc + F.when(cond & (px < xint), F.lit(1)).otherwise(F.lit(0))

    n_cross = F.aggregate(edges, F.lit(0), crossing)
    return F.exists(edges, on_segment) | (n_cross % 2 == 1)
