"""Distributed noding — the §2.I Spark mapping.

Two modes:

* ``node_df(..., tiled=False)`` — exact reference semantics
  (noder.clj node/dissolve): all linework in one applyInPandas group.
  Right whenever one network fits one task (the common case: noding
  is per-city/per-network, keyed by a partition column).

* ``node_df(..., tiled=True)`` — scale path: clip lines to Z-order
  tiles, node each tile independently (applyInPandas per tile), then
  dissolve duplicates.  Every segment×segment intersection lies inside
  some tile that contains both clipped pieces, so all crossings are
  noded; the trade-off is extra nodes on tile boundaries (documented —
  they quantize the linework the same way snap-rounding already does).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from ..cells.cellid import DEFAULT_GRID, CellGrid, unpack
from ..geom import core as gc
from ..geom.noding import node_lines

_OUT = StructType(
    [
        StructField("geom", BinaryType()),
        StructField("sources", ArrayType(LongType())),
    ]
)


def node_df(
    lines: DataFrame,
    id_col: str = "line_id",
    geom_col: str = "geom",
    cm_precision: float = 10.0,
    tiled: bool = False,
    tile_level: int = 12,
    grid: CellGrid = DEFAULT_GRID,
    group_col: Optional[str] = None,
) -> DataFrame:
    """Node + dissolve a linework DataFrame → (geom WKB, sources).

    group_col: optional network key — exact reference semantics per
    group, distributed across groups (the usual deployment shape).
    """
    scale = 100.0 / cm_precision

    if not tiled:
        key = group_col
        d = lines.select(
            *( [F.col(group_col)] if group_col else [F.lit(0).alias("__g")] ),
            F.col(id_col).alias("__id"),
            F.col(geom_col).alias("__wkb"),
        )
        gcol = group_col or "__g"

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            arrs = []
            ids = []
            for lid, wkb in zip(pdf["__id"], pdf["__wkb"]):
                g = gc.from_wkb(bytes(wkb))
                from ..geom.ops import linearize

                for l in linearize(g):
                    arrs.append(l.parts)
                    ids.append(int(lid))
            noded = node_lines(arrs, scale)
            rows = []
            for coords, srcs in noded:
                rows.append(
                    (
                        gc.to_wkb(gc.line_string(coords)),
                        sorted({ids[s] for s in srcs}),
                    )
                )
            return pd.DataFrame(rows, columns=["geom", "sources"])

        return d.groupBy(gcol).applyInPandas(run, schema=_OUT)

    # tiled: clip each line to its covering tiles, node per tile
    cell_size = grid.cell_size(tile_level)

    clip_schema = StructType(
        [
            StructField("__tile", LongType()),
            StructField("__id", LongType()),
            StructField("__wkb", BinaryType()),
        ]
    )

    def clip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for lid, wkb in zip(pdf[id_col], pdf[geom_col]):
                g = gc.from_wkb(bytes(wkb))
                from ..geom.ops import linearize

                for l in linearize(g):
                    out.extend(_clip_line_to_tiles(l.parts, int(lid), grid, tile_level))
            if out:
                yield pd.DataFrame(out, columns=["__tile", "__id", "__wkb"])

    clipped = lines.select(F.col(id_col), F.col(geom_col)).mapInPandas(
        clip, schema=clip_schema
    )

    def run_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs, ids = [], []
        for lid, wkb in zip(pdf["__id"], pdf["__wkb"]):
            g = gc.from_wkb(bytes(wkb))
            arrs.append(g.parts)
            ids.append(int(lid))
        noded = node_lines(arrs, scale)
        rows = []
        for coords, srcs in noded:
            rows.append(
                (gc.to_wkb(gc.line_string(coords)), sorted({ids[s] for s in srcs}))
            )
        return pd.DataFrame(rows, columns=["geom", "sources"])

    out = clipped.groupBy("__tile").applyInPandas(run_tile, schema=_OUT)
    # dissolve exact duplicates created by shared tile edges
    return out.dropDuplicates(["geom"])


def _clip_line_to_tiles(c: np.ndarray, lid: int, grid: CellGrid, level: int):
    """Split a polyline wherever it crosses a tile boundary; emit
    (tile, id, wkb) per piece."""
    size = grid.cell_size(level)
    out = []
    cur = [c[0]]
    ix0, iy0 = grid.cell_xy(np.array([c[0, 0]]), np.array([c[0, 1]]), level)
    cur_tile = (int(ix0[0]), int(iy0[0]))
    for i in range(len(c) - 1):
        p, q = c[i], c[i + 1]
        # walk boundary crossings along the segment (param t ascending)
        ts = [1.0]
        for axis, x0 in ((0, grid.x0), (1, grid.y0)):
            a, b = p[axis], q[axis]
            if a == b:
                continue
            ia = int(np.floor((min(a, b) - x0) / size)) + 1
            ib = int(np.floor((max(a, b) - x0) / size))
            for k in range(ia, ib + 1):
                bound = x0 + k * size
                t = (bound - a) / (b - a)
                if 0.0 < t < 1.0:
                    ts.append(float(t))
        prev_pt = p
        for t in sorted(set(ts)):
            pt = (p[0] + (q[0] - p[0]) * t, p[1] + (q[1] - p[1]) * t)
            cur.append(pt)
            if t < 1.0:
                # flush piece, next piece starts at the boundary point
                mid = ((prev_pt[0] + pt[0]) / 2.0, (prev_pt[1] + pt[1]) / 2.0)
                out.append(_emit(cur, mid, lid, grid, level))
                cur = [pt]
            prev_pt = pt
    if len(cur) >= 2:
        mid = (
            (cur[0][0] + cur[1][0]) / 2.0,
            (cur[0][1] + cur[1][1]) / 2.0,
        )
        out.append(_emit(cur, mid, lid, grid, level))
    return out


def _emit(pts, mid, lid, grid, level):
    tile = int(grid.encode_points(np.array([mid[0]]), np.array([mid[1]]), level)[0])
    wkb = gc.to_wkb(gc.line_string(np.asarray(pts, dtype=np.float64)))
    return (tile, lid, wkb)
