"""Distributed kNN — cell-grid join with ring coverage + exact re-rank.

Reference semantics (index.clj:78-104): candidates are entries whose
*envelope* is within `rng` of the query (rect distance), the best n by
rect distance are kept, then re-sorted by true geometry distance.
The docstring trap (bbox-nearest ≠ geom-nearest for n=1,
index.clj:87-91) is preserved intentionally — we reproduce it.

Distribution: pick the cell level so one k-ring(1) of cells covers
the search disk (cell_size ≥ rng ⇒ the 3×3 neighborhood contains
every envelope within rng of the query point's cell).  Query side
explodes its 9 neighbor cells; build side keys each entry by the
cells its envelope touches at that level; equi-join, dedupe, rank
with a window.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from ..cells.cellid import DEFAULT_GRID, CellGrid, k_ring, pack, unpack
from ..functions import st_envelope
from ..geom import core as gc
from ..geom.predicates import bbox_distance, distance


def knn_join(
    query: DataFrame,
    build: DataFrame,
    n: int,
    rng: float,
    query_id: str = "qid",
    qx: str = "x",
    qy: str = "y",
    build_id: str = "bid",
    build_geom: Optional[str] = None,
    bx: str = "x",
    by: str = "y",
    grid: CellGrid = DEFAULT_GRID,
) -> DataFrame:
    """For each query point: up to n nearest build rows within rng.

    Build side is points (bx/by) or geometries (build_geom WKB).
    Output: (qid, bid, rect_dist, dist, rank) — rank by true distance
    after the rect-distance top-n cut, per reference semantics.
    """
    level = grid.level_for_size(rng)

    @F.pandas_udf(LongType())
    def qcell(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(grid.encode_points(x.to_numpy(np.float64), y.to_numpy(np.float64), level))

    @F.pandas_udf(ArrayType(LongType()))
    def ring1(c: pd.Series) -> pd.Series:
        return c.map(lambda v: k_ring(int(v), 1).tolist())

    q = query.select(
        F.col(query_id).alias("__qid"),
        F.col(qx).alias("__qx"),
        F.col(qy).alias("__qy"),
        F.explode(ring1(qcell(F.col(qx), F.col(qy)))).alias("__cell"),
    )

    if build_geom is not None:
        env = build.select(
            F.col(build_id).alias("__bid"),
            F.col(build_geom).alias("__bwkb"),
            st_envelope(F.col(build_geom)).alias("__env"),
        ).select(
            "__bid",
            "__bwkb",
            F.col("__env.xmin").alias("__xmin"),
            F.col("__env.ymin").alias("__ymin"),
            F.col("__env.xmax").alias("__xmax"),
            F.col("__env.ymax").alias("__ymax"),
        ).where(F.col("__xmin").isNotNull())
    else:
        env = build.select(
            F.col(build_id).alias("__bid"),
            F.col(bx).alias("__xmin"),
            F.col(by).alias("__ymin"),
            F.col(bx).alias("__xmax"),
            F.col(by).alias("__ymax"),
            F.lit(None).cast("binary").alias("__bwkb"),
        )

    @F.pandas_udf(ArrayType(LongType()))
    def env_cells(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.Series:
        out = []
        for a, b, c, d in zip(xmin, ymin, xmax, ymax):
            out.append(grid.cover_bbox(a, b, c, d, level).tolist())
        return pd.Series(out)

    b = env.select(
        "__bid",
        "__bwkb",
        "__xmin",
        "__ymin",
        "__xmax",
        "__ymax",
        F.explode(env_cells("__xmin", "__ymin", "__xmax", "__ymax")).alias("__cell"),
    )

    cand = (
        q.join(b, on="__cell", how="inner")
        .dropDuplicates(["__qid", "__bid"])
        .withColumn(
            "__rect_dist",
            F.sqrt(
                F.pow(
                    F.greatest(
                        F.lit(0.0),
                        F.greatest(F.col("__xmin") - F.col("__qx"), F.col("__qx") - F.col("__xmax")),
                    ),
                    2,
                )
                + F.pow(
                    F.greatest(
                        F.lit(0.0),
                        F.greatest(F.col("__ymin") - F.col("__qy"), F.col("__qy") - F.col("__ymax")),
                    ),
                    2,
                )
            ),
        )
        .where(F.col("__rect_dist") <= rng)
    )

    # rect-distance top-n (the R-tree .nearest cut), then true-distance
    # re-rank (index.clj:102-103)
    w_rect = Window.partitionBy("__qid").orderBy(F.col("__rect_dist").asc(), F.col("__bid").asc())
    cand = cand.withColumn("__rrank", F.row_number().over(w_rect)).where(F.col("__rrank") <= n)

    @F.pandas_udf(DoubleType())
    def true_dist(qx_: pd.Series, qy_: pd.Series, wkb: pd.Series, rect: pd.Series) -> pd.Series:
        out = []
        for x, y, bwkb, rd in zip(qx_, qy_, wkb, rect):
            if bwkb is None:
                out.append(float(rd))  # point build side: rect == true
            else:
                out.append(distance(gc.point(float(x), float(y)), gc.from_wkb(bwkb)))
        return pd.Series(out, dtype="float64")

    cand = cand.withColumn(
        "__dist", true_dist(F.col("__qx"), F.col("__qy"), F.col("__bwkb"), F.col("__rect_dist"))
    )
    w_true = Window.partitionBy("__qid").orderBy(F.col("__dist").asc(), F.col("__bid").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w_true))
        .select(
            F.col("__qid").alias(query_id),
            F.col("__bid").alias(build_id),
            F.col("__rect_dist").alias("rect_dist"),
            F.col("__dist").alias("dist"),
            "rank",
        )
    )
