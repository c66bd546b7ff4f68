"""Driver-oracle queries for the GEOMETRY CORE — overlay, linear
referencing, polygonize/node, predicate truth tables, reprojection.

Each query runs the real distributed kernels (pandas-UDF stages over
the same geom/* modules the operators use) on inputs constructed with
integer arithmetic, so an exact ANSI-SQL closed form exists for the
DuckDB oracle (driver compares rows + schema + value hash at sf0.01).

Reference semantics verified here:
  overlay       core.clj:401-448 (cg/intersection, difference, ...)
  cut-line      core.clj:593-643
  polygonize    core.clj:566-578, noder.clj:43-88
  predicates    index_test.clj:16-93 truth tables
  reproject     crs_test.clj:41-64
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# WKT/WKB codec roundtrip (§2.B construction & codecs)
# ---------------------------------------------------------------------------

def q_codec_roundtrip(spark, sf_dir) -> DataFrame:
    """WKT → geometry → WKB → geometry → WKT through the real codecs
    (geom/core.py; semantics core.clj read-wkt/write-wkt + the WKB
    codec).  Integer coordinates format identically in both engines;
    WKB byte lengths are closed-form (polygon 9+4+5·16, point 21)."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(
        k.alias("n_nationkey"),
        ((k * 3) % 50).cast("long").alias("x0"),
        ((k * 7) % 50).cast("long").alias("y0"),
        (5 + k % 9).cast("long").alias("s"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("poly_wkt", StringType()),
            StructField("poly_wkb_len", LongType()),
            StructField("point_wkt", StringType()),
            StructField("point_wkb_len", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc

        for pdf in batches:
            rows = []
            for key, x0, y0, s in zip(pdf["n_nationkey"], pdf["x0"], pdf["y0"], pdf["s"]):
                x0, y0, s = int(x0), int(y0), int(s)
                wkt = (
                    f"POLYGON (({x0} {y0}, {x0+s} {y0}, {x0+s} {y0+s}, "
                    f"{x0} {y0+s}, {x0} {y0}))"
                )
                g = gc.from_wkb(gc.to_wkb(gc.from_wkt(wkt)))
                p = gc.from_wkb(gc.to_wkb(gc.point(float(x0), float(y0))))
                rows.append(
                    (
                        key,
                        gc.to_wkt(g),
                        len(gc.to_wkb(g)),
                        gc.to_wkt(p),
                        len(gc.to_wkb(p)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["n_nationkey", "poly_wkt", "poly_wkb_len",
                         "point_wkt", "point_wkb_len"],
            )

    return src.mapInPandas(run, schema=out_schema)


Q_CODEC_SQL = """
WITH p AS (
  SELECT n_nationkey,
         (n_nationkey*3)%50 AS x0, (n_nationkey*7)%50 AS y0,
         5 + n_nationkey%9 AS s
  FROM nation)
SELECT n_nationkey,
       'POLYGON ((' || x0 || ' ' || y0 || ', ' || (x0+s) || ' ' || y0 || ', '
         || (x0+s) || ' ' || (y0+s) || ', ' || x0 || ' ' || (y0+s) || ', '
         || x0 || ' ' || y0 || '))' AS poly_wkt,
       (1 + 4 + 4 + 4 + 5*16)::BIGINT AS poly_wkb_len,
       'POINT (' || x0 || ' ' || y0 || ')' AS point_wkt,
       21::BIGINT AS point_wkb_len
FROM p
"""


# ---------------------------------------------------------------------------
# overlay: intersection / union / difference / sym-difference areas
# ---------------------------------------------------------------------------

def q_overlay_areas(spark, sf_dir) -> DataFrame:
    """Box-pair overlay through the snap-round overlay kernels
    (geom/overlay.py; semantics core.clj:421-448).  Integer-coordinate
    boxes → every area is an exact integer, closed-form in SQL."""
    from .functions import st_geomfromtext

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ax0, ay0 = (k * 7) % 60, (k * 11) % 60
    bx0, by0 = (k * 13) % 60, (k * 17) % 60

    def box_wkt(x0, y0, s):
        return F.format_string(
            "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
            x0, y0, x0 + s, y0, x0 + s, y0 + s, x0, y0 + s, x0, y0,
        )

    src = c.select(
        k.alias("c_custkey"),
        st_geomfromtext(box_wkt(ax0, ay0, 20)).alias("ga"),
        st_geomfromtext(box_wkt(bx0, by0, 25)).alias("gb"),
    )

    out_schema = StructType(
        [
            StructField("c_custkey", src.schema["c_custkey"].dataType),
            StructField("inter_area", DoubleType()),
            StructField("union_area", DoubleType()),
            StructField("diff_area", DoubleType()),
            StructField("symdiff_area", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom import overlay as ov
        from .geom.ops import area

        for pdf in batches:
            ia, ua, da, sa = [], [], [], []
            for wa, wb in zip(pdf["ga"], pdf["gb"]):
                a = gc.from_wkb(wa)
                b = gc.from_wkb(wb)
                ia.append(area(ov.intersection(a, b)))
                ua.append(area(ov.union(a, b)))
                da.append(area(ov.difference(a, b)))
                sa.append(area(ov.sym_difference(a, b)))
            yield pd.DataFrame(
                {
                    "c_custkey": pdf["c_custkey"],
                    "inter_area": np.round(ia, 2),
                    "union_area": np.round(ua, 2),
                    "diff_area": np.round(da, 2),
                    "symdiff_area": np.round(sa, 2),
                }
            )

    return src.mapInPandas(run, schema=out_schema)


Q_OVERLAY_SQL = """
WITH b AS (
  SELECT c_custkey,
         (c_custkey*7)%60  AS ax0, (c_custkey*11)%60 AS ay0,
         (c_custkey*13)%60 AS bx0, (c_custkey*17)%60 AS by0
  FROM customer),
i AS (
  SELECT c_custkey,
         GREATEST(0, LEAST(ax0+20, bx0+25) - GREATEST(ax0, bx0))
         * GREATEST(0, LEAST(ay0+20, by0+25) - GREATEST(ay0, by0)) AS inter
  FROM b)
SELECT c_custkey,
       ROUND(inter::DOUBLE, 2)              AS inter_area,
       ROUND((400 + 625 - inter)::DOUBLE, 2) AS union_area,
       ROUND((400 - inter)::DOUBLE, 2)       AS diff_area,
       ROUND((400 + 625 - 2*inter)::DOUBLE, 2) AS symdiff_area
FROM i
"""


# ---------------------------------------------------------------------------
# cut-line: linear referencing on axis-parallel integer polylines
# ---------------------------------------------------------------------------

def q_cut_line(spark, sf_dir) -> DataFrame:
    """cut_line (geom/linear.py:219; semantics core.clj:593-643) on an
    L-shaped polyline (0,0)→(L,0)→(L,M) cut by a vertical line x=c and
    a horizontal line y=d → exactly 3 pieces with integer lengths
    (c, L-c+d, M-d) in order along the line."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    L = 10 + (k * 3) % 15
    M = 5 + (k * 7) % 10
    c = 1 + (k * 5) % (L - 1)
    d = 1 + (k * 11) % (M - 1)
    src = n.select(
        k.alias("n_nationkey"),
        L.cast("long").alias("L"),
        M.cast("long").alias("M"),
        c.cast("long").alias("c"),
        d.cast("long").alias("d"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("n_pieces", LongType()),
            StructField("len1", DoubleType()),
            StructField("len2", DoubleType()),
            StructField("len3", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.linear import cut_line
        from .geom.ops import length as glen

        for pdf in batches:
            rows = []
            for key, L_, M_, c_, d_ in zip(
                pdf["n_nationkey"], pdf["L"], pdf["M"], pdf["c"], pdf["d"]
            ):
                line = gc.line_string([(0.0, 0.0), (float(L_), 0.0), (float(L_), float(M_))])
                cutter = gc.multi_line_string(
                    [
                        [(float(c_), -1.0), (float(c_), float(M_) + 1.0)],
                        [(-1.0, float(d_)), (float(L_) + 1.0, float(d_))],
                    ]
                )
                pieces = cut_line(line, cutter)
                lens = [round(glen(p), 6) for p in pieces]
                while len(lens) < 3:
                    lens.append(float("nan"))
                rows.append((key, len(pieces), lens[0], lens[1], lens[2]))
            yield pd.DataFrame(
                rows, columns=["n_nationkey", "n_pieces", "len1", "len2", "len3"]
            )

    return src.mapInPandas(run, schema=out_schema)


Q_CUT_LINE_SQL = """
WITH p AS (
  SELECT n_nationkey,
         10 + (n_nationkey*3)%15 AS L,
         5  + (n_nationkey*7)%10 AS M
  FROM nation),
q AS (
  SELECT n_nationkey, L, M,
         1 + (n_nationkey*5)  % (L-1) AS c,
         1 + (n_nationkey*11) % (M-1) AS d
  FROM p)
SELECT n_nationkey,
       3::BIGINT AS n_pieces,
       ROUND(c::DOUBLE, 6)           AS len1,
       ROUND((L - c + d)::DOUBLE, 6) AS len2,
       ROUND((M - d)::DOUBLE, 6)     AS len3
FROM q
"""


# ---------------------------------------------------------------------------
# polygonize: face extraction from a noded integer grid
# ---------------------------------------------------------------------------

def q_polygonize(spark, sf_dir) -> DataFrame:
    """Snap-round noding + polygonization (geom/noding.py:220,373;
    semantics noder.clj:43-88, core.clj:566-578) of an nx×ny unit grid
    of crossing lines → nx·ny unit faces."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(
        k.alias("n_nationkey"),
        (2 + k % 4).cast("long").alias("nx"),
        (2 + k % 3).cast("long").alias("ny"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("n_faces", LongType()),
            StructField("total_area", DoubleType()),
            StructField("total_perimeter", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.noding import polygonize
        from .geom.ops import area, length as glen

        for pdf in batches:
            rows = []
            for key, nx, ny in zip(pdf["n_nationkey"], pdf["nx"], pdf["ny"]):
                nx, ny = int(nx), int(ny)
                paths = [
                    gc.line_string([(float(i), 0.0), (float(i), float(ny))])
                    for i in range(nx + 1)
                ] + [
                    gc.line_string([(0.0, float(j)), (float(nx), float(j))])
                    for j in range(ny + 1)
                ]
                faces = polygonize(paths)
                rows.append(
                    (
                        key,
                        len(faces),
                        round(sum(area(f) for f in faces), 6),
                        round(sum(glen(f) for f in faces), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["n_nationkey", "n_faces", "total_area", "total_perimeter"],
            )

    return src.mapInPandas(run, schema=out_schema)


Q_POLYGONIZE_SQL = """
SELECT n_nationkey,
       ((2 + n_nationkey%4) * (2 + n_nationkey%3))::BIGINT AS n_faces,
       ROUND(((2 + n_nationkey%4) * (2 + n_nationkey%3))::DOUBLE, 6) AS total_area,
       ROUND((4 * (2 + n_nationkey%4) * (2 + n_nationkey%3))::DOUBLE, 6) AS total_perimeter
FROM nation
"""


# ---------------------------------------------------------------------------
# unary measures & inspection: area/length/centroid/MBC/envelope
# ---------------------------------------------------------------------------

def q_measures_box(spark, sf_dir) -> DataFrame:
    """§2.C/§2.E measures through the real kernels — area, perimeter,
    centroid, minimum bounding circle (Welzl), envelope — on nation
    boxes; every value closed-form (radius = 1250·√2 is the same IEEE
    double in both engines)."""
    n = _t(spark, sf_dir, "nation")
    from .functions import st_geomfromtext

    k = F.col("n_nationkey")
    x0 = (k * 773) % 18000
    y0 = (k * 1571) % 18000
    wkt = F.format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        x0, y0, x0 + 2500, y0, x0 + 2500, y0 + 2500, x0, y0 + 2500, x0, y0,
    )
    src = n.select(k.alias("n_nationkey"), st_geomfromtext(wkt).alias("geom"))
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("area", DoubleType()),
            StructField("perimeter", DoubleType()),
            StructField("cx", DoubleType()),
            StructField("cy", DoubleType()),
            StructField("mbc_r", DoubleType()),
            StructField("env_xmin", DoubleType()),
            StructField("env_ymax", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.ops import area, centroid, length, minimum_bounding_circle

        for pdf in batches:
            rows = []
            for key, wkb in zip(pdf["n_nationkey"], pdf["geom"]):
                g = gc.from_wkb(wkb)
                c = centroid(g)
                cx, cy = float(c.parts[0, 0]), float(c.parts[0, 1])
                _, _, r = minimum_bounding_circle(g)
                env = g.envelope()
                rows.append(
                    (
                        key,
                        round(area(g), 6),
                        round(length(g), 6),
                        round(cx, 6),
                        round(cy, 6),
                        round(r, 6),
                        env[0],
                        env[3],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["n_nationkey", "area", "perimeter", "cx", "cy",
                         "mbc_r", "env_xmin", "env_ymax"],
            )

    return src.mapInPandas(run, schema=out_schema)


Q_MEASURES_SQL = """
SELECT n_nationkey,
       ROUND(6250000.0, 6) AS area,
       ROUND(10000.0, 6) AS perimeter,
       ROUND(((n_nationkey*773)%18000) + 1250.0, 6) AS cx,
       ROUND(((n_nationkey*1571)%18000) + 1250.0, 6) AS cy,
       ROUND(1250.0 * sqrt(2.0), 6) AS mbc_r,
       ((n_nationkey*773)%18000)::DOUBLE AS env_xmin,
       (((n_nationkey*1571)%18000) + 2500)::DOUBLE AS env_ymax
FROM nation
"""


# ---------------------------------------------------------------------------
# convex hull over constructed point clouds
# ---------------------------------------------------------------------------

def q_hull_points(spark, sf_dir) -> DataFrame:
    """Convex hull (monotone chain) of a box's 4 corners plus strictly
    interior points — hull is exactly the box (area s², 4 vertices)."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(k.alias("n_nationkey"), (10 + k % 7).cast("long").alias("s"))
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("hull_area", DoubleType()),
            StructField("hull_vertices", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.ops import area, convex_hull

        for pdf in batches:
            rows = []
            for key, s in zip(pdf["n_nationkey"], pdf["s"]):
                s = int(s)
                pts = [(0.0, 0.0), (float(s), 0.0), (float(s), float(s)), (0.0, float(s))]
                pts += [
                    (1.0 + (key * 3 + i) % (s - 1), 1.0 + (key * 7 + i) % (s - 1))
                    for i in range(12)
                ]
                hull = convex_hull(gc.multi_point(pts))
                # shell ring: closed → vertices = len - 1
                rows.append((key, round(area(hull), 6), len(hull.parts[0]) - 1))
            yield pd.DataFrame(rows, columns=["n_nationkey", "hull_area", "hull_vertices"])

    return src.mapInPandas(run, schema=out_schema)


Q_HULL_SQL = """
SELECT n_nationkey,
       ROUND(((10 + n_nationkey%7) * (10 + n_nationkey%7))::DOUBLE, 6) AS hull_area,
       4::BIGINT AS hull_vertices
FROM nation
"""


# ---------------------------------------------------------------------------
# negative buffer + make-valid on a bowtie
# ---------------------------------------------------------------------------

def q_valid_buffer(spark, sf_dir) -> DataFrame:
    """Negative buffer erosion of a box (→ (s-2d)² exactly) and
    make_valid of a self-intersecting bowtie (→ two triangles, s²/2)
    through the real kernels."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(k.alias("n_nationkey"), (20 + 2 * (k % 5)).cast("long").alias("s"))
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("eroded_area", DoubleType()),
            StructField("bowtie_area", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.buffer import buffer
        from .geom.ops import area
        from .geom.overlay import make_valid

        for pdf in batches:
            rows = []
            for key, s in zip(pdf["n_nationkey"], pdf["s"]):
                s = float(int(s))
                box = gc.from_wkt(
                    f"POLYGON ((0 0, {s} 0, {s} {s}, 0 {s}, 0 0))"
                )
                eroded = buffer(box, -2.0, quad_segs=4)
                bowtie = gc.Geometry(
                    gc.POLYGON,
                    [np.array([[0, 0], [s, s], [s, 0], [0, s], [0, 0]], dtype=np.float64)],
                )
                fixed = make_valid(bowtie)
                rows.append((key, round(area(eroded), 6), round(area(fixed), 6)))
            yield pd.DataFrame(rows, columns=["n_nationkey", "eroded_area", "bowtie_area"])

    return src.mapInPandas(run, schema=out_schema)


Q_VALID_BUFFER_SQL = """
SELECT n_nationkey,
       ROUND(((20 + 2*(n_nationkey%5)) - 4.0) * ((20 + 2*(n_nationkey%5)) - 4.0), 6) AS eroded_area,
       ROUND((20 + 2*(n_nationkey%5)) * (20 + 2*(n_nationkey%5)) / 2.0, 6) AS bowtie_area
FROM nation
"""


# ---------------------------------------------------------------------------
# linear referencing: along-line interpolation, densify, split
# ---------------------------------------------------------------------------

def q_linear_refs(spark, sf_dir) -> DataFrame:
    """Length-indexed interpolation at half length, densify vertex
    count, and split-at-point on the L-shaped integer polyline —
    closed-form in SQL (geom/linear.py LengthIndexedLine/split_line,
    geom/ops.py densify; semantics core.clj:526-544, 661-670)."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(
        k.alias("n_nationkey"),
        (10 + (k * 3) % 15).cast("long").alias("L"),
        (5 + (k * 7) % 10).cast("long").alias("M"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("mid_x", DoubleType()),
            StructField("mid_y", DoubleType()),
            StructField("densify_pts", LongType()),
            StructField("split_parts", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.linear import LengthIndexedLine, split_line
        from .geom.ops import densify

        for pdf in batches:
            rows = []
            for key, L, M in zip(pdf["n_nationkey"], pdf["L"], pdf["M"]):
                L, M = float(int(L)), float(int(M))
                line = gc.line_string([(0.0, 0.0), (L, 0.0), (L, M)])
                lil = LengthIndexedLine(line.parts)
                mx, my = lil.extract_point((L + M) / 2.0)
                dens = densify(line, 1.0)
                parts = split_line(line, gc.point(L, 0.0))
                rows.append(
                    (key, round(mx, 6), round(my, 6), len(dens.parts), len(parts))
                )
            yield pd.DataFrame(
                rows,
                columns=["n_nationkey", "mid_x", "mid_y", "densify_pts", "split_parts"],
            )

    return src.mapInPandas(run, schema=out_schema)


Q_LINEAR_REFS_SQL = """
WITH p AS (
  SELECT n_nationkey,
         (10 + (n_nationkey*3)%15)::DOUBLE AS L,
         (5 + (n_nationkey*7)%10)::DOUBLE AS M
  FROM nation)
SELECT n_nationkey,
       ROUND(CASE WHEN (L+M)/2 <= L THEN (L+M)/2 ELSE L END, 6) AS mid_x,
       ROUND(CASE WHEN (L+M)/2 <= L THEN 0.0 ELSE (L+M)/2 - L END, 6) AS mid_y,
       (L + M + 1)::BIGINT AS densify_pts,
       2::BIGINT AS split_parts
FROM p
"""


# ---------------------------------------------------------------------------
# noder: snap-round noding of crossing linework
# ---------------------------------------------------------------------------

def q_node_grid(spark, sf_dir) -> DataFrame:
    """node() (geom/noding.py:373; semantics noder.clj:43-88) on
    crossing grid lines: every crossing becomes a node, so an nx×ny
    unit grid dissolves into (nx+1)·ny + (ny+1)·nx unit substrings."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(
        k.alias("n_nationkey"),
        (2 + k % 4).cast("long").alias("nx"),
        (2 + k % 3).cast("long").alias("ny"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("n_segments", LongType()),
            StructField("total_length", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.noding import node
        from .geom.ops import length as glen

        for pdf in batches:
            rows = []
            for key, nx, ny in zip(pdf["n_nationkey"], pdf["nx"], pdf["ny"]):
                nx, ny = int(nx), int(ny)
                paths = [
                    gc.line_string([(float(i), 0.0), (float(i), float(ny))])
                    for i in range(nx + 1)
                ] + [
                    gc.line_string([(0.0, float(j)), (float(nx), float(j))])
                    for j in range(ny + 1)
                ]
                noded = node(paths)
                rows.append(
                    (key, len(noded), round(sum(glen(g) for g, _ in noded), 6))
                )
            yield pd.DataFrame(rows, columns=["n_nationkey", "n_segments", "total_length"])

    return src.mapInPandas(run, schema=out_schema)


Q_NODE_GRID_SQL = """
SELECT n_nationkey,
       ((2 + n_nationkey%4 + 1) * (2 + n_nationkey%3)
        + (2 + n_nationkey%3 + 1) * (2 + n_nationkey%4))::BIGINT AS n_segments,
       ROUND(((2 + n_nationkey%4 + 1) * (2 + n_nationkey%3)
        + (2 + n_nationkey%3 + 1) * (2 + n_nationkey%4))::DOUBLE, 6) AS total_length
FROM nation
"""


# ---------------------------------------------------------------------------
# cut-polygon: face extraction of a box cut by a vertical + horizontal line
# ---------------------------------------------------------------------------

def q_cut_polygon(spark, sf_dir) -> DataFrame:
    """cut_polygon (geom/noding.py:309; semantics core.clj:580-591):
    an s×s box cut by x=c and y=d → 4 rectangular faces with closed-
    form areas (sorted ascending so the oracle is order-free)."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    s = (10 + 2 * (k % 5)).cast("long")
    src = n.select(
        k.alias("n_nationkey"),
        s.alias("s"),
        (1 + (k * 3) % (s - 1)).cast("long").alias("c"),
        (1 + (k * 7) % (s - 1)).cast("long").alias("d"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("n_faces", LongType()),
            StructField("a1", DoubleType()),
            StructField("a2", DoubleType()),
            StructField("a3", DoubleType()),
            StructField("a4", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.noding import cut_polygon
        from .geom.ops import area

        for pdf in batches:
            rows = []
            for key, s_, c_, d_ in zip(pdf["n_nationkey"], pdf["s"], pdf["c"], pdf["d"]):
                s_, c_, d_ = float(int(s_)), float(int(c_)), float(int(d_))
                box = gc.from_wkt(
                    f"POLYGON ((0 0, {s_} 0, {s_} {s_}, 0 {s_}, 0 0))"
                )
                cutters = [
                    gc.line_string([(c_, -1.0), (c_, s_ + 1.0)]),
                    gc.line_string([(-1.0, d_), (s_ + 1.0, d_)]),
                ]
                faces = cut_polygon(box, cutters)
                areas = sorted(round(area(f), 6) for f in faces)
                while len(areas) < 4:
                    areas.append(float("nan"))
                rows.append((key, len(faces), areas[0], areas[1], areas[2], areas[3]))
            yield pd.DataFrame(
                rows, columns=["n_nationkey", "n_faces", "a1", "a2", "a3", "a4"]
            )

    return src.mapInPandas(run, schema=out_schema)


Q_CUT_POLYGON_SQL = """
WITH p AS (
  SELECT n_nationkey,
         (10 + 2*(n_nationkey%5))::DOUBLE AS s,
         (1 + (n_nationkey*3) % (10 + 2*(n_nationkey%5) - 1))::DOUBLE AS c,
         (1 + (n_nationkey*7) % (10 + 2*(n_nationkey%5) - 1))::DOUBLE AS d
  FROM nation),
f AS (
  SELECT n_nationkey,
         [c*d, (s-c)*d, c*(s-d), (s-c)*(s-d)] AS areas
  FROM p),
srt AS (SELECT n_nationkey, list_sort(areas) AS a FROM f)
SELECT n_nationkey, 4::BIGINT AS n_faces,
       ROUND(a[1], 6) AS a1, ROUND(a[2], 6) AS a2,
       ROUND(a[3], 6) AS a3, ROUND(a[4], 6) AS a4
FROM srt
"""


# ---------------------------------------------------------------------------
# predicate truth table over constructed boxes
# ---------------------------------------------------------------------------

def q_predicates_box(spark, sf_dir) -> DataFrame:
    """All five binary predicates via the exact kernels
    (geom/predicates.py; truth tables index_test.clj:16-93) over
    625 box pairs covering disjoint / touch / overlap / contain."""
    from .functions import st_geomfromtext

    n = _t(spark, sf_dir, "nation")

    def boxes(key_alias, mulx, muly, sizes):
        k = F.col("n_nationkey")
        x0 = (k * mulx) % 20
        y0 = (k * muly) % 20
        s = sizes[0] + sizes[1] * (k % sizes[2])
        wkt = F.format_string(
            "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
            x0, y0, x0 + s, y0, x0 + s, y0 + s, x0, y0 + s, x0, y0,
        )
        return n.select(k.alias(key_alias), st_geomfromtext(wkt).alias(f"g_{key_alias}"))

    A = boxes("a_key", 3, 7, (5, 5, 3))
    B = boxes("b_key", 9, 13, (5, 5, 2))
    src = A.crossJoin(B)
    out_schema = StructType(
        [
            StructField("a_key", src.schema["a_key"].dataType),
            StructField("b_key", src.schema["b_key"].dataType),
            StructField("p_intersects", BooleanType()),
            StructField("p_touches", BooleanType()),
            StructField("p_overlaps", BooleanType()),
            StructField("p_covers", BooleanType()),
            StructField("p_contains", BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom import predicates as gp

        for pdf in batches:
            rows = []
            for ak, bk, wa, wb in zip(
                pdf["a_key"], pdf["b_key"], pdf["g_a_key"], pdf["g_b_key"]
            ):
                a = gc.from_wkb(wa)
                b = gc.from_wkb(wb)
                rows.append(
                    (
                        ak,
                        bk,
                        gp.intersects(a, b),
                        gp.touches(a, b),
                        gp.overlaps(a, b),
                        gp.covers(a, b),
                        gp.contains(a, b),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "a_key",
                    "b_key",
                    "p_intersects",
                    "p_touches",
                    "p_overlaps",
                    "p_covers",
                    "p_contains",
                ],
            )

    return src.mapInPandas(run, schema=out_schema)


Q_PREDICATES_SQL = """
WITH a AS (
  SELECT n_nationkey AS a_key,
         (n_nationkey*3)%20 AS x0, (n_nationkey*7)%20 AS y0,
         5 + 5*(n_nationkey%3) AS s
  FROM nation),
b AS (
  SELECT n_nationkey AS b_key,
         (n_nationkey*9)%20 AS x0, (n_nationkey*13)%20 AS y0,
         5 + 5*(n_nationkey%2) AS s
  FROM nation),
p AS (
  SELECT a.a_key, b.b_key,
         a.x0 AS ax0, a.y0 AS ay0, a.x0+a.s AS ax1, a.y0+a.s AS ay1,
         b.x0 AS bx0, b.y0 AS by0, b.x0+b.s AS bx1, b.y0+b.s AS by1
  FROM a, b),
r AS (
  SELECT a_key, b_key,
         (ax0 <= bx1 AND bx0 <= ax1 AND ay0 <= by1 AND by0 <= ay1) AS closed_int,
         (ax0 <  bx1 AND bx0 <  ax1 AND ay0 <  by1 AND by0 <  ay1) AS open_int,
         (bx0 >= ax0 AND bx1 <= ax1 AND by0 >= ay0 AND by1 <= ay1) AS a_covers_b,
         (ax0 >= bx0 AND ax1 <= bx1 AND ay0 >= by0 AND ay1 <= by1) AS b_covers_a
  FROM p)
SELECT a_key, b_key,
       closed_int AS p_intersects,
       (closed_int AND NOT open_int) AS p_touches,
       (open_int AND NOT a_covers_b AND NOT b_covers_a) AS p_overlaps,
       a_covers_b AS p_covers,
       a_covers_b AS p_contains
FROM r
"""


# ---------------------------------------------------------------------------
# DE-9IM relate over constructed boxes
# ---------------------------------------------------------------------------

def q_relate_box(spark, sf_dir) -> DataFrame:
    """Full DE-9IM matrices via the real relate kernel
    (geom/relate.py:60; semantics core.clj relates?/JTS relate) over
    the same 625 box pairs as predicates_box.  For axis-aligned boxes
    every matrix entry has a closed form (interval case analysis), so
    the oracle reproduces the 9-char string exactly."""
    from .functions import st_geomfromtext

    n = _t(spark, sf_dir, "nation")

    def boxes(key_alias, mulx, muly, sizes):
        k = F.col("n_nationkey")
        x0 = (k * mulx) % 20
        y0 = (k * muly) % 20
        s = sizes[0] + sizes[1] * (k % sizes[2])
        wkt = F.format_string(
            "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
            x0, y0, x0 + s, y0, x0 + s, y0 + s, x0, y0 + s, x0, y0,
        )
        return n.select(k.alias(key_alias), st_geomfromtext(wkt).alias(f"g_{key_alias}"))

    src = boxes("a_key", 3, 7, (5, 5, 3)).crossJoin(boxes("b_key", 9, 13, (5, 5, 2)))
    out_schema = StructType(
        [
            StructField("a_key", src.schema["a_key"].dataType),
            StructField("b_key", src.schema["b_key"].dataType),
            StructField("de9im", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.relate import relate_matrix

        for pdf in batches:
            rows = [
                (ak, bk, relate_matrix(gc.from_wkb(wa), gc.from_wkb(wb)))
                for ak, bk, wa, wb in zip(
                    pdf["a_key"], pdf["b_key"], pdf["g_a_key"], pdf["g_b_key"]
                )
            ]
            yield pd.DataFrame(rows, columns=["a_key", "b_key", "de9im"])

    return src.mapInPandas(run, schema=out_schema)


Q_RELATE_SQL = """
WITH a AS (
  SELECT n_nationkey AS a_key,
         (n_nationkey*3)%20 AS x0, (n_nationkey*7)%20 AS y0,
         5 + 5*(n_nationkey%3) AS s
  FROM nation),
b AS (
  SELECT n_nationkey AS b_key,
         (n_nationkey*9)%20 AS x0, (n_nationkey*13)%20 AS y0,
         5 + 5*(n_nationkey%2) AS s
  FROM nation),
p AS (
  SELECT a.a_key, b.b_key,
         a.x0 AS ax0, a.y0 AS ay0, a.x0+a.s AS ax1, a.y0+a.s AS ay1,
         b.x0 AS bx0, b.y0 AS by0, b.x0+b.s AS bx1, b.y0+b.s AS by1
  FROM a, b),
r AS (
  SELECT *,
    (ax0 <= bx1 AND bx0 <= ax1 AND ay0 <= by1 AND by0 <= ay1) AS ix,
    (ax0 <  bx1 AND bx0 <  ax1 AND ay0 <  by1 AND by0 <  ay1) AS ox,
    (ax0 >= bx0 AND ax1 <= bx1 AND ay0 >= by0 AND ay1 <= by1) AS a_in_b,
    (bx0 >= ax0 AND bx1 <= ax1 AND by0 >= ay0 AND by1 <= ay1) AS b_in_a,
    (ax0 >  bx0 AND ax1 <  bx1 AND ay0 >  by0 AND ay1 <  by1) AS a_strict_in_b,
    (bx0 >  ax0 AND bx1 <  ax1 AND by0 >  ay0 AND by1 <  ay1) AS b_strict_in_a,
    (GREATEST(ay0, by0) < LEAST(ay1, by1)) AS oy_open,
    (GREATEST(ax0, bx0) < LEAST(ax1, bx1)) AS ox_open,
    -- a boundary edge of B strictly inside A's interior (and vice versa)
    (((bx0 > ax0 AND bx0 < ax1) OR (bx1 > ax0 AND bx1 < ax1)) AND GREATEST(ay0, by0) < LEAST(ay1, by1)
     OR ((by0 > ay0 AND by0 < ay1) OR (by1 > ay0 AND by1 < ay1)) AND GREATEST(ax0, bx0) < LEAST(ax1, bx1)) AS ib,
    (((ax0 > bx0 AND ax0 < bx1) OR (ax1 > bx0 AND ax1 < bx1)) AND GREATEST(ay0, by0) < LEAST(ay1, by1)
     OR ((ay0 > by0 AND ay0 < by1) OR (ay1 > by0 AND ay1 < by1)) AND GREATEST(ax0, bx0) < LEAST(ax1, bx1)) AS bi,
    -- collinear boundary edges sharing a positive-length segment
    (((ax0 = bx0 OR ax0 = bx1 OR ax1 = bx0 OR ax1 = bx1) AND LEAST(ay1, by1) > GREATEST(ay0, by0))
     OR ((ay0 = by0 OR ay0 = by1 OR ay1 = by0 OR ay1 = by1) AND LEAST(ax1, bx1) > GREATEST(ax0, bx0))) AS bb_seg
  FROM p)
SELECT a_key, b_key,
  (CASE WHEN ox THEN '2' ELSE 'F' END)
  || (CASE WHEN ib THEN '1' ELSE 'F' END)
  || (CASE WHEN a_in_b THEN 'F' ELSE '2' END)
  || (CASE WHEN bi THEN '1' ELSE 'F' END)
  || (CASE WHEN bb_seg THEN '1'
           WHEN ix AND NOT a_strict_in_b AND NOT b_strict_in_a THEN '0'
           ELSE 'F' END)
  || (CASE WHEN a_in_b THEN 'F' ELSE '1' END)
  || (CASE WHEN b_in_a THEN 'F' ELSE '2' END)
  || (CASE WHEN b_in_a THEN 'F' ELSE '1' END)
  || '2' AS de9im
FROM r
"""


# ---------------------------------------------------------------------------
# DE-9IM relate for point+line GeometryCollections vs boxes (round 5:
# the sampling-free low-dim path, union semantics)
# ---------------------------------------------------------------------------

def q_relate_low(spark, sf_dir) -> DataFrame:
    """DE-9IM matrices of GEOMETRYCOLLECTION(vertical segment, point)
    operands against axis-aligned boxes through the real relate kernel
    (geom/relate.py:_relate_area_low transposed; union semantics —
    explicit point elements are interior-wins, JTS RelateNG GC rule;
    reference: classic JTS RelateOp REJECTS GC operands, core.clj:271
    relates? would throw — this engine computes them exactly).

    Every fourth A snaps its point onto the segment's bottom endpoint,
    removing that endpoint from ∂A (interior-wins) — the oracle
    reproduces each of the 9 entries by interval case analysis on the
    lattice, so the driver grades the new exact path hash-exact."""
    from .functions import st_geomfromtext

    n = _t(spark, sf_dir, "nation")

    k = F.col("n_nationkey")
    a_rows = n.select(
        k.alias("a_key"),
        ((k * 3) % 20).alias("lx"),
        ((k * 7) % 20).alias("ly0"),
        ((k * 7) % 20 + 4).alias("ly1"),
        F.when(k % 4 == 0, (k * 3) % 20).otherwise((k * 11) % 20).alias("px"),
        F.when(k % 4 == 0, (k * 7) % 20).otherwise((k * 5) % 20).alias("py"),
    )
    a = a_rows.select(
        "a_key",
        st_geomfromtext(
            F.format_string(
                "GEOMETRYCOLLECTION (LINESTRING (%d %d, %d %d), POINT (%d %d))",
                F.col("lx"), F.col("ly0"), F.col("lx"), F.col("ly1"),
                F.col("px"), F.col("py"),
            )
        ).alias("g_a"),
    )
    kb = F.col("n_nationkey")
    b = n.select(
        kb.alias("b_key"),
        st_geomfromtext(
            F.format_string(
                "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
                (kb * 9) % 20, (kb * 13) % 20,
                (kb * 9) % 20 + 5 + 5 * (kb % 2), (kb * 13) % 20,
                (kb * 9) % 20 + 5 + 5 * (kb % 2), (kb * 13) % 20 + 5 + 5 * (kb % 2),
                (kb * 9) % 20, (kb * 13) % 20 + 5 + 5 * (kb % 2),
                (kb * 9) % 20, (kb * 13) % 20,
            )
        ).alias("g_b"),
    )
    src = a.crossJoin(b)
    out_schema = StructType(
        [
            StructField("a_key", src.schema["a_key"].dataType),
            StructField("b_key", src.schema["b_key"].dataType),
            StructField("de9im", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.relate import relate_matrix

        for pdf in batches:
            rows = [
                (ak, bk, relate_matrix(gc.from_wkb(wa), gc.from_wkb(wb)))
                for ak, bk, wa, wb in zip(
                    pdf["a_key"], pdf["b_key"], pdf["g_a"], pdf["g_b"]
                )
            ]
            yield pd.DataFrame(rows, columns=["a_key", "b_key", "de9im"])

    return src.mapInPandas(run, schema=out_schema)


Q_RELATE_LOW_SQL = """
WITH a AS (
  SELECT n_nationkey AS a_key,
         (n_nationkey*3)%20 AS lx,
         (n_nationkey*7)%20 AS y0,
         (n_nationkey*7)%20 + 4 AS y1,
         CASE WHEN n_nationkey%4=0 THEN (n_nationkey*3)%20 ELSE (n_nationkey*11)%20 END AS px,
         CASE WHEN n_nationkey%4=0 THEN (n_nationkey*7)%20 ELSE (n_nationkey*5)%20 END AS py
  FROM nation),
b AS (
  SELECT n_nationkey AS b_key,
         (n_nationkey*9)%20 AS bx0, (n_nationkey*13)%20 AS by0,
         (n_nationkey*9)%20 + 5 + 5*(n_nationkey%2) AS bx1,
         (n_nationkey*13)%20 + 5 + 5*(n_nationkey%2) AS by1
  FROM nation),
p AS (SELECT * FROM a, b),
r AS (
  SELECT a_key, b_key,
    -- P location against the box
    (px > bx0 AND px < bx1 AND py > by0 AND py < by1) AS p_in,
    (px >= bx0 AND px <= bx1 AND py >= by0 AND py <= by1
      AND (px = bx0 OR px = bx1 OR py = by0 OR py = by1)) AS p_on,
    NOT (px >= bx0 AND px <= bx1 AND py >= by0 AND py <= by1) AS p_out,
    -- open-stretch overlaps of the vertical segment x=lx, y in [y0,y1]
    (lx > bx0 AND lx < bx1 AND LEAST(y1, by1) > GREATEST(y0, by0)) AS seg_in_open,
    ((lx = bx0 OR lx = bx1) AND LEAST(y1, by1) > GREATEST(y0, by0)) AS seg_on_edge,
    -- 0-dim boundary touches of the segment INTERIOR (strict y0<.<y1)
    ((lx > bx0 AND lx < bx1 AND ((y0 < by0 AND by0 < y1) OR (y0 < by1 AND by1 < y1)))
     OR ((lx = bx0 OR lx = bx1) AND LEAST(y1, by1) = GREATEST(y0, by0)
         AND y0 < GREATEST(y0, by0) AND GREATEST(y0, by0) < y1)) AS seg_touch_b,
    -- positive-length stretch of the open segment outside the closed box
    (lx < bx0 OR lx > bx1 OR y0 < by0 OR y1 > by1) AS seg_out,
    -- boundary endpoints of A (mod-2 minus the interior-wins point element)
    NOT (px = lx AND py = y0) AS e1_active,
    NOT (px = lx AND py = y1) AS e2_active,
    (lx > bx0 AND lx < bx1 AND y0 > by0 AND y0 < by1) AS e1_in,
    (lx > bx0 AND lx < bx1 AND y1 > by0 AND y1 < by1) AS e2_in,
    (lx >= bx0 AND lx <= bx1 AND y0 >= by0 AND y0 <= by1
      AND (lx = bx0 OR lx = bx1 OR y0 = by0 OR y0 = by1)) AS e1_on,
    (lx >= bx0 AND lx <= bx1 AND y1 >= by0 AND y1 <= by1
      AND (lx = bx0 OR lx = bx1 OR y1 = by0 OR y1 = by1)) AS e2_on,
    NOT (lx >= bx0 AND lx <= bx1 AND y0 >= by0 AND y0 <= by1) AS e1_out,
    NOT (lx >= bx0 AND lx <= bx1 AND y1 >= by0 AND y1 <= by1) AS e2_out
  FROM p)
SELECT a_key, b_key,
  (CASE WHEN seg_in_open THEN '1' WHEN p_in THEN '0' ELSE 'F' END)
  || (CASE WHEN seg_on_edge THEN '1' WHEN seg_touch_b OR p_on THEN '0' ELSE 'F' END)
  || (CASE WHEN seg_out THEN '1' WHEN p_out THEN '0' ELSE 'F' END)
  || (CASE WHEN (e1_active AND e1_in) OR (e2_active AND e2_in) THEN '0' ELSE 'F' END)
  || (CASE WHEN (e1_active AND e1_on) OR (e2_active AND e2_on) THEN '0' ELSE 'F' END)
  || (CASE WHEN (e1_active AND e1_out) OR (e2_active AND e2_out) THEN '0' ELSE 'F' END)
  || '2' || '1' || '2' AS de9im
FROM r
"""


# ---------------------------------------------------------------------------
# type inspection / endpoints / thinness / precision
# ---------------------------------------------------------------------------

def q_inspect_ops(spark, sf_dir) -> DataFrame:
    """§2.C inspection + §2.D scalar ops through the kernels:
    geometry-type tags (WKB, no decode), endpoints-of, thinness ratio
    (π/4 for a square), change-precision coordinate snapping."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(
        k.alias("n_nationkey"),
        (10 + (k * 3) % 15).cast("long").alias("L"),
        (5 + (k * 7) % 10).cast("long").alias("M"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("box_type", StringType()),
            StructField("line_type", StringType()),
            StructField("end_x", DoubleType()),
            StructField("end_y", DoubleType()),
            StructField("thinness", DoubleType()),
            StructField("snapped_x", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .functions import st_geometrytype
        from .geom import core as gc
        from .geom.ops import change_precision, endpoints_of, thinness_ratio

        def tname(g):
            # the same WKB-tag → name path st_geometrytype uses
            return st_geometrytype.func(pd.Series([gc.to_wkb(g)])).iloc[0]

        for pdf in batches:
            rows = []
            for key, L, M in zip(pdf["n_nationkey"], pdf["L"], pdf["M"]):
                L, M = float(int(L)), float(int(M))
                box = gc.from_wkt(f"POLYGON ((0 0, {L} 0, {L} {L}, 0 {L}, 0 0))")
                line = gc.line_string([(0.0, 0.0), (L, 0.0), (L, M)])
                ends = endpoints_of(line)
                frac = gc.line_string([(float(key) + 0.123456, 1.0), (2.0, 3.0)])
                snapped = change_precision(frac, 100.0)
                rows.append(
                    (
                        key,
                        tname(box),
                        tname(line),
                        float(ends[1].parts[0, 0]),
                        float(ends[1].parts[0, 1]),
                        round(thinness_ratio(box), 6),
                        round(float(snapped.parts[0, 0]), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["n_nationkey", "box_type", "line_type", "end_x", "end_y",
                         "thinness", "snapped_x"],
            )

    return src.mapInPandas(run, schema=out_schema)


Q_INSPECT_SQL = """
SELECT n_nationkey,
       'POLYGON' AS box_type,
       'LINESTRING' AS line_type,
       (10 + (n_nationkey*3)%15)::DOUBLE AS end_x,
       (5 + (n_nationkey*7)%10)::DOUBLE AS end_y,
       ROUND(pi() / 4, 6) AS thinness,
       ROUND(n_nationkey + 0.12, 6) AS snapped_x
FROM nation
"""


# ---------------------------------------------------------------------------
# distance / closest-points + multi-part extraction
# ---------------------------------------------------------------------------

def q_distance_ops(spark, sf_dir) -> DataFrame:
    """§2.E distance/closest-points-on + §2.C/D part extraction via
    the kernels.  Two disjoint integer boxes separated along x with a
    y-offset: distance = sqrt of an integer (identical IEEE double in
    both engines), witnesses are the facing corners.  A 2-box
    multipolygon exercises parts_of and envelope_polygon."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(
        k.alias("n_nationkey"),
        (3 + k % 5).cast("long").alias("gap"),
        (k % 4).cast("long").alias("dy"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("dist", DoubleType()),
            StructField("wa_x", DoubleType()),
            StructField("wb_x", DoubleType()),
            StructField("n_parts", LongType()),
            StructField("env_area", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.ops import area, envelope_polygon, parts_of
        from .geom.predicates import closest_points

        for pdf in batches:
            rows = []
            for key, gap, dy in zip(pdf["n_nationkey"], pdf["gap"], pdf["dy"]):
                gap, dy = float(int(gap)), float(int(dy))
                a = gc.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
                bx0 = 10.0 + gap
                by0 = 10.0 + dy  # strictly above A's top-right corner
                b = gc.from_wkt(
                    f"POLYGON (({bx0} {by0}, {bx0+10} {by0}, {bx0+10} {by0+10}, "
                    f"{bx0} {by0+10}, {bx0} {by0}))"
                )
                d, wa, wb = closest_points(a, b)
                mp = gc.multi_polygon(
                    [
                        [[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]],
                        [
                            [
                                (bx0, by0), (bx0 + 10, by0), (bx0 + 10, by0 + 10),
                                (bx0, by0 + 10), (bx0, by0),
                            ]
                        ],
                    ]
                )
                rows.append(
                    (
                        key,
                        round(d, 6),
                        float(wa[0]),
                        float(wb[0]),
                        len(parts_of(mp)),
                        round(area(envelope_polygon(mp)), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["n_nationkey", "dist", "wa_x", "wb_x", "n_parts", "env_area"],
            )

    return src.mapInPandas(run, schema=out_schema)


Q_DISTANCE_SQL = """
WITH p AS (
  SELECT n_nationkey,
         (3 + n_nationkey%5)::DOUBLE AS gap,
         (n_nationkey%4)::DOUBLE AS dy
  FROM nation)
SELECT n_nationkey,
       -- corner-to-corner: A's (10,10) to B's (10+gap, 10+dy)
       ROUND(sqrt(gap*gap + dy*dy), 6) AS dist,
       10.0 AS wa_x,
       10.0 + gap AS wb_x,
       2::BIGINT AS n_parts,
       ROUND((20.0 + gap) * (20.0 + dy), 6) AS env_area
FROM p
"""


# ---------------------------------------------------------------------------
# rings & lineal topology: holes, fill, exterior ring, line-merge
# ---------------------------------------------------------------------------

def q_rings_ops(spark, sf_dir) -> DataFrame:
    """§2.D ring/lineal ops through the kernels: holes_of /
    fill_holes / exterior_ring_of on a box with a rectangular hole,
    line_merge on two touching collinear segments plus one disjoint —
    every output closed-form."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(
        k.alias("n_nationkey"),
        (12 + 2 * (k % 5)).cast("long").alias("s"),
        (2 + k % 3).cast("long").alias("h"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("n_holes", LongType()),
            StructField("hole_area", DoubleType()),
            StructField("donut_area", DoubleType()),
            StructField("filled_area", DoubleType()),
            StructField("shell_length", DoubleType()),
            StructField("merged_lines", LongType()),
            StructField("merged_length", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.ops import (
            area,
            exterior_ring_of,
            fill_holes,
            holes_of,
            length,
            line_merge,
        )

        for pdf in batches:
            rows = []
            for key, s, h in zip(pdf["n_nationkey"], pdf["s"], pdf["h"]):
                s, h = float(int(s)), float(int(h))
                donut = gc.polygon(
                    [(0, 0), (s, 0), (s, s), (0, s), (0, 0)],
                    holes=[[(2, 2), (2 + h, 2), (2 + h, 2 + h), (2, 2 + h), (2, 2)]],
                )
                holes = holes_of(donut)
                merged = line_merge(
                    [
                        gc.line_string([(0.0, 0.0), (5.0, 0.0)]),
                        gc.line_string([(5.0, 0.0), (9.0, 0.0)]),
                        gc.line_string([(100.0, 100.0), (100.0, 103.0)]),
                    ]
                )
                rows.append(
                    (
                        key,
                        len(holes),
                        round(area(holes[0]), 6),
                        round(area(donut), 6),
                        round(area(fill_holes(donut)), 6),
                        round(length(exterior_ring_of(donut)), 6),
                        len(merged),
                        round(sum(length(m) for m in merged), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["n_nationkey", "n_holes", "hole_area", "donut_area",
                         "filled_area", "shell_length", "merged_lines", "merged_length"],
            )

    return src.mapInPandas(run, schema=out_schema)


Q_RINGS_SQL = """
WITH p AS (
  SELECT n_nationkey,
         (12 + 2*(n_nationkey%5))::DOUBLE AS s,
         (2 + n_nationkey%3)::DOUBLE AS h
  FROM nation)
SELECT n_nationkey,
       1::BIGINT AS n_holes,
       ROUND(h*h, 6) AS hole_area,
       ROUND(s*s - h*h, 6) AS donut_area,
       ROUND(s*s, 6) AS filled_area,
       ROUND(4*s, 6) AS shell_length,
       2::BIGINT AS merged_lines,
       ROUND(12.0, 6) AS merged_length
FROM p
"""


# ---------------------------------------------------------------------------
# smooth (Chaikin corner cutting)
# ---------------------------------------------------------------------------

def q_smooth_line(spark, sf_dir) -> DataFrame:
    """Chaikin 25/75 smoothing (geom/ops.py:smooth; goldens
    core_test.clj:186-202) of the L-shaped integer polyline, one
    iteration: the corner is cut at 0.75·L and 0.25·M (exact in
    doubles — quarters of integers)."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(
        k.alias("n_nationkey"),
        (10 + (k * 3) % 15).cast("long").alias("L"),
        (5 + (k * 7) % 10).cast("long").alias("M"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("n_pts", LongType()),
            StructField("cut_x", DoubleType()),
            StructField("cut_y", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.ops import smooth

        for pdf in batches:
            rows = []
            for key, L, M in zip(pdf["n_nationkey"], pdf["L"], pdf["M"]):
                L, M = float(int(L)), float(int(M))
                s = smooth(gc.line_string([(0.0, 0.0), (L, 0.0), (L, M)]), 1)
                c = s.parts
                rows.append((key, len(c), float(c[1, 0]), float(c[2, 1])))
            yield pd.DataFrame(rows, columns=["n_nationkey", "n_pts", "cut_x", "cut_y"])

    return src.mapInPandas(run, schema=out_schema)


Q_SMOOTH_SQL = """
SELECT n_nationkey,
       4::BIGINT AS n_pts,
       0.75 * (10 + (n_nationkey*3)%15) AS cut_x,
       0.25 * (5 + (n_nationkey*7)%10) AS cut_y
FROM nation
"""


# ---------------------------------------------------------------------------
# reprojection round-trip 27700 → 4326 → 27700
# ---------------------------------------------------------------------------

def q_reproject_roundtrip(spark, sf_dir) -> DataFrame:
    """OSGB↔WGS84 round trip through the real transform kernels
    (crs/osgb.py:196; semantics crs_test.clj:41-64): BNG-valid points
    out and back, recovered to 2 dp (centimetre closure)."""
    from .crs.osgb import transform_xy

    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    src = c.select(
        k.alias("c_custkey"),
        (200000 + (k * 9973) % 300000).cast("double").alias("e"),
        (200000 + (k * 7919) % 700000).cast("double").alias("n"),
    )

    @F.pandas_udf("e2 double, n2 double")
    def rt(e: pd.Series, n: pd.Series) -> pd.DataFrame:
        lon, lat = transform_xy(e.to_numpy(np.float64), n.to_numpy(np.float64), 27700, 4326)
        e2, n2 = transform_xy(lon, lat, 4326, 27700)
        return pd.DataFrame({"e2": np.round(e2, 2), "n2": np.round(n2, 2)})

    return src.withColumn("__rt", rt("e", "n")).select(
        "c_custkey", F.col("__rt.e2").alias("e2"), F.col("__rt.n2").alias("n2")
    )


Q_REPROJECT_SQL = """
SELECT c_custkey,
       ROUND((200000 + (c_custkey*9973)%300000)::DOUBLE, 2) AS e2,
       ROUND((200000 + (c_custkey*7919)%700000)::DOUBLE, 2) AS n2
FROM customer
"""


# ---------------------------------------------------------------------------
# boundary-of + interior-point-of (core.clj:297-308)
# ---------------------------------------------------------------------------

def q_boundary_interior(spark, sf_dir) -> DataFrame:
    """OGC boundary (polygon→ring(s), open line→endpoint multipoint,
    closed line→empty) and interior-point (widest-chord scanline)
    through the real kernels (geom/ops.py boundary_of/interior_point;
    semantics core.clj:297-308).  Even keys: plain box → LINEARRING
    boundary, interior point = box center.  Odd keys: donut (hole
    inset 1) → MULTILINESTRING boundary, interior point = midpoint of
    the widest scanline interval OUTSIDE the hole (x0+0.5).  All
    constructed coords are integers, so the WKT strings and point
    coords are closed-form."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(
        k.alias("n_nationkey"),
        ((k * 3) % 40).cast("long").alias("x0"),
        ((k * 7) % 40).cast("long").alias("y0"),
        (4 + k % 5).cast("long").alias("s"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("boundary_wkt", StringType()),
            StructField("line_boundary_wkt", StringType()),
            StructField("ring_boundary_wkt", StringType()),
            StructField("ix", DoubleType()),
            StructField("iy", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.ops import boundary_of, interior_point

        for pdf in batches:
            rows = []
            for key, x0, y0, s in zip(pdf["n_nationkey"], pdf["x0"], pdf["y0"], pdf["s"]):
                x0, y0, s = int(x0), int(y0), int(s)
                shell = f"({x0} {y0}, {x0+s} {y0}, {x0+s} {y0+s}, {x0} {y0+s}, {x0} {y0})"
                if key % 2 == 0:
                    poly = gc.from_wkt(f"POLYGON ({shell})")
                else:
                    hole = (
                        f"({x0+1} {y0+1}, {x0+s-1} {y0+1}, {x0+s-1} {y0+s-1}, "
                        f"{x0+1} {y0+s-1}, {x0+1} {y0+1})"
                    )
                    poly = gc.from_wkt(f"POLYGON ({shell}, {hole})")
                open_line = gc.from_wkt(
                    f"LINESTRING ({x0} {y0}, {x0+s} {y0}, {x0+s} {y0+s})"
                )
                ring_line = gc.from_wkt(
                    f"LINESTRING ({x0} {y0}, {x0+s} {y0}, {x0+s} {y0+s}, {x0} {y0})"
                )
                ip = interior_point(poly)
                rows.append(
                    (
                        key,
                        gc.to_wkt(boundary_of(poly)),
                        gc.to_wkt(boundary_of(open_line)),
                        gc.to_wkt(boundary_of(ring_line)),
                        float(ip.parts[0, 0]),
                        float(ip.parts[0, 1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["n_nationkey", "boundary_wkt", "line_boundary_wkt",
                         "ring_boundary_wkt", "ix", "iy"],
            )

    return src.mapInPandas(run, schema=out_schema)


Q_BOUNDARY_INTERIOR_SQL = """
WITH p AS (
  SELECT n_nationkey,
         (n_nationkey*3)%40 AS x0, (n_nationkey*7)%40 AS y0,
         4 + n_nationkey%5 AS s
  FROM nation),
w AS (
  SELECT *,
    '(' || x0 || ' ' || y0 || ', ' || (x0+s) || ' ' || y0 || ', '
        || (x0+s) || ' ' || (y0+s) || ', ' || x0 || ' ' || (y0+s) || ', '
        || x0 || ' ' || y0 || ')' AS shell,
    '(' || (x0+1) || ' ' || (y0+1) || ', ' || (x0+s-1) || ' ' || (y0+1) || ', '
        || (x0+s-1) || ' ' || (y0+s-1) || ', ' || (x0+1) || ' ' || (y0+s-1) || ', '
        || (x0+1) || ' ' || (y0+1) || ')' AS hole
  FROM p)
SELECT n_nationkey,
  CASE WHEN n_nationkey % 2 = 0 THEN 'LINEARRING ' || shell
       ELSE 'MULTILINESTRING (' || shell || ', ' || hole || ')' END AS boundary_wkt,
  'MULTIPOINT ((' || x0 || ' ' || y0 || '), (' || (x0+s) || ' ' || (y0+s) || '))'
    AS line_boundary_wkt,
  'MULTIPOINT EMPTY' AS ring_boundary_wkt,
  CASE WHEN n_nationkey % 2 = 0 THEN x0 + s/2.0 ELSE x0 + 0.5 END AS ix,
  (y0 + s/2.0)::DOUBLE AS iy
FROM w
"""


# ---------------------------------------------------------------------------
# concave hull (core.clj:324-331): ratio=1 degenerates to convex hull
# ---------------------------------------------------------------------------

def q_concave_hull(spark, sf_dir) -> DataFrame:
    """concave-hull-of at length_ratio=1 through the real kernel
    (geom/hull.py; semantics core.clj:324-331 — 'A value of 1 produces
    the convex hull'): box corners + strictly-interior points → hull
    is exactly the box (area s², 4 vertices).  The ratio<1 Delaunay +
    erosion path is covered by pytest goldens (tests/test_relate_hull)."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(k.alias("n_nationkey"), (10 + k % 7).cast("long").alias("s"))
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("hull_area", DoubleType()),
            StructField("hull_vertices", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.hull import concave_hull
        from .geom.ops import area

        for pdf in batches:
            rows = []
            for key, s in zip(pdf["n_nationkey"], pdf["s"]):
                s = int(s)
                pts = [(0.0, 0.0), (float(s), 0.0), (float(s), float(s)), (0.0, float(s))]
                pts += [
                    (1.0 + (key * 3 + i) % (s - 1), 1.0 + (key * 7 + i) % (s - 1))
                    for i in range(12)
                ]
                hull = concave_hull(gc.multi_point(pts), 1.0)
                rows.append((key, round(area(hull), 6), len(hull.parts[0]) - 1))
            yield pd.DataFrame(rows, columns=["n_nationkey", "hull_area", "hull_vertices"])

    return src.mapInPandas(run, schema=out_schema)


Q_CONCAVE_HULL_SQL = """
SELECT n_nationkey,
       ROUND(((10 + n_nationkey%7) * (10 + n_nationkey%7))::DOUBLE, 6) AS hull_area,
       4::BIGINT AS hull_vertices
FROM nation
"""


# ---------------------------------------------------------------------------
# node-with-others + connect-faces (noder.clj:90-185)
# ---------------------------------------------------------------------------

def q_noder_connect(spark, sf_dir) -> DataFrame:
    """Network connectors through the real kernels (geom/noding.py
    node_with_others + connect_faces; semantics noder.clj:90-185 and
    the noder_test.clj fixtures).

    Case A (default closest-points connect): horizontal line (0,0)-(L,0)
    + a point (px,py) above it → the line splits at (px,0) and a
    connector (px,0)-(px,py) is added; all coords integer → the three
    result WKTs and the mapping point are closed-form.

    Case B (connect_faces(2,1)): line (0,0)-(M,0) + a square
    (a,1)..(a+w,1+w); all faces have length w ≥ 2, the bottom-face
    midpoint (a+w/2, 1) is nearest (d=1 = straight distance, within
    tolerance) → connector lands mid-face, mapping = (a+w/2, 1)."""
    n = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    src = n.select(
        k.alias("n_nationkey"),
        (10 + k % 5).cast("long").alias("l"),
        (3 + k % 4).cast("long").alias("px"),
        (2 + k % 3).cast("long").alias("py"),
        (20 + k % 5).cast("long").alias("m"),
        (5 + k % 6).cast("long").alias("a"),
        (2 + k % 3).cast("long").alias("w"),
    )
    out_schema = StructType(
        [
            StructField("n_nationkey", src.schema["n_nationkey"].dataType),
            StructField("lines_sorted", StringType()),
            StructField("map_x", DoubleType()),
            StructField("map_y", DoubleType()),
            StructField("n_lines_faces", LongType()),
            StructField("map2_x", DoubleType()),
            StructField("map2_y", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom import core as gc
        from .geom.noding import connect_faces, node_with_others

        for pdf in batches:
            rows = []
            for key, l, px, py, m, a, w in zip(
                pdf["n_nationkey"], pdf["l"], pdf["px"], pdf["py"],
                pdf["m"], pdf["a"], pdf["w"],
            ):
                l, px, py, m, a, w = int(l), int(px), int(py), int(m), int(a), int(w)
                # case A: plain nearest-point connect
                lines = [gc.from_wkt(f"LINESTRING (0 0, {l} 0)")]
                others = [gc.point(float(px), float(py))]
                out_lines, mapping = node_with_others(lines, others)
                wkts = ";".join(sorted(gc.to_wkt(g) for g in out_lines))
                mp = mapping[0]
                # case B: connect-faces(face_length=2, tolerance=1)
                lines2 = [gc.from_wkt(f"LINESTRING (0 0, {m} 0)")]
                square = gc.from_wkt(
                    f"POLYGON (({a} 1, {a+w} 1, {a+w} {1+w}, {a} {1+w}, {a} 1))"
                )
                out2, mapping2 = node_with_others(
                    lines2, [square], connect=lambda li, tg: connect_faces(2.0, 1.0, li, tg)
                )
                mp2 = mapping2[0]
                rows.append(
                    (
                        key,
                        wkts,
                        float(mp.parts[0, 0]),
                        float(mp.parts[0, 1]),
                        len(out2),
                        float(mp2.parts[0, 0]),
                        float(mp2.parts[0, 1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["n_nationkey", "lines_sorted", "map_x", "map_y",
                         "n_lines_faces", "map2_x", "map2_y"],
            )

    return src.mapInPandas(run, schema=out_schema)


Q_NODER_CONNECT_SQL = """
WITH p AS (
  SELECT n_nationkey,
         10 + n_nationkey%5 AS l,
         3 + n_nationkey%4 AS px,
         2 + n_nationkey%3 AS py,
         20 + n_nationkey%5 AS m,
         5 + n_nationkey%6 AS a,
         2 + n_nationkey%3 AS w
  FROM nation)
SELECT n_nationkey,
  array_to_string(list_sort([
    'LINESTRING (0 0, ' || px || ' 0)',
    'LINESTRING (' || px || ' 0, ' || l || ' 0)',
    'LINESTRING (' || px || ' 0, ' || px || ' ' || py || ')'
  ]), ';') AS lines_sorted,
  px::DOUBLE AS map_x,
  py::DOUBLE AS map_y,
  3::BIGINT AS n_lines_faces,
  (a + w/2.0)::DOUBLE AS map2_x,
  1.0::DOUBLE AS map2_y
FROM p
"""
