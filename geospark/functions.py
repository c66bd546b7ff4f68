"""Spark-facing geometry functions — vectorized pandas UDFs over WKB
binary columns.

Column convention: geometry is WKB ``binary``; envelopes are
materialized double columns (xmin, ymin, xmax, ymax) so Catalyst
min/max stats prune scans (SURVEY.md §2.A mapping of the persistent
rtree).  Points get a fully-vectorized fixed-width WKB fast path —
the hot path never runs per-row Python beyond byte slicing.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .geom import core as gc
from .geom import ops as gops
from .geom import predicates as gpred

# ---------------------------------------------------------------------------
# vectorized point WKB codec (fixed 21-byte little-endian layout)
# ---------------------------------------------------------------------------

_PT_DTYPE = np.dtype([("e", "u1"), ("t", "<u4"), ("x", "<f8"), ("y", "<f8")])
assert _PT_DTYPE.itemsize == 21


def points_to_wkb_np(x: np.ndarray, y: np.ndarray) -> list:
    n = len(x)
    rec = np.empty(n, dtype=_PT_DTYPE)
    rec["e"] = 1
    rec["t"] = gc.POINT
    rec["x"] = x
    rec["y"] = y
    raw = rec.tobytes()
    return [raw[i * 21 : (i + 1) * 21] for i in range(n)]


def wkb_to_points_np(wkbs) -> tuple:
    """Fast path: batch of 21-byte point WKBs → (x, y) arrays; falls
    back to the generic decoder for anything else / nulls."""
    vals = list(wkbs)
    if vals and all(v is not None and len(v) == 21 and v[0] == 1 for v in vals):
        rec = np.frombuffer(b"".join(vals), dtype=_PT_DTYPE)
        return rec["x"].astype(np.float64), rec["y"].astype(np.float64)
    x = np.full(len(vals), np.nan)
    y = np.full(len(vals), np.nan)
    for i, v in enumerate(vals):
        if v is None:
            continue
        g = gc.from_wkb(v)
        if len(g.parts):
            c = g.all_coords()
            x[i], y[i] = c[0, 0], c[0, 1]
    return x, y


# ---------------------------------------------------------------------------
# scalar pandas UDFs
# ---------------------------------------------------------------------------

@F.pandas_udf(BinaryType())
def st_point(x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series(points_to_wkb_np(x.to_numpy(np.float64), y.to_numpy(np.float64)))


@F.pandas_udf(BinaryType())
def st_geomfromtext(wkt: pd.Series) -> pd.Series:
    return wkt.map(lambda s: None if s is None else gc.to_wkb(gc.from_wkt(s)))


@F.pandas_udf(StringType())
def st_astext(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: None if b is None else gc.to_wkt(gc.from_wkb(b)))


@F.pandas_udf(StringType())
def st_geometrytype(wkb: pd.Series) -> pd.Series:
    # WKB tag read without full decode (reference geometry-type,
    # core.clj:108-119)
    def tag(b):
        if b is None or len(b) < 5:
            return None
        t = struct.unpack_from("<I" if b[0] == 1 else ">I", b, 1)[0] % 1000
        return gc.TYPE_NAMES.get(t)

    return wkb.map(tag)


def _tag_of(b):
    if b is None or len(b) < 5:
        return None
    return struct.unpack_from("<I" if b[0] == 1 else ">I", b, 1)[0] % 1000


@F.pandas_udf(BooleanType())
def st_issingle(wkb: pd.Series) -> pd.Series:
    # reference single? (core.clj:149-156): point, linestring (incl.
    # linearring) or polygon — tag read, no decode
    return wkb.map(lambda b: None if _tag_of(b) is None else _tag_of(b) in (1, 2, 3))


@F.pandas_udf(BooleanType())
def st_ismulti(wkb: pd.Series) -> pd.Series:
    # reference multi? (core.clj:158-166): multi* or collection
    return wkb.map(lambda b: None if _tag_of(b) is None else _tag_of(b) in (4, 5, 6, 7))


@F.pandas_udf(DoubleType())
def st_area(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: None if b is None else gops.area(gc.from_wkb(b)))


@F.pandas_udf(DoubleType())
def st_length(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: None if b is None else gops.length(gc.from_wkb(b)))


@F.pandas_udf(BooleanType())
def st_isempty(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: None if b is None else gc.from_wkb(b).is_empty())


@F.pandas_udf(BinaryType())
def st_centroid(wkb: pd.Series) -> pd.Series:
    return wkb.map(
        lambda b: None if b is None else gc.to_wkb(gops.centroid(gc.from_wkb(b)))
    )


_ENV_SCHEMA = StructType(
    [
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
    ]
)


@F.pandas_udf(_ENV_SCHEMA)
def st_envelope(wkb: pd.Series) -> pd.DataFrame:
    rows = []
    for b in wkb:
        if b is None:
            rows.append((None, None, None, None))
            continue
        env = gc.from_wkb(b).envelope()
        rows.append(env if env else (None, None, None, None))
    return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])


@F.pandas_udf(BinaryType())
def st_normalize(wkb: pd.Series) -> pd.Series:
    return wkb.map(
        lambda b: None if b is None else gc.to_wkb(gc.normalize(gc.from_wkb(b)))
    )


def st_buffer(dist: float, quad_segs: int = 8, cap: str = "round", join: str = "round"):
    from .geom.buffer import buffer as _buffer

    @F.pandas_udf(BinaryType())
    def _udf(wkb: pd.Series) -> pd.Series:
        return wkb.map(
            lambda b: None
            if b is None
            else gc.to_wkb(_buffer(gc.from_wkb(b), dist, quad_segs, cap, join))
        )

    return _udf


def st_transform(from_srid: int, to_srid: int):
    """Vectorized reprojection; point columns use the array fast path."""
    from .crs.osgb import reproject, transform_xy

    @F.pandas_udf(BinaryType())
    def _udf(wkb: pd.Series) -> pd.Series:
        vals = list(wkb)
        if vals and all(v is not None and len(v) == 21 and v[0] == 1 for v in vals):
            x, y = wkb_to_points_np(vals)
            tx, ty = transform_xy(x, y, from_srid, to_srid)
            return pd.Series(points_to_wkb_np(np.asarray(tx), np.asarray(ty)))
        return pd.Series(
            [
                None if b is None else gc.to_wkb(reproject(gc.from_wkb(b), from_srid, to_srid))
                for b in vals
            ]
        )

    return _udf


# binary predicates (filter-refine joins use ops/joins.py instead;
# these are for ad-hoc pairs)

def _pair_pred(fn):
    @F.pandas_udf(BooleanType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(None)
            else:
                out.append(bool(fn(gc.from_wkb(x), gc.from_wkb(y))))
        return pd.Series(out)

    return _udf


st_intersects = _pair_pred(gpred.intersects)
st_contains = _pair_pred(gpred.contains)
st_covers = _pair_pred(gpred.covers)
st_touches = _pair_pred(gpred.touches)
st_overlaps = _pair_pred(gpred.overlaps)


@F.pandas_udf(DoubleType())
def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        if x is None or y is None:
            out.append(None)
        else:
            out.append(gpred.distance(gc.from_wkb(x), gc.from_wkb(y)))
    return pd.Series(out)


# ---------------------------------------------------------------------------
# cell functions
# ---------------------------------------------------------------------------

def cell_of_point(level: int, grid=None):
    from .cells.cellid import DEFAULT_GRID

    g = grid or DEFAULT_GRID

    @F.pandas_udf(LongType())
    def _udf(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            g.encode_points(x.to_numpy(np.float64), y.to_numpy(np.float64), level)
        )

    return _udf


def cover_cells(level: int, grid=None, exact: bool = True):
    """WKB → array<long> of covering cells at `level`."""
    from .cells.cellid import DEFAULT_GRID
    from .cells.coverage import cover_geometry

    g = grid or DEFAULT_GRID

    @F.pandas_udf(ArrayType(LongType()))
    def _udf(wkb: pd.Series) -> pd.Series:
        return wkb.map(
            lambda b: None
            if b is None
            else cover_geometry(gc.from_wkb(b), g, level, exact=exact).tolist()
        )

    return _udf
