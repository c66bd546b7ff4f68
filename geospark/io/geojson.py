"""GeoJSON source → DataFrame rows with WKB geometry.

Reference semantics (geojson.clj:6-62): accepts Feature,
FeatureCollection, or a bare geometry object; recursive coordinate
decoder; properties merge into the row as open attributes.

Spark mapping: for bulk data use spark.read.json + the kernel
converter; `read_geojson` here is the driver-side fixture path.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Iterator, List, Optional

from ..geom import core as gc

_TYPES = {
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
}


def geometry_from_obj(obj: Dict[str, Any]) -> gc.Geometry:
    t = obj.get("type")
    if t == "Point":
        c = obj["coordinates"]
        return gc.point(c[0], c[1]) if c else gc.empty(gc.POINT)
    if t == "LineString":
        return gc.line_string(obj["coordinates"])
    if t == "Polygon":
        rings = obj["coordinates"]
        if not rings:
            return gc.empty(gc.POLYGON)
        return gc.polygon(rings[0], rings[1:])
    if t == "MultiPoint":
        return gc.multi_point(obj["coordinates"])
    if t == "MultiLineString":
        return gc.multi_line_string(obj["coordinates"])
    if t == "MultiPolygon":
        polys = obj["coordinates"]
        return gc.multi_polygon([p[0] for p in polys]) if all(
            len(p) == 1 for p in polys
        ) else gc.Geometry(
            gc.MULTIPOLYGON,
            [[gc._close_ring(gc._coords(r)) for r in p] for p in polys],
        )
    if t == "GeometryCollection":
        return gc.collection([geometry_from_obj(g) for g in obj.get("geometries", [])])
    raise ValueError(f"not a GeoJSON geometry: {t!r}")


def features_from_obj(obj: Dict[str, Any]) -> Iterator[Dict[str, Any]]:
    """Feature / FeatureCollection / bare geometry → row dicts with
    'geometry' (WKB) plus the feature's properties (open attributes,
    geojson.clj:44-62)."""
    t = obj.get("type")
    if t == "FeatureCollection":
        for f in obj.get("features", []):
            yield from features_from_obj(f)
    elif t == "Feature":
        row = dict(obj.get("properties") or {})
        geom = obj.get("geometry")
        row["geometry"] = gc.to_wkb(geometry_from_obj(geom)) if geom else None
        yield row
    elif t in _TYPES:
        yield {"geometry": gc.to_wkb(geometry_from_obj(obj))}
    else:
        raise ValueError(f"not GeoJSON: {t!r}")


def read_geojson(path_or_str: str) -> List[Dict[str, Any]]:
    s = path_or_str
    if not s.lstrip().startswith("{"):
        with open(s) as fh:
            s = fh.read()
    return list(features_from_obj(json.loads(s)))


def geojson_df(spark, path_or_str: str):
    import pandas as pd

    rows = read_geojson(path_or_str)
    return spark.createDataFrame(pd.DataFrame(rows))
