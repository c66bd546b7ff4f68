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
    if not rows:
        # empty FeatureCollection: schema inference has nothing to
        # work with — return the minimal contract schema
        return spark.createDataFrame([], "`geometry` binary")
    return spark.createDataFrame(pd.DataFrame(rows))


# ---------------------------------------------------------------------------
# distributed read
# ---------------------------------------------------------------------------


# staged-ndjson LRU: (abspath, mtime, features_per_part) → (dir, n_part).
# Past the cap the OLDEST staged dir is deleted eagerly; a DataFrame
# still lazily referencing an evicted dir would fail on re-execution,
# so the cap trades that (rare: >4 distinct multi-GB collections live
# at once) against unbounded driver-disk growth over a session.
from collections import OrderedDict

_STAGED_DIRS: "OrderedDict[tuple, tuple]" = OrderedDict()
_STAGED_DIRS_MAX = 4


def _iter_feature_strings(fh, chunk_size: int = 1 << 20) -> Iterator[str]:
    """Stream a FeatureCollection document, yielding each top-level
    feature object's raw JSON text.

    O(current-feature) memory: a JSON-lexer-lite state machine finds
    the ROOT object's `"features"` key (depth-anchored — a nested
    "features" array inside a foreign member like `"metadata"` is
    skipped, RFC 7946 §6.1 allows such members) and splits balanced
    {...} objects; the whole document is never json.loads'd or held
    in memory, so a multi-GB FeatureCollection streams through the
    driver."""
    buf = ""
    pos = 0
    phase = 0  # 0: lexing for the root-level "features" key; 2: in array
    rdepth = 0  # structural depth from document start (phase 0)
    in_str = False
    esc = False
    key_chars = None  # capture of a depth-1 string (candidate key)
    pending = None  # completed depth-1 string awaiting ':' check
    expect = None  # None | "colon" | "bracket"
    depth = 0  # feature-object depth (phase 2)
    start = -1
    cur: List[str] = []
    while True:
        if pos >= len(buf):
            if start >= 0:
                # mid-feature: stash the started text, continue at 0
                cur.append(buf[start:])
                start = 0
            nxt = fh.read(chunk_size)
            if not nxt:
                return
            buf = nxt
            pos = 0
        c = buf[pos]
        if phase == 0:
            pos += 1
            if in_str:
                if esc:
                    esc = False
                elif c == "\\":
                    esc = True
                    # an escape sequence means the raw key text is NOT
                    # the literal 'features' — invalidate the capture
                    # (else a key like "features\n" would mis-match
                    # because the escaped char is skipped)
                    key_chars = None
                elif c == '"':
                    in_str = False
                    if key_chars is not None:
                        pending = (
                            "".join(key_chars) if len(key_chars) <= 16 else None
                        )
                        key_chars = None
                        expect = "colon"
                elif key_chars is not None and len(key_chars) <= 16:
                    key_chars.append(c)
                continue
            if expect is not None:
                if c in " \t\r\n":
                    continue
                if expect == "colon" and c == ":" and pending == "features":
                    expect = "bracket"
                    continue
                if expect == "bracket" and c == "[":
                    phase = 2
                    expect = pending = None
                    continue
                # not the features key / not an array value — resume
                # structural scanning on this char
                expect = pending = None
            if c == '"':
                in_str = True
                key_chars = [] if rdepth == 1 else None
            elif c in "{[":
                rdepth += 1
            elif c in "}]":
                rdepth -= 1
                if rdepth <= 0:
                    return  # root closed without a features array
            continue
        # phase 2: inside the features array
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            pos += 1
            continue
        if depth == 0:
            if c == "{":
                depth = 1
                start = pos
            elif c == "]":
                return
            elif c not in " \t\r\n,":
                # a non-object element (string, number, nested array,
                # literal) in the features array: raising beats the
                # old behavior of a stray ']' inside such an element
                # silently dropping every remaining feature
                raise ValueError(
                    f"features array contains a non-object element "
                    f"(unexpected {c!r}); every element must be a Feature object"
                )
            pos += 1
            continue
        if c == '"':
            in_str = True
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                cur.append(buf[start : pos + 1])
                yield "".join(cur)
                cur = []
                start = -1
        pos += 1


def _spark_to_kernel_type(dt):
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType) or isinstance(dt, T.IntegerType):
        return "bigint", lambda v: int(v)
    if isinstance(dt, T.DoubleType) or isinstance(dt, T.FloatType):
        return "double", lambda v: float(v)
    if isinstance(dt, T.BooleanType):
        return "boolean", lambda v: bool(v)
    if isinstance(dt, T.StringType):
        return "string", lambda v: v if isinstance(v, str) else json.dumps(v)
    # nested / mixed property values ride along as JSON strings
    return "string", lambda v: json.dumps(v)


def read_geojson_spark(spark, path: str, features_per_part: int = 100_000, tmp_dir: Optional[str] = None):
    """GeoJSON → DataFrame, DISTRIBUTED (geojson.clj:6-62 semantics).

    Physical forms by input shape:
      - newline-delimited Features (GeoJSONSeq / ndjson — the scale
        format): parsed directly, fully distributed, no staging.
      - single FeatureCollection document: stream-split on the driver
        (O(1)-memory bracket matcher, no whole-doc json.loads) into
        rotating ndjson part files, then the distributed path runs
        over those.
      - bare geometry / Feature strings: driver parser (fixture path).

    Properties schema comes from Spark's own DISTRIBUTED json
    inference over the ndjson; geometry decodes to WKB in a
    mapInPandas kernel (recursive coordinate decoder is python, but
    Arrow-batched and executor-side).  Non-primitive property values
    ride along as JSON strings.

    SHARED-FILESYSTEM REQUIREMENT: executors read `path` (ndjson) or
    the staged part files directly, so on a multi-machine cluster
    both must live on a filesystem all executors mount at the same
    path.  Staged parts land in a driver-local tempdir by default —
    on a non-local master pass tmp_dir= pointing at a shared mount
    (the FeatureCollection staging falls back to the driver-side
    parser when the master is not local and no tmp_dir is given)."""
    import glob as _glob
    import os
    import tempfile

    if path.lstrip().startswith("{"):
        return geojson_df(spark, path)

    # ndjson detection: first line is a complete JSON object.  The
    # read is BOUNDED — a single-line multi-GB FeatureCollection (the
    # default json.dump output) must not be materialized or parsed on
    # the driver just to sniff the format
    sniff_cap = 4 << 20
    with open(path) as fh:
        first = fh.readline(sniff_cap)
    sniff_capped = len(first) >= sniff_cap
    ndjson_glob = None
    if not sniff_capped:
        try:
            obj = json.loads(first)
            if obj.get("type") in ("Feature",) or obj.get("type") in _TYPES:
                ndjson_glob = path
        except (json.JSONDecodeError, AttributeError):
            pass

    if ndjson_glob is None:
        # stage: FeatureCollection → rotating ndjson parts.  Staged
        # dirs are CACHED per (abspath, mtime, features_per_part) —
        # re-reading the same collection in one session reuses the
        # parts instead of re-splitting and re-copying a multi-GB
        # document — and the cache is BOUNDED (LRU, oldest staged dir
        # deleted eagerly past the cap), so a long-lived session that
        # reads many distinct collections no longer accumulates full
        # staged copies for its whole lifetime.  Whatever survives is
        # removed at PROCESS exit (not DataFrame GC — derived plans
        # keep referencing the files without keeping the python
        # DataFrame object alive, the same lifetime trap as
        # destroying a closed-over broadcast).
        try:
            is_local = spark.sparkContext.master.startswith("local")
        except Exception:
            is_local = False
        if not is_local and tmp_dir is None:
            # staged parts in a driver-local tempdir are unreadable
            # from remote executors — driver-side parse is the safe
            # fallback (pass tmp_dir= on a shared mount to distribute)
            return geojson_df(spark, path)
        # tmp_dir is part of the key: a shared-mount staging must not
        # reuse parts staged under a driver-local tempdir (and vice
        # versa)
        cache_key = (os.path.abspath(path), os.path.getmtime(path), features_per_part, tmp_dir)
        cached = _STAGED_DIRS.get(cache_key)
        if cached is not None and os.path.isdir(cached[0]):
            _STAGED_DIRS.move_to_end(cache_key)
            d, n_part = cached
        else:
            d = tempfile.mkdtemp(prefix="geojson_parts_", dir=tmp_dir)
            import atexit
            import shutil

            atexit.register(shutil.rmtree, d, ignore_errors=True)
            n_part, n_in_part, out = 0, 0, None
            try:
                with open(path) as fh:
                    for feat in _iter_feature_strings(fh):
                        if out is None or n_in_part >= features_per_part:
                            if out is not None:
                                out.close()
                            out = open(os.path.join(d, f"part-{n_part:05d}.json"), "w")
                            n_part += 1
                            n_in_part = 0
                        out.write(feat.replace("\n", " ") + "\n")
                        n_in_part += 1
            except Exception:
                shutil.rmtree(d, ignore_errors=True)
                raise
            finally:
                if out is not None:
                    out.close()
            if n_part:
                _STAGED_DIRS[cache_key] = (d, n_part)
                # the LRU only bounds REUSE (advice r5, medium):
                # previously-returned DataFrames lazily re-read their
                # part files on every action, so eager rmtree here
                # made a 5th distinct FeatureCollection break earlier
                # DataFrames with FileNotFound on re-execution.  The
                # atexit hook registered at staging time removes every
                # staged dir at interpreter exit; eviction only
                # forgets the cache entry.
                while len(_STAGED_DIRS) > _STAGED_DIRS_MAX:
                    _STAGED_DIRS.popitem(last=False)
        if n_part == 0:
            if sniff_capped:
                # no root features array AND a first line too big to
                # sniff: this is ndjson whose first Feature exceeds
                # the sniff cap (a detailed boundary polygon) — route
                # to the distributed line parser, NEVER to a driver
                # json.loads of the whole multi-document file
                ndjson_glob = path
            else:
                # small doc: bare geometry / empty collection →
                # driver fallback
                return geojson_df(spark, path)
        else:
            ndjson_glob = os.path.join(d, "part-*.json")

    files = sorted(_glob.glob(ndjson_glob)) if "*" in ndjson_glob else [ndjson_glob]
    inferred = spark.read.json(files)
    prop_fields = []
    if "properties" in inferred.columns:
        from pyspark.sql import types as T

        pt = inferred.schema["properties"].dataType
        if isinstance(pt, T.StructType):
            # a property named 'geometry' would collide with the
            # synthesized WKB column; the driver parser drops it the
            # same way (dict assignment order in features_from_obj)
            prop_fields = [
                (f.name, *_spark_to_kernel_type(f.dataType))
                for f in pt.fields
                if f.name != "geometry"
            ]
    schema_ddl = ", ".join(
        [f"`{n}` {t}" for n, t, _ in prop_fields] + ["`geometry` binary"]
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                if not line.strip():
                    continue
                f = json.loads(line)
                props = f.get("properties") or {}
                row = {}
                for name, _t, conv in prop_fields:
                    v = props.get(name)
                    row[name] = None if v is None else conv(v)
                geom = f.get("geometry") if f.get("type") == "Feature" else f
                row["geometry"] = (
                    gc.to_wkb(geometry_from_obj(geom)) if geom else None
                )
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[n for n, _, _ in prop_fields] + ["geometry"]
            )

    return spark.read.text(files).mapInPandas(parse, schema=schema_ddl)
