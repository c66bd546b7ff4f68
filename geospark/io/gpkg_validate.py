"""GeoPackage conformance validator — executable subset of the
OGC GeoPackage 1.4 Annex A requirements the reference checks
(validate.clj:602-671; its registry spans core/features/extensions).

Each check returns {id, req, category, status, message} with status
∈ {pass, fail, not-applicable}; `failures` and `is_valid` mirror the
reference helpers (validate.clj:649-671).
"""

from __future__ import annotations

import re
import sqlite3
from typing import Dict, List

from . import gpb

APPLICATION_ID = 0x47504B47

_ALLOWED_COLUMN_TYPES = {
    "BOOLEAN", "TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER",
    "FLOAT", "DOUBLE", "REAL", "TEXT", "BLOB", "DATE", "DATETIME",
}
_GEOM_TYPES = {
    "GEOMETRY", "POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
    "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION",
}
_ISO8601 = re.compile(
    r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2}(\.\d+)?Z?)?$"
)


def _result(cid, req, cat, status, message=""):
    return {"id": cid, "req": req, "category": cat, "status": status, "message": message}


def validate(path: str) -> List[Dict]:
    results: List[Dict] = []
    with open(path, "rb") as fh:
        header = fh.read(72)

    def add(cid, req, cat, ok, msg_fail, na=False):
        if na:
            results.append(_result(cid, req, cat, "not-applicable"))
        else:
            results.append(
                _result(cid, req, cat, "pass" if ok else "fail", "" if ok else msg_fail)
            )

    # -- core file format -------------------------------------------------
    add("core-1", "Req 1", "core", header[:16] == b"SQLite format 3\x00",
        "not an SQLite v3 database")
    app_id = int.from_bytes(header[68:72], "big") if len(header) >= 72 else 0
    add("core-2", "Req 2", "core", app_id == APPLICATION_ID,
        f"application_id is {app_id:#x}, expected GPKG")

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        def has(table):
            return con.execute(
                "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", (table,)
            ).fetchone() is not None

        ok_integrity = con.execute("PRAGMA integrity_check").fetchone()[0] == "ok"
        add("core-6", "Req 6", "core", ok_integrity, "integrity_check failed")
        add("core-7", "Req 7", "core",
            con.execute("PRAGMA foreign_key_check").fetchall() == [],
            "foreign_key_check reported violations")

        add("core-10", "Req 10", "core", has("gpkg_spatial_ref_sys"),
            "gpkg_spatial_ref_sys missing")
        add("core-13", "Req 13", "core", has("gpkg_contents"),
            "gpkg_contents missing")
        if not (has("gpkg_spatial_ref_sys") and has("gpkg_contents")):
            return results

        # required default SRS rows (-1, 0, 4326)
        srs_ids = {r[0] for r in con.execute("SELECT srs_id FROM gpkg_spatial_ref_sys")}
        add("core-11", "Req 11", "core", {-1, 0, 4326} <= srs_ids,
            f"missing default SRS rows, have {sorted(srs_ids)}")

        # every contents row references an existing table + valid SRS
        contents = con.execute(
            "SELECT table_name, data_type, srs_id, last_change FROM gpkg_contents"
        ).fetchall()
        add("core-14", "Req 14", "core",
            all(has(t) for t, *_ in contents),
            "gpkg_contents references missing tables")
        add("core-15", "Req 15", "core",
            all(lc is None or _ISO8601.match(str(lc)) for *_, lc in contents),
            "last_change not ISO-8601")
        spatial_srs_ok = all(
            s in srs_ids for _, dt, s, _ in contents if dt == "features" and s is not None
        )
        add("core-srs-fk", "Req 14c", "core", spatial_srs_ok,
            "features row with unknown srs_id")

        # -- features ------------------------------------------------------
        feature_tables = [t for t, dt, *_ in contents if dt == "features"]
        if not feature_tables:
            add("feat-21", "Req 21", "features", True, "", na=True)
            return results

        add("feat-21", "Req 21", "features", has("gpkg_geometry_columns"),
            "gpkg_geometry_columns missing")
        gcols = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(
                "SELECT table_name, column_name, geometry_type_name, srs_id FROM gpkg_geometry_columns"
            )
        }
        add("feat-22", "Req 22", "features",
            all(t in gcols for t in feature_tables),
            "feature table missing from gpkg_geometry_columns")
        add("feat-25", "Req 25", "features",
            all(g[1].upper() in _GEOM_TYPES for g in gcols.values()),
            "invalid geometry_type_name")
        add("feat-srs", "Req 26", "features",
            all(g[2] in srs_ids for g in gcols.values()),
            "geometry column srs_id not in gpkg_spatial_ref_sys")

        # column types + pk + geometry blob checks per feature table
        for t in feature_tables:
            info = con.execute(f'PRAGMA table_info("{t}")').fetchall()
            pk_cols = [r for r in info if r[5] > 0]
            add(f"feat-29-{t}", "Req 29", "features",
                len(pk_cols) == 1 and pk_cols[0][2].upper() == "INTEGER",
                f"{t}: feature table needs a single INTEGER primary key")
            gcol = gcols.get(t, (None,))[0]
            bad_types = [
                r[1] for r in info
                if r[1] != gcol and r[2].upper().split("(")[0] not in _ALLOWED_COLUMN_TYPES
            ]
            add(f"feat-5-{t}", "Req 5", "features", not bad_types,
                f"{t}: non-spec column types {bad_types}")
            if gcol:
                blobs = con.execute(
                    f'SELECT "{gcol}" FROM "{t}" WHERE "{gcol}" IS NOT NULL LIMIT 1000'
                ).fetchall()
                ok_magic = True
                ok_decode = True
                for (b,) in blobs:
                    bb = bytes(b)
                    if len(bb) < 8 or bb[0] != 0x47 or bb[1] != 0x50:
                        ok_magic = False
                        break
                    try:
                        gpb.decode(bb)
                    except Exception:
                        ok_decode = False
                        break
                add(f"feat-19-{t}", "Req 19", "features", ok_magic,
                    f"{t}: geometry blob without GP magic")
                add(f"feat-20-{t}", "Req 20", "features", ok_decode,
                    f"{t}: geometry blob failed to decode")
            # duplicate PK check (validator analogue validate.clj:146-148)
            if pk_cols:
                pk = pk_cols[0][1]
                dup = con.execute(
                    f'SELECT COUNT(*) - COUNT(DISTINCT "{pk}") FROM "{t}"'
                ).fetchone()[0]
                add(f"feat-pk-{t}", "Req 29b", "features", dup == 0,
                    f"{t}: {dup} duplicate primary keys")
        return results
    finally:
        con.close()


def failures(results: List[Dict]) -> List[Dict]:
    return [r for r in results if r["status"] == "fail"]


def is_valid(path: str) -> bool:
    return not failures(validate(path))
