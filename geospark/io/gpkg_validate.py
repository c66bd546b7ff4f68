"""GeoPackage conformance validator — the full 41-check Annex-A
registry the reference runs (validate.clj:602-647: 16 core, 17
features, 7 extension-mechanism, 1 attributes).

Each check returns {id, req, category, status, message} with status
∈ {pass, fail, not-applicable, skip}; `failures` and `is_valid`
mirror the reference helpers (validate.clj:649-671).  Check ids use
the reference's abstract-test-suite paths so results line up 1:1.
"""

from __future__ import annotations

import re
import sqlite3
import struct
from typing import Dict, List, Optional

APPLICATION_ID = 0x47504B47  # "GPKG"

_BASE_COLUMN_TYPES = {
    "BOOLEAN", "TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER",
    "FLOAT", "DOUBLE", "REAL", "TEXT", "BLOB", "DATE", "DATETIME",
}
_GEOM_TYPE_NAMES = {
    "GEOMETRY", "POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
    "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION",
    "CIRCULARSTRING", "COMPOUNDCURVE", "CURVEPOLYGON", "MULTICURVE",
    "MULTISURFACE", "CURVE", "SURFACE",
}
_ISO8601 = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?Z$")
_KNOWN_GPKG_EXTENSIONS = {
    "gpkg_rtree_index", "gpkg_schema", "gpkg_zoom_other", "gpkg_webp",
    "gpkg_metadata", "gpkg_crs_wkt", "gpkg_srs_id_trigger",
    "gpkg_elevation_tiles", "gpkg_geometry_type_trigger",
    "gpkg_geometry_columns", "gpkg_related_tables",
}
_EXT_DEF_RE = re.compile(r"(?i)^(annex |https?://|mailto:|extension title)")

# WKB geometry type code → type name (codes mod 1000 for Z/M variants)
_WKB_TYPE_NAMES = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
    5: "MULTILINESTRING", 6: "MULTIPOLYGON", 7: "GEOMETRYCOLLECTION",
}


def _norm_type(t: Optional[str]) -> str:
    return re.sub(r"\(.*\)", "", (t or "").upper()).strip()


def _parse_gpb_header(blob: bytes) -> Optional[Dict]:
    """StandardGeoPackageBinary 8-byte header (spec clause 2.1.3)."""
    if blob is None or len(blob) < 8:
        return None
    flags = blob[3]
    little = bool(flags & 0x01)
    srs = struct.unpack("<i" if little else ">i", blob[4:8])[0]
    return {
        "magic_ok": blob[0] == 0x47 and blob[1] == 0x50,
        "version": blob[2],
        "binary_type": 1 if flags & 0x20 else 0,
        "empty": bool(flags & 0x10),
        "envelope_code": (flags >> 1) & 0x07,
        "little": little,
        "srs_id": srs,
    }


_ENV_LEN = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def _wkb_type_of_gpb(blob: bytes) -> Optional[str]:
    """Geometry type name from the WKB payload of a GP blob."""
    h = _parse_gpb_header(blob)
    if h is None or h["envelope_code"] > 4:
        return None
    off = 8 + _ENV_LEN[h["envelope_code"]]
    if len(blob) < off + 5:
        return None
    little = blob[off] == 1
    code = struct.unpack("<I" if little else ">I", blob[off + 1 : off + 5])[0]
    return _WKB_TYPE_NAMES.get(code % 1000)


class _Ctx:
    def __init__(self, con: sqlite3.Connection, path: str):
        self.con = con
        self.path = path

    def q(self, sql, *params):
        return self.con.execute(sql, params).fetchall()

    def has_table(self, name) -> bool:
        return (
            self.con.execute(
                "SELECT 1 FROM sqlite_master WHERE type IN ('table','view') "
                "AND lower(name) = lower(?)",
                (str(name),),
            ).fetchone()
            is not None
        )

    def table_info(self, table):
        esc = str(table).replace("'", "''")
        return self.q(f"PRAGMA table_info('{esc}')")

    def table_columns(self, table):
        return {r[1].lower() for r in self.table_info(table)}

    def feature_tables(self):
        return [
            r[0]
            for r in self.q(
                "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
            )
        ]

    def attribute_tables(self):
        return [
            r[0]
            for r in self.q(
                "SELECT table_name FROM gpkg_contents WHERE data_type = 'attributes'"
            )
        ]

    def gc_rows(self):
        if not self.has_table("gpkg_geometry_columns"):
            return []
        return self.q(
            "SELECT table_name, column_name, geometry_type_name, srs_id, z, m "
            "FROM gpkg_geometry_columns"
        )

    def feature_geom_blobs(self):
        """(table, column, declared_type, gc_srs_id, blob) for every
        non-null geometry value (validate.clj feature-geom-blobs)."""
        feats = set(self.feature_tables())
        for tn, cn, gt, sid, _z, _m in self.gc_rows():
            if tn not in feats or not self.has_table(tn):
                continue
            eid = str(cn).replace('"', '""')
            eidt = str(tn).replace('"', '""')
            cur = self.con.execute(f'SELECT "{eid}" FROM "{eidt}"')
            for (blob,) in cur:
                if blob is not None:
                    yield tn, cn, gt, sid, bytes(blob)


def _ok(msg=""):
    return ("pass", msg)


def _bad(msg):
    return ("fail", msg)


def _na(msg):
    return ("not-applicable", msg)


def _skip(msg):
    return ("skip", msg)


def _require_columns(ctx: _Ctx, table: str, required):
    if not ctx.has_table(table):
        return _bad(f"{table} does not exist")
    cols = ctx.table_columns(table)
    missing = [c for c in (r.lower() for r in required) if c not in cols]
    if missing:
        return _bad(f"{table} missing columns: {', '.join(missing)}")
    return _ok(f"{table} has the required columns")


def _integer_pk_problem(ctx: _Ctx, table) -> Optional[str]:
    """Req 29/150/118: INTEGER primary-key-like column, unique values."""
    info = ctx.table_info(table)
    if not info:
        return f"{table}: table has no columns"
    pk = next((r for r in info if r[5] == 1), info[0])
    cid = pk[1]
    if _norm_type(pk[2]) != "INTEGER":
        return f"{table}: id column '{cid}' is type '{pk[2]}', not INTEGER"
    eid = str(cid).replace('"', '""')
    eidt = str(table).replace('"', '""')
    dup = ctx.q(f'SELECT COUNT(*) - COUNT(DISTINCT "{eid}") FROM "{eidt}"')[0][0]
    if dup and dup > 0:
        return f"{table}: id column '{cid}' has duplicate values"
    return None


# ---------------------------------------------------------------------------
# Base / Core (A.1.1)
# ---------------------------------------------------------------------------

def _check_file_format(ctx):
    with open(ctx.path, "rb") as fh:
        head = fh.read(16)
    if head[:15] == b"SQLite format 3":
        return _ok("first 16 bytes are 'SQLite format 3'")
    return _bad("first 16 bytes are not 'SQLite format 3'")


def _check_application_id(ctx):
    app = ctx.q("PRAGMA application_id")[0][0]
    uv = ctx.q("PRAGMA user_version")[0][0]
    if app != APPLICATION_ID:
        return _bad(f"application_id is {app}, expected {APPLICATION_ID} (GPKG)")
    if uv < 10200:
        return _bad(f"user_version is {uv}, expected >= 10200")
    return _ok(f"application_id GPKG, user_version {uv}")


def _check_file_extension(ctx):
    if str(ctx.path).lower().endswith(".gpkg"):
        return _ok("file extension is .gpkg")
    return _bad("file extension is not .gpkg")


def _check_table_data_types(ctx):
    tables = [
        r[0]
        for r in ctx.q(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type IN ('tiles','features','attributes')"
        )
    ]
    if not tables:
        return _na("no user tables registered in gpkg_contents")
    allowed = _BASE_COLUMN_TYPES | _GEOM_TYPE_NAMES
    offenders = [
        f"{t}.{r[1]} : {r[2]}"
        for t in tables
        for r in ctx.table_info(t)
        if _norm_type(r[2]) and _norm_type(r[2]) not in allowed
    ]
    if offenders:
        return _bad(f"columns with invalid data types: {', '.join(offenders)}")
    return _ok("all user-table column types are valid")


def _check_file_integrity(ctx):
    rows = ctx.q("PRAGMA integrity_check")
    if rows and rows[0][0] == "ok":
        return _ok("PRAGMA integrity_check returned ok")
    return _bad(f"integrity_check: {[r[0] for r in rows]}")


def _check_foreign_key_integrity(ctx):
    rows = ctx.q("PRAGMA foreign_key_check")
    if not rows:
        return _ok("no foreign key violations")
    return _bad(f"{len(rows)} foreign key violation(s): {rows}")


def _check_sql_api(ctx):
    ctx.q("SELECT * FROM sqlite_master")
    return _ok("SQLite SQL API is available")


def _check_srs_table_def(ctx):
    return _require_columns(
        ctx,
        "gpkg_spatial_ref_sys",
        ["srs_name", "srs_id", "organization", "organization_coordsys_id",
         "definition", "description"],
    )


def _check_srs_defaults(ctx):
    neg1 = ctx.q(
        "SELECT 1 FROM gpkg_spatial_ref_sys WHERE srs_id = -1 "
        "AND organization = 'NONE' AND organization_coordsys_id = -1"
    )
    zero = ctx.q(
        "SELECT 1 FROM gpkg_spatial_ref_sys WHERE srs_id = 0 "
        "AND organization = 'NONE' AND organization_coordsys_id = 0"
    )
    epsg = ctx.q(
        "SELECT 1 FROM gpkg_spatial_ref_sys WHERE lower(organization) = 'epsg' "
        "AND organization_coordsys_id = 4326"
    )
    if not neg1:
        return _bad("missing default srs_id = -1 (NONE) row")
    if not zero:
        return _bad("missing default srs_id = 0 (NONE) row")
    if not epsg:
        return _bad("missing EPSG:4326 row")
    return _ok("required default SRS rows present")


def _check_srs_required(ctx):
    rows = ctx.q(
        "SELECT DISTINCT gc.srs_id FROM gpkg_contents gc "
        "LEFT OUTER JOIN gpkg_spatial_ref_sys srs ON srs.srs_id = gc.srs_id "
        "WHERE gc.data_type IN ('tiles','features') AND srs.srs_id IS NULL"
    )
    if not rows:
        return _ok("every referenced srs_id is defined")
    return _bad(f"undefined srs_id values referenced by contents: {[r[0] for r in rows]}")


def _check_contents_table_def(ctx):
    return _require_columns(
        ctx,
        "gpkg_contents",
        ["table_name", "data_type", "identifier", "description", "last_change",
         "min_x", "min_y", "max_x", "max_y", "srs_id"],
    )


def _check_contents_table_name(ctx):
    rows = ctx.q(
        "SELECT DISTINCT table_name FROM gpkg_contents "
        "WHERE table_name NOT IN (SELECT name FROM sqlite_master)"
    )
    if not rows:
        return _ok("every gpkg_contents.table_name exists")
    return _bad(f"gpkg_contents references missing tables: {[r[0] for r in rows]}")


def _check_contents_last_change(ctx):
    vals = [r[0] for r in ctx.q("SELECT last_change FROM gpkg_contents")]
    if not vals:
        return _na("no gpkg_contents rows")
    offenders = [v for v in vals if not _ISO8601.match(str(v))]
    if offenders:
        return _bad(f"non-ISO8601 last_change values: {offenders}")
    return _ok("all last_change values are ISO8601")


def _check_contents_srs_id(ctx):
    rows = ctx.q("PRAGMA foreign_key_check('gpkg_contents')")
    if not rows:
        return _ok("gpkg_contents.srs_id references are valid")
    return _bad(f"gpkg_contents FK violations: {rows}")


def _check_valid_geopackage(ctx):
    n = ctx.q(
        "SELECT COUNT(*) FROM gpkg_contents WHERE data_type IN ('tiles','features')"
    )[0][0]
    if n > 0:
        return _ok("contains a features or tiles table")
    return _bad("no features or tiles table registered in gpkg_contents")


# ---------------------------------------------------------------------------
# Features (A.2.1)
# ---------------------------------------------------------------------------

def _check_features_row(ctx):
    tables = ctx.feature_tables()
    if not tables:
        return _na("no feature tables")
    problems = [p for p in (_integer_pk_problem(ctx, t) for t in tables) if p]
    if problems:
        return _bad("feature table problems: " + "; ".join(problems))
    return _ok("every feature table exists with an integer primary key")


def _check_blob_format(ctx):
    if not ctx.feature_tables():
        return _na("no feature tables")
    problems, seen = [], False
    for tn, _cn, _gt, _sid, blob in ctx.feature_geom_blobs():
        seen = True
        h = _parse_gpb_header(blob)
        if not (h and h["magic_ok"] and h["version"] == 0 and h["binary_type"] == 0
                and 0 <= h["envelope_code"] <= 4):
            problems.append(f"{tn}: {h}")
    if not seen:
        return _na("no non-null feature geometries")
    if problems:
        return _bad(f"invalid GeoPackageBinary headers: {problems[:5]}")
    return _ok("all geometry blobs are valid StandardGeoPackageBinary")


def _check_empty_geometry(ctx):
    if not ctx.feature_tables():
        return _na("no feature tables")
    problems, seen = [], False
    for tn, _cn, _gt, _sid, blob in ctx.feature_geom_blobs():
        seen = True
        h = _parse_gpb_header(blob)
        if h and h["empty"] and h["envelope_code"] != 0:
            problems.append(f"{tn}: empty geometry with non-empty envelope")
    if not seen:
        return _na("no non-null feature geometries")
    if problems:
        return _bad(f"inconsistent empty geometry encoding: {problems[:5]}")
    return _ok("empty geometries encoded consistently")


def _check_core_types(ctx):
    from . import gpb

    if not ctx.feature_tables():
        return _na("no feature tables")
    problems, seen = [], False
    for tn, _cn, _gt, _sid, blob in ctx.feature_geom_blobs():
        seen = True
        try:
            gpb.decode(blob)
        except Exception as e:
            problems.append(f"{tn}: {e}")
    if not seen:
        return _na("no non-null feature geometries")
    if problems:
        return _bad(f"geometries not valid GeoPackageBinary WKB: {problems[:5]}")
    return _ok("all geometries decode as valid WKB")


def _check_gc_table_def(ctx):
    if not ctx.feature_tables():
        return _na("no feature tables")
    return _require_columns(
        ctx,
        "gpkg_geometry_columns",
        ["table_name", "column_name", "geometry_type_name", "srs_id", "z", "m"],
    )


def _check_gc_one_row_per_table(ctx):
    if not ctx.feature_tables():
        return _na("no feature tables")
    rows = ctx.q(
        "SELECT table_name FROM gpkg_contents WHERE data_type = 'features' "
        "AND table_name NOT IN (SELECT table_name FROM gpkg_geometry_columns)"
    )
    if not rows:
        return _ok("every feature table has a gpkg_geometry_columns row")
    return _bad(f"feature tables missing from gpkg_geometry_columns: {[r[0] for r in rows]}")


def _check_gc_table_name_fk(ctx):
    if not ctx.has_table("gpkg_geometry_columns"):
        return _na("no gpkg_geometry_columns table")
    fks = ctx.q("PRAGMA foreign_key_list('gpkg_geometry_columns')")
    # columns: id, seq, table, from, to, ...
    if any(str(r[2]).lower() == "gpkg_contents" and str(r[3]).lower() == "table_name" for r in fks):
        return _ok("table_name is a foreign key to gpkg_contents")
    return _bad("gpkg_geometry_columns.table_name is not a foreign key to gpkg_contents")


def _check_gc_column_name(ctx):
    rows = ctx.gc_rows()
    if not rows:
        return _na("no gpkg_geometry_columns rows")
    problems = [
        f"{tn}.{cn}"
        for tn, cn, *_ in rows
        if str(cn).lower() not in ctx.table_columns(tn)
    ]
    if problems:
        return _bad(f"geometry column names not present in their tables: {problems}")
    return _ok("every geometry column name exists in its table")


def _check_gc_geometry_type(ctx):
    rows = ctx.gc_rows()
    if not rows:
        return _na("no gpkg_geometry_columns rows")
    bad = [gt for _tn, _cn, gt, *_ in rows if str(gt).upper() not in _GEOM_TYPE_NAMES]
    if bad:
        return _bad(f"invalid geometry_type_name values: {bad}")
    return _ok("all geometry_type_name values are valid")


def _check_gc_srs_id(ctx):
    if not ctx.has_table("gpkg_geometry_columns"):
        return _na("no gpkg_geometry_columns table")
    rows = ctx.q("PRAGMA foreign_key_check('gpkg_geometry_columns')")
    if not rows:
        return _ok("gpkg_geometry_columns.srs_id references are valid")
    return _bad(f"gpkg_geometry_columns FK violations: {rows}")


def _check_gc_srs_id_match(ctx):
    rows = ctx.gc_rows()
    if not rows:
        return _na("no gpkg_geometry_columns rows")
    mism = ctx.q(
        "SELECT gc.table_name FROM gpkg_geometry_columns gc "
        "JOIN gpkg_contents c ON gc.table_name = c.table_name "
        "WHERE gc.srs_id <> c.srs_id"
    )
    if not mism:
        return _ok("srs_id matches between gpkg_geometry_columns and gpkg_contents")
    return _bad(f"srs_id mismatch for tables: {[r[0] for r in mism]}")


def _check_gc_z(ctx):
    rows = ctx.gc_rows()
    if not rows:
        return _na("no gpkg_geometry_columns rows")
    bad = [r[4] for r in rows if r[4] not in (0, 1, 2)]
    if bad:
        return _bad(f"invalid z values: {bad}")
    return _ok("all z values are in {0,1,2}")


def _check_gc_m(ctx):
    rows = ctx.gc_rows()
    if not rows:
        return _na("no gpkg_geometry_columns rows")
    bad = [r[5] for r in rows if r[5] not in (0, 1, 2)]
    if bad:
        return _bad(f"invalid m values: {bad}")
    return _ok("all m values are in {0,1,2}")


def _check_feature_table_pk(ctx):
    tables = ctx.feature_tables()
    if not tables:
        return _na("no feature tables")
    problems = [p for p in (_integer_pk_problem(ctx, t) for t in tables) if p]
    if problems:
        return _bad("; ".join(problems))
    return _ok("every feature table has an integer primary key with unique values")


def _check_one_geometry_column(ctx):
    tables = ctx.feature_tables()
    if not tables:
        return _na("no feature tables")
    gc = ctx.gc_rows()
    problems = []
    for t in tables:
        n = sum(1 for r in gc if r[0] == t)
        if n > 1:
            problems.append(f"{t} has {n} geometry columns")
    if problems:
        return _bad(f"feature tables with multiple geometry columns: {problems}")
    return _ok("every feature table has exactly one geometry column")


def _check_geometry_column_type(ctx):
    feats = set(ctx.feature_tables())
    rows = [r for r in ctx.gc_rows() if r[0] in feats]
    if not rows:
        return _na("no feature geometry columns")
    problems = []
    for tn, cn, gt, *_ in rows:
        decl = next(
            (_norm_type(r[2]) for r in ctx.table_info(tn)
             if str(r[1]).lower() == str(cn).lower()),
            None,
        )
        if decl != str(gt).upper():
            problems.append(f"{tn}.{cn} declared '{decl}', expected '{str(gt).upper()}'")
    if problems:
        return _bad(f"geometry column SQL type mismatch: {problems}")
    return _ok("geometry column SQL types match geometry_type_name")


def _check_data_geometry_type(ctx):
    if not ctx.feature_tables():
        return _na("no feature tables")
    problems, seen = [], False
    for tn, _cn, gt, _sid, blob in ctx.feature_geom_blobs():
        seen = True
        decl = str(gt).upper()
        if decl == "GEOMETRY":
            continue
        actual = _wkb_type_of_gpb(blob)
        if actual and actual != decl:
            problems.append(f"{tn}: declared {decl}, found {actual}")
    if not seen:
        return _na("no non-null feature geometries")
    if problems:
        return _bad(f"geometry type mismatches: {problems[:5]}")
    return _ok("feature geometry types match geometry_type_name")


def _check_data_geometry_srs(ctx):
    if not ctx.feature_tables():
        return _na("no feature tables")
    problems, seen = [], False
    for tn, _cn, _gt, sid, blob in ctx.feature_geom_blobs():
        seen = True
        h = _parse_gpb_header(blob)
        if h and int(sid) != int(h["srs_id"]):
            problems.append(f"{tn}: blob srs_id {h['srs_id']}, expected {sid}")
    if not seen:
        return _na("no non-null feature geometries")
    if problems:
        return _bad(f"geometry srs_id mismatches: {problems[:5]}")
    return _ok("feature geometry srs_id values match gpkg_geometry_columns")


# ---------------------------------------------------------------------------
# Extension mechanism (A.2.3)
# ---------------------------------------------------------------------------

def _ext_rows(ctx):
    return ctx.q(
        "SELECT table_name, column_name, extension_name, definition, scope "
        "FROM gpkg_extensions"
    )


def _check_ext_table_def(ctx):
    if not ctx.has_table("gpkg_extensions"):
        return _na("no gpkg_extensions table")
    return _require_columns(
        ctx, "gpkg_extensions",
        ["table_name", "column_name", "extension_name", "definition", "scope"],
    )


def _check_ext_table_name(ctx):
    if not ctx.has_table("gpkg_extensions"):
        return _na("no gpkg_extensions table")
    rows = _ext_rows(ctx)
    if not rows:
        return _na("no gpkg_extensions rows")
    problems = [tn for tn, *_ in rows if tn is not None and not ctx.has_table(tn)]
    if problems:
        return _bad(f"gpkg_extensions references missing tables: {problems}")
    return _ok("every extension table_name exists")


def _check_ext_column_name(ctx):
    if not ctx.has_table("gpkg_extensions"):
        return _na("no gpkg_extensions table")
    rows = _ext_rows(ctx)
    if not rows:
        return _na("no gpkg_extensions rows")
    problems = [
        f"{tn}.{cn}"
        for tn, cn, *_ in rows
        if cn is not None and tn is not None
        and str(cn).lower() not in ctx.table_columns(tn)
    ]
    if problems:
        return _bad(f"gpkg_extensions references missing columns: {problems}")
    return _ok("every extension column_name exists")


def _extension_name_problem(ename) -> Optional[str]:
    e = str(ename)
    if e in _KNOWN_GPKG_EXTENSIONS:
        return None
    if "_" not in e:
        return f"{e} (no author_extension form)"
    author, ext = e.split("_", 1)
    if author == "gpkg":
        return f"{e} (unregistered gpkg author)"
    if not re.fullmatch(r"[a-zA-Z0-9]+", author):
        return f"{e} (invalid author)"
    if not re.fullmatch(r"[a-zA-Z0-9_]+", ext):
        return f"{e} (invalid extension)"
    return None


def _check_ext_name(ctx):
    if not ctx.has_table("gpkg_extensions"):
        return _na("no gpkg_extensions table")
    rows = _ext_rows(ctx)
    if not rows:
        return _na("no gpkg_extensions rows")
    problems = [p for p in (_extension_name_problem(r[2]) for r in rows) if p]
    if problems:
        return _bad(f"invalid extension_name values: {problems}")
    return _ok("all extension_name values are valid")


def _check_ext_definition(ctx):
    if not ctx.has_table("gpkg_extensions"):
        return _na("no gpkg_extensions table")
    rows = _ext_rows(ctx)
    if not rows:
        return _na("no gpkg_extensions rows")
    problems = [r[3] for r in rows if not _EXT_DEF_RE.match(str(r[3] or "").strip())]
    if problems:
        return _bad(f"extension definitions not referencing documentation: {problems}")
    return _ok("all extension definitions reference documentation")


def _check_ext_scope(ctx):
    if not ctx.has_table("gpkg_extensions"):
        return _na("no gpkg_extensions table")
    rows = _ext_rows(ctx)
    if not rows:
        return _na("no gpkg_extensions rows")
    problems = [r[4] for r in rows if r[4] not in ("read-write", "write-only")]
    if problems:
        return _bad(f"invalid scope values: {problems}")
    return _ok("all extension scope values are valid")


# ---------------------------------------------------------------------------
# Attributes (A.2.4)
# ---------------------------------------------------------------------------

def _check_attributes_row(ctx):
    tables = ctx.attribute_tables()
    if not tables:
        return _na("no attributes tables")
    problems = [p for p in (_integer_pk_problem(ctx, t) for t in tables) if p]
    if problems:
        return _bad("attributes table problems: " + "; ".join(problems))
    return _ok("every attributes table exists with an integer primary key")


# ---------------------------------------------------------------------------
# registry + entry points (validate.clj:602-647)
# ---------------------------------------------------------------------------

CHECKS = [
    ("/base/core/container/data/file_format", 1, "core", _check_file_format),
    ("/base/core/container/data/file_format/application_id", 2, "core", _check_application_id),
    ("/base/core/container/data/file_extension_name", 3, "core", _check_file_extension),
    ("/base/core/container/data/table_data_types", 5, "core", _check_table_data_types),
    ("/base/core/container/data/file_integrity", 6, "core", _check_file_integrity),
    ("/base/core/container/data/foreign_key_integrity", 7, "core", _check_foreign_key_integrity),
    ("/base/core/container/api/sql", 8, "core", _check_sql_api),
    ("/base/core/gpkg_spatial_ref_sys/data/table_def", 10, "core", _check_srs_table_def),
    ("/base/core/gpkg_spatial_ref_sys/data_values_default", 11, "core", _check_srs_defaults),
    ("/base/core/spatial_ref_sys/data_values_required", 12, "core", _check_srs_required),
    ("/base/core/contents/data/table_def", 13, "core", _check_contents_table_def),
    ("/base/core/contents/data/data_values_table_name", 14, "core", _check_contents_table_name),
    ("/base/core/contents/data/data_values_last_change", 15, "core", _check_contents_last_change),
    ("/base/core/contents/data/data_values_srs_id", 16, "core", _check_contents_srs_id),
    ("/opt/valid_geopackage", 17, "core", _check_valid_geopackage),
    ("/opt/features/contents/data/features_row", 18, "features", _check_features_row),
    ("/opt/features/geometry_encoding/data/blob", 19, "features", _check_blob_format),
    ("/opt/features/geometry_encoding/data/empty_geometry", 152, "features", _check_empty_geometry),
    ("/opt/features/geometry_encoding/data/core_types_existing_sparse_data", 20, "features", _check_core_types),
    ("/opt/features/geometry_columns/data/table_def", 21, "features", _check_gc_table_def),
    ("/opt/features/geometry_columns/data/data_values_geometry_columns", 22, "features", _check_gc_one_row_per_table),
    ("/opt/features/geometry_columns/data/data_values_table_name", 23, "features", _check_gc_table_name_fk),
    ("/opt/features/geometry_columns/data/data_values_column_name", 24, "features", _check_gc_column_name),
    ("/opt/features/geometry_columns/data/data_values_geometry_type_name", 25, "features", _check_gc_geometry_type),
    ("/opt/features/geometry_columns/data/data_values_srs_id", 26, "features", _check_gc_srs_id),
    ("/opt/features/geometry_columns/data/data_values_srs_id_match", 146, "features", _check_gc_srs_id_match),
    ("/opt/features/geometry_columns/data/data_values_z", 27, "features", _check_gc_z),
    ("/opt/features/geometry_columns/data/data_values_m", 28, "features", _check_gc_m),
    ("/opt/features/vector_features/data/feature_table", 29, "features", _check_feature_table_pk),
    ("/opt/features/vector_features/data/feature_table_one_geometry_column", 30, "features", _check_one_geometry_column),
    ("/opt/features/vector_features/data/feature_table_geometry_column_type", 31, "features", _check_geometry_column_type),
    ("/opt/features/vector_features/data/data_values_geometry_type", 32, "features", _check_data_geometry_type),
    ("/opt/features/vector_features/data/data_value_geometry_srs_id", 33, "features", _check_data_geometry_srs),
    ("/opt/extension_mechanism/data/table_def", 58, "extensions", _check_ext_table_def),
    ("/opt/extension_mechanism/data/data_values_for_extensions", 59, "extensions",
     lambda ctx: _skip("requires manual inspection of extensions in use")),
    ("/opt/extension_mechanism/data/data_values_table_name", 60, "extensions", _check_ext_table_name),
    ("/opt/extension_mechanism/data/data_values_column_name", 61, "extensions", _check_ext_column_name),
    ("/opt/extension_mechanism/data/data_values_extension_name", 62, "extensions", _check_ext_name),
    ("/opt/extension_mechanism/data/data_values_definition", 63, "extensions", _check_ext_definition),
    ("/opt/extension_mechanism/data/data_values_scope", 64, "extensions", _check_ext_scope),
    ("/opt/attributes/contents/data/attributes_row", 118, "attributes", _check_attributes_row),
]


def validate(path: str) -> List[Dict]:
    """Run the 41-check abstract test suite; one result map per check."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        ctx = _Ctx(con, str(path))
        results = []
        for cid, req, cat, fn in CHECKS:
            try:
                status, msg = fn(ctx)
            except Exception as e:  # a crashed check is a failed check
                status, msg = "fail", f"exception: {e}"
            results.append(
                {"id": cid, "req": f"Req {req}", "category": cat,
                 "status": status, "message": msg}
            )
        return results
    finally:
        con.close()


def failures(results: List[Dict]) -> List[Dict]:
    return [r for r in results if r["status"] == "fail"]


def is_valid(path: str) -> bool:
    return not failures(validate(path))
