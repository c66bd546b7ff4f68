"""Conformance suite as executable spec (gpkg_conformance_test.clj):
the full 41-check validator must pass on our own writer's output, and
the negative tests corrupt bytes/rows to flip specific checks to fail
(one per check class: core header, geometry blob, contents, geometry
columns, extensions, attributes)."""

import sqlite3

import pandas as pd
import pytest

from geospark.geom import core as C
from geospark.io import gpkg
from geospark.io.gpkg_validate import CHECKS, failures, is_valid, validate


@pytest.fixture
def written(spark, tmp_path):
    path = str(tmp_path / "conf.gpkg")
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "geom": [C.to_wkb(C.point(1, 2)), C.to_wkb(C.point(3, 4))],
                "name": ["a", "b"],
            }
        )
    )
    gpkg.write_gpkg(df, path, "pts", srid=27700)
    return path


def _failed_ids(res):
    return {r["id"] for r in res if r["status"] == "fail"}


def test_registry_is_complete():
    # the reference registry spans 41 checks (validate.clj:602-647)
    assert len(CHECKS) == 41
    cats = [c[2] for c in CHECKS]
    assert cats.count("core") == 15
    assert cats.count("features") == 18
    assert cats.count("extensions") == 7
    assert cats.count("attributes") == 1


def test_writer_output_conforms(written):
    res = validate(written)
    assert failures(res) == [], failures(res)
    assert is_valid(written)
    assert len(res) == 41
    cats = {r["category"] for r in res}
    assert {"core", "features", "extensions", "attributes"} <= cats
    # req 59 is the reference's manual-inspection skip
    assert any(r["status"] == "skip" for r in res)


def test_non_spatial_only_fails_req17_only(spark, tmp_path):
    # attributes-only gpkg: feature checks are not-applicable, but
    # req 17 (/opt/valid_geopackage) fails — reference semantics
    path = str(tmp_path / "attrs.gpkg")
    gpkg.write_gpkg(
        spark.createDataFrame(pd.DataFrame({"k": [1]})), path, "t", geom_col=None
    )
    res = validate(path)
    assert _failed_ids(res) == {"/opt/valid_geopackage"}
    assert any(r["status"] == "not-applicable" for r in res)
    # the attributes check passes (integer pk present)
    att = next(r for r in res if r["category"] == "attributes")
    assert att["status"] == "pass"


def test_corrupt_application_id_fails_req2(written):
    # gpkg_conformance_test.clj:102-133 negative test: flip the
    # application_id at offset 68
    with open(written, "r+b") as fh:
        fh.seek(68)
        fh.write(b"\x00\x00\x00\x00")
    res = validate(written)
    assert "/base/core/container/data/file_format/application_id" in _failed_ids(res)


def test_corrupt_geometry_magic_fails_req19(written):
    con = sqlite3.connect(written)
    blob = bytearray(con.execute("SELECT geom FROM pts WHERE fid=1").fetchone()[0])
    blob[0] = 0x00  # break the "GP" magic
    con.execute("UPDATE pts SET geom=? WHERE fid=1", (bytes(blob),))
    con.commit()
    con.close()
    res = validate(written)
    assert "/opt/features/geometry_encoding/data/blob" in _failed_ids(res)


def test_missing_contents_row_fails_req14(written):
    con = sqlite3.connect(written)
    con.execute("PRAGMA foreign_keys = OFF")
    con.execute("UPDATE gpkg_contents SET table_name='ghost'")
    con.commit()
    con.close()
    res = validate(written)
    assert "/base/core/contents/data/data_values_table_name" in _failed_ids(res)


def test_bad_last_change_fails_req15(written):
    con = sqlite3.connect(written)
    con.execute("UPDATE gpkg_contents SET last_change='yesterday'")
    con.commit()
    con.close()
    res = validate(written)
    assert "/base/core/contents/data/data_values_last_change" in _failed_ids(res)


def test_bad_z_m_fail_req27_req28(written):
    con = sqlite3.connect(written)
    con.execute("UPDATE gpkg_geometry_columns SET z=7, m=9")
    con.commit()
    con.close()
    res = validate(written)
    bad = _failed_ids(res)
    assert "/opt/features/geometry_columns/data/data_values_z" in bad
    assert "/opt/features/geometry_columns/data/data_values_m" in bad


def test_srs_id_mismatch_fails_req146(written):
    con = sqlite3.connect(written)
    con.execute("PRAGMA foreign_keys = OFF")
    con.execute("UPDATE gpkg_geometry_columns SET srs_id=4326")
    con.commit()
    con.close()
    res = validate(written)
    assert (
        "/opt/features/geometry_columns/data/data_values_srs_id_match"
        in _failed_ids(res)
    )
    # blob headers still carry 27700 → req 33 fails too
    assert (
        "/opt/features/vector_features/data/data_value_geometry_srs_id"
        in _failed_ids(res)
    )


def test_bad_geometry_type_name_fails_req25(written):
    con = sqlite3.connect(written)
    con.execute("UPDATE gpkg_geometry_columns SET geometry_type_name='BLOB'")
    con.commit()
    con.close()
    res = validate(written)
    assert (
        "/opt/features/geometry_columns/data/data_values_geometry_type_name"
        in _failed_ids(res)
    )


def test_declared_type_mismatch_fails_req32(written):
    # declare POINT but store a LINESTRING blob
    con = sqlite3.connect(written)
    con.execute("UPDATE gpkg_geometry_columns SET geometry_type_name='LINESTRING'")
    con.commit()
    con.close()
    res = validate(written)
    assert (
        "/opt/features/vector_features/data/data_values_geometry_type"
        in _failed_ids(res)
    )


def test_extension_rows_validated(written):
    # well-formed extension rows pass; bad name/scope/definition fail
    con = sqlite3.connect(written)
    con.execute(
        """CREATE TABLE gpkg_extensions (
             table_name TEXT, column_name TEXT, extension_name TEXT NOT NULL,
             definition TEXT NOT NULL, scope TEXT NOT NULL)"""
    )
    con.execute(
        "INSERT INTO gpkg_extensions VALUES ('pts', 'geom', 'acme_magic', "
        "'https://example.org/ext', 'read-write')"
    )
    con.commit()
    con.close()
    assert is_valid(written)

    con = sqlite3.connect(written)
    con.execute(
        "INSERT INTO gpkg_extensions VALUES ('pts', 'nope', 'gpkg_bogus', "
        "'see my notes', 'sometimes')"
    )
    con.commit()
    con.close()
    res = validate(written)
    bad = _failed_ids(res)
    assert "/opt/extension_mechanism/data/data_values_column_name" in bad
    assert "/opt/extension_mechanism/data/data_values_extension_name" in bad
    assert "/opt/extension_mechanism/data/data_values_definition" in bad
    assert "/opt/extension_mechanism/data/data_values_scope" in bad


def test_attributes_pk_fails_req118(spark, tmp_path):
    path = str(tmp_path / "badattr.gpkg")
    gpkg.write_gpkg(
        spark.createDataFrame(pd.DataFrame({"k": [1]})), path, "t", geom_col=None
    )
    con = sqlite3.connect(path)
    con.execute("PRAGMA foreign_keys = OFF")
    con.execute("CREATE TABLE t2 (fid TEXT PRIMARY KEY, v TEXT)")
    con.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier) "
        "VALUES ('t2', 'attributes', 't2')"
    )
    con.commit()
    con.close()
    res = validate(path)
    assert "/opt/attributes/contents/data/attributes_row" in _failed_ids(res)
