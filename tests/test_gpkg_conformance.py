"""Conformance suite as executable spec (gpkg_conformance_test.clj):
the validator must pass on our own writer's output, and the negative
tests corrupt bytes to flip specific checks to fail."""

import sqlite3

import pandas as pd
import pytest

from geospark.geom import core as C
from geospark.io import gpkg
from geospark.io.gpkg_validate import failures, is_valid, validate


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


def test_writer_output_conforms(written):
    res = validate(written)
    assert failures(res) == [], failures(res)
    assert is_valid(written)
    # every category exercised
    cats = {r["category"] for r in res}
    assert {"core", "features"} <= cats


def test_non_spatial_only_is_not_applicable(spark, tmp_path):
    path = str(tmp_path / "attrs.gpkg")
    gpkg.write_gpkg(
        spark.createDataFrame(pd.DataFrame({"k": [1]})), path, "t", geom_col=None
    )
    res = validate(path)
    assert failures(res) == []
    assert any(r["status"] == "not-applicable" for r in res)


def test_corrupt_application_id_fails_core2(written):
    # gpkg_conformance_test.clj:102-133 negative test: flip the
    # application_id at offset 68
    with open(written, "r+b") as fh:
        fh.seek(68)
        fh.write(b"\x00\x00\x00\x00")
    res = validate(written)
    bad = [r for r in res if r["status"] == "fail"]
    assert any(r["id"] == "core-2" for r in bad)


def test_corrupt_geometry_magic_fails_feat19(written):
    con = sqlite3.connect(written)
    blob = bytearray(con.execute("SELECT geom FROM pts WHERE fid=1").fetchone()[0])
    blob[0] = 0x00  # break the "GP" magic
    con.execute("UPDATE pts SET geom=? WHERE fid=1", (bytes(blob),))
    con.commit()
    con.close()
    res = validate(written)
    assert any(r["id"] == "feat-19-pts" and r["status"] == "fail" for r in res)


def test_missing_contents_row_fails(written):
    con = sqlite3.connect(written)
    con.execute("UPDATE gpkg_contents SET table_name='ghost'")
    con.commit()
    con.close()
    res = validate(written)
    assert any(r["id"] == "core-14" and r["status"] == "fail" for r in res)
