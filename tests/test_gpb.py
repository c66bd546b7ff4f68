"""GeoPackage blob codec tests — ported from encode_test.clj:38-90
including the captured GeoTools blob."""

import struct

import pytest

from geospark.geom import core as C
from geospark.io import gpb

_ENV_N = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def build_blob(g, srid, little, env_code):
    """Header variant builder (encode_test.clj:15-36)."""
    n_env = _ENV_N[env_code]
    flags = (0x01 if little else 0) | (env_code << 1)
    order = "<" if little else ">"
    header = struct.pack(f"{order}2sBBi", b"GP", 0, flags, srid)
    header += struct.pack(f"{order}{'d' * n_env}", *([0.0] * n_env))
    return header + C.to_wkb(g)


def test_decode_header_variants():
    gm = C.point(1, 2)
    for little in (True, False):
        for env_code in (0, 1, 2, 3, 4):
            g, srid = gpb.decode(build_blob(gm, 27700, little, env_code))
            assert C.geom_eq(g, gm), (little, env_code)
            assert srid == 27700 and g.srid == 27700


def test_decode_bad_magic():
    with pytest.raises(gpb.GpbError):
        gpb.decode(bytes(8))


def test_empty_geometry_roundtrip():
    empty_pt = C.empty(C.POINT)
    blob = gpb.encode(empty_pt, 27700)
    g, srid = gpb.decode(blob)
    assert g.is_empty() and srid == 27700
    assert blob[3] & 0x10  # empty bit


def test_decode_geotools_reference():
    # captured blob from encode_test.clj:64-72 (big-endian header,
    # xy envelope, big-endian WKB point 1 2, srid 27700)
    blob = bytes.fromhex(
        "4750000200006c34"
        "3ff0000000000000"
        "3ff0000000000000"
        "4000000000000000"
        "4000000000000000"
        "0000000001"
        "3ff0000000000000"
        "4000000000000000"
    )
    g, srid = gpb.decode(blob)
    assert C.geom_eq(g, C.point(1, 2))
    assert srid == 27700
    assert gpb.envelope_from_header(blob) == (1.0, 1.0, 2.0, 2.0)


def test_roundtrip_all_types():
    for gm in [
        C.point(1, 2),
        C.line_string([[0, 0], [1, 1], [2, 3]]),
        C.polygon([[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]),
        C.multi_point([[1, 2], [3, 4]]),
        C.multi_polygon([[[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]]),
    ]:
        g, srid = gpb.decode(gpb.encode(gm, 27700))
        assert C.geom_eq(g, gm)
        assert srid == 27700


def test_nil_passthrough():
    assert gpb.encode(None, 27700) is None
    assert gpb.decode(None) is None
