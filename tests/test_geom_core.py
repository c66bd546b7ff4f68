"""Kernel substrate tests: codecs, measures, construction, normalize.

Golden values ported from the reference test suite
(core_test.clj / grid_test.clj); comparisons follow the g=/f=
convention: normalize, then exact coordinates.
"""

import math

import numpy as np
import pytest

from geospark.geom import core as C, ops as O
from tests.conftest import wkt_set


def test_wkt_wkb_roundtrip():
    cases = [
        "POINT (1 2)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
        "MULTIPOINT ((0 0), (1 1))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 4 4))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))",
        "GEOMETRYCOLLECTION (POINT (6 6), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))",
        "POLYGON EMPTY",
        "LINESTRING EMPTY",
        "POINT EMPTY",
    ]
    for w in cases:
        g = C.from_wkt(w)
        g2 = C.from_wkb(C.to_wkb(g))
        assert C.geom_eq(g, g2), w


def test_type_predicates():
    # reference types-test (core_test.clj:8-29)
    assert C.point(1, 1).gtype == C.POINT
    assert C.multi_point([[0, 0], [1, 1]]).gtype == C.MULTIPOINT
    assert C.line_string([[0, 0], [1, 1]]).gtype == C.LINESTRING
    assert C.multi_line_string([[[0, 0], [1, 1]], [[2, 2], [4, 4]]]).gtype == C.MULTILINESTRING
    assert C.polygon([[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]).gtype == C.POLYGON
    assert C.multi_polygon([[[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]]]).gtype == C.MULTIPOLYGON
    assert C.collection([C.point(6, 6)]).gtype == C.GEOMETRYCOLLECTION


def test_polygons_of_nested_collections():
    # core_test.clj:31-48
    p1 = C.polygon([[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]])
    p2 = C.polygon([[2, 2], [2, 3], [3, 3], [3, 2], [2, 2]])
    nested = C.collection([C.point(5, 5), p1, C.collection([C.point(6, 6), p2])])
    got = O.polygons_of(nested)
    assert wkt_set(got) == wkt_set([p1, p2])


def test_holes_of():
    # core_test.clj:54-62
    hole = [[5, 5], [5, 6], [6, 6], [6, 5], [5, 5]]
    poly = C.polygon([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], [hole])
    assert wkt_set(O.holes_of(poly)) == wkt_set([C.polygon(hole)])
    mp = C.multi_polygon([poly])
    assert wkt_set(O.holes_of(mp)) == wkt_set([C.polygon(hole)])


def test_measures():
    sq = C.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert O.area(sq) == 100.0
    assert O.length(sq) == 40.0
    withhole = C.from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    )
    assert O.area(withhole) == 96.0
    cen = O.centroid(sq)
    assert (cen.parts[0] == [5.0, 5.0]).all()
    assert abs(O.thinness_ratio(sq) - 4 * math.pi * 100 / 1600) < 1e-12


def test_envelope_and_boundary():
    sq = C.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert sq.envelope() == (0, 0, 10, 10)
    b = O.boundary_of(sq)
    assert b.gtype == C.LINESTRING and b.ring
    ls = C.from_wkt("LINESTRING (0 0, 5 5)")
    bb = O.boundary_of(ls)
    assert bb.gtype == C.MULTIPOINT and len(bb.parts) == 2
    eps = O.endpoints_of(ls)
    assert (eps[0].parts[0] == [0, 0]).all() and (eps[1].parts[0] == [5, 5]).all()


def test_grid_golden():
    # grid_test.clj:6-18 — exact 9-cell grid
    cells = O.make_grid(C.from_wkt("POLYGON((0 0, 100 0, 100 100, 0 100, 0 0))"), 100)
    expected = [
        "POLYGON ((-100 -100, -100 0, 0 0, 0 -100, -100 -100))",
        "POLYGON ((0 -100, 0 0, 100 0, 100 -100, 0 -100))",
        "POLYGON ((100 -100, 100 0, 200 0, 200 -100, 100 -100))",
        "POLYGON ((-100 0, -100 100, 0 100, 0 0, -100 0))",
        "POLYGON ((0 0, 0 100, 100 100, 100 0, 0 0))",
        "POLYGON ((100 0, 100 100, 200 100, 200 0, 100 0))",
        "POLYGON ((-100 100, -100 200, 0 200, 0 100, -100 100))",
        "POLYGON ((0 100, 0 200, 100 200, 100 100, 0 100))",
        "POLYGON ((100 100, 100 200, 200 200, 200 100, 100 100))",
    ]
    assert wkt_set(cells) == wkt_set(expected)


def test_smooth_goldens():
    # core_test.clj:186-202 — bit-exact Chaikin output
    ls = C.line_string([[0, 0], [0, 10], [10, 10]])
    assert C.to_wkt(O.smooth(ls, 1)) == "LINESTRING (0 0, 0 7.5, 2.5 10, 10 10)"
    assert C.to_wkt(O.smooth(ls, 3)) == (
        "LINESTRING (0 0, 0 4.21875, 0.15625 6.25, 0.46875 7.5, 0.9375 8.4375, "
        "1.5625 9.0625, 2.5 9.53125, 3.75 9.84375, 5.78125 10, 10 10)"
    )
    five = C.to_wkt(O.smooth(ls, 5))
    assert five.startswith("LINESTRING (0 0, 0 2.373046875, 0.009765625 3.5546875,")
    assert "7.626953125 10, 10 10)" in five
    # 2-coordinate lines unchanged; empty unchanged
    two = C.line_string([[0, 0], [0, 10]])
    assert C.geom_eq(O.smooth(two, 1), two)
    assert O.smooth(C.line_string([]), 1).is_empty()


def test_interpolate_endpoint_exactness():
    # core.clj:661-670: pct 0/1 return the endpoints exactly
    c1, c2 = (0.1, 0.2), (0.7, 0.9)
    assert O.interpolate(c1, c2, 0.0) == (0.1, 0.2)
    assert O.interpolate(c1, c2, 1.0) == (0.7, 0.9)
    x, y = O.interpolate((0, 0), (10, 10), 0.25)
    assert (x, y) == (2.5, 2.5)


def test_convex_hull():
    g = C.multi_point([[0, 0], [10, 0], [10, 10], [0, 10], [5, 5]])
    h = O.convex_hull(g)
    assert O.area(h) == 100.0


def test_line_merge_goldens():
    # core_test.clj:122-137
    r = O.line_merge(
        [
            C.from_wkt("LINESTRING (0 0, 3 3)"),
            C.from_wkt("LINESTRING (3 3, 5 5)"),
            C.from_wkt("LINESTRING (5 5, 3 1)"),
        ]
    )
    assert wkt_set(r) == wkt_set(["LINESTRING (0 0, 3 3, 5 5, 3 1)"])
    r = O.line_merge(
        [C.from_wkt("LINESTRING (0 0, 3 3)"), C.from_wkt("LINESTRING (0 5, 5 5)")]
    )
    assert wkt_set(r) == wkt_set(["LINESTRING (0 0, 3 3)", "LINESTRING (0 5, 5 5)"])
    r = O.line_merge(
        [
            C.from_wkt("LINESTRING (0 0, 0 1)"),
            C.from_wkt("LINESTRING (0 1, 0 5)"),
            C.from_wkt("LINESTRING (1 1, 1 5)"),
            C.from_wkt("LINESTRING (1 5, 8 7)"),
            C.from_wkt("LINESTRING (0 10, 10 10)"),
        ]
    )
    assert wkt_set(r) == wkt_set(
        [
            "LINESTRING (0 0, 0 1, 0 5)",
            "LINESTRING (0 10, 10 10)",
            "LINESTRING (1 1, 1 5, 8 7)",
        ]
    )


def test_densify_and_precision():
    l = C.line_string([[0, 0], [10, 0]])
    d = O.densify(l, 3.0)
    seg = np.diff(d.parts, axis=0)
    assert (np.hypot(seg[:, 0], seg[:, 1]) <= 3.0 + 1e-12).all()
    g = C.point(1.2345, 5.6789)
    snapped = O.change_precision(g, 10.0)  # decimetre grid
    assert (snapped.parts[0] == [1.2, 5.7]).all()


def test_normalize_idempotent_and_orientation():
    p_ccw = C.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    p_cw = C.from_wkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")
    assert C.to_wkb(C.normalize(p_ccw)) == C.to_wkb(C.normalize(p_cw))
    n = C.normalize(p_ccw)
    assert C.to_wkb(C.normalize(n)) == C.to_wkb(n)
