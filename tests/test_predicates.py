"""Predicate truth tables ported from index_test.clj:16-143 and the
core predicate surface (core.clj:266-275)."""

import math

import numpy as np

from geospark.geom import core as C, ops as O
from geospark.geom import predicates as P

SQ1 = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
SQ2 = "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))"
FAR = "POLYGON ((1010 1010, 1020 1010, 1020 1020, 1010 1020, 1010 1010))"


def g(w):
    return C.from_wkt(w)


def test_intersecting_truth_table():
    # index_test.clj:16-28
    assert P.intersects(g(SQ1), g("POINT (5 5)"))
    assert not P.intersects(g(SQ2), g("POINT (5 5)"))
    # empty query intersects nothing
    assert not P.intersects(g(SQ1), g("POLYGON EMPTY"))
    assert not P.intersects(g("POLYGON EMPTY"), g(SQ1))


def test_centroid_intersecting():
    # index_test.clj:30-42: query polygon vs entry centroids
    q = g("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))")
    assert P.intersects(q, O.centroid(g(SQ1)))
    assert not P.intersects(q, O.centroid(g(SQ2)))
    q2 = g("POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))")
    assert not P.intersects(q2, O.centroid(g(SQ1)))
    assert not P.intersects(q2, O.centroid(g(SQ2)))


def test_touching():
    # index_test.clj:64-71: POINT (0 0) touches SQ1, not SQ2
    assert P.touches(g(SQ1), g("POINT (0 0)"))
    assert not P.touches(g(SQ2), g("POINT (0 0)"))
    # corner-touching squares touch
    assert P.touches(g(SQ1), g(SQ2))
    # interior point does not touch
    assert not P.touches(g(SQ1), g("POINT (5 5)"))
    # edge-sharing squares touch
    assert P.touches(g(SQ1), g("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"))


def test_overlapping():
    # index_test.clj:73-82: query overlaps SQ1 and SQ2, not the small one
    q = g("POLYGON ((5 5, 11 5, 11 11, 5 11, 5 5))")
    assert P.overlaps(q, g(SQ1)) and P.overlaps(g(SQ1), q)
    assert P.overlaps(q, g(SQ2))
    small = g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert not P.overlaps(q, small)
    # containment is not overlap
    assert not P.overlaps(g(SQ1), small)


def test_strip_overlap_same_extent_boxes():
    # regression (found by the driver predicate oracle): same-x-extent
    # boxes overlapping in a y-strip — every corner of the overlap
    # region lies on both boundaries and neither centroid is inside the
    # other, so the sampling heuristics all miss; the overlay fallback
    # must classify this as overlaps, NOT touches
    a = g("POLYGON ((19 11, 29 11, 29 21, 19 21, 19 11))")
    b = g("POLYGON ((19 3, 29 3, 29 13, 19 13, 19 3))")
    assert P.intersects(a, b)
    assert P.overlaps(a, b) and P.overlaps(b, a)
    assert not P.touches(a, b)
    # shifted to share only the y=11/13→11 edge: touches, not overlaps
    c = g("POLYGON ((19 1, 29 1, 29 11, 19 11, 19 1))")
    assert P.touches(a, c)
    assert not P.overlaps(a, c)


def test_covered_by():
    # index_test.clj:84-93: query covers SQ1 and SQ2 but not the
    # triangle poking out to x=-1 (orientation: query covers entry)
    q = g("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")
    tri = g("POLYGON ((-1 0, 1 0, 1 1, 0 1, -1 0))")
    assert P.covers(q, g(SQ1))
    assert P.covers(q, g(SQ2))
    assert not P.covers(q, tri)
    # covers self
    assert P.covers(g(SQ1), g(SQ1))
    # contains requires interior intersection
    assert P.contains(q, g(SQ1))
    assert not P.contains(g(SQ1), g(SQ1)) is None  # contains(self) is True in OGC
    assert P.contains(g(SQ1), g("POINT (5 5)"))
    assert not P.contains(g(SQ1), g("POINT (0 0)"))  # boundary point
    assert P.covers(g(SQ1), g("POINT (0 0)"))


def test_polygon_with_hole_predicates():
    holed = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))")
    assert not P.contains(holed, g("POINT (5 5)"))  # in the hole
    assert P.contains(holed, g("POINT (1 1)"))
    inner = g("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")
    assert not P.covers(holed, inner)
    assert P.touches(holed, g("POINT (3 3)"))  # hole boundary


def test_distance_and_closest_points():
    d = P.distance(g(SQ1), g(FAR))
    assert abs(d - math.hypot(1000, 1000)) < 1e-9
    assert P.distance(g(SQ1), g(SQ2)) == 0.0
    dist, pa, pb = P.closest_points(g("LINESTRING (0 0, 10 0)"), g("POINT (5 3)"))
    assert dist == 3.0 and pa == (5.0, 3.0 - 3.0) and pb == (5.0, 3.0)


def test_bbox_distance():
    ea = g(SQ1).envelope()
    eb = g(FAR).envelope()
    assert abs(P.bbox_distance(ea, eb) - math.hypot(1000, 1000)) < 1e-9
    assert P.bbox_distance(ea, g(SQ2).envelope()) == 0.0


def test_prepared_polygon_batch():
    pp = P.PreparedPolygon(g(SQ1))
    xs = np.array([5.0, 0.0, -1.0, 10.0, 15.0])
    ys = np.array([5.0, 0.0, 5.0, 5.0, 15.0])
    loc = pp.locate_batch(xs, ys)
    assert list(loc) == [P.INTERIOR, P.BOUNDARY, P.EXTERIOR, P.BOUNDARY, P.EXTERIOR]


def test_prepared_polygon_large_bucketed():
    # force the y-bucket index path (>=256 edges)
    ang = np.linspace(0, 2 * np.pi, 400)
    ring = np.column_stack([np.cos(ang) * 100, np.sin(ang) * 100])
    ring[-1] = ring[0]
    poly = C.Geometry(C.POLYGON, [ring])
    pp = P.PreparedPolygon(poly)
    xs = np.array([0.0, 99.9, 101.0])
    ys = np.array([0.0, 0.0, 0.0])
    loc = pp.locate_batch(xs, ys)
    assert loc[0] == P.INTERIOR and loc[2] == P.EXTERIOR
