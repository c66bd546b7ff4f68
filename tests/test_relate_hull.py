"""DE-9IM relate + concave hull tests."""

from geospark.geom import core as C, ops as O
from geospark.geom.hull import concave_hull
from geospark.geom.relate import relate_matrix, relates

SQ1 = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"


def g(w):
    return C.from_wkt(w)


def test_relate_matrices_match_jts():
    cases = [
        (SQ1, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))", "212101212"),        # overlap
        (SQ1, "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))", "FF2F01212"),  # corner touch
        (SQ1, "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))", "FF2F11212"),     # edge touch
        (SQ1, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", "212FF1FF2"),            # contains
        (SQ1, "POINT (5 5)", "0F2FF1FF2"),                                     # pip
        (SQ1, "LINESTRING (-5 5, 15 5)", "1F20F1102"),                         # line crosses
        (SQ1, SQ1, "2FFF1FFF2"),                                               # equal
    ]
    for a, b, exp in cases:
        assert relate_matrix(g(a), g(b)) == exp, (a, b)


def test_relate_area_area_short_contact_stretches():
    # regression (found by the driver relate oracle): contact/overlap
    # features spanning <10% of an edge were missed by the old
    # fixed-offset sampler — the area×area path is now overlay-exact
    cases = [
        # tiny corner overlap [8,9]×[12,13] of a 10-unit and 5-unit box
        ("POLYGON ((8 12, 18 12, 18 22, 8 22, 8 12))",
         "POLYGON ((4 8, 9 8, 9 13, 4 13, 4 8))", "212101212"),
        # edge touch where the shared segment is 1/15 of A's edge
        ("POLYGON ((2 18, 17 18, 17 33, 2 33, 2 18))",
         "POLYGON ((17 9, 27 9, 27 19, 17 19, 17 9))", "FF2F11212"),
        # same-x-extent strip overlap (collinear side edges)
        ("POLYGON ((19 11, 29 11, 29 21, 19 21, 19 11))",
         "POLYGON ((19 3, 29 3, 29 13, 19 13, 19 3))", "212111212"),
    ]
    for a, b, exp in cases:
        assert relate_matrix(g(a), g(b)) == exp, (a, b)


def test_relates_masks():
    a = g(SQ1)
    ov = g("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    t = g("POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))")
    assert relates(a, ov, "T********")          # intersects
    # OGC touches = any of the three masks; corner touch hits BB
    assert (
        relates(a, t, "FT*******")
        or relates(a, t, "F**T*****")
        or relates(a, t, "F***T****")
    )
    assert relates(a, a, "T*F**FFF*")           # equals mask
    assert not relates(a, ov, "FT*******")


def test_concave_hull_ratio_one_is_convex():
    pts = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5), (2, 7)]
    ch = concave_hull(C.multi_point(pts), 1.0)
    assert abs(O.area(ch) - 100.0) < 1e-9


def test_concave_hull_digs_into_concavity():
    # U-shape: dense points along three sides, opening at the top
    pts = (
        [(x, 0.0) for x in range(0, 21)]
        + [(0.0, y) for y in range(0, 21)]
        + [(20.0, y) for y in range(0, 21)]
        + [(x, 20.0) for x in (0, 1, 19, 20)]
    )
    g_ = C.multi_point(pts)
    convex = concave_hull(g_, 1.0)
    concave = concave_hull(g_, 0.0)
    assert O.area(concave) < O.area(convex)
    assert O.area(concave) > 0


def test_concave_hull_few_points():
    assert concave_hull(C.multi_point([(0, 0), (1, 0)]), 0.5).gtype == C.LINESTRING
    tri = concave_hull(C.multi_point([(0, 0), (4, 0), (0, 3)]), 0.2)
    assert abs(O.area(tri) - 6.0) < 1e-9
