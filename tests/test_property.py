"""Property-based tests (hypothesis) — roundtrips and geometric
invariants the fixture goldens can't cover exhaustively."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from geospark.cells import cellid as CI
from geospark.geom import core as C, ops as O, overlay as OV
from geospark.geom.predicates import EXTERIOR, INTERIOR, PreparedPolygon

# realistic coordinates: bounded magnitude, quantized to mm — survey
# data never carries denormals; adversarial sub-ulp slivers are the
# OverlayNG-robustness class the reference also only best-efforts
# (core.clj:401-412) and are out of property scope
coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=64
).map(lambda v: round(v, 3))


@st.composite
def points(draw):
    return C.point(draw(coord), draw(coord))


@st.composite
def linestrings(draw):
    n = draw(st.integers(2, 12))
    return C.line_string([[draw(coord), draw(coord)] for _ in range(n)])


@st.composite
def convex_polys(draw):
    """Random convex polygon via hull of random points (always valid)."""
    n = draw(st.integers(3, 12))
    pts = [[draw(coord), draw(coord)] for _ in range(n)]
    h = O.convex_hull(C.multi_point(pts))
    if h.gtype != C.POLYGON:
        # degenerate collinear draw — nudge into a triangle
        return C.polygon([[0, 0], [1, 0], [0, 1], [0, 0]])
    return h


@given(st.one_of(points(), linestrings(), convex_polys()))
@settings(max_examples=200, deadline=None)
def test_wkb_wkt_roundtrip(g):
    assert C.geom_eq(C.from_wkb(C.to_wkb(g)), g)
    assert C.geom_eq(C.from_wkt(C.to_wkt(g)), g)


@given(convex_polys())
@settings(max_examples=100, deadline=None)
def test_normalize_idempotent(g):
    n1 = C.normalize(g)
    assert C.to_wkb(C.normalize(n1)) == C.to_wkb(n1)


@given(convex_polys(), st.integers(0, 1000))
@settings(max_examples=100, deadline=None)
def test_pip_centroid_inside_convex(g, _seed):
    from hypothesis import note
    note("G: " + C.to_wkt(g))
    from hypothesis import assume
    assume(O.area(g) > 1e-9 * max(1.0, O.length(g)))  # skip degenerate slivers
    cen = O.centroid(g)
    pp = PreparedPolygon(g)
    loc = pp.locate_batch(cen.parts[:, 0], cen.parts[:, 1])
    assert loc[0] != EXTERIOR  # centroid of a convex polygon is inside


@given(convex_polys())
@settings(max_examples=60, deadline=None)
def test_pip_matches_bbox_exclusion(g):
    xmin, ymin, xmax, ymax = g.envelope()
    w, h = xmax - xmin, ymax - ymin
    pp = PreparedPolygon(g)
    outside = np.array(
        [[xmin - 1 - w, ymin - 1 - h], [xmax + 1 + w, ymax + 1 + h]]
    )
    assert (pp.locate_batch(outside[:, 0], outside[:, 1]) == EXTERIOR).all()


@given(convex_polys(), convex_polys())
@settings(max_examples=40, deadline=None)
def test_overlay_area_invariants(a, b):
    from hypothesis import note
    note("A: " + C.to_wkt(a))
    note("B: " + C.to_wkt(b))
    from hypothesis import assume
    assume(O.area(a) > 1e-9 * max(1.0, O.length(a)))
    assume(O.area(b) > 1e-9 * max(1.0, O.length(b)))
    area_a = O.area(a)
    area_b = O.area(b)
    inter = O.area(OV.intersection(a, b))
    union = O.area(OV.union(a, b))
    diff = O.area(OV.difference(a, b))
    # overlay is snap-rounded: areas can shift by up to
    # perimeter × half-pixel per input (documented quantization)
    scale = OV._pick_scale(a, b)
    tol = 4.0 * (O.length(a) + O.length(b)) / scale + 1e-6 * max(
        1.0, area_a + area_b
    )
    # inclusion–exclusion and partition identities
    assert abs(union - (area_a + area_b - inter)) <= tol
    assert abs(diff - (area_a - inter)) <= tol
    assert inter <= min(area_a, area_b) + tol
    assert union + tol >= max(area_a, area_b)


@given(
    st.integers(0, (1 << 20) - 1),
    st.integers(0, (1 << 20) - 1),
    st.integers(1, 20),
)
@settings(max_examples=200, deadline=None)
def test_cellid_roundtrip_and_parent(ix, iy, level):
    n = 1 << level
    ix, iy = ix % n, iy % n
    cid = CI.pack(np.array([ix]), np.array([iy]), level)
    l, rx, ry = CI.unpack(cid)
    assert (l[0], rx[0], ry[0]) == (level, ix, iy)
    p = CI.parent(cid)
    pl, px, py = CI.unpack(p)
    assert (pl[0], px[0], py[0]) == (level - 1, ix // 2, iy // 2)
    assert int(cid[0]) in CI.children(int(p[0]))


@given(st.floats(min_value=0, max_value=700000), st.floats(min_value=0, max_value=1200000))
@settings(max_examples=100, deadline=None)
def test_crs_roundtrip_property(e, n):
    # realistic National Grid domain; beyond ~1200 km north the OS
    # TM series truncation itself exceeds 1 cm (proj4j behaves alike)
    from geospark.crs.osgb import bng_to_wgs84, wgs84_to_bng

    lon, lat = bng_to_wgs84(e, n)
    e2, n2 = wgs84_to_bng(lon, lat)
    assert abs(float(e2) - e) < 0.01
    assert abs(float(n2) - n) < 0.01


@settings(max_examples=120, deadline=None)
@given(
    st.tuples(
        st.integers(0, 30), st.integers(0, 30), st.integers(1, 20), st.integers(1, 20)
    ),
    st.tuples(
        st.integers(0, 30), st.integers(0, 30), st.integers(1, 20), st.integers(1, 20)
    ),
)
def test_predicates_consistent_with_de9im(ra, rb):
    """Cross-kernel consistency: each binary predicate must equal its
    JTS DE-9IM mask evaluated on the (exact, area-area) relate matrix."""
    from geospark.geom import core as C2
    from geospark.geom import predicates as P2
    from geospark.geom.relate import relate_matrix, relates

    def box(x0, y0, w, h):
        return C2.from_wkt(
            f"POLYGON (({x0} {y0}, {x0+w} {y0}, {x0+w} {y0+h}, {x0} {y0+h}, {x0} {y0}))"
        )

    a = box(*ra)
    b = box(*rb)
    m = relate_matrix(a, b)
    assert P2.intersects(a, b) == (not (m[0] == "F" and m[1] == "F" and m[3] == "F" and m[4] == "F"))
    assert P2.touches(a, b) == (
        m[0] == "F" and (m[1] != "F" or m[3] != "F" or m[4] != "F")
    )
    assert P2.overlaps(a, b) == relates(a, b, "T*T***T**")
    covers_masks = ["T*****FF*", "*T****FF*", "***T**FF*", "****T*FF*"]
    assert P2.covers(a, b) == any(relates(a, b, mk) for mk in covers_masks)
    assert P2.contains(a, b) == relates(a, b, "T*****FF*")


# ---------------------------------------------------------------------------
# winnowing (text/fingerprint.py): the composite-key window-min
# formulation must equal the textbook definition (Schleimer et al.
# SIGMOD'03: every window selects its RIGHTMOST minimum), and the
# guarantee must hold.  Pure-python mirrors of both formulations using
# the same md5 arithmetic as the Spark/DuckDB implementations.
# ---------------------------------------------------------------------------

def _kgram_hashes_py(text, k):
    import hashlib

    return [
        int.from_bytes(hashlib.md5(text[i : i + k].encode()).digest()[:4], "big")
        for i in range(len(text) - k + 1)
    ]


def _winnow_textbook(text, k, w):
    hs = _kgram_hashes_py(text, k)
    sel = set()
    for s in range(0, len(hs) - w + 1):
        window = hs[s : s + w]
        m = min(window)
        p = max(j for j in range(w) if window[j] == m)  # rightmost min
        sel.add((s + p + 1, m))  # 1-based k-gram position
    return sel


def _winnow_keyform(text, k, w):
    POS = 2**31
    hs = _kgram_hashes_py(text, k)
    keys = [h * POS + (POS - 1 - (i + 1)) for i, h in enumerate(hs)]
    sel = set()
    for s in range(0, len(keys) - w + 1):
        mk = min(keys[s : s + w])
        sel.add((POS - 1 - (mk % POS), mk >> 31))
    return sel


@given(
    st.text(alphabet="abcd", min_size=12, max_size=120),
    st.integers(2, 6),
    st.integers(2, 10),
)
@settings(max_examples=200)
def test_winnow_keyform_equals_textbook(text, k, w):
    if len(text) < k + w - 1:
        return
    assert _winnow_keyform(text, k, w) == _winnow_textbook(text, k, w)


@given(st.text(alphabet="abcdefgh", min_size=20, max_size=60), st.data())
@settings(max_examples=100)
def test_winnow_guarantee(shared, data):
    """Any two texts sharing a substring of length >= w+k-1 share at
    least one fingerprint hash (the winnowing guarantee)."""
    k, w = 5, 8
    if len(shared) < k + w - 1:
        return
    pre = data.draw(st.text(alphabet="xyz", min_size=0, max_size=40))
    post = data.draw(st.text(alphabet="uvw", min_size=0, max_size=40))
    a = pre + shared
    b = shared + post
    fa = {h for _, h in _winnow_keyform(a, k, w)}
    fb = {h for _, h in _winnow_keyform(b, k, w)}
    assert fa & fb
