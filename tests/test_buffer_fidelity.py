"""Buffer arc-discretization fidelity bound (VERDICT r3 #8, stretch).

The reference's tests only demand buffer VALIDITY (core_test.clj:
116-120); this adds a measurable fidelity contract: the symmetric
(Hausdorff-style) deviation between the buffer output boundary and
the TRUE offset set {x : dist(x, input) = d} is bounded by the round
arc's chord sagitta, d·(1 − cos(π / (4·quad_segs)))·safety.

Direction 1: every sample on the output boundary sits at distance
d ± tol from the input.  Direction 2: dense samples of the true
offset set sit within tol of the output boundary.
"""

import numpy as np
import pytest

from geospark.geom import core as C
from geospark.geom.buffer import buffer
from geospark.geom.ops import _linework, boundary_of, densify
from geospark.geom.predicates import distance

QUAD_SEGS = 8


def _tol(d):
    # chord sagitta for a quarter arc split into quad_segs pieces,
    # x3 safety for float noise + join geometry
    return 3.0 * d * (1.0 - np.cos(np.pi / (4.0 * QUAD_SEGS))) + 1e-9


def _boundary_samples(g, step):
    dens = densify(boundary_of(g), step)
    return dens.all_coords()


def _true_offset_samples(src, d, n_per_elem=24):
    """Points x with dist(x, src) == d, built from edge normals and
    vertex arcs, keeping only those whose GLOBAL distance to src is
    (float-)equal to d."""
    out = []
    for c in _linework(src):
        for i in range(len(c) - 1):
            p1, p2 = c[i], c[i + 1]
            e = p2 - p1
            L = float(np.hypot(e[0], e[1]))
            if L == 0:
                continue
            nrm = np.array([-e[1], e[0]]) / L
            for t in np.linspace(0.05, 0.95, 6):
                base = p1 + e * t
                for s in (1.0, -1.0):
                    out.append(base + s * d * nrm)
        for v in c[:-1]:
            for a in np.linspace(0.0, 2 * np.pi, n_per_elem, endpoint=False):
                out.append(v + d * np.array([np.cos(a), np.sin(a)]))
    keep = []
    for p in out:
        pt = C.point(float(p[0]), float(p[1]))
        if abs(distance(pt, src) - d) <= 1e-9 * max(1.0, d):
            keep.append(p)
    return keep


SHAPES = [
    (
        "L-polygon",
        C.polygon([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10], [0, 0]]),
        2.0,
    ),
    (
        "zigzag-line",
        C.line_string([[0, 0], [3, 4], [6, 0], [9, 4], [12, 0]]),
        1.5,
    ),
    (
        "holed-polygon",
        C.Geometry(
            C.POLYGON,
            [
                C._close_ring(C._coords([[0, 0], [12, 0], [12, 12], [0, 12], [0, 0]])),
                C._close_ring(C._coords([[4, 4], [4, 8], [8, 8], [8, 4], [4, 4]])),
            ],
        ),
        1.0,
    ),
]


@pytest.mark.parametrize("name,src,d", SHAPES, ids=[s[0] for s in SHAPES])
def test_buffer_hausdorff_fidelity(name, src, d):
    buf = buffer(src, d, quad_segs=QUAD_SEGS)
    tol = _tol(d)

    # direction 1: output boundary stays in the d ± tol shell
    samples = _boundary_samples(buf, d / 8.0)
    assert len(samples) > 50
    devs = [abs(distance(C.point(float(x), float(y)), src) - d) for x, y in samples]
    assert max(devs) <= tol, f"{name}: boundary deviates {max(devs):.4f} > {tol:.4f}"

    # direction 2: every true offset point is near the output boundary
    bnd = boundary_of(buf)
    offs = _true_offset_samples(src, d)
    assert len(offs) > 20
    devs2 = [distance(C.point(float(p[0]), float(p[1])), bnd) for p in offs]
    assert max(devs2) <= tol, f"{name}: offset set deviates {max(devs2):.4f} > {tol:.4f}"
