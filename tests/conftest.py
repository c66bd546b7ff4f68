import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    # deterministic property tests: same examples every run (no DB
    # dependence, no open-ended shrink time under the driver's gate)
    from hypothesis import HealthCheck, settings

    settings.register_profile(
        "ci",
        derandomize=True,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    settings.load_profile("ci")
except Exception:
    pass


@pytest.fixture(scope="session")
def spark():
    from geospark.session import build_session

    s = build_session("geospark-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def wkt_set(geoms):
    """Normalized-WKB set for order-insensitive golden comparison
    (reference testutils g= macro, testutils.clj:5-21)."""
    from geospark.geom import core as gc

    out = set()
    for g in geoms:
        if isinstance(g, str):
            g = gc.from_wkt(g)
        out.add(gc.to_wkb(gc.normalize(g)))
    return out
