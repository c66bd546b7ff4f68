"""Geometry value type + WKT/WKB codecs, pure numpy.

This is the kernel substrate of the engine: every Spark-side geometry
column is WKB ``binary``; inside vectorized pandas UDFs we decode into
these numpy-backed values, run the computational geometry, and encode
back.

Semantics follow the reference (cse-bristol/clj-geometry) JTS wrapper:
eight geometry types keyed by the WKB type tag
(reference: src/geometry/core.clj:108-119), 2-D double coordinates
(core.clj:168-176).  The implementation is original, written for
columnar batches — not a port of JTS.
"""

from __future__ import annotations

import struct
from typing import Iterable, List, Optional, Sequence, Union

import numpy as np

# WKB geometry type tags (ISO)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    POINT: "POINT",
    LINESTRING: "LINESTRING",
    POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT",
    MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON",
    GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}
NAME_TYPES = {v: k for k, v in TYPE_NAMES.items()}
NAME_TYPES["LINEARRING"] = LINESTRING  # JTS LinearRing ⊂ LineString

_EMPTY_COORDS = np.zeros((0, 2), dtype=np.float64)


def _coords(seq) -> np.ndarray:
    a = np.asarray(seq, dtype=np.float64)
    if a.size == 0:
        return _EMPTY_COORDS
    return a.reshape(-1, 2)


class Geometry:
    """A parsed geometry.

    parts layout per gtype:
      POINT              -> (1,2) or (0,2) ndarray
      LINESTRING         -> (N,2) ndarray
      POLYGON            -> [ring0, ring1, ...]   (shell, holes) each (N,2)
      MULTIPOINT         -> (N,2) ndarray
      MULTILINESTRING    -> [ (N,2), ... ]
      MULTIPOLYGON       -> [ [ring,...], ... ]
      GEOMETRYCOLLECTION -> [ Geometry, ... ]
    """

    __slots__ = ("gtype", "parts", "srid", "ring")

    def __init__(self, gtype: int, parts, srid: int = 0, ring: bool = False):
        self.gtype = gtype
        self.parts = parts
        self.srid = srid
        self.ring = ring  # linearring flag (WKT LINEARRING round-trip)

    # -- basic inspection ------------------------------------------------
    def is_empty(self) -> bool:
        g, p = self.gtype, self.parts
        if g in (POINT, LINESTRING, MULTIPOINT):
            return len(p) == 0
        return len(p) == 0 or (
            g == GEOMETRYCOLLECTION and all(c.is_empty() for c in p)
        )

    def coords_iter(self) -> Iterable[np.ndarray]:
        """Yield every coordinate array in the geometry."""
        g, p = self.gtype, self.parts
        if g in (POINT, LINESTRING, MULTIPOINT):
            yield p
        elif g in (POLYGON, MULTILINESTRING):
            yield from p
        elif g == MULTIPOLYGON:
            for poly in p:
                yield from poly
        else:
            for child in p:
                yield from child.coords_iter()

    def all_coords(self) -> np.ndarray:
        arrs = [a for a in self.coords_iter() if len(a)]
        if not arrs:
            return _EMPTY_COORDS
        return np.concatenate(arrs)

    def envelope(self):
        """(xmin, ymin, xmax, ymax) or None for empty."""
        c = self.all_coords()
        if len(c) == 0:
            return None
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())

    def num_points(self) -> int:
        return sum(len(a) for a in self.coords_iter())

    # -- python niceties -------------------------------------------------
    def __repr__(self):
        return f"<Geometry {TYPE_NAMES[self.gtype]} pts={self.num_points()}>"

    def __eq__(self, other):
        if not isinstance(other, Geometry):
            return NotImplemented
        return geom_eq(self, other)

    def __hash__(self):
        return hash(to_wkb(normalize(self)))


# ---------------------------------------------------------------------------
# constructors (reference: core.clj:168-229 make-* family)
# ---------------------------------------------------------------------------

def point(x: float, y: float, srid: int = 0) -> Geometry:
    return Geometry(POINT, _coords([[x, y]]), srid)


def empty(gtype: int = POLYGON, srid: int = 0) -> Geometry:
    if gtype in (POINT, LINESTRING, MULTIPOINT):
        return Geometry(gtype, _EMPTY_COORDS, srid)
    return Geometry(gtype, [], srid)


def line_string(coords, srid: int = 0) -> Geometry:
    return Geometry(LINESTRING, _coords(coords), srid)


def linear_ring(coords, srid: int = 0) -> Geometry:
    c = _coords(coords)
    if len(c) and not np.array_equal(c[0], c[-1]):
        c = np.vstack([c, c[:1]])
    return Geometry(LINESTRING, c, srid, ring=True)


def polygon(shell, holes: Optional[Sequence] = None, srid: int = 0) -> Geometry:
    rings = [_close_ring(_coords(shell))]
    for h in holes or []:
        rings.append(_close_ring(_coords(h)))
    return Geometry(POLYGON, rings, srid)


def _close_ring(c: np.ndarray) -> np.ndarray:
    if len(c) and not np.array_equal(c[0], c[-1]):
        c = np.vstack([c, c[:1]])
    return c


def multi_point(coords, srid: int = 0) -> Geometry:
    return Geometry(MULTIPOINT, _coords(coords), srid)


def multi_line_string(lines, srid: int = 0) -> Geometry:
    return Geometry(MULTILINESTRING, [_coords(l) for l in lines], srid)


def multi_polygon(polys, srid: int = 0) -> Geometry:
    out = []
    for p in polys:
        if isinstance(p, Geometry):
            if p.gtype != POLYGON:
                raise ValueError("multi_polygon parts must be polygons")
            out.append(p.parts)
        else:
            out.append([_close_ring(_coords(p))])
    return Geometry(MULTIPOLYGON, out, srid)


def collection(geoms: Sequence[Geometry], srid: int = 0) -> Geometry:
    return Geometry(GEOMETRYCOLLECTION, list(geoms), srid)


# ---------------------------------------------------------------------------
# WKT codec (reference: core.clj:477-480 read-wkt/write-wkt)
# ---------------------------------------------------------------------------

class _WktParser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def _skip_ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t\n\r":
            self.i += 1

    def _word(self) -> str:
        self._skip_ws()
        j = self.i
        while j < len(self.s) and (self.s[j].isalpha()):
            j += 1
        w = self.s[self.i:j].upper()
        self.i = j
        return w

    def _peek(self) -> str:
        self._skip_ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def _expect(self, ch: str):
        self._skip_ws()
        if self.i >= len(self.s) or self.s[self.i] != ch:
            raise ValueError(f"WKT parse error at {self.i}: expected {ch!r} in {self.s[:80]!r}")
        self.i += 1

    def _number(self) -> float:
        self._skip_ws()
        j = self.i
        while j < len(self.s) and self.s[j] not in " \t\n\r,()":
            j += 1
        v = float(self.s[self.i:j])
        self.i = j
        return v

    def _coord_seq(self) -> np.ndarray:
        # ( x y, x y, ... )
        self._expect("(")
        pts = []
        while True:
            x = self._number()
            y = self._number()
            pts.append((x, y))
            if self._peek() == ",":
                self.i += 1
            else:
                break
        self._expect(")")
        return _coords(pts)

    def _maybe_empty(self) -> bool:
        save = self.i
        w = self._word()
        if w == "EMPTY":
            return True
        self.i = save
        return False

    def parse(self) -> Geometry:
        tag = self._word()
        if tag not in NAME_TYPES:
            raise ValueError(f"unknown WKT tag {tag!r}")
        gt = NAME_TYPES[tag]
        ring = tag == "LINEARRING"
        if self._maybe_empty():
            return empty(gt) if not ring else Geometry(LINESTRING, _EMPTY_COORDS, ring=True)
        if gt == POINT:
            self._expect("(")
            x = self._number()
            y = self._number()
            self._expect(")")
            return Geometry(POINT, _coords([[x, y]]))
        if gt == LINESTRING:
            return Geometry(LINESTRING, self._coord_seq(), ring=ring)
        if gt == POLYGON:
            self._expect("(")
            rings = [self._coord_seq()]
            while self._peek() == ",":
                self.i += 1
                rings.append(self._coord_seq())
            self._expect(")")
            return Geometry(POLYGON, rings)
        if gt == MULTIPOINT:
            self._expect("(")
            pts = []
            while True:
                if self._peek() == "(":
                    self._expect("(")
                    x = self._number()
                    y = self._number()
                    self._expect(")")
                else:
                    x = self._number()
                    y = self._number()
                pts.append((x, y))
                if self._peek() == ",":
                    self.i += 1
                else:
                    break
            self._expect(")")
            return Geometry(MULTIPOINT, _coords(pts))
        if gt == MULTILINESTRING:
            self._expect("(")
            lines = [self._coord_seq()]
            while self._peek() == ",":
                self.i += 1
                lines.append(self._coord_seq())
            self._expect(")")
            return Geometry(MULTILINESTRING, lines)
        if gt == MULTIPOLYGON:
            self._expect("(")
            polys = []
            while True:
                self._expect("(")
                rings = [self._coord_seq()]
                while self._peek() == ",":
                    self.i += 1
                    rings.append(self._coord_seq())
                self._expect(")")
                polys.append(rings)
                if self._peek() == ",":
                    self.i += 1
                else:
                    break
            self._expect(")")
            return Geometry(MULTIPOLYGON, polys)
        if gt == GEOMETRYCOLLECTION:
            self._expect("(")
            children = [self.parse()]
            while self._peek() == ",":
                self.i += 1
                children.append(self.parse())
            self._expect(")")
            return Geometry(GEOMETRYCOLLECTION, children)
        raise AssertionError(gt)


def from_wkt(s: str, srid: int = 0) -> Geometry:
    g = _WktParser(s).parse()
    g.srid = srid
    return g


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_seq(c: np.ndarray) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in c) + ")"


def to_wkt(g: Geometry) -> str:
    t = g.gtype
    name = "LINEARRING" if (t == LINESTRING and g.ring) else TYPE_NAMES[t]
    if g.is_empty():
        return f"{name} EMPTY"
    p = g.parts
    if t == POINT:
        return f"POINT ({_fmt(p[0, 0])} {_fmt(p[0, 1])})"
    if t == LINESTRING:
        return f"{name} {_fmt_seq(p)}"
    if t == POLYGON:
        return "POLYGON (" + ", ".join(_fmt_seq(r) for r in p) + ")"
    if t == MULTIPOINT:
        return "MULTIPOINT (" + ", ".join(f"({_fmt(x)} {_fmt(y)})" for x, y in p) + ")"
    if t == MULTILINESTRING:
        return "MULTILINESTRING (" + ", ".join(_fmt_seq(l) for l in p) + ")"
    if t == MULTIPOLYGON:
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(_fmt_seq(r) for r in poly) + ")" for poly in p)
            + ")"
        )
    return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(c) for c in p) + ")"


# ---------------------------------------------------------------------------
# WKB codec — engine wire format (little-endian ISO WKB)
# ---------------------------------------------------------------------------

def to_wkb(g: Geometry) -> bytes:
    out = bytearray()
    _wkb_write(g, out)
    return bytes(out)


def _wkb_write(g: Geometry, out: bytearray):
    out += b"\x01"  # little endian
    t = g.gtype
    out += struct.pack("<I", t)
    p = g.parts
    if t == POINT:
        if len(p) == 0:
            out += struct.pack("<dd", float("nan"), float("nan"))
        else:
            out += p.astype("<f8").tobytes()
    elif t in (LINESTRING, MULTIPOINT):
        out += struct.pack("<I", len(p))
        if t == MULTIPOINT:
            # each point is a nested WKB point
            for x, y in p:
                out += b"\x01" + struct.pack("<Idd", POINT, x, y)
        else:
            out += np.ascontiguousarray(p, dtype="<f8").tobytes()
    elif t == POLYGON:
        out += struct.pack("<I", len(p))
        for r in p:
            out += struct.pack("<I", len(r))
            out += np.ascontiguousarray(r, dtype="<f8").tobytes()
    elif t == MULTILINESTRING:
        out += struct.pack("<I", len(p))
        for l in p:
            out += b"\x01" + struct.pack("<II", LINESTRING, len(l))
            out += np.ascontiguousarray(l, dtype="<f8").tobytes()
    elif t == MULTIPOLYGON:
        out += struct.pack("<I", len(p))
        for poly in p:
            out += b"\x01" + struct.pack("<II", POLYGON, len(poly))
            for r in poly:
                out += struct.pack("<I", len(r))
                out += np.ascontiguousarray(r, dtype="<f8").tobytes()
    elif t == GEOMETRYCOLLECTION:
        out += struct.pack("<I", len(p))
        for c in p:
            _wkb_write(c, out)
    else:
        raise ValueError(f"bad gtype {t}")


def from_wkb(buf: Union[bytes, bytearray, memoryview], srid: int = 0) -> Geometry:
    g, _ = _wkb_read(memoryview(buf), 0)
    g.srid = srid
    return g


def _wkb_read(mv: memoryview, off: int):
    endian = "<" if mv[off] == 1 else ">"
    t = struct.unpack_from(endian + "I", mv, off + 1)[0] % 1000  # tolerate EWKB Z flags
    off += 5
    dt = np.dtype(endian + "f8")
    if t == POINT:
        xy = np.frombuffer(mv, dtype=dt, count=2, offset=off).astype(np.float64)
        off += 16
        if np.isnan(xy).all():
            return Geometry(POINT, _EMPTY_COORDS), off
        return Geometry(POINT, xy.reshape(1, 2)), off
    n = struct.unpack_from(endian + "I", mv, off)[0]
    off += 4
    if t == LINESTRING:
        c = np.frombuffer(mv, dtype=dt, count=2 * n, offset=off).astype(np.float64).reshape(-1, 2)
        off += 16 * n
        return Geometry(LINESTRING, c), off
    if t == POLYGON:
        rings = []
        for _ in range(n):
            m = struct.unpack_from(endian + "I", mv, off)[0]
            off += 4
            c = np.frombuffer(mv, dtype=dt, count=2 * m, offset=off).astype(np.float64).reshape(-1, 2)
            off += 16 * m
            rings.append(c)
        return Geometry(POLYGON, rings), off
    if t == MULTIPOINT:
        pts = np.empty((n, 2), dtype=np.float64)
        for i in range(n):
            g, off = _wkb_read(mv, off)
            pts[i] = g.parts[0] if len(g.parts) else (np.nan, np.nan)
        return Geometry(MULTIPOINT, pts), off
    if t == MULTILINESTRING:
        lines = []
        for _ in range(n):
            g, off = _wkb_read(mv, off)
            lines.append(g.parts)
        return Geometry(MULTILINESTRING, lines), off
    if t == MULTIPOLYGON:
        polys = []
        for _ in range(n):
            g, off = _wkb_read(mv, off)
            polys.append(g.parts)
        return Geometry(MULTIPOLYGON, polys), off
    if t == GEOMETRYCOLLECTION:
        children = []
        for _ in range(n):
            g, off = _wkb_read(mv, off)
            children.append(g)
        return Geometry(GEOMETRYCOLLECTION, children), off
    raise ValueError(f"bad WKB type {t}")


# ---------------------------------------------------------------------------
# normalize — canonical form for equality (reference: core.clj:645-646;
# JTS normal form: rings closed + oriented, minimum vertex first, parts
# sorted).  Used by every golden comparison (testutils.clj:5-21).
# ---------------------------------------------------------------------------

def _ring_area2(c: np.ndarray) -> float:
    """Twice the signed area (positive = CCW)."""
    if len(c) < 3:
        return 0.0
    x, y = c[:-1, 0], c[:-1, 1]
    x2, y2 = c[1:, 0], c[1:, 1]
    return float(np.sum(x * y2 - x2 * y))


def _normalize_ring(c: np.ndarray, ccw: bool) -> np.ndarray:
    """Close, rotate to min vertex first, orient."""
    if len(c) == 0:
        return c
    c = _close_ring(c)
    body = c[:-1]
    if len(body) == 0:
        return c
    # rotate so lexicographically-smallest coordinate is first
    idx = np.lexsort((body[:, 1], body[:, 0]))[0]
    body = np.roll(body, -idx, axis=0)
    c = np.vstack([body, body[:1]])
    if (_ring_area2(c) > 0) != ccw:
        c = c[::-1].copy()
        # re-rotate: reversal moved the min vertex to the end
        body = c[:-1]
        idx = np.lexsort((body[:, 1], body[:, 0]))[0]
        body = np.roll(body, -idx, axis=0)
        c = np.vstack([body, body[:1]])
    return c


def _normalize_line(c: np.ndarray) -> np.ndarray:
    if len(c) < 2:
        return c
    # orient so start <= end lexicographically (JTS convention)
    a, b = c[0], c[-1]
    if (b[0], b[1]) < (a[0], a[1]):
        return c[::-1].copy()
    return c


def _coord_key(c: np.ndarray):
    return tuple(map(tuple, c))


def normalize(g: Geometry) -> Geometry:
    t = g.gtype
    if t == POINT or t == MULTIPOINT:
        p = g.parts
        if t == MULTIPOINT and len(p):
            order = np.lexsort((p[:, 1], p[:, 0]))
            p = p[order]
        return Geometry(t, p, g.srid)
    if t == LINESTRING:
        return Geometry(t, _normalize_line(g.parts), g.srid, ring=g.ring)
    if t == POLYGON:
        # JTS normal form: shell CW, holes CCW, holes sorted
        rings = g.parts
        if not rings:
            return Geometry(t, [], g.srid)
        shell = _normalize_ring(rings[0], ccw=False)
        holes = sorted(
            (_normalize_ring(r, ccw=True) for r in rings[1:]), key=_coord_key
        )
        return Geometry(t, [shell] + list(holes), g.srid)
    if t == MULTILINESTRING:
        lines = sorted((_normalize_line(l) for l in g.parts), key=_coord_key)
        return Geometry(t, lines, g.srid)
    if t == MULTIPOLYGON:
        polys = []
        for rings in g.parts:
            if not rings:
                continue
            shell = _normalize_ring(rings[0], ccw=False)
            holes = sorted((_normalize_ring(r, ccw=True) for r in rings[1:]), key=_coord_key)
            polys.append([shell] + list(holes))
        polys.sort(key=lambda rs: _coord_key(rs[0]))
        return Geometry(t, polys, g.srid)
    # collection: normalize children, sort by (type, coords)
    children = sorted(
        (normalize(c) for c in g.parts),
        key=lambda c: (c.gtype, _coord_key(c.all_coords())),
    )
    return Geometry(t, children, g.srid)


def geom_eq(a: Geometry, b: Geometry, tol: float = 0.0) -> bool:
    """Equality under normalization (reference testutils g= macro)."""
    na, nb = normalize(a), normalize(b)
    if na.gtype != nb.gtype:
        return False
    ca, cb = na.all_coords(), nb.all_coords()
    if ca.shape != cb.shape:
        return False
    if tol == 0.0:
        coords_ok = np.array_equal(ca, cb)
    else:
        coords_ok = len(ca) == 0 or bool(np.max(np.abs(ca - cb), initial=0.0) <= tol)
    if not coords_ok:
        return False
    # structure check: ring/part sizes must line up
    sa = [len(x) for x in na.coords_iter()]
    sb = [len(x) for x in nb.coords_iter()]
    return sa == sb
