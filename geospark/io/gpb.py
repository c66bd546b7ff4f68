"""GeoPackage geometry blob ("GP" header + WKB) codec.

Format semantics per the public GeoPackage spec §2.1.3 gpb_format
(reference behavior: gpkg/encode.clj:40-85 — magic check, flags byte
with header endianness bit 0, envelope code bits 1-3, empty bit 4;
encoder writes little-endian header, no envelope).

The engine-internal format is plain WKB; this codec lives only at the
GeoPackage boundary (SURVEY.md §2.A).
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

from ..geom import core as gc

_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


class GpbError(ValueError):
    pass


def payload_offset(blob: bytes) -> int:
    """Validated offset of the WKB payload inside a GP blob — the ONE
    place that knows the header layout (magic, flags, envelope sizes).
    Raises GpbError for bad magic, invalid envelope codes, and the
    ExtendedGeoPackageBinary bit (flags bit 5 — the payload then
    starts with a 4-byte extension code, not WKB; unsupported)."""
    if len(blob) < 8 or blob[0] != 0x47 or blob[1] != 0x50:
        raise GpbError(f"Not a GeoPackage geometry blob (bad magic): {blob[:2]!r}")
    flags = blob[3]
    if flags & 0x20:
        raise GpbError("ExtendedGeoPackageBinary (flags bit 5) is not supported")
    env_code = (flags >> 1) & 0x07
    if env_code not in _ENVELOPE_DOUBLES:
        raise GpbError(f"Invalid envelope indicator {env_code}")
    return 8 + 8 * _ENVELOPE_DOUBLES[env_code]


def decode(blob: Optional[bytes]) -> Optional[Tuple[gc.Geometry, int]]:
    """GeoPackage blob → (Geometry with srid set, srid).
    None passes through; bad magic / envelope code raise GpbError."""
    if blob is None:
        return None
    header_len = payload_offset(blob)
    little = bool(blob[3] & 0x01)
    srid = struct.unpack_from("<i" if little else ">i", blob, 4)[0]
    g = gc.from_wkb(memoryview(blob)[header_len:])
    g.srid = srid
    return g, srid


def encode(geom: Optional[gc.Geometry], srid: int) -> Optional[bytes]:
    """Geometry → blob: little-endian header, no envelope, empty bit."""
    if geom is None:
        return None
    flags = 0x01 | (0x10 if geom.is_empty() else 0)
    header = struct.pack("<2sBBi", b"GP", 0, flags, int(srid))
    return header + gc.to_wkb(geom)


def envelope_from_header(blob: bytes):
    """Read the header envelope if present (env codes 1-4)."""
    flags = blob[3]
    little = bool(flags & 0x01)
    env_code = (flags >> 1) & 0x07
    n = _ENVELOPE_DOUBLES.get(env_code, 0)
    if n == 0:
        return None
    fmt = ("<" if little else ">") + "d" * n
    vals = struct.unpack_from(fmt, blob, 8)
    return vals[:4]  # (minx, maxx, miny, maxy) per spec ordering
