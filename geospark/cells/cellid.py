"""Hierarchical Z-order (Morton) cell ids — the engine's spatial join
key fabric (SURVEY.md §4.2: H3/S2-style cell layer; no h3/s2 libs in
this environment, so this is a planar quadtree with Morton codes).

A cell id packs (level, ix, iy) into one int64:

    id = (morton(ix, iy) << 6) | level          (level 0..28)

Level cap 28: the packed id needs 2*level+6 bits, so level 29-30 would
wrap the top morton bits off int64 (pack(2^29,0,30) == pack(0,0,30) —
distinct cells would alias and joins would get spurious candidates).
2*28+6 = 62 bits keeps every id a positive int64.  pack() range-checks.

ix/iy are the cell coordinates at `level` (grid of 2^level × 2^level
cells over the configured domain).  All encoders are vectorized numpy
over coordinate batches — this runs inside pandas UDFs on the hot
path, one call per Arrow batch.

Reference analogue: the R-tree access path (index.clj:56-76) — we
replace a single-node tree with a distributed equi-join key.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

MAX_LEVEL = 28

# domain default: covers British National Grid comfortably
# (EPSG:27700 valid range is 0..700000 / 0..1300000; reference default
# srid 27700, core.clj:72)
DEFAULT_X0 = -1048576.0
DEFAULT_Y0 = -1048576.0
DEFAULT_SPAN = 4194304.0  # 2^22 metres


class CellGrid:
    """Quadtree over [x0, x0+span) × [y0, y0+span)."""

    __slots__ = ("x0", "y0", "span")

    def __init__(self, x0: float = DEFAULT_X0, y0: float = DEFAULT_Y0, span: float = DEFAULT_SPAN):
        self.x0 = x0
        self.y0 = y0
        self.span = span

    def cell_size(self, level: int) -> float:
        return self.span / (1 << level)

    def level_for_size(self, size: float) -> int:
        """Finest level whose cells are at least `size` across."""
        lvl = int(np.floor(np.log2(self.span / max(size, 1e-12))))
        return int(np.clip(lvl, 0, MAX_LEVEL))

    # -- vectorized encoders ------------------------------------------
    def cell_xy(self, x: np.ndarray, y: np.ndarray, level: int) -> Tuple[np.ndarray, np.ndarray]:
        # clamp the FLOAT before truncating: .astype(int64) wraps for
        # doubles beyond int64 range (a huge positive coordinate would
        # land in cell 0), while clip-then-truncate saturates to the
        # domain edge — and matches the Catalyst encoder
        # (cells/cellexpr.py), which must clamp pre-cast anyway to
        # avoid ANSI cast overflow errors.  In-domain results are
        # unchanged (clip is the identity there).
        # NaN → cell 0 (np.clip passes NaN through and astype(NaN) is
        # INT64_MIN, a wild index for array-indexing callers)
        n = 1 << level
        fx = (np.asarray(x, dtype=np.float64) - self.x0) / self.span
        fy = (np.asarray(y, dtype=np.float64) - self.y0) / self.span
        ix = np.clip(np.nan_to_num(fx * n, nan=0.0), 0, n - 1).astype(np.int64)
        iy = np.clip(np.nan_to_num(fy * n, nan=0.0), 0, n - 1).astype(np.int64)
        return ix, iy

    def encode_points(self, x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
        ix, iy = self.cell_xy(x, y, level)
        return pack(ix, iy, level)

    def cell_bounds(self, cid: int) -> Tuple[float, float, float, float]:
        level, ix, iy = unpack_one(int(cid))
        s = self.cell_size(level)
        xmin = self.x0 + ix * s
        ymin = self.y0 + iy * s
        return (xmin, ymin, xmin + s, ymin + s)

    def cover_bbox(self, xmin, ymin, xmax, ymax, level: int) -> np.ndarray:
        """All cells at `level` overlapping the bbox (inclusive)."""
        n = 1 << level
        ix0 = int(np.clip(np.floor((xmin - self.x0) / self.span * n), 0, n - 1))
        ix1 = int(np.clip(np.floor((xmax - self.x0) / self.span * n), 0, n - 1))
        iy0 = int(np.clip(np.floor((ymin - self.y0) / self.span * n), 0, n - 1))
        iy1 = int(np.clip(np.floor((ymax - self.y0) / self.span * n), 0, n - 1))
        ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
        iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
        IX, IY = np.meshgrid(ixs, iys, indexing="ij")
        return pack(IX.ravel(), IY.ravel(), level)


# ---------------------------------------------------------------------------
# morton packing (uint64 magic-number bit spreading)
# ---------------------------------------------------------------------------

def _part1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64)
    v &= np.uint64(0x00000000FFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64)
    v &= np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def pack(ix: np.ndarray, iy: np.ndarray, level: int) -> np.ndarray:
    if level > MAX_LEVEL:
        raise ValueError(f"cell level {level} > MAX_LEVEL {MAX_LEVEL} (int64 overflow)")
    m = _part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << np.uint64(1))
    return ((m << np.uint64(6)) | np.uint64(level)).astype(np.int64)


def unpack(cid: np.ndarray):
    c = np.asarray(cid).astype(np.uint64)
    level = (c & np.uint64(0x3F)).astype(np.int64)
    m = c >> np.uint64(6)
    ix = _compact1by1(m).astype(np.int64)
    iy = _compact1by1(m >> np.uint64(1)).astype(np.int64)
    return level, ix, iy


def unpack_one(cid: int):
    level, ix, iy = unpack(np.array([cid]))
    return int(level[0]), int(ix[0]), int(iy[0])


def parent(cid: np.ndarray, levels_up: int = 1) -> np.ndarray:
    level, ix, iy = unpack(cid)
    new_level = level - levels_up
    if (new_level < 0).any():
        raise ValueError("parent below level 0")
    return pack_arr(ix >> levels_up, iy >> levels_up, new_level)


def pack_arr(ix: np.ndarray, iy: np.ndarray, level: np.ndarray) -> np.ndarray:
    lv = np.asarray(level)
    if lv.size and int(lv.max()) > MAX_LEVEL:
        raise ValueError(f"cell level {int(lv.max())} > MAX_LEVEL {MAX_LEVEL}")
    m = _part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << np.uint64(1))
    return ((m << np.uint64(6)) | lv.astype(np.uint64)).astype(np.int64)


def children(cid: int) -> List[int]:
    level, ix, iy = unpack_one(cid)
    if level >= MAX_LEVEL:
        raise ValueError("children beyond max level")
    out = []
    for dx in (0, 1):
        for dy in (0, 1):
            out.append(int(pack(np.array([ix * 2 + dx]), np.array([iy * 2 + dy]), level + 1)[0]))
    return out


def k_ring(cid: int, k: int) -> np.ndarray:
    """All cells at the same level within Chebyshev distance k
    (reference analogue: envelope `radius` expansion, index.clj:106-122)."""
    level, ix, iy = unpack_one(cid)
    n = 1 << level
    xs = np.arange(max(0, ix - k), min(n, ix + k + 1), dtype=np.int64)
    ys = np.arange(max(0, iy - k), min(n, iy + k + 1), dtype=np.int64)
    IX, IY = np.meshgrid(xs, ys, indexing="ij")
    return pack(IX.ravel(), IY.ravel(), level)


def ring_only(cid: int, k: int) -> np.ndarray:
    """Cells exactly at Chebyshev distance k (the expansion shell)."""
    if k == 0:
        return np.array([cid], dtype=np.int64)
    level, ix, iy = unpack_one(cid)
    n = 1 << level
    cells = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            if max(abs(dx), abs(dy)) != k:
                continue
            jx, jy = ix + dx, iy + dy
            if 0 <= jx < n and 0 <= jy < n:
                cells.append((jx, jy))
    if not cells:
        return np.empty(0, dtype=np.int64)
    a = np.array(cells, dtype=np.int64)
    return pack(a[:, 0], a[:, 1], level)


def compact(cids: np.ndarray) -> np.ndarray:
    """Replace any complete set of 4 siblings by their parent,
    recursively (H3-style compaction; keeps covers small for broadcast)."""
    cur = np.unique(np.asarray(cids, dtype=np.int64))
    out = []
    while len(cur):
        level, _, _ = unpack(cur)
        lvl = int(level.max())
        if lvl == 0:
            out.append(cur)
            break
        at = cur[level == lvl]
        rest = cur[level != lvl]
        _, ix2, iy2 = unpack(at)
        pid = pack(ix2 >> 1, iy2 >> 1, lvl - 1)
        uniq, counts = np.unique(pid, return_counts=True)
        full = uniq[counts == 4]
        keep = at[~np.isin(pid, full)]
        out.append(keep)
        if len(full) == 0:
            out.append(rest)
            break
        cur = np.unique(np.concatenate([rest, full]))
    return np.unique(np.concatenate(out)) if out else np.empty(0, dtype=np.int64)


def uncompact(cids: np.ndarray, level: int) -> np.ndarray:
    """Expand cells to the given (finer) level."""
    res = []
    for cid in np.asarray(cids, dtype=np.int64):
        l, ix, iy = unpack_one(int(cid))
        if l == level:
            res.append(np.array([cid], dtype=np.int64))
        elif l > level:
            res.append(pack(np.array([ix >> (l - level)]), np.array([iy >> (l - level)]), level))
        else:
            d = level - l
            xs = np.arange(ix << d, (ix + 1) << d, dtype=np.int64)
            ys = np.arange(iy << d, (iy + 1) << d, dtype=np.int64)
            IX, IY = np.meshgrid(xs, ys, indexing="ij")
            res.append(pack(IX.ravel(), IY.ravel(), level))
    return np.unique(np.concatenate(res)) if res else np.empty(0, dtype=np.int64)


DEFAULT_GRID = CellGrid()
