"""Snap-rounding noder, dissolver, polygonizer, cut-polygon, and the
network noder (node / node-with-others / connect-faces).

Semantics from the reference noder (noder.clj:11-185) and polygonize
(core.clj:546-591): fixed-precision snap-round noding at cm precision
(scale = 100/cm, core.clj:69-70), duplicate-segment dissolve with
metadata merge, planar face extraction.

These kernels run per tile group inside ``applyInPandas`` in the
distributed engine (SURVEY.md §2.I mapping); they are plain-python /
numpy here so they are testable without Spark.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .core import Geometry, LINESTRING, POLYGON, line_string, point, polygon
from .linear import segment_intersection, split_line
from .ops import boundary_of, endpoints_of, line_strings_of, linearize
from .predicates import PreparedPolygon, bbox_distance, closest_points, distance

Pt = Tuple[float, float]


def _snap(v: float, scale: float) -> float:
    return round(v * scale) / scale


def _snap_line(c: np.ndarray, scale: float) -> List[Pt]:
    out: List[Pt] = []
    for x, y in c:
        p = (_snap(x, scale), _snap(y, scale))
        if not out or out[-1] != p:
            out.append(p)
    return out


def _seg_point_dist(a: Pt, b: Pt, p: Pt) -> float:
    dx, dy = b[0] - a[0], b[1] - a[1]
    l2 = dx * dx + dy * dy
    if l2 == 0:
        return math.hypot(p[0] - a[0], p[1] - a[1])
    t = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / l2
    t = min(1.0, max(0.0, t))
    return math.hypot(p[0] - (a[0] + t * dx), p[1] - (a[1] + t * dy))


def node_lines(
    lines: Sequence[np.ndarray], scale: float
) -> List[Tuple[List[Pt], List[int]]]:
    """Snap-round node a set of polylines.

    Returns dissolved substrings as (vertex list, contributing input
    indices).  Substrings split at nodes = points where ≥2 distinct
    inputs meet or any input ends.
    """
    snapped = [_snap_line(np.asarray(c, dtype=np.float64), scale) for c in lines]
    snapped = [s for s in snapped if len(s) >= 2]
    half_px = 0.5 / scale * math.sqrt(2) * 1.0001

    # flat segment table + uniform-grid candidate prefilter: the exact
    # per-pair tests below are unchanged, the grid only prunes pairs
    seg_of: List[Tuple[int, int]] = []  # (line, pos)
    segs: List[Tuple[Pt, Pt]] = []
    for li, s in enumerate(snapped):
        for a in range(len(s) - 1):
            seg_of.append((li, a))
            segs.append((s[a], s[a + 1]))
    nseg = len(segs)
    if nseg == 0:
        return []
    lens = [
        max(abs(p2[0] - p1[0]), abs(p2[1] - p1[1])) for p1, p2 in segs
    ]
    lens_sorted = sorted(lens)
    med = lens_sorted[len(lens_sorted) // 2] or (1.0 / scale)
    cell = max(med, 4.0 / scale)
    grid_idx: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for si, (p1, p2) in enumerate(segs):
        gx0 = int(math.floor((min(p1[0], p2[0]) - half_px) / cell))
        gx1 = int(math.floor((max(p1[0], p2[0]) + half_px) / cell))
        gy0 = int(math.floor((min(p1[1], p2[1]) - half_px) / cell))
        gy1 = int(math.floor((max(p1[1], p2[1]) + half_px) / cell))
        for gx in range(gx0, gx1 + 1):
            for gy in range(gy0, gy1 + 1):
                grid_idx[(gx, gy)].append(si)

    # 1. collect split points per (line, segment)
    splits: Dict[Tuple[int, int], set] = defaultdict(set)
    seen_pairs = set()
    for bucket in grid_idx.values():
        nb = len(bucket)
        for u in range(nb):
            su = bucket[u]
            i, a = seg_of[su]
            p1, p2 = segs[su]
            for w in range(u + 1, nb):
                sw = bucket[w]
                j, b = seg_of[sw]
                if i == j and abs(a - b) <= 1:
                    continue
                pair = (su, sw)
                if pair in seen_pairs:
                    continue
                seen_pairs.add(pair)
                q1, q2 = segs[sw]
                if (
                    max(p1[0], p2[0]) < min(q1[0], q2[0]) - half_px
                    or max(q1[0], q2[0]) < min(p1[0], p2[0]) - half_px
                    or max(p1[1], p2[1]) < min(q1[1], q2[1]) - half_px
                    or max(q1[1], q2[1]) < min(p1[1], p2[1]) - half_px
                ):
                    continue
                pt = segment_intersection(p1, p2, q1, q2)
                if pt is not None:
                    sp = (_snap(pt[0], scale), _snap(pt[1], scale))
                    if _seg_point_dist(p1, p2, sp) <= half_px and _seg_point_dist(
                        q1, q2, sp
                    ) <= half_px:
                        splits[(i, a)].add(sp)
                        splits[(j, b)].add(sp)
    # hot-pixel: any vertex of another line lying on a segment
    for li, s in enumerate(snapped):
        for v in s:
            gx, gy = int(math.floor(v[0] / cell)), int(math.floor(v[1] / cell))
            cands = set()
            for dgx in (-1, 0, 1):
                for dgy in (-1, 0, 1):
                    cands.update(grid_idx.get((gx + dgx, gy + dgy), ()))
            for sj_id in cands:
                j, b = seg_of[sj_id]
                if j == li:
                    continue
                q1, q2 = segs[sj_id]
                if _seg_point_dist(q1, q2, v) <= half_px:
                    splits[(j, b)].add(v)

    # 2. rebuild each line with splits inserted
    rebuilt: List[List[Pt]] = []
    for li, s in enumerate(snapped):
        chain: List[Pt] = [s[0]]
        for a in range(len(s) - 1):
            p1, p2 = s[a], s[a + 1]
            extra = [
                p
                for p in splits.get((li, a), ())
                if p != p1 and p != p2
            ]
            dx, dy = p2[0] - p1[0], p2[1] - p1[1]
            extra.sort(key=lambda p: (p[0] - p1[0]) * dx + (p[1] - p1[1]) * dy)
            for p in extra:
                if p != chain[-1]:
                    chain.append(p)
            if p2 != chain[-1]:
                chain.append(p2)
        if len(chain) >= 2:
            rebuilt.append(chain)

    # 3. node set: endpoints + points on ≥2 distinct lines + junctions
    pt_lines: Dict[Pt, set] = defaultdict(set)
    pt_count: Dict[Pt, int] = defaultdict(int)
    for li, chain in enumerate(rebuilt):
        seen = set()
        for v in chain:
            pt_lines[v].add(li)
            if v not in seen:
                pt_count[v] += 1
                seen.add(v)
    nodes = set()
    for li, chain in enumerate(rebuilt):
        nodes.add(chain[0])
        nodes.add(chain[-1])
    for v, ls in pt_lines.items():
        if len(ls) >= 2:
            nodes.add(v)
    for li, chain in enumerate(rebuilt):
        # self-intersection: vertex appearing twice in one chain
        cnt = defaultdict(int)
        for v in chain:
            cnt[v] += 1
        for v, c in cnt.items():
            if c > 1:
                nodes.add(v)

    # 4. split chains at nodes → substrings
    substrings: List[Tuple[List[Pt], int]] = []
    for li, chain in enumerate(rebuilt):
        cur = [chain[0]]
        for v in chain[1:]:
            cur.append(v)
            if v in nodes:
                if len(cur) >= 2:
                    substrings.append((cur, li))
                cur = [v]
        if len(cur) >= 2:
            substrings.append((cur, li))

    # 5. dissolve duplicates (canonical direction), merging sources
    dissolved: Dict[tuple, Tuple[List[Pt], List[int]]] = {}
    for coords, li in substrings:
        fwd = tuple(coords)
        rev = tuple(reversed(coords))
        key = min(fwd, rev)
        if key in dissolved:
            dissolved[key][1].append(li)
        else:
            dissolved[key] = (coords, [li])
    return list(dissolved.values())


# ---------------------------------------------------------------------------
# polygonize (core.clj:566-578) — planar face extraction
# ---------------------------------------------------------------------------

def polygonize(paths: Sequence[Geometry], snapping_scale_factor: float = 10.0) -> List[Geometry]:
    lines = []
    for p in paths:
        for l in linearize(p):
            lines.append(l.parts)
    return [polygon(ring) for ring in trace_faces(lines, snapping_scale_factor)]


def trace_faces(lines: Sequence[np.ndarray], snapping_scale_factor: float) -> List[List[Pt]]:
    """Node the linework and extract all bounded (CCW) planar faces as
    closed vertex rings."""
    noded = node_lines(lines, snapping_scale_factor)
    # build directed half-edge graph over substring edges
    edges = []  # (from, to, coords)
    for coords, _src in noded:
        edges.append((coords[0], coords[-1], coords))
        edges.append((coords[-1], coords[0], list(reversed(coords))))
    out_edges: Dict[Pt, List[int]] = defaultdict(list)
    for idx, (a, b, coords) in enumerate(edges):
        out_edges[a].append(idx)

    def _angle(e):
        a, b, coords = edges[e]
        # direction of the first segment
        p0, p1 = coords[0], coords[1]
        return math.atan2(p1[1] - p0[1], p1[0] - p0[0])

    for v in out_edges:
        out_edges[v].sort(key=_angle)

    twin = {}
    for idx in range(0, len(edges), 2):
        twin[idx] = idx + 1
        twin[idx + 1] = idx

    nxt = {}
    for idx, (a, b, coords) in enumerate(edges):
        # at head b: pick the outgoing edge that is the next one
        # clockwise from the reverse direction (standard face tracing)
        rev = twin[idx]
        outs = out_edges[b]
        if not outs:
            continue
        rev_angle = _angle(rev)
        # sort outgoing by angle; choose the one just below rev_angle (cw)
        best = None
        best_key = None
        for e in outs:
            ang = _angle(e)
            d = (rev_angle - ang) % (2 * math.pi)
            if d == 0:
                d = 2 * math.pi  # don't immediately bounce back unless forced
            if best_key is None or d < best_key:
                best_key = d
                best = e
        nxt[idx] = best

    visited = set()
    faces = []
    for start in range(len(edges)):
        if start in visited or start not in nxt:
            continue
        ring: List[Pt] = []
        e = start
        guard = 0
        while e not in visited:
            visited.add(e)
            a, b, coords = edges[e]
            ring.extend(coords[:-1])
            e = nxt.get(e)
            if e is None:
                ring = []
                break
            guard += 1
            if guard > len(edges) + 1:
                ring = []
                break
        if not ring or e != start:
            continue
        ring.append(ring[0])
        if len(ring) >= 4:
            area2 = 0.0
            for i in range(len(ring) - 1):
                area2 += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
            if area2 > 0:  # CCW interior faces only; CW trace = outer face
                faces.append(ring)
    return faces


def cut_polygon(
    poly: Geometry, paths: Sequence[Geometry], snapping_scale_factor: float = 10.0
) -> List[Geometry]:
    """Cut a polygon with paths (core.clj:580-591): polygonize(paths +
    boundary), keep faces inside the polygon (holes excluded)."""
    if not paths:
        return [poly]
    all_paths = list(paths) + [boundary_of(poly)]
    faces = polygonize(all_paths, snapping_scale_factor)
    pp = PreparedPolygon(poly)
    out = []
    for f in faces:
        from .predicates import _interior_sample

        s = _interior_sample(f)
        if s is None:
            continue
        loc = pp.locate_batch(np.array([s[0]]), np.array([s[1]]))[0]
        if loc == 2:  # INTERIOR
            out.append(f)
    return out


# ---------------------------------------------------------------------------
# network noder (noder.clj:11-185)
# ---------------------------------------------------------------------------

def snap_endpoints(lines: List[Geometry], cm_precision: float) -> List[Geometry]:
    """Greedy endpoint snapping: move endpoints onto previously-seen
    endpoints within cm radius; drop collapsed lines
    (noder.clj:11-41; deterministic in input order)."""
    radius = cm_precision / 100.0
    seen: List[Pt] = []
    out = []
    for g in lines:
        c = g.parts
        a = (float(c[0, 0]), float(c[0, 1]))
        b = (float(c[-1, 0]), float(c[-1, 1]))

        def _near(p):
            for q in seen:
                if p != q and abs(p[0] - q[0]) <= radius and abs(p[1] - q[1]) <= radius:
                    return q
            return None

        ai, bi = _near(a), _near(b)
        if ai or bi:
            c2 = c.copy()
            if ai:
                c2[0] = ai
            if bi:
                c2[-1] = bi
            # drop consecutive duplicates; collapsed lines are filtered
            keep = [0] + [i for i in range(1, len(c2)) if not np.array_equal(c2[i], c2[i - 1])]
            c2 = c2[keep]
            if len(c2) >= 2:
                out.append(line_string(c2, g.srid))
            seen.extend([ai or a, bi or b])
        else:
            out.append(g)
            seen.extend([a, b])
    return out


def node(
    lines: Sequence[Geometry],
    cm_precision: float = 10.0,
    snap_ends: bool = True,
) -> List[Tuple[Geometry, List[int]]]:
    """Node + dissolve linework (noder.clj:43-88).  Returns
    (linestring, contributing input indices) — the index list is the
    ::lines metadata analogue."""
    gs = list(lines)
    if snap_ends:
        gs = snap_endpoints(gs, cm_precision)
    scale = 100.0 / cm_precision
    noded = node_lines([g.parts for g in gs], scale)
    return [(line_string(coords), srcs) for coords, srcs in noded]


def connect_faces(face_length: float, tolerance: float, line: Geometry, target: Geometry):
    """Prefer connecting to midpoints of long boundary faces
    (noder.clj:90-122)."""
    d0, on_line, on_target = closest_points(line, target)
    straight = (on_line, on_target)
    best = None
    b = boundary_of(target)
    coords = b.all_coords()
    for i in range(len(coords) - 1):
        a, c = coords[i], coords[i + 1]
        if math.hypot(c[0] - a[0], c[1] - a[1]) >= face_length:
            mid = point((a[0] + c[0]) / 2.0, (a[1] + c[1]) / 2.0)
            d, lp, tp = closest_points(line, mid)
            if d0 - d <= tolerance or d <= d0 + tolerance:
                # reference keeps candidates where straight isn't more
                # than `tolerance` shorter (noder.clj:118)
                if d - d0 <= tolerance:
                    if best is None or d < best[0]:
                        best = (d, (lp, tp))
    return best[1] if best else straight


def node_with_others(
    lines: Sequence[Geometry],
    others: Sequence[Geometry],
    cm_precision: float = 10.0,
    rng: float = 1000.0,
    connect: Optional[Callable] = None,
):
    """Node lines, then connect each other-feature to its nearest line
    (noder.clj:124-185).  Returns (lines, {other index -> connection
    point geometry})."""
    noded = [g for g, _src in node(lines, cm_precision=cm_precision)]
    current: List[Geometry] = list(noded)
    mapping: Dict[int, Geometry] = {}
    for oi, target in enumerate(others):
        # kNN: 5 nearest by bbox distance within range, re-sort by true
        # distance (index.clj:78-104 semantics)
        te = target.envelope()
        cands = []
        for li, l in enumerate(current):
            le = l.envelope()
            rd = bbox_distance(te, le)
            if rd <= rng:
                cands.append((rd, li))
        cands.sort(key=lambda t: t[0])
        cands = cands[:5]
        if not cands:
            continue
        by_true = sorted(cands, key=lambda t: distance(current[t[1]], target))
        li = by_true[0][1]
        line = current[li]
        if connect is not None:
            line_pt, target_pt = connect(line, target)
        else:
            _, line_pt, target_pt = closest_points(line, target)
        mapping[oi] = point(target_pt[0], target_pt[1])
        new_line = None
        if target_pt != line_pt:
            new_line = line_string([line_pt, target_pt])
        c = line.parts
        start = (float(c[0, 0]), float(c[0, 1]))
        end = (float(c[-1, 0]), float(c[-1, 1]))
        if line_pt == start or line_pt == end:
            if new_line is not None:
                current.append(new_line)
        else:
            a, b = split_line(line, point(line_pt[0], line_pt[1]))
            current.pop(li)
            current.extend([a, b])
            if new_line is not None:
                current.append(new_line)
    return current, mapping
