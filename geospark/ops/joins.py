"""Distributed spatial joins — the engine's centerpiece.

Strategy (SURVEY.md §3.2 / §4.2): two-phase filter-refine re-expressed
as a cell-key equi-join + vectorized refine:

  build side (polygons)  → explode exact covering cells at a level
                           chosen from the polygon size distribution
  probe side (points)    → one cell per point (same level)
  candidate pairs        → plain Catalyst equi-join on `cell`
                           (broadcast when the build side is small,
                           AQE-managed shuffle otherwise)
  refine                 → mapInPandas: decode each polygon once per
                           executor (LRU cache), vectorized
                           point-in-polygon over the whole Arrow batch

This mirrors the reference's R-tree probe + PreparedGeometry refine
(index.clj:124-160) with the tree replaced by the cell fabric and the
prepared-geometry cache replaced by an executor-level polygon cache.

Skew (north rule: dense urban cells): optional salting fans hot cells
out across `salt` partitions — build rows replicate per salt value,
probe rows pick one deterministically.  AQE's skew-join handles the
shuffle-size half of the problem; salting spreads the refine CPU.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..cells.cellid import DEFAULT_GRID, CellGrid
from ..functions import cover_cells
from ..geom import core as gc
from ..geom import predicates as gpred

_PRED_FNS = {
    "intersects": gpred.intersects,
    "contains": gpred.contains,
    "covers": gpred.covers,
    "covered_by": lambda a, b: gpred.covers(b, a),
    "touches": gpred.touches,
    "overlaps": gpred.overlaps,
    "within": lambda a, b: gpred.contains(b, a),
}

# executor-level prepared polygon cache (poly_id → PreparedPolygon)
_PREP_CACHE: dict = {}
_PREP_CACHE_MAX = 4096

# build-side size gate: above this estimate the broadcast-dict plan
# (driver collect + sc.broadcast) is refused and the shuffle cell-join
# runs instead — an unbounded collect() OOMs the driver long before
# any task starts (SURVEY §4.2: selection by size estimate, then AQE)
BROADCAST_MAX_BYTES = 256 << 20


def estimate_build_bytes(polys: DataFrame, geom_col: str, sample: int = 8192) -> int:
    """Cheap build-side size estimate: row count × sampled avg WKB
    length (+ dict-entry overhead).  ONE job for the common small-dim
    case: count+avg over limit(sample+1) — if the limit wasn't hit the
    count is exact; only genuinely large tables pay a second
    (metadata-cheap on parquet) count job."""
    row = (
        polys.select(F.length(F.col(geom_col)).alias("l"))
        .limit(sample + 1)
        .agg(F.count(F.lit(1)).alias("n"), F.avg("l").alias("a"))
        .collect()[0]
    )
    n, avg = row["n"], row["a"] or 0.0
    if n <= sample:
        return int(n * (avg + 64))
    # large table: exact count (metadata-cheap on parquet), then a
    # RANDOM sample for the average — a limit() prefix is ordered, and
    # size-skewed tables (small geometries first) would under-estimate
    # straight through the gate this function exists to enforce
    cnt = polys.count()
    frac = min(1.0, (10.0 * sample) / max(cnt, 1))
    srow = (
        polys.select(F.length(F.col(geom_col)).alias("l"))
        .sample(fraction=frac, seed=7)
        .agg(F.avg("l").alias("a"))
        .collect()[0]
    )
    avg = srow["a"] if srow["a"] is not None else avg
    return int(cnt * (avg + 64))


def _prepared(key, wkb: bytes) -> gpred.PreparedPolygon:
    # key on the WKB bytes themselves: python workers are reused across
    # jobs and a bare poly_id collides between different polygon tables;
    # dict keying on bytes hashes internally AND compares content on
    # collision, so two different payloads can never alias
    full_key = (key, bytes(wkb))
    pp = _PREP_CACHE.get(full_key)
    if pp is None:
        if len(_PREP_CACHE) >= _PREP_CACHE_MAX:
            _PREP_CACHE.clear()
        pp = gpred.PreparedPolygon(gc.from_wkb(wkb))
        _PREP_CACHE[full_key] = pp
    return pp


# level choice memoized per DataFrame object (same immutable-source
# contract as the flagship index cache: identity implies identical
# data only for snapshot-backed tables).  A long-running job probing
# one dimension layer repeatedly pays the sample job once, not per
# query.
import weakref

_LEVEL_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def choose_level(polys: DataFrame, geom_col: str, grid: CellGrid, sample: int = 1000) -> int:
    """Pick the cell level from the build side's median bbox extent —
    cells ≈ the typical polygon size keep both the cover sets and the
    per-cell candidate lists small."""
    key = (geom_col, grid.x0, grid.y0, grid.span, sample)
    per_df = _LEVEL_CACHE.setdefault(polys, {})
    if key in per_df:
        return per_df[key]
    from ..functions import st_envelope

    s = (
        polys.select(st_envelope(F.col(geom_col)).alias("e"))
        .select(
            (F.col("e.xmax") - F.col("e.xmin")).alias("w"),
            (F.col("e.ymax") - F.col("e.ymin")).alias("h"),
        )
        .limit(sample)
        .agg(
            F.expr("percentile_approx(greatest(w, h), 0.5)").alias("med"),
        )
        .collect()[0]
    )
    med = s["med"] or 1.0
    # bias 3 levels finer than the median polygon: candidate count
    # falls ~4× per level while the (broadcast) cover set grows only
    # linearly with polygon perimeter — measured sweet spot
    from ..cells.cellid import MAX_LEVEL

    lvl = min(grid.level_for_size(max(med, 1e-9)) + 3, MAX_LEVEL)
    per_df[key] = lvl
    return lvl


# Small-dimension fast path: one LIMIT-gated collect answers level
# choice, the broadcast size gate AND supplies the broadcast rows —
# replacing three separate driver jobs (choose_level sample, size
# estimate, map collect; measured ~0.9s of fixed per-query cost at
# local[32] on a 25-row dimension table).  Level is replayed from
# choose_level's formula with an exact driver-side median — the level
# affects candidate volume only, never the refined output.
_SMALL_DIM_ROWS = 1024


def _level_from_wkbs(wkbs, grid: CellGrid) -> int:
    from ..cells.cellid import MAX_LEVEL

    ext = []
    for w in wkbs:
        env = gc.from_wkb(w).envelope()
        if env:
            ext.append(max(env[2] - env[0], env[3] - env[1]))
    med = float(np.median(ext)) if ext else 1.0
    return min(grid.level_for_size(max(med, 1e-9)) + 3, MAX_LEVEL)


def _small_dim_plan(polys, poly_id, poly_geom, grid, level, broadcast, threshold):
    """Resolve (level, broadcast, rows) with one driver job when the
    dimension table is small; rows is None when the table exceeds the
    limit (callers fall back to the sampled jobs)."""
    probe = polys.select(poly_id, poly_geom).limit(_SMALL_DIM_ROWS + 1).collect()
    if len(probe) > _SMALL_DIM_ROWS:
        if level is None:
            level = choose_level(polys, poly_geom, grid)
        if broadcast is None:
            broadcast = estimate_build_bytes(polys, poly_geom) <= threshold
        return level, broadcast, None
    rows = [(r[0], bytes(r[1])) for r in probe if r[1] is not None]
    if level is None:
        level = _level_from_wkbs([w for _, w in rows], grid)
    if broadcast is None:
        broadcast = sum(len(w) + 64 for _, w in rows) <= threshold
    return level, broadcast, rows


def pip_join(
    points: DataFrame,
    polys: DataFrame,
    point_id: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    poly_id: str = "poly_id",
    poly_geom: str = "geom",
    predicate: str = "intersects",
    level: Optional[int] = None,
    grid: CellGrid = DEFAULT_GRID,
    broadcast: Optional[bool] = None,
    salt: int = 0,
    keep_cols: Optional[list] = None,
    cell_col: Optional[str] = None,
    tile_level: Optional[int] = None,
    tile_grid: Optional[CellGrid] = None,
    broadcast_threshold: int = BROADCAST_MAX_BYTES,
    bbox_prefilter: bool = False,
) -> DataFrame:
    """Point-in-polygon (or other predicate) join.

    points: (point_id, x, y, ...); polys: (poly_id, geom WKB, ...).
    Returns (point_id, poly_id [, *keep_cols]) candidate-exact pairs —
    keep_cols are probe-side columns carried through the join so the
    caller doesn't need a second pass over the (expensive) probe input.

    For point probes every predicate reduces to a point-location test:
    intersects/covers(poly,pt) → loc != EXTERIOR; contains → strict
    interior; touches → boundary (index.clj:145-160 refine modes).

    cell_col: a pre-computed probe cell column at exactly `level` —
    lets the caller fuse the cell encode into an upstream python
    stage (one fewer JVM↔Python hop).
    tile_level: fuse Z-order tile assignment into the refine stage —
    output gains a `cell_id` column with no extra python stage.
    """
    spark = points.sparkSession
    small_rows = None
    if level is None or broadcast is None:
        # size-gate the collect-based plan ONLY for the default: an
        # explicit True from a caller who knows the build side is small
        # is honored (and skips the estimate job); explicit False keeps
        # the shuffle cell-join
        level, broadcast, small_rows = _small_dim_plan(
            polys, poly_id, poly_geom, grid, level, broadcast, broadcast_threshold
        )

    # bbox_prefilter: carry the build bbox (FLATTENED doubles — a
    # struct column through the broadcast join measured +0.7s/256M
    # probe rows just for field access) and discard out-of-envelope
    # candidates in the JVM before they cross the python socket.
    # MEASURED (round 5, 256M uniform points × 2000 districts,
    # 32 pinned cores): removes ~20% of candidates but costs ~1s of
    # join-side evaluation — net NEGATIVE when candidates are sparse
    # (2M of 256M rows; the probe scan, not the socket, dominates).
    # Net positive only when the candidate fraction is high, so it is
    # opt-in rather than default.
    if small_rows is not None and broadcast and not bbox_prefilter:
        # collected small dimension: build the (cell, pid) table on the
        # driver (same cover_geometry cells as the cover_cells UDF) —
        # removes the build side's python stage from the timed path
        from ..cells.coverage import cover_geometry

        pid_type = polys.schema[poly_id].dataType.simpleString()
        pairs = [
            (int(cid), pid)
            for pid, wkb in small_rows
            for cid in cover_geometry(gc.from_wkb(wkb), grid, level)
        ]
        build = spark.createDataFrame(pairs, f"__cell long, __pid {pid_type}")
    elif not bbox_prefilter:
        build = polys.select(
            F.col(poly_id).alias("__pid"),
            F.col(poly_geom).alias("__pwkb"),
            F.explode(cover_cells(level, grid)(F.col(poly_geom))).alias("__cell"),
        )
    else:
        from ..functions import st_envelope

        build = (
            polys.select(
                F.col(poly_id).alias("__pid"),
                F.col(poly_geom).alias("__pwkb"),
                st_envelope(F.col(poly_geom)).alias("__benv"),
                F.explode(cover_cells(level, grid)(F.col(poly_geom))).alias("__cell"),
            )
            .select(
                "__pid", "__pwkb", "__cell",
                F.col("__benv.xmin").alias("__bx0"),
                F.col("__benv.ymin").alias("__by0"),
                F.col("__benv.xmax").alias("__bx1"),
                F.col("__benv.ymax").alias("__by1"),
            )
        )
    poly_bc = None
    if broadcast:
        # ship each polygon ONCE per executor via a broadcast dict —
        # carrying WKB through the join would duplicate it per
        # candidate row (measured 4× refine slowdown from Arrow bytes)
        poly_map = (
            dict(small_rows)
            if small_rows is not None
            else {r[0]: r[1] for r in polys.select(poly_id, poly_geom).collect()}
        )
        poly_bc = spark.sparkContext.broadcast(poly_map)
        build = build.drop("__pwkb")
    keep_cols = [c for c in (keep_cols or []) if c not in (point_id,)]
    # probe-side cell assignment is PURE CATALYST (cellexpr is
    # property-tested bit-identical to the numpy encoder): the probe
    # is the big side, and a pandas UDF here would put every point
    # through the python socket before the join even starts
    from ..cells.cellexpr import cell_id_expr

    cell_expr = (
        F.col(cell_col)
        if cell_col is not None
        else cell_id_expr(F.col(x_col), F.col(y_col), level, grid)
    )
    probe = points.select(
        F.col(point_id).alias("__qid"),
        F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
        cell_expr.alias("__cell"),
        *[F.col(c) for c in keep_cols],
    )
    if salt > 1:
        build = build.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        probe = probe.withColumn("__salt", F.pmod(F.xxhash64("__qid"), F.lit(salt)))
        on = ["__cell", "__salt"]
    else:
        on = ["__cell"]

    if broadcast is True:
        build = F.broadcast(build)
    cand = probe.join(build, on=on, how="inner")
    if bbox_prefilter:
        # inclusive bounds: every supported point predicate requires
        # the point inside or ON the envelope, so touches/boundary
        # cases survive.  The filter fuses into the join's codegen
        # stage; the bbox columns are dropped before the python
        # refine, so the socket sees only surviving, narrow rows.
        cand = cand.where(
            (F.col("__x") >= F.col("__bx0"))
            & (F.col("__x") <= F.col("__bx1"))
            & (F.col("__y") >= F.col("__by0"))
            & (F.col("__y") <= F.col("__by1"))
        ).drop("__bx0", "__by0", "__bx1", "__by1")

    pred = predicate
    out_fields = [
        StructField("point_id", cand.schema["__qid"].dataType),
        StructField("poly_id", cand.schema["__pid"].dataType),
    ] + [StructField(c, cand.schema[c].dataType) for c in keep_cols]
    if tile_level is not None:
        from pyspark.sql.types import LongType

        out_fields.append(StructField("cell_id", LongType()))
        tgrid = tile_grid or grid
    out_schema = StructType(out_fields)

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # sort by polygon id → contiguous slices, one vectorized
            # point-location call per polygon (no pandas groupby)
            pid = pdf["__pid"].to_numpy()
            order = np.argsort(pid, kind="stable")
            pid = pid[order]
            px = pdf["__x"].to_numpy(np.float64)[order]
            py = pdf["__y"].to_numpy(np.float64)[order]
            qid = pdf["__qid"].to_numpy()[order]
            if poly_bc is not None:
                wkb_of = poly_bc.value
            else:
                wkb_col = pdf["__pwkb"].to_numpy()[order]
            bounds = np.flatnonzero(np.r_[True, pid[1:] != pid[:-1], True])
            keep = np.zeros(n, dtype=bool)
            for s, e in zip(bounds[:-1], bounds[1:]):
                w = wkb_of[pid[s]] if poly_bc is not None else wkb_col[s]
                pp = _prepared(("pip", pid[s]), w)
                loc = pp.locate_batch(px[s:e], py[s:e])
                if pred in ("intersects", "covers"):
                    keep[s:e] = loc != gpred.EXTERIOR
                elif pred == "contains":
                    keep[s:e] = loc == gpred.INTERIOR
                elif pred == "touches":
                    keep[s:e] = loc == gpred.BOUNDARY
                else:
                    raise ValueError(f"unsupported point predicate {pred}")
            if keep.any():
                out = {"point_id": qid[keep], "poly_id": pid[keep]}
                for c in keep_cols:
                    out[c] = pdf[c].to_numpy()[order][keep]
                if tile_level is not None:
                    out["cell_id"] = tgrid.encode_points(px[keep], py[keep], tile_level)
                yield pd.DataFrame(out)

    return cand.mapInPandas(refine, schema=out_schema)


def predicate_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_geom: str,
    right_id: str,
    right_geom: str,
    predicate: str = "intersects",
    level: Optional[int] = None,
    grid: CellGrid = DEFAULT_GRID,
    broadcast: Optional[bool] = None,
    broadcast_threshold: int = BROADCAST_MAX_BYTES,
) -> DataFrame:
    """General geometry×geometry predicate join (both sides WKB).

    Two physical plans, selected by the build-side size estimate
    (same gate as pip_join):

    broadcast (small right side — the common dimension-layer case):
      a cell→geometry index of the right side ships once per executor;
      the probe side runs ONE mapInPandas — no Catalyst join, no pair
      dedupe shuffle, no WKB duplication per candidate row.
    shuffle (both sides large): cover-cell equi-join with dedupe on
      the pair, then the decode-once vectorized refine.

    Both are the distributed form of index/intersecting, touching,
    overlapping, covered-by (index.clj:145-160).
    `predicate` orientation: predicate(left_geom, right_geom).
    """
    small_rows = None
    if level is None or broadcast is None:
        # gate only the default; explicit True/False is the caller's call
        level, broadcast, small_rows = _small_dim_plan(
            right, right_id, right_geom, grid, level, broadcast, broadcast_threshold
        )
    if broadcast:
        return _predicate_join_broadcast(
            left, right, left_id, left_geom, right_id, right_geom,
            predicate, level, grid, rows=small_rows,
        )
    build = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_geom).alias("__rwkb"),
        F.explode(cover_cells(level, grid)(F.col(right_geom))).alias("__cell"),
    )
    probe = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_geom).alias("__lwkb"),
        F.explode(cover_cells(level, grid)(F.col(left_geom))).alias("__cell"),
    )
    cand = (
        probe.join(build, on="__cell", how="inner")
        .select("__lid", "__lwkb", "__rid", "__rwkb")
        .dropDuplicates(["__lid", "__rid"])
    )
    fn = _PRED_FNS[predicate]
    out_schema = StructType(
        [
            StructField("left_id", cand.schema["__lid"].dataType),
            StructField("right_id", cand.schema["__rid"].dataType),
        ]
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decode each right geometry ONCE per contiguous slice (argsort
        # by __rid, the pip_join refine pattern at the `bounds` trick
        # above), decode each left geometry once per batch, and run the
        # envelope prefilter as ONE numpy comparison per slice — the
        # exact kernel touches only bbox survivors (every supported
        # predicate requires a shared point, so disjoint bboxes decide
        # false without the geometry kernels).
        geom_cache: dict = {}

        def decoded(side, wkb):
            # key on the bytes themselves (content-compared on hash
            # collision — same rule as _prepared above)
            b = bytes(wkb)
            key = (side, b)
            g = geom_cache.get(key)
            if g is None:
                if len(geom_cache) >= _PREP_CACHE_MAX:
                    geom_cache.clear()
                g = gc.from_wkb(b)
                geom_cache[key] = g
            return g

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            rid = pdf["__rid"].to_numpy()
            order = np.argsort(rid, kind="stable")
            rid_s = rid[order]
            lid_s = pdf["__lid"].to_numpy()[order]
            lwkb_s = pdf["__lwkb"].to_numpy()[order]
            rwkb_s = pdf["__rwkb"].to_numpy()[order]
            bounds = np.flatnonzero(np.r_[True, rid_s[1:] != rid_s[:-1], True])
            # batch-wide left envelope columns; empties get an inverted
            # box so the vectorized overlap test excludes them
            lgeoms = [None if w is None else decoded("l", w) for w in lwkb_s]
            lenv = np.empty((n, 4), dtype=np.float64)
            for i, g in enumerate(lgeoms):
                if g is None or g.is_empty():
                    lenv[i] = (np.inf, np.inf, -np.inf, -np.inf)
                else:
                    lenv[i] = g.envelope()
            lx0, ly0, lx1, ly1 = lenv[:, 0], lenv[:, 1], lenv[:, 2], lenv[:, 3]
            keep_l, keep_r = [], []
            for s, e in zip(bounds[:-1], bounds[1:]):
                if rwkb_s[s] is None:
                    continue
                gb = decoded("r", rwkb_s[s])
                if gb.is_empty():
                    continue
                bx0, by0, bx1, by1 = gb.envelope()
                sl = slice(s, e)
                ok = ~(
                    (lx1[sl] < bx0) | (bx1 < lx0[sl])
                    | (ly1[sl] < by0) | (by1 < ly0[sl])
                )
                for i in np.flatnonzero(ok) + s:
                    if fn(lgeoms[i], gb):
                        keep_l.append(lid_s[i])
                        keep_r.append(rid_s[i])
            if keep_l:
                yield pd.DataFrame({"left_id": keep_l, "right_id": keep_r})

    return cand.mapInPandas(refine, schema=out_schema)


def _predicate_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_geom: str,
    right_id: str,
    right_geom: str,
    predicate: str,
    level: int,
    grid: CellGrid,
    rows=None,
) -> DataFrame:
    """Broadcast-index plan: cell→right-geometry index shipped once per
    executor, one python stage over the left side, zero shuffles."""
    from collections import defaultdict

    from ..cells.coverage import cover_geometry

    fn = _PRED_FNS[predicate]
    # NULL geometries can never satisfy a predicate — skip them here
    # (the shuffle path and pip_join tolerate them the same way);
    # rows from the small-dim fast path are already NULL-filtered
    if rows is None:
        rows = [
            (r[0], bytes(r[1]))
            for r in right.select(right_id, right_geom).collect()
            if r[1] is not None
        ]
    rids, geoms, envs = [], [], []
    cell_map = defaultdict(list)
    for rid, wkb in rows:
        g = gc.from_wkb(wkb)
        if g.is_empty():
            continue
        # index into the COMPACTED arrays (empties are skipped above,
        # so the raw row position would misalign)
        idx = len(rids)
        for cid in cover_geometry(g, grid, level):
            cell_map[int(cid)].append(idx)
        rids.append(rid)
        geoms.append(wkb)
        envs.append(g.envelope())
    # CSR layout: sorted cell keys + concatenated member slices — lets
    # the probe resolve EVERY (row, cell) lookup of a batch with one
    # np.searchsorted instead of a python dict probe per cell
    sorted_cells = sorted(cell_map)
    cell_keys = np.asarray(sorted_cells, dtype=np.int64)
    counts = np.asarray([len(cell_map[c]) for c in sorted_cells], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])
    members = (
        np.concatenate([np.asarray(cell_map[c], dtype=np.int32) for c in sorted_cells])
        if sorted_cells
        else np.empty(0, dtype=np.int32)
    )
    index = {
        "rids": rids,
        "wkbs": geoms,
        "envs": np.asarray(envs, dtype=np.float64).reshape(-1, 4),
        "cell_keys": cell_keys,
        "starts": starts,
        "members": members,
    }
    bc = left.sparkSession.sparkContext.broadcast(index)

    probe = left.select(F.col(left_id).alias("__lid"), F.col(left_geom).alias("__lwkb"))
    out_schema = StructType(
        [
            StructField("left_id", probe.schema["__lid"].dataType),
            StructField("right_id", right.schema[right_id].dataType),
        ]
    )
    nside = 1 << level
    inv = nside / grid.span
    gx0, gy0 = grid.x0, grid.y0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..cells.cellid import pack

        idx = bc.value
        wkbs = idx["wkbs"]
        benvs = idx["envs"]
        rids_ = idx["rids"]
        keys = idx["cell_keys"]
        starts_ = idx["starts"]
        members_ = idx["members"]
        geom_cache: dict = {}
        for pdf in batches:
            nrows = len(pdf)
            if nrows == 0 or len(keys) == 0:
                continue
            lids = pdf["__lid"].to_numpy()
            lwkbs = pdf["__lwkb"].to_numpy()
            lgeoms = []
            lenv = np.empty((nrows, 4), dtype=np.float64)
            for i, lw in enumerate(lwkbs):
                g = None if lw is None else gc.from_wkb(bytes(lw))
                lgeoms.append(g)
                if g is None or g.is_empty():
                    lenv[i] = (np.inf, np.inf, -np.inf, -np.inf)
                else:
                    lenv[i] = g.envelope()
            # vectorized bbox→cell ranges, flat (row, cell) expansion
            ix0 = np.clip(np.floor((lenv[:, 0] - gx0) * inv), 0, nside - 1).astype(np.int64)
            ix1 = np.clip(np.floor((lenv[:, 2] - gx0) * inv), 0, nside - 1).astype(np.int64)
            iy0 = np.clip(np.floor((lenv[:, 1] - gy0) * inv), 0, nside - 1).astype(np.int64)
            iy1 = np.clip(np.floor((lenv[:, 3] - gy0) * inv), 0, nside - 1).astype(np.int64)
            # any non-finite coord (empty sentinel OR a NaN slipping
            # through from bad input) must zero the row's cell count:
            # NaN→int64 yields INT64_MIN and a NEGATIVE ny would make
            # np.repeat throw
            empty_mask = ~np.isfinite(lenv).all(axis=1)
            ny = iy1 - iy0 + 1
            cnt = np.where(empty_mask, 0, (ix1 - ix0 + 1) * ny)
            cum = np.cumsum(cnt)
            total = int(cum[-1])
            if total == 0:
                continue
            row = np.repeat(np.arange(nrows, dtype=np.int64), cnt)
            j = np.arange(total, dtype=np.int64) - np.repeat(cum - cnt, cnt)
            cells = pack(ix0[row] + j // ny[row], iy0[row] + j % ny[row], level).view(np.int64)
            # batched index lookup: searchsorted + equality mask
            pos = np.searchsorted(keys, cells)
            pos = np.minimum(pos, len(keys) - 1)
            hit = keys[pos] == cells
            hrow, hpos = row[hit], pos[hit]
            # expand each hit cell's member slice → flat (row, member)
            mcnt = starts_[hpos + 1] - starts_[hpos]
            mtotal = int(mcnt.sum())
            if mtotal == 0:
                continue
            mrow = np.repeat(hrow, mcnt)
            moff = np.arange(mtotal, dtype=np.int64) - np.repeat(
                np.cumsum(mcnt) - mcnt, mcnt
            )
            midx = members_[np.repeat(starts_[hpos], mcnt) + moff].astype(np.int64)
            # dedupe (row, member) pairs from multi-cell hits
            pairkey = mrow * np.int64(len(rids_)) + midx
            uniq = np.unique(pairkey)
            urow = (uniq // len(rids_)).astype(np.int64)
            umem = (uniq % len(rids_)).astype(np.int64)
            # vectorized envelope prefilter
            a = lenv[urow]
            b = benvs[umem]
            ok = ~(
                (a[:, 2] < b[:, 0]) | (b[:, 2] < a[:, 0])
                | (a[:, 3] < b[:, 1]) | (b[:, 3] < a[:, 1])
            )
            keep_l, keep_r = [], []
            for r_, m_ in zip(urow[ok], umem[ok]):
                gb = geom_cache.get(m_)
                if gb is None:
                    if len(geom_cache) >= _PREP_CACHE_MAX:
                        geom_cache.clear()
                    gb = gc.from_wkb(wkbs[m_])
                    geom_cache[m_] = gb
                if fn(lgeoms[r_], gb):
                    keep_l.append(lids[r_])
                    keep_r.append(rids_[m_])
            if keep_l:
                yield pd.DataFrame({"left_id": keep_l, "right_id": keep_r})

    return probe.mapInPandas(run, schema=out_schema)
