"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant (random-hyperplane signs) is the 100 TB scale path — bucket
equi-join prunes the candidate set, exact cosine re-ranks.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


Q_SCALE = 1 << 20  # embedding quantization step for the exact sign-hash
P_HALF = 1 << 19   # plane entries are uniform integers in [-P_HALF, P_HALF)


def portable_planes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic integer hyperplanes, reproducible in ANY engine
    with md5: entry (i, j) = first-8-hex-chars-of md5('plane:i:j') as
    uint32, mapped to [-2^19, 2^19).  Returned as float64 (the values
    are integers ≤ 2^19, so float64 matmul against integer-quantized
    embeddings stays EXACT — every intermediate < 2^53).  Uniform-cube
    rather than Gaussian directions: fine for sign-LSH in practice,
    and it makes the signature bit-for-bit replayable in a SQL oracle
    (recall vs brute force is asserted separately in tests)."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for i in range(n_planes):
        for j in range(dim):
            h = int(hashlib.md5(f"plane:{i}:{j}".encode()).hexdigest()[:8], 16)
            out[i, j] = float((h % (2 * P_HALF)) - P_HALF)
    return out


def portable_planes_sql(n_planes: int, dim: int) -> str:
    """DuckDB CTE body producing the identical plane table:
    (i BIGINT, p LIST<BIGINT>[dim])."""
    return f"""
  SELECT i, list_transform(range(0, {dim}),
           j -> (('0x' || substring(md5('plane:' || i || ':' || j), 1, 8))::UBIGINT
                 % {2 * P_HALF})::BIGINT - {P_HALF}) AS p
  FROM range(0, {n_planes}) t(i)"""


def _cosine_col(a, b):
    """Cosine similarity between two array<double> columns, sequential
    left-fold (matches the oracle's list-reduction order)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid: str = "qid",
    cid: str = "cid",
    q_emb: str = "embedding",
    c_emb: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the queries, scan the corpus once
    (at 100 TB this is the right plan: one pass, no shuffle of the big
    side; the window is per-query, partitioned on qid)."""
    from ..partitioning import spread_small_scan

    q = queries.select(
        F.col(qid).alias("__qid"), F.transform(F.col(q_emb), lambda v: v.cast("double")).alias("__qe")
    )
    # the per-pair cosine fold is the expensive stage; a one-row-group
    # corpus scan would run it on a single core
    c = spread_small_scan(corpus, cid).select(
        F.col(cid).alias("__cid"), F.transform(F.col(c_emb), lambda v: v.cast("double")).alias("__ce")
    )
    pairs = c.crossJoin(F.broadcast(q)).withColumn(
        "sim", F.round(_cosine_col(F.col("__qe"), F.col("__ce")), 6)
    )
    w = Window.partitionBy("__qid").orderBy(F.col("sim").desc(), F.col("__cid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("__qid").alias(qid), F.col("__cid").alias(cid), "sim", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 8,
    train_sample: int = 10_000,
    qid: str = "qid",
    cid: str = "cid",
    q_emb: str = "embedding",
    c_emb: str = "embedding",
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path:

      train: Lloyd's k-means on a BOUNDED corpus sample (driver-side,
        ≤ train_sample vectors — size-gated by construction), on
        L2-normalized vectors so euclidean argmin == cosine argmax.
      assign: one corpus pass tags each vector with its nearest
        centroid (broadcast centers, vectorized matmul per batch).
      probe: each query explodes its `nprobe` nearest centroid ids;
        a plain equi-join on centroid id prunes the candidate set to
        ~nprobe/n_centroids of the corpus; exact cosine re-ranks.

    Every corpus vector lives in exactly one list, so the probe join
    needs no dedupe.  Deterministic for a fixed seed."""
    rng = np.random.RandomState(seed)

    sample = [
        np.asarray(r[0], dtype=np.float64)
        for r in corpus.select(c_emb).limit(train_sample).collect()
    ]
    S = np.stack(sample)
    if S.shape[1] != dim:
        raise ValueError(f"corpus embeddings are {S.shape[1]}-d, expected dim={dim}")
    S = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    n_c = min(n_centroids, len(S))
    centers = S[rng.choice(len(S), size=n_c, replace=False)]
    for _ in range(10):  # Lloyd's on the sample
        assign = np.argmax(S @ centers.T, axis=1)
        for j in range(n_c):
            members = S[assign == j]
            if len(members):
                m = members.mean(axis=0)
                centers[j] = m / max(np.linalg.norm(m), 1e-12)
    bc = corpus.sparkSession.sparkContext.broadcast(centers)

    @F.pandas_udf(LongType())
    def nearest_center(emb: pd.Series) -> pd.Series:
        C = bc.value
        m = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ C.T, axis=1).astype(np.int64))

    from pyspark.sql.types import ArrayType

    @F.pandas_udf(ArrayType(LongType()))
    def probe_centers(emb: pd.Series) -> pd.Series:
        C = bc.value
        m = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ C.T
        top = np.argsort(-sims, axis=1)[:, : min(nprobe, C.shape[0])]
        return pd.Series([row.astype(np.int64).tolist() for row in top])

    from ..partitioning import spread_small_scan

    c = spread_small_scan(corpus, cid).select(
        F.col(cid).alias("__cid"),
        F.transform(F.col(c_emb), lambda v: v.cast("double")).alias("__ce"),
        nearest_center(F.col(c_emb)).alias("__ctr"),
    )
    q = queries.select(
        F.col(qid).alias("__qid"),
        F.transform(F.col(q_emb), lambda v: v.cast("double")).alias("__qe"),
        F.explode(probe_centers(F.col(q_emb))).alias("__ctr"),
    )
    cand = q.join(c, on="__ctr", how="inner").withColumn(
        "sim", F.round(_cosine_col(F.col("__qe"), F.col("__ce")), 6)
    )
    w = Window.partitionBy("__qid").orderBy(F.col("sim").desc(), F.col("__cid").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("__qid").alias(qid), F.col("__cid").alias(cid), "sim", "rank")
    )


def ivf_topk_deterministic(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    qid: str = "qid",
    cid: str = "cid",
    q_emb: str = "embedding",
    c_emb: str = "embedding",
) -> DataFrame:
    """IVF with a fully engine-portable coarse quantizer — the oracle-
    checkable twin of `ivf_topk` (same plan shape: assign → inverted
    lists → probe-join → exact re-rank), trading Lloyd refinement for
    determinism:

      centers: the `n_centroids` corpus vectors with the smallest
        md5(vec_id-as-string) — a deterministic pseudo-random sample
        any engine reproduces (k-means++-style seeding without the
        iterations).
      assign/probe: argmax / top-nprobe of ROUND(cosine, 6) with
        center-id tiebreak — rounding before the argmax makes the
        assignment robust to last-ulp float differences across
        engines; ties at 6dp break on the smaller center id.

    Pure DataFrame ops (no pandas UDF): the corpus×centers scoring is
    a broadcast nested-loop the JVM codegens; at 100 TB the corpus is
    scanned once and only the tiny center table is broadcast."""
    from ..partitioning import spread_small_scan

    c = spread_small_scan(corpus, cid).select(
        F.col(cid).alias("__cid"),
        F.transform(F.col(c_emb), lambda v: v.cast("double")).alias("__ce"),
    )
    q = queries.select(
        F.col(qid).alias("__qid"),
        F.transform(F.col(q_emb), lambda v: v.cast("double")).alias("__qe"),
    )
    # distributed TakeOrdered (orderBy+limit), NOT a global window —
    # the row_number only runs over the already-selected n rows
    sample = c.withColumn("__h", F.md5(F.col("__cid").cast("string"))).orderBy(
        "__h"
    ).limit(n_centroids)
    centers = F.broadcast(
        sample.withColumn(
            "__ctr", F.row_number().over(Window.orderBy("__h")) - 1
        ).select("__ctr", F.col("__ce").alias("__ctre"))
    )

    def best_centers(df, emb_col, n):
        scored = df.crossJoin(centers).withColumn(
            "__csim", F.round(_cosine_col(F.col(emb_col), F.col("__ctre")), 6)
        )
        w = Window.partitionBy(df.columns[0]).orderBy(
            F.col("__csim").desc(), F.col("__ctr").asc()
        )
        return (
            scored.withColumn("__crank", F.row_number().over(w))
            .where(F.col("__crank") <= n)
            .drop("__csim", "__crank", "__ctre")
        )

    c_assigned = best_centers(c, "__ce", 1)
    q_probes = best_centers(q, "__qe", nprobe)
    cand = q_probes.join(c_assigned, on="__ctr", how="inner").withColumn(
        "sim", F.round(_cosine_col(F.col("__qe"), F.col("__ce")), 6)
    )
    w = Window.partitionBy("__qid").orderBy(F.col("sim").desc(), F.col("__cid").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("__qid").alias(qid), F.col("__cid").alias(cid), "sim", "rank")
    )


def _cosine_near_dups_matmul(
    c: DataFrame, threshold: float, rows, chunk_doubles: int = 64_000_000
) -> DataFrame:
    """Broadcast-matrix brute force: one corpus pass, numpy sims per
    Arrow batch, emit (id_a < id_b, sim ≥ t).  Each UNORDERED pair is
    computed once on the side holding its smaller id.

    `rows` is the already-collected corpus (the caller's size gate
    collects it anyway; re-collecting here would pay a second job —
    the single-collect planning discipline of ops/joins.py).

    The B×N sims matrix is computed in CORPUS-COLUMN CHUNKS so peak
    per-batch memory is bounded by `chunk_doubles` float64s (~512 MB
    default) independent of corpus size N — a 10k-row batch against a
    500k corpus would otherwise allocate a 40 GB dense matrix."""
    ids = np.asarray([r[0] for r in rows])
    M = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    order = np.argsort(ids, kind="stable")
    ids_s, M_s = ids[order], M[order]
    # ratio form dot/(|a||b|), the same float ops as the SQL oracle
    norms = np.maximum(np.sqrt((M_s * M_s).sum(axis=1)), 1e-300)
    bc = c.sparkSession.sparkContext.broadcast((ids_s, M_s, norms))
    # the scan side of a union/one-row-group corpus can be badly
    # unbalanced (one fat partition does every matmul); the corpus is
    # collect-gated small here, so an explicit hash spread is cheap
    # and makes the B x N scoring embarrassingly parallel
    c = c.repartition(c.sparkSession.sparkContext.defaultParallelism, "__id")

    out_schema = StructType(
        [
            StructField("id_a", c.schema["__id"].dataType),
            StructField("id_b", c.schema["__id"].dataType),
            StructField("sim", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, allM, allnorm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            bids = pdf["__id"].to_numpy()
            B = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["__e"]])
            bnorm = np.maximum(np.sqrt((B * B).sum(axis=1)), 1e-300)
            step = max(1, chunk_doubles // max(len(B), 1))
            for c0 in range(0, len(all_ids), step):
                c1 = min(c0 + step, len(all_ids))
                raw = (B @ allM[c0:c1].T) / (bnorm[:, None] * allnorm[None, c0:c1])
                # pre-filter on the raw sims with a half-ulp-of-6dp
                # margin, THEN round only the survivors: np.round over
                # the full B x N matrix costs more than the matmul
                # itself, and round(x, 6) >= t can only admit raw
                # values within 5e-7 of t.  Threshold semantics are
                # unchanged (exact filter on the rounded value below).
                hit_r, hit_c = np.nonzero(
                    (raw >= threshold - 1e-6)
                    & (bids[:, None] < all_ids[None, c0:c1])
                )
                if len(hit_r):
                    sims = np.round(raw[hit_r, hit_c], 6)
                    keep = sims >= threshold
                    hit_r, hit_c, sims = hit_r[keep], hit_c[keep], sims[keep]
                if len(hit_r):
                    yield pd.DataFrame(
                        {
                            "id_a": bids[hit_r],
                            "id_b": all_ids[c0 + hit_c],
                            "sim": sims,
                        }
                    )

    return c.mapInPandas(run, schema=out_schema)


def cosine_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    cid: str = "vec_id",
    emb: str = "embedding",
    candidates: DataFrame = None,
    matmul: bool = True,
    matmul_max: int = 500_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim ≥ t).

    Three physical forms:
      candidates given  — exact cosine only for those (id_a, id_b)
        pairs (the LSH-candidates verification pattern shared with
        jaccard_pairs); the 100 TB path.
      broadcast matmul (default when the corpus fits `matmul_max`
        vectors) — the corpus matrix ships once per executor; each
        Arrow batch scores B×N sims with ONE numpy matmul instead of
        N×N Catalyst fold evaluations (measured 40× at 2k vectors).
      pair self-join (`matmul=False`) — the pure-Catalyst reference
        form; quadratic in row count AND per-pair fold cost."""
    c = corpus.select(
        F.col(cid).alias("__id"),
        F.transform(F.col(emb), lambda v: v.cast("double")).alias("__e"),
    )
    if candidates is None and matmul:
        # ONE driver job answers the size gate AND hands the matmul
        # path its corpus: limit(max+1) returns every row while the
        # corpus is within the gate, and the +1 sentinel detects
        # overflow without a separate count job (was: a count job,
        # then a full collect — two jobs of pure fixed cost per call)
        rows = c.limit(matmul_max + 1).collect()
        if len(rows) <= matmul_max:
            return _cosine_near_dups_matmul(c, threshold, rows)
    if candidates is not None:
        # normalize to the exact-form contract (id_a < id_b, no self
        # pairs): raw LSH candidates contain self matches and both
        # orientations
        cand = (
            candidates.select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .where(F.col("id_a") != F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        pairs = (
            cand
            .join(c.select(F.col("__id").alias("id_a"), F.col("__e").alias("__ea")), "id_a")
            .join(c.select(F.col("__id").alias("id_b"), F.col("__e").alias("__eb")), "id_b")
        )
    else:
        a = c.select(F.col("__id").alias("id_a"), F.col("__e").alias("__ea"))
        b = c.select(F.col("__id").alias("id_b"), F.col("__e").alias("__eb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("sim", F.round(_cosine_col(F.col("__ea"), F.col("__eb")), 6))
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 64,
    band_bits: int = 16,
    multiprobe: int = 1,
    qid: str = "qid",
    cid: str = "cid",
    q_emb: str = "embedding",
    c_emb: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH, sized for scale:

      64 planes → 4 bands of 16 bits (65,536 buckets per band), so a
      random corpus pair collides in a band with p≈2^-16 — candidate
      volume stays a small fraction of the cross join even at 100 TB.
      Recall comes from band OR-ing plus 1-bit MULTI-PROBE on the
      query side (each band also probes the 16 Hamming-1 buckets):
      for near-dup similarity ~0.95 (per-bit agreement p≈0.9) a band
      hits with p^16 + 16·p^15(1-p) ≈ 0.51 → 4 bands ≈ 0.94 recall,
      at ~(1+16)·4/65536 ≈ 0.1% candidate fraction.

    Candidates join on (band index, bucket) — a plain equi-join the
    optimizer can shuffle-partition — then exact cosine re-ranks.
    """
    if n_planes % band_bits != 0:
        raise ValueError("n_planes must be a multiple of band_bits")
    if multiprobe not in (0, 1):
        raise NotImplementedError(
            "multiprobe is the probe Hamming radius; only 0 (exact bucket) "
            "and 1 (all single-bit flips) are implemented"
        )
    n_bands = n_planes // band_bits
    band_mask = (1 << band_bits) - 1
    planes = portable_planes(n_planes, dim)

    @F.pandas_udf(LongType())
    def signature(emb: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        # exact sign-hash: floor(x*2^20 + 0.5) quantization (identical
        # semantics to the oracle's floor(...+0.5)::BIGINT), then a
        # float64 matmul whose terms/sums are all integers < 2^53 —
        # bit-reproducible regardless of summation order or engine
        m = np.floor(m * Q_SCALE + 0.5)
        signs = (m @ planes.T) > 0
        out = np.zeros(len(m), dtype=np.uint64)
        for i in range(n_planes):
            out |= signs[:, i].astype(np.uint64) << np.uint64(i)
        return pd.Series(out.view(np.int64))

    def band_col(sig, b):
        return F.shiftrightunsigned(sig, b * band_bits).bitwiseAND(F.lit(band_mask))

    from ..partitioning import spread_small_scan

    # corpus: one row per (band, bucket) — 4 rows per vector
    c = spread_small_scan(corpus, cid).select(
        F.col(cid).alias("__cid"),
        F.transform(F.col(c_emb), lambda v: v.cast("double")).alias("__ce"),
        signature(F.col(c_emb)).alias("__sig"),
    )
    c_bands = c.select(
        "__cid",
        "__ce",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("b"), band_col(F.col("__sig"), b).alias("v"))
                for b in range(n_bands)
            ])
        ).alias("__bb"),
    ).select("__cid", "__ce", F.col("__bb.b").alias("__b"), F.col("__bb.v").alias("__v"))

    # queries: per band, the exact bucket plus `multiprobe`-bit flips
    q = queries.select(
        F.col(qid).alias("__qid"),
        F.transform(F.col(q_emb), lambda v: v.cast("double")).alias("__qe"),
        signature(F.col(q_emb)).alias("__sig"),
    )
    probe_structs = []
    for b in range(n_bands):
        base = band_col(F.col("__sig"), b)
        keys = [base]
        if multiprobe >= 1:
            keys += [base.bitwiseXOR(F.lit(1 << j)) for j in range(band_bits)]
        probe_structs += [
            F.struct(F.lit(b).alias("b"), key.alias("v")) for key in keys
        ]
    q_bands = q.select(
        "__qid",
        "__qe",
        F.explode(F.array(*probe_structs)).alias("__bb"),
    ).select("__qid", "__qe", F.col("__bb.b").alias("__b"), F.col("__bb.v").alias("__v"))

    cand = q_bands.join(c_bands, on=["__b", "__v"], how="inner").dropDuplicates(
        ["__qid", "__cid"]
    )
    if k is None:  # candidates-only mode (selectivity measurement)
        return cand.select(F.col("__qid").alias(qid), F.col("__cid").alias(cid))
    cand = cand.withColumn("sim", F.round(_cosine_col(F.col("__qe"), F.col("__ce")), 6))
    w = Window.partitionBy("__qid").orderBy(F.col("sim").desc(), F.col("__cid").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("__qid").alias(qid), F.col("__cid").alias(cid), "sim", "rank")
    )
