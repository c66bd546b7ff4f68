"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard.  (Training-data-pipeline operators; graded
alongside SURVEY.md §2.)

All hash arithmetic is engine-portable (md5 → hex-prefix → int) so the
DuckDB oracle can reproduce the exact same signatures; no JVM/py hash
functions in the contract path.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType

MERSENNE = 2147483647  # 2^31 - 1
# deterministic affine-hash parameters (published-constant style: small
# odd multipliers; any fixed values work — the oracle mirrors them)
MINHASH_A = [1999, 3491, 5683, 7873, 9973, 12007, 14009, 16001]
MINHASH_B = [17, 131, 731, 1399, 2677, 3307, 4021, 4801]


def tokens_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct whitespace tokens per document."""
    from ..partitioning import spread_small_scan

    # split+array_distinct+explode is the per-row-expensive stage of
    # every tokens consumer; a one-row-group scan would run it serially
    docs = spread_small_scan(docs.select(id_col, text_col), id_col)
    return docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).where(F.col("tok") != "")


def token_hash(col):
    """Portable token hash: first 8 hex chars of md5 as a bigint."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: (text_hash, n_dups, canonical id)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = 8
) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signature over distinct tokens."""
    toks = tokens_df(docs, id_col, text_col).withColumn("th", token_hash(F.col("tok")))
    aggs = [
        F.min((F.col("th") * MINHASH_A[i] + MINHASH_B[i]) % MERSENNE).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    band_size: int = 2,
    max_bucket: int = None,
) -> DataFrame:
    """Candidate near-dup pairs: documents sharing ≥1 LSH band bucket
    (shingle→minhash→band→bucket, pair set deduped).

    Plan shape (chosen for 100 TB, not just correctness): the MinHash
    signature aggregation runs ONCE — bands come from a single
    explode, buckets from one groupBy, and pairs from an in-row
    double explode over each bucket's sorted id list.  No self-join,
    so no second (or eighth) evaluation of the signature subtree and
    no join shuffle; total shuffles = sig-agg + bucket-agg +
    final pair distinct.

    max_bucket — the skew guard: buckets holding more than this many
    documents (boilerplate-heavy corpora: headers, licence pages,
    empty docs) contribute size² candidate pairs and size-long
    collect_lists; buckets over the cap are DROPPED BEFORE the list
    aggregation and the number of dropped buckets is logged loudly
    (never silently).  Ultra-common buckets carry no near-dup signal
    (they are the Jaccard max_df analogue).  None (default) = exact,
    oracle-scale mode; SET A CAP AT PRODUCTION SCALE.

    Scale note (round 6): band membership is a pure function of the
    signature, so documents with identical signatures are collapsed
    into one *signature group* before any banding — candidates are
    enumerated per group pair, deduped across bands at group level
    (a distinct over group-id pairs instead of doc-id pairs), and
    doc pairs are emitted exactly once by `explode_group_pairs`.  In
    duplicate-heavy corpora this removes the O(pairs x bands) doc-pair
    shuffle outright (sf1.0: a 2.1e9-row distinct became a 4.2e6-row
    one for the identical 9.58e8-row result)."""
    from ._guard import guard_persist
    from .pairgen import explode_group_pairs

    sig = minhash_signatures(docs, id_col, text_col, n_hashes)
    n_bands = n_hashes // band_size
    hcols = [f"h{i}" for i in range(n_hashes)]
    # signature groups: sorted member ids; group id = smallest member
    # (unique across groups because each doc has exactly one signature)
    sgrp = (
        sig.groupBy(*hcols)
        .agg(
            F.sort_array(F.collect_list(F.col(id_col))).alias("__ids"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(F.col("__ids")[0].alias("__gid"), "__ids", "__n", *hcols)
    )
    # small (one row per distinct signature) and read by several
    # subtrees below (band pairs + two broadcast id maps): persist so
    # the token-scan/signature aggregation runs once per invocation
    sgrp = guard_persist("minhash_lsh_pairs", sgrp)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_",
                *[F.col(f"h{i}").cast("string") for i in range(b * band_size, (b + 1) * band_size)],
            ).alias("bucket"),
        )
        for b in range(n_bands)
    ]
    bands = sgrp.select(
        "__gid", "__n", F.explode(F.array(*band_structs)).alias("__bb")
    ).select(
        "__gid",
        "__n",
        F.col("__bb.band").alias("band"),
        F.col("__bb.bucket").alias("bucket"),
    )
    # one aggregation yields both the bucket's group list and its DOC
    # count (the guard is defined over documents, exactly as before)
    grouped = bands.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list("__gid")).alias("__gids"),
        F.sum("__n").alias("__docs"),
    )
    if max_bucket is not None:
        n_dropped = grouped.where(F.col("__docs") > max_bucket).count()
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh_pairs: dropped %d bucket(s) larger than max_bucket=%d "
                "(boilerplate skew guard; pairs within those buckets are NOT emitted)",
                n_dropped,
                max_bucket,
            )
        grouped = grouped.where(F.col("__docs") <= max_bucket)
    # group-level pair generation (posexplode/slice skew spread, then
    # the cross-band dedupe on group-id pairs — tiny vs doc pairs)
    # slice BEFORE the spread exchange: a posexplode row only needs the
    # tail of its bucket array, and shipping the full array moved
    # Σ bucket² id copies through the shuffle instead of Σ bucket²/2
    # (measured 1.4× on the simhash twin of this pattern at sf1.0)
    first = (
        grouped.where(F.size("__gids") > 1)
        .select(F.posexplode("__gids").alias("__i", "__ga"), F.col("__gids"))
        .where(F.col("__i") < F.size("__gids") - 1)
        .select("__ga", "__i", F.slice("__gids", F.col("__i") + 2, F.size("__gids")).alias("__tail"))
    )
    gpairs = (
        first.repartition("__ga", "__i")
        .select("__ga", F.explode("__tail").alias("__gb"))
        .distinct()
    )
    # groups with >=2 members share every band with themselves: all
    # within-group pairs are always candidates
    self_pairs = sgrp.where(F.col("__n") > 1).select(
        F.col("__gid").alias("__ga"), F.col("__gid").alias("__gb")
    )
    idmap = sgrp.select("__gid", "__ids", "__n")
    return explode_group_pairs(gpairs.unionByName(self_pairs), idmap)


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.4,
    max_df: int = None,
    candidates: DataFrame = None,
) -> DataFrame:
    """Token-set Jaccard ≥ threshold pairs (id_a < id_b, jacc 6dp).

    The default (exact) form is the shingle self-join: pairs sharing
    ≥1 token.  That generates Σ df(tok)² candidates — a stopword joins
    nearly all documents pairwise, which is quadratic at 100 TB.  Two
    scale guards (use at least one beyond oracle scale):

    max_df: drop tokens whose document frequency exceeds the cap from
      BOTH the join and the similarity (prefix-filter semantics: ultra-
      common tokens carry no near-dup signal; candidate volume becomes
      Σ_{df≤cap} df² ≤ cap · Σ df).
    candidates: a (id_a, id_b) DataFrame (e.g. minhash_lsh_pairs
      output) — exact Jaccard is then computed only for those pairs
      via two token joins (the verification half of the MinHash+LSH
      pipeline; volume = |candidates| · avg tokens).
    """
    toks = tokens_df(docs, id_col, text_col)
    if max_df is not None:
        keep = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("tok")
        )
        toks = toks.join(keep, "tok")
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        ta = toks.select(F.col(id_col).alias("id_a"), "tok")
        tb = toks.select(F.col(id_col).alias("id_b"), "tok")
        common = (
            candidates.select("id_a", "id_b")
            .join(ta, "id_a")
            .join(tb, ["id_b", "tok"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        # exact form without the token self-join: group each token's
        # sorted doc list, then the same skew-spread pair explosion as
        # minhash_lsh_pairs (posexplode → repartition → slice) so one
        # stop-word's df² pairs don't land in a single task, and the
        # token pipeline is evaluated once instead of twice
        tok_groups = (
            toks.groupBy("tok")
            .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("__ids"))
            .where(F.size("__ids") > 1)
        )
        # slice before the spread exchange (see minhash_lsh_pairs)
        first = (
            tok_groups.select(
                F.posexplode("__ids").alias("__i", "id_a"), F.col("__ids")
            )
            .where(F.col("__i") < F.size("__ids") - 1)
            .select("id_a", "__i", F.slice("__ids", F.col("__i") + 2, F.size("__ids")).alias("__tail"))
        )
        pairs = first.repartition("id_a", "__i").select(
            "id_a",
            F.explode("__tail").alias("id_b"),
        )
        common = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("common"))
    return (
        common.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document.  Token hash = first 8 bytes of
    md5(token) big-endian (portable: the DuckDB oracle reproduces it
    as ('0x'||substr(md5(tok),1,16))::UBIGINT).  Vectorized: each
    batch hashes its UNIQUE tokens once, then accumulates the ±1 bit
    contributions with one scatter-add over the (doc, token) pairs."""
    import hashlib

    BITS = np.arange(64, dtype=np.uint64)

    def _sim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            vocab: dict = {}
            flat_tok: List[int] = []
            flat_doc: List[int] = []
            for i, text in enumerate(pdf[text_col]):
                for t in set((text or "").split(" ")):
                    if not t:
                        continue
                    j = vocab.get(t)
                    if j is None:
                        j = vocab[t] = len(vocab)
                    flat_tok.append(j)
                    flat_doc.append(i)
            if vocab:
                hs = np.fromiter(
                    (
                        int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
                        for t in vocab
                    ),
                    dtype=np.uint64,
                    count=len(vocab),
                )
                # V×64 matrix of ±1 contributions, one row per unique token
                contrib = (
                    ((hs[:, None] >> BITS[None, :]) & np.uint64(1)).astype(np.int32) * 2 - 1
                )
                acc = np.zeros((n, 64), dtype=np.int64)
                np.add.at(acc, np.asarray(flat_doc), contrib[np.asarray(flat_tok)])
            else:
                acc = np.zeros((n, 64), dtype=np.int64)
            pos = acc > 0
            sh = np.zeros(n, dtype=np.uint64)
            for b in range(64):
                sh |= pos[:, b].astype(np.uint64) << np.uint64(b)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": sh.view(np.int64)})

    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("simhash", LongType()),
        ]
    )
    from ..partitioning import spread_small_scan

    # single-row-group scans would serialize the Python kernel
    inp = spread_small_scan(docs.select(id_col, text_col), id_col)
    return inp.mapInPandas(_sim, schema=schema)


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = None,
) -> DataFrame:
    """SimHash near-duplicate pairs: (id_a, id_b, hamming ≤ max_hamming).

    Bit-band LSH over the 64-bit fingerprint (Manku et al., WWW'07):
    with n_bands = max_hamming+1 bands, any pair within max_hamming
    MUST agree on at least one whole band (pigeonhole), so the banded
    bucket equi-join is a lossless candidate generator — no all-pairs
    scan — and the bit_count(XOR) refine is exact.  At 100 TB this is
    a plain 4-way band shuffle join; candidates per bucket scale with
    the near-dup cluster sizes, not the corpus.

    Scale note (round 6): band membership and the Hamming distance are
    pure functions of the 64-bit fingerprint, so documents sharing a
    simhash value are collapsed into one group first (same move as
    minhash_lsh_pairs).  Candidates, the Hamming refine AND the
    cross-band dedupe all run on distinct simhash VALUES — the refine
    filter applies before any doc-level row exists, so the doc-pair
    stage emits only true near-dup pairs, exactly once each, via
    `explode_group_pairs`."""
    if n_bands is None:
        n_bands = max_hamming + 1
    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1
    from ._guard import guard_persist
    from .pairgen import explode_group_pairs

    sh = simhash64(docs, id_col, text_col)
    # one group per distinct simhash value; group id = smallest member
    sgrp = (
        sh.groupBy("simhash")
        .agg(
            F.sort_array(F.collect_list(F.col(id_col))).alias("__ids"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(F.col("__ids")[0].alias("__gid"), "simhash", "__ids", "__n")
    )
    # small (one row per distinct fingerprint), read by several
    # subtrees: persist so the simhash mapInPandas pass runs once
    sgrp = guard_persist("simhash_near_dups", sgrp)
    # Two-level banding (round 6): a pair within max_hamming agrees on
    # some whole band b (pigeonhole, as before) AND — since the other
    # 64-band_bits bits then carry all <=max_hamming errors — on at
    # least one of n_sub sub-bands partitioning those remaining bits
    # (pigeonhole again, n_sub = max_hamming+1).  Bucketing on
    # (band, band value, sub-band, sub value) is therefore still a
    # LOSSLESS candidate generator, with ~band_bits+sub_bits matching
    # bits per bucket instead of band_bits: measured at sf1.0, the
    # within-bucket pair explosion fell 24.4M -> 5.8M (4.2x) for the
    # identical refined pair set (the cross-bucket distinct already
    # dedupes the extra bucketings).
    n_sub = max_hamming + 1
    rem_bits = 64 - band_bits
    sub_bits = max(rem_bits // n_sub, 1)
    sig = F.col("simhash")
    band_structs = []
    for b in range(n_bands):
        low_bits = b * band_bits
        v = F.shiftrightunsigned(sig, low_bits).bitwiseAND(F.lit(mask))
        # 64-bit remainder with band b's bits removed (the unbanded top
        # bits, when 64 % n_bands != 0, are part of the remainder too —
        # errors there count toward the hamming budget)
        high = F.shiftrightunsigned(sig, low_bits + band_bits)
        low = sig.bitwiseAND(F.lit((1 << low_bits) - 1)) if low_bits else F.lit(0)
        rem = F.shiftleft(high, low_bits).bitwiseOR(low)
        for sb in range(n_sub):
            width = rem_bits - (n_sub - 1) * sub_bits if sb == n_sub - 1 else sub_bits
            sv = F.shiftrightunsigned(rem, sb * sub_bits).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            band_structs.append(
                F.struct(
                    F.lit(b * n_sub + sb).alias("b"),
                    F.shiftleft(v, 32).bitwiseOR(sv).alias("v"),
                )
            )
    bands = sgrp.select(
        "__gid",
        "simhash",
        F.explode(F.array(*band_structs)).alias("__bb"),
    ).select("__gid", "simhash", F.col("__bb.b").alias("__b"), F.col("__bb.v").alias("__v"))
    grouped = bands.groupBy("__b", "__v").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__gid").alias("g"), F.col("simhash").alias("s")))
        ).alias("__gs")
    )
    # slice BEFORE the spread exchange (see minhash_lsh_pairs): the
    # full-array shuffle cost 5.5s vs 3.9s sliced at sf1.0
    first = (
        grouped.where(F.size("__gs") > 1)
        .select(F.posexplode("__gs").alias("__i", "__a"), F.col("__gs"))
        .where(F.col("__i") < F.size("__gs") - 1)
        .select("__a", "__i", F.slice("__gs", F.col("__i") + 2, F.size("__gs")).alias("__tail"))
    )
    # Hamming refine BEFORE the cross-band dedupe: surviving group
    # pairs are a tiny fraction of band candidates, so the distinct is
    # over near-dup group pairs only
    gpairs = (
        first.repartition("__a", "__i")
        .select(
            "__a",
            F.explode("__tail").alias("__bb2"),
        )
        .select(
            F.col("__a.g").alias("__ga"),
            F.col("__bb2.g").alias("__gb"),
            F.bit_count(F.col("__a.s").bitwiseXOR(F.col("__bb2.s"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    # identical fingerprints: hamming 0, always within the threshold
    self_pairs = sgrp.where(F.col("__n") > 1).select(
        F.col("__gid").alias("__ga"),
        F.col("__gid").alias("__gb"),
        F.lit(0).cast("long").alias("hamming"),
    )
    idmap = sgrp.select("__gid", "__ids", "__n")
    return explode_group_pairs(
        gpairs.unionByName(self_pairs), idmap, extra_cols=["hamming"]
    )


# DuckDB oracle for simhash_near_dups: same fingerprints, quadratic
# reference join (exact at oracle scale; the Spark side must produce
# the identical pair set through the banded join).
def simhash_near_dups_sql(max_hamming: int = 3) -> str:
    return f"""
WITH sh AS ({SIMHASH_SQL})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# DuckDB oracle for simhash64: same md5-derived 64-bit token hash, same
# ±1 bit accumulation, signed-wrap reassembly (bit 63 contributes the
# int64 minimum so SUM stays in BIGINT exactly like the uint64→int64
# view on the Spark side).
SIMHASH_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
th AS (
  SELECT doc_id, ('0x' || substring(md5(tok), 1, 16))::UBIGINT AS h FROM toks),
bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th, range(0, 64) t(b)
  GROUP BY doc_id, b)
SELECT doc_id,
       SUM(CASE WHEN acc > 0
                THEN CASE WHEN b = 63 THEN -9223372036854775808
                          ELSE (1::BIGINT << b::INTEGER) END
                ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""
