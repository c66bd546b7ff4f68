"""Chunked emission of document pairs from group-level pair decisions.

Several near-duplicate operators (MinHash LSH, SimHash bit-band LSH,
token-set Jaccard) make their pair/no-pair decision from a per-document
*key* (the full MinHash signature, the 64-bit SimHash, the distinct
token set): two documents pair up iff a predicate over their keys
holds.  In duplicate-heavy corpora many documents share a key exactly,
so the decision can be made once per key *group* and the doc-level
pairs emitted by expanding group-id cross products — candidate volume
drops from O(sum bucket_docs^2) to O(sum bucket_groups^2) while the
emitted pair set stays byte-identical (guide §2.3: decide on a
lightweight proxy, move the heavy expansion exactly once).

`explode_group_pairs` is the shared emission kernel: it takes the
group-level pair table and the (group -> sorted member ids) map and
emits each unordered doc pair exactly once, chunking both sides so one
giant group (a boilerplate cluster with 10^4+ members and 10^8+
within-pairs) is split across `ceil(n/chunk)^2` balanced tasks instead
of landing in a single straggler (guide §2.5).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

# Burst-size bound: whole-stage codegen cannot suspend inside a
# Generate loop, so ALL rows emitted for one input row are buffered
# (and, with needCopyResult, individually copied) before the sink
# drains them — a chunk pair's chunk^2-row burst is transient-live
# garbage.  64x64 = 4096-row (~300 KB) bursts stay nursery-sized;
# 1024x1024 bursts made GC 83% of the emission stage wall time at 1e9
# output rows (sweep: chunk 1024 -> 46s, 256 -> 14s, 64 -> 6.3s,
# 16 -> 6.3s at sf1.0/local[32]).  Chunk bookkeeping rows stay ~3
# orders of magnitude below the emitted pair count.
DEFAULT_CHUNK = 64


def explode_group_pairs(
    gpairs: DataFrame,
    idmap: DataFrame,
    extra_cols: Sequence[str] = (),
    chunk: int = DEFAULT_CHUNK,
    out_a: str = "id_a",
    out_b: str = "id_b",
) -> DataFrame:
    """Expand group-level pairs into doc-level pairs, exactly once each.

    gpairs: (__ga, __gb [, extra...]) — distinct group-id pairs with
      __ga < __gb for cross-group pairs, or __ga == __gb meaning "all
      within-group pairs" (groups listed at most once).
    idmap:  (__gid, __ids, __n) — group id, SORTED member-id array, size.

    Emits (out_a, out_b, extra...) with out_a < out_b; the member-id
    ordering is restored with least/greatest because ids from two
    different groups interleave.  Within-group expansion relies on the
    sorted arrays: chunk ca < cb gives a < b structurally, ca == cb is
    filtered to the strict upper triangle.
    """
    extra = [F.col(c) for c in extra_cols]
    na = idmap.select(F.col("__gid").alias("__ga"), F.col("__n").alias("__na"))
    nb = idmap.select(F.col("__gid").alias("__gb"), F.col("__n").alias("__nb"))
    lastc = lambda n: F.floor((F.col(n) - 1) / chunk).cast("int")  # noqa: E731
    # pre-chunked broadcast map: (gid, chunk_no) -> <=chunk member ids.
    # A BroadcastHashJoin copies the matched build row into every probe
    # output row, so broadcasting FULL arrays would memcpy a giant
    # group's whole id list once per chunk row (measured 4x the total
    # stage time at sf1.0); pre-slicing bounds the copy at `chunk` ids.
    chunkmap = idmap.select(
        "__gid", "__ids", F.explode(F.sequence(F.lit(0), lastc("__n"))).alias("__c")
    ).select(
        "__gid", "__c", F.slice("__ids", F.col("__c") * chunk + 1, chunk).alias("__cids")
    )
    ca_map = chunkmap.select(
        F.col("__gid").alias("__ga"), F.col("__c").alias("__ca"), F.col("__cids").alias("__cids_a")
    )
    cb_map = chunkmap.select(
        F.col("__gid").alias("__gb"), F.col("__c").alias("__cb"), F.col("__cids").alias("__cids_b")
    )
    chunks = (
        gpairs.join(F.broadcast(na), "__ga")
        .join(F.broadcast(nb), "__gb")
        .select("__ga", "__gb", *extra, "__na", "__nb",
                F.explode(F.sequence(F.lit(0), lastc("__na"))).alias("__ca"))
        .select("__ga", "__gb", *extra, "__ca",
                F.explode(F.sequence(F.lit(0), lastc("__nb"))).alias("__cb"))
        # within-group: only the (ca <= cb) triangle of chunk pairs
        .where((F.col("__ga") != F.col("__gb")) | (F.col("__cb") >= F.col("__ca")))
    )
    # attach the chunked id arrays, THEN spread.  Order matters for the
    # final stage's codegen: a hash join inside a whole-stage-codegen
    # pipeline sets needCopyResult, which would malloc+copy every one
    # of the emitted rows into the buffered-row list (measured ~10x the
    # per-row floor at 1e9 rows).  With the exchange after the joins,
    # the emission stage is shuffle-read -> explode -> explode ->
    # filter -> project: join-free, so rows stream without copies.
    # The exchange itself carries one <=chunk-id slice per side per
    # chunk row — bounded, and ~1000x smaller than the emitted output.
    attached = chunks.join(F.broadcast(ca_map), ["__ga", "__ca"]).join(
        F.broadcast(cb_map), ["__gb", "__cb"]
    )
    spread = attached.repartition("__ga", "__ca", "__gb", "__cb")
    return (
        spread.select(
            "__ga", "__gb", *extra,
            F.explode("__cids_a").alias("__a"),
            F.col("__cids_b").alias("__sb"),
        )
        .select("__ga", "__gb", *extra, "__a", F.explode("__sb").alias("__b"))
        .where((F.col("__ga") != F.col("__gb")) | (F.col("__a") < F.col("__b")))
        .select(
            F.least("__a", "__b").alias(out_a),
            F.greatest("__a", "__b").alias(out_b),
            *extra,
        )
    )
