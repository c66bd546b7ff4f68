"""Multimodal plumbing + dedup/ANN behavior tests."""

import numpy as np
import pandas as pd
import pytest


def test_media_plumbing_fake_codec(spark):
    from geospark.multimodal.media import generate_media, image_features, resize_stub

    media = generate_media(spark, 50)
    assert media.count() == 50
    feats = image_features(media, codec="fake").toPandas()
    assert len(feats) == 50
    assert all(len(f) == 3 for f in feats["mean_rgb"])
    # determinism across partitionings
    feats2 = image_features(generate_media(spark, 50).repartition(7), codec="fake").toPandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = feats2.sort_values("media_id").reset_index(drop=True)
    assert (a["width"] == b["width"]).all()
    assert np.allclose(np.stack(a["mean_rgb"]), np.stack(b["mean_rgb"]))
    r = resize_stub(media.limit(5), 16, 16, codec="fake").toPandas()
    assert all(len(p) == 16 * 16 * 3 for p in r["pixels"])


def test_media_stub_codec_raises(spark):
    from geospark.multimodal.media import decode_image, fake_image_payload

    with pytest.raises(NotImplementedError):
        decode_image(fake_image_payload(1, 8, 8), codec="stub")


def test_minhash_detects_near_dups(spark):
    from geospark.text.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog near the old mill by the river bank today"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                base,
                base + " extra",  # near-dup of 0
                "completely different words entirely unrelated corpus zebra xylophone quartz",
            ],
        }
    )
    pairs = minhash_lsh_pairs(spark.createDataFrame(docs)).toPandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_simhash_similarity(spark):
    from geospark.text.dedup import simhash64

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
                "alpha beta gamma delta epsilon zeta eta theta iota lambda",
                "one two three four five six seven eight nine ten",
            ],
        }
    )
    sh = simhash64(spark.createDataFrame(docs)).toPandas().set_index("doc_id")["simhash"]

    def ham(a, b):
        return bin((int(a) & 0xFFFFFFFFFFFFFFFF) ^ (int(b) & 0xFFFFFFFFFFFFFFFF)).count("1")

    assert ham(sh[0], sh[1]) < ham(sh[0], sh[2])


def test_jaccard_scale_guards(spark):
    """max_df drops stopword-driven candidates; candidates= mode
    (MinHash verification) matches the exact pipeline on its pairs."""
    from geospark.text.dedup import jaccard_pairs, minhash_lsh_pairs

    rng = np.random.RandomState(11)
    rows = []
    # 30 near-dup pairs: 10 shared rare tokens + the stopword everywhere
    for i in range(30):
        rare = " ".join(f"tok{i}_{j}" for j in range(10))
        rows.append((2 * i, f"the {rare}"))
        rows.append((2 * i + 1, f"the {rare} extra{i}"))
    # 100 unrelated docs that share ONLY the stopword
    for i in range(100):
        rows.append((1000 + i, f"the uniq{i}_a uniq{i}_b uniq{i}_c"))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    exact = jaccard_pairs(docs, threshold=0.6).toPandas()
    capped = jaccard_pairs(docs, threshold=0.6, max_df=50).toPandas()
    # the 30 planted pairs survive in both modes; stopword-only pairs never qualify
    want = {(2 * i, 2 * i + 1) for i in range(30)}
    assert set(zip(exact["id_a"], exact["id_b"])) == want
    assert set(zip(capped["id_a"], capped["id_b"])) == want

    cands = minhash_lsh_pairs(docs)
    verified = jaccard_pairs(docs, threshold=0.6, candidates=cands).toPandas()
    ver_pairs = set(zip(verified["id_a"], verified["id_b"]))
    assert ver_pairs == want
    # exact jaccard values agree between the self-join and candidate paths
    ex = exact.set_index(["id_a", "id_b"])["jaccard"]
    vr = verified.set_index(["id_a", "id_b"])["jaccard"]
    assert (ex.sort_index() == vr.sort_index()).all()


def test_ivf_recall_and_selectivity(spark):
    """IVF coarse quantizer: ≥0.9 recall of brute-force top-5 on a
    planted-near-dup corpus while probing nprobe/n_centroids of the
    lists."""
    from geospark.ml.ann import brute_force_topk, ivf_topk

    rng = np.random.RandomState(9)
    n_base, n_q, dim = 10_000, 20, 64
    base = rng.normal(size=(n_base, dim))
    qvecs = base[:n_q]
    planted = np.concatenate(
        [qvecs + rng.normal(scale=0.15, size=(n_q, dim)) for _ in range(5)]
    )
    corpus = np.vstack([base, planted])
    e = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(len(corpus)),
             "embedding": [list(map(float, v)) for v in corpus]}
        )
    )
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {"qid": np.arange(n_q), "embedding": [list(map(float, v)) for v in qvecs]}
        )
    )
    c = e.selectExpr("vec_id as cid", "embedding")
    bf = brute_force_topk(qdf, c, k=6, qid="qid", cid="cid").toPandas()
    bf = bf[bf["qid"] != bf["cid"]].groupby("qid").head(5)
    iv = ivf_topk(qdf, c, k=6, n_centroids=64, nprobe=8, qid="qid", cid="cid", dim=dim).toPandas()
    iv = iv[iv["qid"] != iv["cid"]].groupby("qid").head(5)
    bf_set = set(zip(bf["qid"], bf["cid"]))
    iv_set = set(zip(iv["qid"], iv["cid"]))
    recall = len(bf_set & iv_set) / len(bf_set)
    assert recall >= 0.9, recall


def test_cosine_near_dups_lsh_candidates_mode(spark):
    """The LSH-candidates scale path of cosine_near_dups recovers the
    planted near-dup pairs the exact self-join finds."""
    from geospark.ml.ann import cosine_near_dups, lsh_topk

    rng = np.random.RandomState(3)
    n, dim = 2000, 64
    base = rng.normal(size=(n, dim))
    planted = base[:50] + rng.normal(scale=0.05, size=(50, dim))
    corpus = np.vstack([base, planted])
    e = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(len(corpus)),
                "embedding": [list(map(float, v)) for v in corpus],
            }
        )
    )
    exact = cosine_near_dups(e, threshold=0.97).toPandas()
    want = set(zip(exact["id_a"], exact["id_b"]))
    assert {(i, n + i) for i in range(50)} <= want

    q = e.selectExpr("vec_id as qid", "embedding")
    c = e.selectExpr("vec_id as cid", "embedding")
    cands = (
        lsh_topk(q, c, k=None, qid="qid", cid="cid", dim=dim)
        .where("qid < cid")
        .selectExpr("qid as id_a", "cid as id_b")
    )
    via_lsh = cosine_near_dups(e, threshold=0.97, candidates=cands).toPandas()
    got = set(zip(via_lsh["id_a"], via_lsh["id_b"]))
    # near-dup recall through the bucketed path
    assert len(got & want) / len(want) >= 0.9
    # every LSH-path pair is a true pair with the identical sim
    assert got <= want


def test_lsh_recall_and_selectivity(spark):
    """Near-dup ANN eval: corpus with 5 planted near-duplicates per
    query (cosine ≈ 0.99).  The 64-plane / 16-bit-band / multi-probe
    LSH must recover ≥0.9 of the brute-force top-5 while generating
    <5% of the cross-join as candidates (the 100 TB selectivity bar)."""
    from geospark.ml.ann import brute_force_topk, lsh_topk

    rng = np.random.RandomState(5)
    n_base, n_q, dim = 20_000, 20, 64
    base = rng.normal(size=(n_base, dim))
    qvecs = base[:n_q]
    planted = np.concatenate(
        [qvecs + rng.normal(scale=0.15, size=(n_q, dim)) for _ in range(5)]
    )
    corpus = np.vstack([base, planted])
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(len(corpus)),
            "embedding": [list(map(float, v)) for v in corpus],
        }
    )
    e = spark.createDataFrame(emb)
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "qid": np.arange(n_q),
                "embedding": [list(map(float, v)) for v in qvecs],
            }
        )
    )
    c = e.selectExpr("vec_id as cid", "embedding")
    # queries are corpus members (vec_id<n_q): drop self from both sides
    bf = brute_force_topk(qdf, c, k=6, qid="qid", cid="cid").toPandas()
    bf = bf[bf["qid"] != bf["cid"]].groupby("qid").head(5)
    ls = lsh_topk(qdf, c, k=6, qid="qid", cid="cid", dim=dim).toPandas()
    ls = ls[ls["qid"] != ls["cid"]].groupby("qid").head(5)
    bf_set = set(zip(bf["qid"], bf["cid"]))
    ls_set = set(zip(ls["qid"], ls["cid"]))
    recall = len(bf_set & ls_set) / len(bf_set)
    assert recall >= 0.9, recall
    # selectivity: candidate fraction of the full cross join
    n_cand = lsh_topk(qdf, c, k=None, qid="qid", cid="cid", dim=dim).count()
    frac = n_cand / (n_q * len(corpus))
    assert frac < 0.05, frac


def test_audio_features_fake_codec(spark):
    import numpy as np
    import pandas as pd
    import pytest

    from geospark.multimodal.media import (
        audio_features,
        decode_audio,
        fake_audio_payload,
    )

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0, 1, 2],
                "payload": [fake_audio_payload(i, 8000, 100 + i * 50) for i in range(3)],
            }
        )
    )
    out = audio_features(media, codec="fake").toPandas().sort_values("media_id")
    assert list(out["n_samples"]) == [100, 150, 200]
    assert (out["sample_rate"] == 8000).all()
    # cross-check one clip against a direct decode
    sr, s = decode_audio(fake_audio_payload(1, 8000, 150), codec="fake")
    s64 = s.astype(np.int64)
    assert abs(out[out.media_id == 1]["mean_abs"].iloc[0] - np.abs(s64).mean()) < 1e-9
    # stub path raises
    with pytest.raises(NotImplementedError):
        decode_audio(fake_audio_payload(0, 8000, 10), codec="stub")


def test_frame_sample_fake_codec(spark):
    import pandas as pd
    import pytest

    from geospark.multimodal.media import (
        decode_frame,
        fake_video_payload,
        frame_sample,
    )

    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [0], "payload": [fake_video_payload(0, 8, 4, 25)]}
        )
    )
    out = frame_sample(media, every_n=10, codec="fake").toPandas()
    assert sorted(out["frame_idx"]) == [0, 10, 20]  # every 10th of 25
    assert (out["width"] == 8).all() and (out["height"] == 4).all()
    f10 = decode_frame(fake_video_payload(0, 8, 4, 25), 10, codec="fake")
    assert abs(
        out[out.frame_idx == 10]["mean_luma"].iloc[0] - f10.astype("int64").mean()
    ) < 1e-9
    with pytest.raises(IndexError):
        decode_frame(fake_video_payload(0, 8, 4, 25), 25, codec="fake")
    with pytest.raises(ValueError):
        frame_sample(media, every_n=0, codec="fake")


def test_winnow_guarantee_and_density(spark):
    """Winnowing (SIGMOD'03): any shared substring of length >= w+k-1
    yields >= 1 shared fingerprint; expected density ~ 2/(w+1)."""
    import random

    from geospark.text.fingerprint import winnow_fingerprints

    rng = random.Random(7)
    alpha = "abcdefghij"
    shared = "".join(rng.choice(alpha) for _ in range(40))  # >= w+k-1 = 12
    docs = [
        (1, "".join(rng.choice(alpha) for _ in range(100)) + shared),
        (2, shared + "".join(rng.choice(alpha) for _ in range(100))),
        (3, "".join(rng.choice(alpha) for _ in range(140))),
    ]
    fp = winnow_fingerprints(
        spark.createDataFrame(docs, "doc_id long, text string"), k=5, w=8
    ).toPandas()
    s1 = set(fp[fp.doc_id == 1].fp)
    s2 = set(fp[fp.doc_id == 2].fp)
    assert s1 & s2, "docs sharing a 40-char substring must share a fingerprint"
    # density: n_grams=136 per doc, expected ~2/(w+1)=0.22 selected
    per_doc = fp.groupby("doc_id").size()
    assert (per_doc > 10).all() and (per_doc < 70).all()
    # positions are valid 1-based k-gram starts
    assert fp.fp_pos.min() >= 1 and fp.fp_pos.max() <= 136


def test_winnow_short_doc_and_determinism(spark):
    from geospark.text.fingerprint import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "abcdefghikj"), (2, "x" * 11), (3, "abcdefghijkl")],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=5, w=8).toPandas()
    # len 11 < k+w-1=12 -> no fingerprints; len 12 -> exactly one full window
    assert set(fp.doc_id) == {3}
    assert len(fp) == 1
    # repartitioning must not change the fingerprint set
    fp2 = winnow_fingerprints(docs.repartition(5), k=5, w=8).toPandas()
    assert sorted(map(tuple, fp.values.tolist())) == sorted(map(tuple, fp2.values.tolist()))


def test_fingerprint_overlap_pairs_max_bucket(spark):
    from geospark.text.fingerprint import fingerprint_overlap_pairs

    # 6 identical docs: every fingerprint bucket holds all 6 docs
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again") for i in range(6)],
        "doc_id long, text string",
    )
    full = fingerprint_overlap_pairs(docs, min_common=1).toPandas()
    assert len(full) == 15  # all C(6,2) pairs
    capped = fingerprint_overlap_pairs(docs, min_common=1, max_bucket=3).toPandas()
    assert len(capped) == 0  # every bucket dropped by the guard


def test_cosine_matmul_chunked_equals_unchunked(spark):
    """Column-chunked matmul (bounded per-batch memory, ADVICE r3)
    emits exactly the same pair set + sims as one dense B×N matrix."""
    from pyspark.sql import functions as F

    from geospark.ml.ann import _cosine_near_dups_matmul

    rng = np.random.RandomState(7)
    n, dim = 300, 16
    base = rng.normal(size=(n, dim))
    dups = base[:20] + rng.normal(scale=0.03, size=(20, dim))
    corpus = np.vstack([base, dups])
    e = spark.createDataFrame(
        pd.DataFrame(
            {
                "__id": np.arange(len(corpus)),
                "embedding": [list(map(float, v)) for v in corpus],
            }
        )
    ).select(
        "__id", F.col("embedding").cast("array<double>").alias("__e")
    )
    rows = e.collect()
    one = _cosine_near_dups_matmul(e, 0.95, rows).toPandas()
    # chunk_doubles=4096 → 4096/B columns per chunk → many chunks
    many = _cosine_near_dups_matmul(e, 0.95, rows, chunk_doubles=4096).toPandas()
    k = ["id_a", "id_b"]
    one_s = one.sort_values(k).reset_index(drop=True)
    many_s = many.sort_values(k).reset_index(drop=True)
    pd.testing.assert_frame_equal(one_s, many_s)
    assert len(one_s) >= 20


def test_simhash_two_level_banding_lossless(spark):
    """The two-level (band, sub-band) bucketing must reproduce the exact
    brute-force pair set: every pair within max_hamming, each exactly
    once — including identical-fingerprint (hamming 0) pairs."""
    import itertools
    import random

    from geospark.text.dedup import simhash64, simhash_near_dups

    rng = random.Random(7)
    words = [f"w{i}" for i in range(60)]
    texts = []
    # clusters of near-identical documents (1-2 word swaps -> small
    # hamming), some exact copies, plus unrelated background docs
    for c in range(6):
        base = rng.sample(words, 20)
        for j in range(5):
            t = list(base)
            for _ in range(rng.randint(0, 2)):
                t[rng.randrange(len(t))] = rng.choice(words)
            texts.append(" ".join(t))
        texts.append(" ".join(base))  # exact copy of the cluster base
    for _ in range(20):
        texts.append(" ".join(rng.sample(words, 12)))
    docs = pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    sdf = spark.createDataFrame(docs)

    for max_hamming in (2, 3):
        got = simhash_near_dups(sdf, max_hamming=max_hamming).toPandas()
        got_set = set(zip(got["id_a"], got["id_b"], got["hamming"]))
        assert len(got_set) == len(got), "pair emitted more than once"
        sh = simhash64(sdf).toPandas().set_index("doc_id")["simhash"]
        want = set()
        for a, b in itertools.combinations(sorted(sh.index), 2):
            h = bin((int(sh[a]) ^ int(sh[b])) & 0xFFFFFFFFFFFFFFFF).count("1")
            if h <= max_hamming:
                want.add((a, b, h))
        assert got_set == want
