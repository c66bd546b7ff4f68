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


def test_lsh_recall_vs_brute_force(spark):
    from geospark.ml.ann import brute_force_topk, lsh_topk

    rng = np.random.RandomState(5)
    n, dim = 300, 16
    base = rng.normal(size=(n, dim)).astype(np.float32)
    emb = pd.DataFrame({"vec_id": np.arange(n), "embedding": [list(map(float, v)) for v in base]})
    e = spark.createDataFrame(emb)
    q = e.where("vec_id < 10").selectExpr("vec_id as qid", "embedding")
    c = e.selectExpr("vec_id as cid", "embedding")
    bf = brute_force_topk(q, c, k=5, qid="qid", cid="cid").toPandas()
    ls = lsh_topk(q, c, k=5, qid="qid", cid="cid", dim=dim).toPandas()
    bf_set = set(zip(bf["qid"], bf["cid"]))
    ls_set = set(zip(ls["qid"], ls["cid"]))
    recall = len(bf_set & ls_set) / len(bf_set)
    assert recall >= 0.4, recall  # buckets prune; self-match always survives
    # rank-1 self matches always found
    assert set(ls[ls["rank"] == 1]["cid"]) >= set(range(10))
