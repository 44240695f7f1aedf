"""Training-data operators: dedup / similarity / textstats / multimodal."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fonduer_spark.functions import dedup as dd
from fonduer_spark.functions import multimodal as mm
from fonduer_spark.functions import similarity as sim
from fonduer_spark.functions import textstats as ts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),   # near dup
        (3, "completely different words entirely here now"),
        (4, "el gato y el perro y el raton"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    groups = dd.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 2 and groups[0].canonical_id == 0


def test_minhash_identical_sigs_for_dups(spark, docs):
    sig = dd.minhash_signature(F.col("text"), k=8)
    out = {r.doc_id: r.s for r in docs.select("doc_id", sig.alias("s")).collect()}
    assert out[0] == out[1]
    assert out[0] != out[3]
    # near-dup shares most signature slots
    shared = sum(a == b for a, b in zip(out[0], out[2]))
    assert shared >= 4


def test_minhash_lsh_pairs_finds_dups(spark, docs):
    pairs = {(r.a, r.b) for r in dd.minhash_lsh_pairs(
        docs, k=16, bands=8).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_ngram_jaccard(spark, docs):
    pairs = {(r.a, r.b): r.jaccard for r in dd.ngram_jaccard_pairs(
        docs, shingle_n=3, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    near = dd.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.3).collect()
    assert any((r.a, r.b) == (0, 2) for r in near)


def test_simhash_dups_equal_and_near_dups_close(spark, docs):
    out = {r.doc_id: r.simhash for r in dd.simhash(docs).collect()}
    assert out[0] == out[1]
    ham = bin((out[0] ^ out[2]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((out[0] ^ out[3]) & ((1 << 64) - 1)).count("1")
    assert ham < ham_far


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(0)
    vecs = rng.randn(40, 16).astype("float32")
    vecs[1] = vecs[0] + 0.01 * rng.randn(16).astype("float32")  # near 0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark, emb):
    out = sim.cosine_topk(emb, [0], k=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].neighbor_id == 1  # the planted near-duplicate
    assert out[0].score > 0.99


def test_cosine_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    q = mat[5]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    cos[5] = -np.inf
    top = np.argsort(-cos)[:3]
    got = [r.neighbor_id for r in sim.cosine_topk(emb, [5], k=3).collect()]
    assert got == list(top)


def test_lsh_ann_bucket_determinism_and_recall(spark, emb):
    out1 = sim.lsh_bucketed_ann(emb, [0], dim=16, k=3, n_planes=4).collect()
    out2 = sim.lsh_bucketed_ann(emb, [0], dim=16, k=3, n_planes=4).collect()
    assert [(r.neighbor_id, r.score) for r in out1] == \
           [(r.neighbor_id, r.score) for r in out2]
    # the planted near-dup lands in the same sign bucket
    assert out1 and out1[0].neighbor_id == 1


def test_multimodal_plumbing(spark, docs):
    media = mm.media_from_docs(docs)
    feats = mm.extract_features(media, decoder="fake")
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 6
    assert all(len(r.features) == mm.FEATURE_DIM for r in rows.values())
    # identical payloads -> identical fake features; deterministic
    assert rows[0].features == rows[1].features
    assert rows[0].n_bytes == len(
        "the quick brown fox jumps over the lazy dog")


def test_multimodal_real_decoder_stub(spark, docs):
    media = mm.media_from_docs(docs)
    with pytest.raises(Exception):  # NotImplementedError inside the executor
        mm.extract_features(media, decoder="real").collect()


def test_textstats_values(spark):
    d = spark.createDataFrame(
        [(0, "The cat and the dog."), (1, ""), (2, "  x  ")],
        "doc_id long, text string")
    q = {r.doc_id: r for r in ts.quality_stats(d).collect()}
    assert q[0].n_tokens == 5
    assert q[1].n_tokens == 0
    assert q[2].n_tokens == 1
    assert q[0].stopword_ratio == pytest.approx(0.6)  # the, and, the / 5
    lang = {r.doc_id: r.lang for r in d.select(
        "doc_id", ts.lang_id(F.col("text")).alias("lang")).collect()}
    assert lang[0] == "en" and lang[1] == "und"
    fp = d.select(ts.fingerprint(F.col("text")).alias("f")).collect()
    assert all(len(r.f) == 32 for r in fp if r.f)
