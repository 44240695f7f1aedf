"""Empty-input robustness: a 100 TB pipeline routinely sees empty
partitions, empty splits, and zero-match filters — every operator must
produce an empty frame of the right schema, not raise."""

from pyspark.sql import functions as F  # noqa: F401

from fonduer_spark.functions import dedup as dd
from fonduer_spark.functions import similarity as sim
from fonduer_spark.functions.sampling import (
    deterministic_sample,
    pack_token_stream,
    stratified_sample,
)
from fonduer_spark.pipeline import kg_stages


def test_kg_pipeline_empty_corpus(spark):
    stages = kg_stages(spark, "/root/testdata/sf0.001", max_docs=0)
    assert stages["triples"].count() == 0
    assert stages["mentions"].count() == 0
    assert {"subj", "pred", "obj"} <= set(stages["triples"].columns)


def test_functions_empty_inputs(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert deterministic_sample(docs, 0.5).count() == 0
    assert stratified_sample(docs, "text", {"x": 1.0}).count() == 0
    packed = pack_token_stream(docs, capacity=10)
    assert packed.count() == 0
    assert set(packed.columns) == {"doc_id", "n_tokens", "start_offset",
                                   "bin_id", "bin_offset"}
    assert dd.lsh_verified_pairs(docs).count() == 0
    assert dd.near_dup_keep(docs).count() == 0
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert sim.ann_topk(emb, [0], dim=64).count() == 0
    assert sim.lsh_bucketed_ann(emb, [0], dim=64, n_tables=2).count() == 0
