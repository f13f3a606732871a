"""Degenerate-input robustness: empty frames, all-filtered corpora,
k > n top-k, single-doc dedup — operators must return empty/partial
results, never throw."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flight_delay_prediction_using_pyspark_spark.operators import temporal as TP
from flight_delay_prediction_using_pyspark_spark.similarity import ann
from flight_delay_prediction_using_pyspark_spark.text import analysis as TA
from flight_delay_prediction_using_pyspark_spark.text import dedup as TD

DOCS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _empty_docs(spark):
    return spark.createDataFrame([], DOCS_SCHEMA)


def test_dedup_pipeline_on_empty_corpus(spark):
    empty = _empty_docs(spark)
    assert TD.minhash_lsh_pairs(empty).count() == 0
    assert TD.simhash_pairs(empty).count() == 0
    assert TD.exact_dup_stats(empty).count() == 0
    assert TD.prepare_training_corpus(empty).count() == 0


def test_connected_components_empty_and_single_pair(spark):
    empty = spark.createDataFrame(
        [], "id_a long, id_b long"
    )
    assert TD.connected_components(empty).count() == 0
    one = spark.createDataFrame([(7, 9)], ["id_a", "id_b"])
    out = {r.node: r.cluster_id for r in TD.connected_components(one).collect()}
    assert out == {7: 7, 9: 7}


def test_text_profile_null_and_whitespace(spark):
    df = spark.createDataFrame([(0, " "), (1, "x")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in TA.text_profile(df).collect()}
    assert rows[0].quality == 0.0
    assert rows[1].n_tokens == 1


def test_cosine_topk_k_exceeds_corpus(spark):
    df = spark.createDataFrame([(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"])
    assert ann.cosine_topk(df, [1.0, 0.0], k=50).count() == 2


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame([(1, 10, "a")], ["k", "t", "tag"])
    right = spark.createDataFrame([], "k long, t long, v double")
    out = TP.asof_join(left, right, key="k", time_col="t", payload_cols=["v"]).collect()
    assert len(out) == 1 and out[0].v_asof is None


def test_quality_gate_filters_everything(spark):
    docs = spark.createDataFrame([(0, "tiny"), (1, "small")], ["doc_id", "text"])
    assert TD.prepare_training_corpus(docs, min_quality=0.4).count() == 0
