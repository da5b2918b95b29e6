"""ANN quality gates: the approximate top-k operators were proven
self-consistent (oracle hash gates + brute-force sim equality on returned
ids); these tests prove the approximations are GOOD — recall@10 floors vs
exact cosine top-k, and the trained PQ codebook beating the formula one
(r4 VERDICT #4/#6). Floors sit ~30-40% below the values measured at
sf0.01 (see BENCH/RECALL.md for the sf0.1 table) so host noise never
flakes them, while a broken probe path (recall ~ random ≈ k/N ≈ 0.02)
always fails."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def recall(spark):
    from tools.recall_report import measure_recall

    return measure_recall(spark, SF, k=10, query_ids=[1, 2, 7])


def test_recall_floors(recall):
    floors = {
        "ann_lsh_topk": 0.10,
        "ann_ivf_topk": 0.35,
        "pq_ann_topk (formula codebook)": 0.10,
        "pq_ann_topk (trained codebook)": 0.20,
        "ivfpq_topk": 0.08,
    }
    for op, floor in floors.items():
        assert recall[op]["mean"] >= floor, (op, recall[op])


def test_trained_codebook_beats_formula(recall):
    """The documented 'swap formula_codebook for trained centroids' path
    must actually improve quantization: mean recall@10 strictly higher
    (measured: 0.36 trained vs 0.24 formula at sf0.01)."""
    t = recall["pq_ann_topk (trained codebook)"]["mean"]
    f = recall["pq_ann_topk (formula codebook)"]["mean"]
    assert t > f, (t, f)
    # and on the L2 metric PQ actually optimizes
    assert recall["pq_ann_topk (trained codebook)"]["mean_vs_l2"] >= recall[
        "pq_ann_topk (formula codebook)"
    ]["mean_vs_l2"], recall


def test_trained_codebook_same_plan_shape(spark):
    """Swapping the formula codebook for a trained one must not change the
    physical plan shape — same broadcast joins, same exchanges; only the
    doubles in the broadcast table differ."""
    from logprocessor_spark.operators.pq import (
        formula_codebook,
        pq_adc_topk,
        train_pq_codebook,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cb_t = train_pq_codebook(emb, iters=1)
    cb_f = formula_codebook(spark)

    def shape(df):
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        return (
            p.count("BroadcastHashJoin"),
            p.count("Exchange hashpartitioning"),
            p.count("BroadcastExchange"),
        )

    assert shape(pq_adc_topk(emb, 7, codebook=cb_t)) == shape(
        pq_adc_topk(emb, 7, codebook=cb_f)
    )
