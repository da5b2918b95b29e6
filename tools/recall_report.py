"""ANN recall@k measurement: every approximate top-k operator vs the
exact ``cosine_topk`` baseline (and, for the L2-metric PQ family, also vs
the exact L2 top-k, so quantization error isn't conflated with the
cosine/L2 metric mismatch on unnormalized vectors).

The operators were already proven SELF-consistent (oracle hash gates,
brute-force sim equality on returned ids); this measures whether the
approximations are GOOD — the number a user tuning nprobe/K needs
(r4 VERDICT #4). Writes BENCH/RECALL.md when run as a script::

    python tools/recall_report.py [sf_dir] [k]

Context for reading the numbers: the synthetic embeddings are near-random
in 64-d, where neighbors are near-equidistant — the hardest regime for
ANN — so absolute recall is structurally low; the comparisons that carry
signal are trained-vs-formula codebooks and recall-vs-candidate-fraction.
"""

from __future__ import annotations

import statistics
import sys
import tempfile

sys.path.insert(0, ".")

QUERY_IDS = [0, 1, 2, 3, 7]


def _topk_ids(df) -> list[int]:
    return [r[0] for r in df.collect()]


def measure_recall(spark, sf_dir: str, k: int = 10, query_ids=None) -> dict:
    """{op: {"mean": float, "per_q": [...], "candidate_fraction": float}}
    for every ANN operator, recall@k vs exact cosine top-k (PQ ops also
    get a ``vs_l2`` entry vs exact L2 top-k)."""
    from pyspark.sql import functions as F

    from logprocessor_spark.operators.pq import (
        IVF_KC,
        IVF_NPROBE,
        ivfpq_topk,
        pq_adc_topk,
        train_pq_codebook,
    )
    from logprocessor_spark.operators.similarity import (
        cosine_topk,
        ivf_build_deterministic,
        ivf_topk_deterministic,
        lsh_ann_topk,
    )

    qids = query_ids or QUERY_IDS
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()
    qvecs = {
        q: [float(x) for x in emb.where(F.col("vec_id") == q).first().embedding]
        for q in qids
    }
    exact = {q: set(_topk_ids(cosine_topk(emb, qvecs[q], k=k))) for q in qids}

    def l2_exact(q):
        qv = qvecs[q]
        d = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(x) for x in qv]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return set(
            _topk_ids(
                emb.select("vec_id", d.alias("d")).orderBy("d", "vec_id").limit(k)
            )
        )

    exact_l2 = {q: l2_exact(q) for q in qids}

    def rec(ids, base):
        return sum(1 for x in ids if x in base) / len(base)

    out = {}

    def add(name, per_q, frac, per_q_l2=None):
        out[name] = {
            "mean": round(statistics.mean(per_q), 3),
            "per_q": per_q,
            "candidate_fraction": round(frac, 3),
        }
        if per_q_l2 is not None:
            out[name]["mean_vs_l2"] = round(statistics.mean(per_q_l2), 3)

    # LSH: candidate fraction = multiprobe buckets / 2^planes scan share —
    # measured directly from the operator's own candidate count is not
    # exposed; report the probe share of buckets instead (9/256 at the
    # default 8 planes + hamming-1 multiprobe).
    add(
        "ann_lsh_topk",
        [rec(_topk_ids(lsh_ann_topk(emb, qvecs[q], k=k)), exact[q]) for q in qids],
        9 / 256,
    )

    ivf_k, nprobe = 16, 4
    path = tempfile.mkdtemp(prefix="lp_recall_") + "/ivfd"
    cents = ivf_build_deterministic(emb.select("vec_id", "embedding"), path, k=ivf_k)
    add(
        "ann_ivf_topk",
        [
            rec(
                _topk_ids(
                    ivf_topk_deterministic(
                        spark, path, cents, qvecs[q], k=k, nprobe=nprobe
                    )
                ),
                exact[q],
            )
            for q in qids
        ],
        nprobe / ivf_k,
    )

    pq_f = {q: _topk_ids(pq_adc_topk(emb, q, k_out=k)) for q in qids}
    add(
        "pq_ann_topk (formula codebook)",
        [rec(pq_f[q], exact[q]) for q in qids],
        1.0,  # PQ scans all codes; compression, not pruning
        [rec(pq_f[q], exact_l2[q]) for q in qids],
    )

    cb = train_pq_codebook(emb, iters=4)
    pq_t = {q: _topk_ids(pq_adc_topk(emb, q, k_out=k, codebook=cb)) for q in qids}
    add(
        "pq_ann_topk (trained codebook)",
        [rec(pq_t[q], exact[q]) for q in qids],
        1.0,
        [rec(pq_t[q], exact_l2[q]) for q in qids],
    )

    add(
        "ivfpq_topk",
        [rec(_topk_ids(ivfpq_topk(emb, q, k_out=k)), exact[q]) for q in qids],
        IVF_NPROBE / IVF_KC,
    )

    out["_meta"] = {"n_vectors": n, "k": k, "query_ids": list(qids)}
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from logprocessor_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    res = measure_recall(spark, sf_dir, k=k)
    meta = res.pop("_meta")
    lines = [
        "# ANN recall@{k} vs exact cosine top-{k}".format(k=meta["k"]),
        "",
        f"Corpus: `{sf_dir}` ({meta['n_vectors']} vectors, 64-d);"
        f" queries: vec_ids {meta['query_ids']}.",
        "",
        "The synthetic embeddings are near-random in 64-d (neighbors",
        "near-equidistant — the hardest ANN regime), so absolute recall is",
        "structurally low; the signal is in the relative numbers:",
        "trained-vs-formula codebooks and recall vs candidate fraction.",
        "",
        "| operator | recall@10 (mean) | vs exact-L2 | candidate fraction |",
        "|---|---|---|---|",
    ]
    for name, v in res.items():
        l2 = v.get("mean_vs_l2", "—")
        lines.append(
            f"| {name} | {v['mean']} | {l2} | {v['candidate_fraction']} |"
        )
    lines += [
        "",
        "Per-query recall: "
        + "; ".join(f"{name}: {v['per_q']}" for name, v in res.items()),
        "",
        "Floors asserted in `tests/test_ann_recall.py` (same measurement",
        "function); the trained codebook must beat the formula codebook.",
    ]
    with open("BENCH/RECALL.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
