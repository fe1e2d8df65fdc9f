"""Recall@K of the IVF-PQ serving path vs exact brute-force cosine.

Measures, per query, |ivfpq top-K ∩ exact top-K| / K at a given sf dir —
the number the residual-encoding change (r14) is supposed to move.
Ground truth is the exact cosine top-K over the whole corpus (excluding
self), computed with the same portable fold the engine uses.

Usage: python tools/ivfpq_recall.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or ["knn_ivfpq"]

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nshm2022db_spark.extensions.similarity import KNN_K, N_QUERIES
    from nshm2022db_spark.functions.portable import spark_dot
    from nshm2022db_spark.registry import QUERIES
    from nshm2022db_spark.session import get_spark
    from nshm2022db_spark.sources import read_table

    spark = get_spark("ivfpq_recall")

    emb = read_table(spark, sf, "embeddings").withColumn(
        "enorm", F.expr(f"sqrt({spark_dot('embedding', 'embedding')})")
    )
    q = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("enorm").alias("qnorm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    exact = (
        emb.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                F.expr(spark_dot("qe", "embedding"))
                / (F.col("qnorm") * F.col("enorm"))
            ).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .collect()
    )
    truth: dict[int, set[int]] = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    out = {}
    for name in names:
        rows = QUERIES[name](spark, sf).collect()
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        per_q = {
            int(qid): len(got.get(qid, set()) & t) / len(t)
            for qid, t in sorted(truth.items())
        }
        out[name] = {
            "recall_at_k": round(sum(per_q.values()) / len(per_q), 4),
            "per_query": per_q,
            "k": KNN_K,
        }
    print(json.dumps({"sf": sf, **out}))


if __name__ == "__main__":
    main()
