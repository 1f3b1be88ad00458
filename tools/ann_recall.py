"""ANN retrieval-quality accountability (VERDICT r3 item 8): recall@k of
the three ANN flavors (`ann_lsh`, `ann_multiprobe`, `ann_ivf`) against
exact brute-force cosine top-k at sf0.1, plus the IVF nprobe curve for
both the deterministic seed index and the kmeans-trained index.

The correctness oracles pin each flavor's DETERMINISM (same candidates,
same ranks as the SQL twin); this tool pins its RETRIEVAL QUALITY — the
thing a user actually trades when they pick the approximate path. Also
reports the mean candidate fraction per flavor (the cost axis recall is
bought with), measured as candidate rows / base size.

Usage: python tools/ann_recall.py [sf_dir] [n_queries] [k]
Writes BENCH/ann_recall_sf01.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(sf_dir: str = "/root/testdata/sf0.1", n_queries: int = 100, k: int = 5) -> dict:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from copernicusdata_jl_spark.operators import dedup as D

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    base = emb.filter(F.col("vec_id") >= n_queries)
    n_base = base.count()

    def topk_sets(df) -> dict[int, set[int]]:
        out: dict[int, set[int]] = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    # exact ground truth: brute-force cosine with the SAME rounding and
    # tie-break (6dp, then smallest id) every flavor's re-rank uses
    bn = base.withColumn("_vn", D.norm_expr(F.col("embedding")))
    qn = q.withColumn("_qn", D.norm_expr(F.col("qe")))
    sim = F.round(
        D.dot_cols_expr(F.col("embedding"), F.col("qe")) / (F.col("_vn") * F.col("_qn")), 6
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    exact = topk_sets(
        bn.crossJoin(F.broadcast(qn))
        .withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id")
    )

    def recall(approx: dict[int, set[int]]) -> float:
        # a query with no candidates (empty probe bucket) contributes 0
        hits = sum(len(exact[qid] & approx.get(qid, set())) for qid in exact)
        return round(hits / (len(exact) * k), 4)

    def cand_fraction(cand_df) -> float:
        return round(cand_df.count() / (len(exact) * n_base), 4)

    report: dict = {
        "sf_dir": sf_dir, "n_queries": len(exact), "n_base": n_base, "k": k,
        "flavors": {}, "ivf_nprobe_curve": {"seed": {}, "kmeans": {}},
    }

    # -- sign-LSH single- and multi-probe (the registry's configs) ----------
    for name, mp in (("ann_lsh", False), ("ann_multiprobe", True)):
        res = D.ann_lsh_topk(base, q, k, "vec_id", "embedding", "query_id", "qe",
                             dim=64, num_proj=4, multiprobe=mp)
        w = D.projection_weights(64, 4)
        b = base.select(D.sign_bucket_expr(F.col("embedding"), w).alias("bucket"))
        qb = q.select(D.sign_bucket_expr(F.col("qe"), w).alias("bucket"), "query_id")
        if mp:
            probes = F.array(F.col("bucket"), *[
                F.col("bucket").bitwiseXOR(F.lit(1 << j)).cast("long") for j in range(4)
            ])
            qb = qb.select("query_id", F.explode(probes).alias("bucket"))
        cand = b.join(F.broadcast(qb), "bucket")
        report["flavors"][name] = {
            "recall_at_k": recall(topk_sets(res)),
            "cand_fraction": cand_fraction(cand),
        }

    # -- IVF nprobe curve: seed index and kmeans-trained index --------------
    seed = D.ivf_centroid_rows(base, 8)
    trained = D.ivf_train_kmeans(base, 8, iters=3)
    for label, cents in (("seed", seed), ("kmeans", trained)):
        for nprobe in (1, 2, 4, 8):
            res = D.ivf_topk(base, q, k=k, nprobe=nprobe, n_centroids=8,
                             centroids=cents)
            report["ivf_nprobe_curve"][label][str(nprobe)] = recall(topk_sets(res))
            if label == "seed" and nprobe == 2:  # the registry's ann_ivf config
                report["flavors"]["ann_ivf"] = {
                    "recall_at_k": report["ivf_nprobe_curve"]["seed"]["2"],
                    "cand_fraction": round(nprobe / 8, 4),
                }
    spark.stop()
    return report


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    rep = main(sf_dir, nq, k)
    out = os.path.join(REPO, "BENCH", "ann_recall_sf01.json")
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep))
