"""spark-submit entry point for the TRAINING-DATA CURATION pipeline — the
consumer-side twin of scripts/run_pipeline.py (which maintains the table this
job typically reads). Composes the library's verified stages end to end:

    quality gate (Gopher rules)
      -> exact dedup (content-hash, keep smallest id)
      -> near-dup dedup (SimHash blocking -> connected components ->
         keep-one survivor per cluster; optional)
      -> benchmark decontamination (4-token-shingle overlap vs an eval set;
         optional)
      -> deterministic md5-bucket train/valid/test split (90/5/5)
      -> per-split parquet + ONE JSON report line on stdout

Each stage is exactly the operator its catalog entry value-checks against
DuckDB (docs_gopher_filter, docs_exact_dedup, docs_dup_clusters /
docs_dedup_survivors, docs_decontaminate, docs_train_split,
docs_training_set); this script only sequences them. Run:

    spark-submit --master local[8] --py-files olr_spark.zip \
      scripts/run_curation.py --input docs.parquet --out /path/curated \
      [--eval eval_docs.parquet] [--near-dup simhash|none] [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import sys


def curate(
    spark,
    input_path: str,
    out: str,
    eval_path: str | None = None,
    near_dup: str = "simhash",
) -> dict:
    from pyspark.sql import functions as F

    from openlogreplicator_spark.functions import similarity as S
    from openlogreplicator_spark.functions import text as TXT

    d = spark.read.parquet(input_path)
    report: dict = {"input": d.count()}

    # 1. quality gate — the 4 satisfiable Gopher channels (see
    # docs_training_set for why the stopword minimum is excluded here)
    r = TXT.gopher_rules(F.col("text"))
    gate = (
        r["ok_n_words"] & r["ok_mean_len"] & r["ok_symbols"] & r["ok_alpha"]
    )
    passed = d.filter(gate)
    report["after_quality"] = passed.count()

    # 2. exact dedup: keep the smallest doc_id per content hash
    keep = (
        passed.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    cur = passed.join(keep, "doc_id", "left_semi")
    report["after_exact_dedup"] = cur.count()

    # 3. near-dup dedup: blocked SimHash pairs -> connected components ->
    # keep-one survivor per cluster (longest text wins, ties to smallest id)
    if near_dup == "simhash":
        pairs = S.simhash_near_dup_pairs(cur, "doc_id", "text", max_hamming=3)
        comps = S.connected_components(pairs, "a", "b")
        surv = S.dup_cluster_survivors(
            cur, comps, "doc_id", quality_col=F.length("text")
        ).select(F.col("survivor_doc_id").alias("doc_id"))
        clustered = comps.select(F.col("id").alias("doc_id"))
        cur = cur.join(clustered, "doc_id", "left_anti").unionByName(
            cur.join(surv, "doc_id", "left_semi")
        )
        report["after_near_dedup"] = cur.count()

    # 4. decontamination vs the eval set (4-token shingle overlap)
    if eval_path:
        bench = spark.read.parquet(eval_path)
        contam = S.contamination_overlap(
            cur, bench, "doc_id", "text", n=4
        ).select("doc_id")
        cur = cur.join(contam, "doc_id", "left_anti")
        report["after_decontamination"] = cur.count()

    # 5. deterministic 90/5/5 split (same md5-bucket rule as
    # docs_train_split), written per split — the split column is map-side
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % 100
    cur = cur.withColumn(
        "split",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "valid")
        .otherwise("test"),
    )
    cur.write.mode("overwrite").partitionBy("split").parquet(out)
    out_df = spark.read.parquet(out)
    report["splits"] = {
        row["split"]: row["n"]
        for row in out_df.groupBy("split").agg(
            F.count("*").alias("n")
        ).collect()
    }
    report["out"] = out
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--eval")
    ap.add_argument("--near-dup", choices=["simhash", "none"],
                    default="simhash")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from openlogreplicator_spark.session import build_session

    spark = build_session(app_name="olr-curation", cores=args.cores,
                          shuffle_partitions=max(8, args.cores))
    try:
        report = curate(
            spark, args.input, args.out,
            eval_path=args.eval, near_dup=args.near_dup,
        )
        sys.stdout.write(json.dumps(report) + "\n")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
