"""Stage-level wall-clock breakdown of c2 (MinHash-LSH near-dup pairs)
at a given SF dir — separates the corpus shingle+signature pass, the
bucket materialization, the banding self-join, and candidate verification
so perf work targets the real dominator instead of the total.

ATTRIBUTION CAVEAT (cost a re-derivation in round 7): each labeled stage
materializes its own lineage, so a stage's number includes every
UPSTREAM stage that isn't checkpointed — "bucket triple localCheckpoint"
pays the shingle+signature kernel again, and looked like an 11 s stage
when the checkpoint write itself is ~free (a with/without A/B on the
full operator measured the checkpoint at breakeven warm). Read the
stages as cumulative prefixes unless the input is already materialized;
for per-stage deltas, subtract the previous line or A/B the full
operator with the one change.

Usage: python tools/profile_c2.py [sf_dir] (default .scale/sf10)
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from aws_snowflake_kinesis_airflow_pipeline_spark.session import get_spark  # noqa: E402
from aws_snowflake_kinesis_airflow_pipeline_spark.operators import dedup  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:45s} {dt:7.2f} s")
    return out


def main():
    spark = get_spark()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # warm: parquet footers + py worker daemons
    docs.count()

    for rep in range(2):
        print(f"--- rep {rep} ---")
        per_doc = dedup.doc_shingles(docs, "doc_id", "text")
        t("shingle pass only (count)", lambda: per_doc.select(
            F.sum(F.size("hs"))).collect())
        sig = dedup.minhash_signatures(
            docs, "doc_id", "text", 64, 3, per_doc=per_doc)
        t("shingle+minhash kernel (count)", lambda: sig.select(
            F.count("mins")).collect())
        buckets = t("bucket triple localCheckpoint", lambda: dedup.band_buckets(
            sig, "doc_id", 64, 16).localCheckpoint())
        postings = (
            buckets.groupBy("band_id", "band_hash")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") >= 2))
        cand = t("grouped postings + pair emit + ckpt", lambda: (
            dedup._posting_pairs(postings).distinct().localCheckpoint()))
        n_cand = cand.count()
        pairs = dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.8, candidates=cand)
        n = t("candidate verify (count)", lambda: pairs.count())
        print(f"candidates={n_cand} verified_pairs={n}")
        t("full operator end-to-end", lambda: dedup.minhash_lsh_pairs(
            docs, "doc_id", "text").count())


if __name__ == "__main__":
    main()
