"""Adversarial-skew benchmark for the salted MinHash band join.

Generates a template-heavy corpus — the boilerplate-corpus failure mode
the salted fallback exists for: one 60-token template cloned N times
with a couple of unique token substitutions each, so thousands of
DISTINCT signature clusters land in the same band bucket and the plain
band equi-join concentrates B^2 pair evaluations in a single task (one
join key — AQE's skew split cannot divide it, because every pair needs
both rows).

Runs ``dedup_minhash_lsh`` twice on that corpus — with
``spark.gmall_flink.minhash.hotBucketThreshold=2048`` set and unset —
and reports:

- wall time per run (min of ``reps``),
- result parity (row count + pair-set hash must be identical),
- the hottest band-bucket size in signature clusters (the unsalted
  build-side input of the worst task), and
- the max salted build-group size (the salted build-side input bound:
  ~hottest/N_BAND_SALT).

Usage: python scripts/salted_skew_bench.py [n_template_docs]
Writes one JSON line; results land in SCALE.md.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gmall_flink_parent_spark import plans
from gmall_flink_parent_spark.functions.dedup import (
    HOT_BUCKET_CONF,
    MINHASH_HOT_BUCKET,
    N_BAND_SALT,
    NUM_HASHES,
    _minhash_sigs,
    band_hash_cols,
)
from gmall_flink_parent_spark.session import get_spark
from gmall_flink_parent_spark.sources.tables import load_table


def make_corpus(spark, out_dir: str, n_template: int, n_random: int = 500) -> None:
    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(5000)]
    template = [vocab[rng.randrange(len(vocab))] for _ in range(60)]
    rows = []
    for i in range(n_template):
        toks = list(template)
        # two unique substitutions: distinct signature, ~0.9 shingle
        # jaccard — band collision probability ~ j^4 stays high
        for _ in range(2):
            toks[rng.randrange(60)] = f"uniq{i}_{rng.randrange(99)}"
        rows.append((i, " ".join(toks)))
    for i in range(n_random):
        rows.append(
            (
                n_template + i,
                " ".join(vocab[rng.randrange(len(vocab))] for _ in range(60)),
            )
        )
    spark.createDataFrame(rows, "doc_id long, text string").repartition(8).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")


def bucket_stats(spark, sf_dir: str) -> tuple[int, int]:
    """(hottest band-bucket size, max salted build-group size), both in
    signature clusters — the build-side task-input bounds of the plain
    and salted joins."""
    docs = load_table(spark, sf_dir, "documents")
    sig_cols = [f"s{i}" for i in range(NUM_HASHES)]
    clusters = (
        _minhash_sigs(docs)
        .groupBy(*sig_cols)
        .agg(F.min("doc_id").alias("rep"))
    )
    # the SAME band bucketing the join uses (shared helper — no drift)
    n_bands = len(band_hash_cols())
    banded = clusters.select("rep", *band_hash_cols()).select(
        "rep",
        F.explode(F.array(*[F.col(f"bh{j}") for j in range(n_bands)])).alias("bh"),
    )
    by_bucket = banded.groupBy("bh").count()
    hottest = by_bucket.agg(F.max("count")).collect()[0][0]
    max_group = (
        banded.withColumn("g", F.pmod(F.xxhash64("rep"), F.lit(N_BAND_SALT)))
        .groupBy("bh", "g")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    return int(hottest), int(max_group)


def run_once(spark, sf_dir: str) -> tuple[float, int, int]:
    t0 = time.time()
    df = plans.query_map()["dedup_minhash_lsh"](spark, sf_dir)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        # pmod keeps the order-insensitive checksum inside long range
        # under ANSI even at tens of millions of pairs
        F.sum(F.pmod(F.xxhash64("doc_id_a", "doc_id_b"), F.lit(10**9))).alias("h"),
    ).collect()[0]
    return time.time() - t0, int(agg["n"]), int(agg["h"])


def main() -> None:
    n_template = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    reps = 2
    spark = get_spark("salted-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="skewbench_")
    try:
        make_corpus(spark, tmp, n_template)
        hottest, max_group = bucket_stats(spark, tmp)
        out = {
            "n_template_docs": n_template,
            "hot_bucket_threshold": MINHASH_HOT_BUCKET,
            "hottest_bucket_clusters": hottest,
            "salted_max_build_group": max_group,
        }
        results = {}
        for mode in ("plain", "salted"):
            if mode == "salted":
                spark.conf.set(HOT_BUCKET_CONF, str(MINHASH_HOT_BUCKET))
            else:
                spark.conf.unset(HOT_BUCKET_CONF)
            times, counts, hashes = [], set(), set()
            for _ in range(reps):
                t, n, h = run_once(spark, tmp)
                times.append(round(t, 2))
                counts.add(n)
                hashes.add(h)
            results[mode] = {"times": times, "rows": counts.pop(), "hash": hashes.pop()}
            assert not counts and not hashes, "nondeterministic result within mode"
        spark.conf.unset(HOT_BUCKET_CONF)
        assert results["plain"]["rows"] == results["salted"]["rows"]
        assert results["plain"]["hash"] == results["salted"]["hash"]
        out["pairs"] = results["plain"]["rows"]
        out["plain_sec"] = min(results["plain"]["times"])
        out["salted_sec"] = min(results["salted"]["times"])
        out["all_times"] = {m: results[m]["times"] for m in results}
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
