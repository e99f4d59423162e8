"""100x documents shard (sf1-doc): direct evidence the banded dedup
equi-joins hold their LINEARITY two orders of magnitude above bench
scale (VERDICT r11 next-round #9, stretch).

The sf1 harness inflates every table 10x; dedup truth there is 10
vocabulary-disjoint copies. This harness inflates DOCUMENTS ONLY to
100x bench scale (500k docs from the sf0.1 base, same disjoint-vocab
construction: tokens suffixed "_<copy>", doc_ids offset per copy), then
runs the two banded-fingerprint heads once each:

- ``dedup_minhash_lsh`` — banded signature equi-join; disjoint copies
  mean true pairs scale exactly 100x, so wall vs the committed sf0.1 /
  sf1 numbers reads directly as the linearity curve.
- ``winnow_near_dup`` — winnowing-fingerprint posting-list join, same
  argument.

Also emits the LSH **bucket-occupancy histogram** (clusters per
(band, hash) bucket): per-bucket join work is occupancy², so the
histogram IS the join-cost model — linearity holds exactly as long as
occupancy stays flat while bucket COUNT scales, which disjoint copies
should produce (each copy hashes its own buckets).

Usage: ``python scripts/sf1doc_dedup_run.py [out.json]`` → results to
SCALE.md "100x documents shard".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.sf1_scale_run import KEY_OFF  # noqa: E402

SF1DOC_DIR = os.environ.get("SPARK_GRAFT_SF1DOC_DIR", "/tmp/spark_graft_sf1doc")
BASE_DIR = "/root/testdata/sf0.1"
COPIES = 100
OUT_FILES = 32


def generate(spark) -> None:
    """Idempotent 100x documents build — same disjoint-vocabulary
    construction as ``sf1_scale_run._inflate`` (underscore suffix: the
    base corpus contains no underscores, asserted there)."""
    marker = os.path.join(SF1DOC_DIR, "_GENERATED")
    if os.path.exists(marker):
        return
    os.makedirs(SF1DOC_DIR, exist_ok=True)
    from gmall_flink_parent_spark.sources.tables import load_table

    base = load_table(spark, BASE_DIR, "documents")
    copies = []
    for i in range(COPIES):
        df = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_OFF))
        if i > 0:
            df = df.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(w, F.lit("_" + str(i))),
                    ),
                    " ",
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        copies.append(df)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(OUT_FILES).write.mode("overwrite").parquet(
        os.path.join(SF1DOC_DIR, "documents.parquet")
    )
    with open(marker, "w") as fh:
        fh.write("ok\n")


def bucket_histogram(spark) -> dict:
    """Clusters per (band, hash) bucket, bucketed by occupancy — the
    LSH join-cost model (per-bucket work = occupancy²). Uses the SAME
    signature/band pipeline as the head (one distinct-signature frame,
    4 band columns stacked)."""
    from gmall_flink_parent_spark.functions.dedup import (
        NUM_HASHES,
        _minhash_sigs,
        band_hash_cols,
    )
    from gmall_flink_parent_spark.sources.tables import fan_out, load_table

    docs = fan_out(spark, load_table(spark, SF1DOC_DIR, "documents"))
    sig_cols = [f"s{i}" for i in range(NUM_HASHES)]
    band_cols = band_hash_cols()
    clusters = (
        _minhash_sigs(docs).groupBy(*sig_cols).agg(F.count(F.lit(1)))
        .select(*[c for c in band_cols])
    )
    stacked = clusters.selectExpr(
        "stack({n}, {cols}) AS (band_idx, bh)".format(
            n=len(band_cols),
            cols=", ".join(f"{i}, bh{i}" for i in range(len(band_cols))),
        )
    )
    occ = stacked.groupBy("band_idx", "bh").agg(F.count(F.lit(1)).alias("n"))
    hist_rows = (
        occ.groupBy("n").agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy("n")
        .collect()
    )  # bounded: one row per distinct occupancy value
    return {str(r["n"]): r["n_buckets"] for r in hist_rows}


def run_cc() -> dict:
    """Connected components over the 100x near-dup pair graph (VERDICT
    r12 next-round #6): the linear-state fixed point two orders above
    bench scale. The edge set is the MinHash head's own verified output
    (est-Jaccard >= its threshold — the "verified tier"); correctness
    at this scale is pinned by two EXACT disjoint-copy invariants:
    copy 0 is the base corpus verbatim so its label slice must count
    exactly the base components (computed here with the same code on
    the base), and no component may span a copy boundary (the copies
    share no vocabulary). The total count is reported, not pinned —
    borderline MinHash estimates flip per suffixed copy."""
    import gmall_flink_parent_spark.plans as plans
    from gmall_flink_parent_spark.functions.dedup import connected_components
    from gmall_flink_parent_spark.session import get_spark
    from gmall_flink_parent_spark.sources.tables import load_table

    spark = get_spark("gmall-sf1doc-cc")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)
    qmap = plans.query_map()

    def components(sf_dir: str) -> tuple[int, int, dict]:
        pairs = qmap["dedup_minhash_lsh"](spark, sf_dir).select(
            "doc_id_a", "doc_id_b"
        )
        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        stats: dict = {}
        labels = connected_components(docs, pairs, stats=stats)
        return labels.select("label").distinct().count(), labels.count(), stats

    t0 = time.monotonic()
    base_components, base_docs, _ = components(BASE_DIR)
    base_sec = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    pairs = qmap["dedup_minhash_lsh"](spark, SF1DOC_DIR).select(
        "doc_id_a", "doc_id_b"
    )
    n_edges = pairs.count()
    pair_sec = round(time.monotonic() - t0, 1)
    docs = load_table(spark, SF1DOC_DIR, "documents").select("doc_id")
    n_docs = docs.count()
    stats: dict = {}
    t0 = time.monotonic()
    labels = connected_components(docs, pairs, stats=stats)
    n_components = labels.select("label").distinct().count()
    cc_sec = round(time.monotonic() - t0, 1)
    rounds = stats.get("rounds", -1)
    # Correctness pins at 100x — exact, not approximate:
    # (1) copy 0 is the base corpus VERBATIM (unsuffixed), so its slice
    #     of the 100x labels must land exactly base_components;
    # (2) copies share no vocabulary, so no component may span copies
    #     (label and member always in the same KEY_OFF block).
    # The TOTAL count is reported but not pinned to 100x: MinHash is an
    # estimate, and borderline pairs (est approximately at threshold) flip
    # in/out per suffixed copy because each copy's tokens hash to a
    # different permutation sample — a property of the estimator, not
    # the engine (copy 0 proves the engine bit-exact).
    copy0_components = (
        labels.filter(F.col("doc_id") < KEY_OFF)
        .select("label")
        .distinct()
        .count()
    )
    assert copy0_components == base_components, (
        f"copy-0 slice broke: {copy0_components} components vs "
        f"{base_components} at base (must be identical — same docs, same edges)"
    )
    n_cross = labels.filter(
        F.floor(F.col("doc_id") / KEY_OFF) != F.floor(F.col("label") / KEY_OFF)
    ).count()
    assert n_cross == 0, f"{n_cross} labels cross a copy boundary"
    return {
        "metric": "sf1doc_cc_run",
        "scale_vs_bench": COPIES,
        "n_docs": n_docs,
        "n_edges": n_edges,
        "pair_gen_sec": pair_sec,
        "cc_sec": cc_sec,
        "rounds": rounds,
        "directed_edge_rows_per_round": 2 * n_edges,
        "edge_rows_per_sec": round(2 * n_edges * rounds / cc_sec, 1) if cc_sec else None,
        "n_components": n_components,
        "base_components_sf01": base_components,
        "copy0_components": copy0_components,
        "cross_copy_labels": n_cross,
        "base_cc_sec": base_sec,
        "invariants": "copy-0 slice == base exactly; zero cross-copy labels "
        "(total is estimator-variant: borderline MinHash pairs flip per "
        "suffixed copy)",
    }


def main() -> None:
    import gmall_flink_parent_spark.plans as plans
    from gmall_flink_parent_spark.session import get_spark

    if "--cc" in sys.argv:
        doc = run_cc()
        line = json.dumps(doc)
        print(line)
        out = [a for a in sys.argv[1:] if not a.startswith("--")]
        if out:
            with open(out[0], "w") as fh:
                fh.write(line + "\n")
        return

    spark = get_spark("gmall-sf1doc")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    generate(spark)
    gen_sec = round(time.monotonic() - t0, 1)
    qmap = plans.query_map()
    heads: dict[str, dict] = {}
    n_docs = spark.read.parquet(
        os.path.join(SF1DOC_DIR, "documents.parquet")
    ).count()
    for name in ("dedup_minhash_lsh", "winnow_near_dup"):
        t = time.monotonic()
        df = qmap[name](spark, SF1DOC_DIR)
        n_pairs = df.count()
        wall = round(time.monotonic() - t, 2)
        heads[name] = {
            "sec": wall,
            "pairs": n_pairs,
            "docs_per_sec": round(n_docs / wall, 1),
        }
    hist = bucket_histogram(spark)
    doc = {
        "metric": "sf1doc_dedup_run",
        "scale_vs_bench": COPIES,
        "n_docs": n_docs,
        "generate_sec": gen_sec,
        "heads": heads,
        "lsh_bucket_occupancy_hist": hist,
    }
    line = json.dumps(doc)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
