"""Deduplication operators for large-scale corpus curation.

Four tiers, each a registered query over ``documents``:

- **exact** — hash-groupBy on a normalized md5 fingerprint; one shuffle
  on the 128-bit key, no skew (hash keys are uniform).
- **blocked exact Jaccard** — token-set Jaccard within blocking keys; the
  quadratic cost is bounded per block, not per corpus.
- **MinHash + LSH** — signatures → banding → bucket equi-join; the 100 TB
  path: candidate generation is a join on band hashes, never all-pairs.
- **SimHash** — 32-bit signatures + Hamming-ball candidate filter.

Portability note: every hash in this module is md5-derived because md5 is
the one hash function Spark and DuckDB compute identically (xxhash64 /
``hash()`` are engine-specific), letting the LSH pipelines be
oracle-checked end-to-end. MinHash signature components are *hex-string
minima* — order statistics over md5 strings — which avoids unportable
hex→int conversion entirely. In production the same plans run with
xxhash64 for speed; the structure is hash-agnostic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_parent_spark.plans.registry import register
from gmall_flink_parent_spark.sources.tables import fan_out, load_table

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
JACCARD_THRESHOLD = 0.6
SIMHASH_BITS = 32
HAMMING_THRESHOLD = 6

DEDUP_EXACT_ORACLE = """
SELECT md5(lower(trim(text))) AS fingerprint,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY md5(lower(trim(text)))
"""


@register("dedup_exact", oracle=DEDUP_EXACT_ORACLE, tags=("dedup",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per content fingerprint.

    GroupBy on md5(normalized text) — partial aggregation map-side, one
    shuffle of (128-bit key, min-id, count) pairs. At 100 TB this is the
    cheapest possible exact-dup pass: bytes shuffled ≈ #distinct docs.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


JACCARD_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
    FROM documents
)
SELECT doc_id_a, doc_id_b, jaccard
FROM (
    SELECT a.doc_id AS doc_id_a,
           b.doc_id AS doc_id_b,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))),
                 6) AS jaccard
    FROM t a
    JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
)
WHERE jaccard >= {JACCARD_THRESHOLD}
"""


@register("dedup_jaccard_blocked", oracle=JACCARD_ORACLE, tags=("dedup",))
def dedup_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup within source blocks.

    The blocking key bounds the self-join: cost is Σ_block n_b², not N².
    This is the ground-truth oracle the approximate tiers (MinHash,
    SimHash) are validated against in tests.
    """
    # fan_out: the blocked self-join is quadratic per block — run it as
    # wide as the cluster, not as wide as the (single-split) scan.
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    a = t.alias("a")
    b = t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


NGRAM_N = 3
NGRAM_JACCARD_THRESHOLD = 0.02

NGRAM_JACCARD_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, sh
    FROM (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                   i -> concat_ws(' ', string_split(text, ' ')[i],
                                  string_split(text, ' ')[i + 1],
                                  string_split(text, ' ')[i + 2])
               )) AS sh
        FROM documents
    )
    WHERE len(sh) > 0
)
SELECT doc_id_a, doc_id_b, jaccard
FROM (
    SELECT a.doc_id AS doc_id_a,
           b.doc_id AS doc_id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                 6) AS jaccard
    FROM t a
    JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
)
WHERE jaccard >= {NGRAM_JACCARD_THRESHOLD}
"""


@register("dedup_ngram_jaccard", oracle=NGRAM_JACCARD_ORACLE, tags=("dedup", "ngram"))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram (shingle) Jaccard near-dup within source blocks.

    Shingling preserves word *order*, so unlike token-set Jaccard
    (`dedup_jaccard_blocked`) two docs drawing on the same vocabulary
    but phrased differently score near zero — the standard
    boilerplate-resistant near-dup signal. Same blocked self-join shape:
    cost is Σ_block n_b², and at corpus scale the shingle sets feed the
    MinHash pipeline instead of being compared exactly.
    """
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    shingles = F.array_distinct(
        F.when(
            F.size("toks") >= NGRAM_N,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (NGRAM_N - 1)),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("toks"), i),
                    F.element_at(F.col("toks"), i + 1),
                    F.element_at(F.col("toks"), i + 2),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    t = (
        docs.select("doc_id", "source", toks.alias("toks"))
        .select("doc_id", "source", shingles.alias("sh"))
        .filter(F.size("sh") > 0)
    )
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)
    )


# ---------------------------------------------------------------- MinHash

# Universal-hash family over one base md5 per token: h_i(t) = (a_i·h + b_i)
# mod P, with h = md5(t)[0:15] parsed as an integer, reduced mod P. One
# digest per token (not per hash function) — 16× less hashing than the
# naive scheme; coefficients are fixed literals so Spark and the oracle
# compute identical signatures.
MINHASH_P = 1_000_000_007
A_COEF = [(i * 2_654_435_761 + 1) % MINHASH_P for i in range(NUM_HASHES)]
B_COEF = [(i * 40_503 + 12_345) % MINHASH_P for i in range(NUM_HASHES)]

# token → bounded integer hash (engine-specific hex parse, same value)
_TOKHASH_DUCK = f"CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % {MINHASH_P}"


def _perm_min(i: int):
    # factory (not default-arg binding) — PySpark introspects lambda arity
    a, b = A_COEF[i], B_COEF[i]
    return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)


def _minhash_sigs(docs: DataFrame) -> DataFrame:
    hashes = F.transform(
        F.array_distinct(F.split("text", " ")),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_P),
    )
    sig_cols = [
        F.array_min(F.transform(F.col("hashes"), _perm_min(i))).alias(f"s{i}")
        for i in range(NUM_HASHES)
    ]
    return docs.select("doc_id", hashes.alias("hashes")).select("doc_id", *sig_cols)


def _minhash_oracle() -> str:
    sig_exprs = ",\n           ".join(
        f"list_min(list_transform(hashes, h -> (h * {A_COEF[i]} + {B_COEF[i]}) "
        f"% {MINHASH_P})) AS s{i}"
        for i in range(NUM_HASHES)
    )
    band_selects = "\n    UNION ALL\n".join(
        "    SELECT doc_id, {j} AS band_idx, concat_ws(':', {cols}) AS bh FROM sigs".format(
            j=j,
            cols=", ".join(f"s{j * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)),
        )
        for j in range(BANDS)
    )
    matches = " + ".join(
        f"(CASE WHEN x.s{i} = y.s{i} THEN 1 ELSE 0 END)" for i in range(NUM_HASHES)
    )
    return f"""
WITH base AS (
    SELECT doc_id,
           list_transform(list_distinct(string_split(text, ' ')),
                          t -> {_TOKHASH_DUCK}) AS hashes
    FROM documents
), sigs AS (
    SELECT doc_id,
           {sig_exprs}
    FROM base
), banded AS (
{band_selects}
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM banded a
    JOIN banded b ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT doc_id_a, doc_id_b, est_jaccard
FROM (
    SELECT c.doc_id_a, c.doc_id_b,
           ROUND(({matches}) / {NUM_HASHES}.0, 6) AS est_jaccard
    FROM cand c
    JOIN sigs x ON c.doc_id_a = x.doc_id
    JOIN sigs y ON c.doc_id_b = y.doc_id
)
WHERE est_jaccard >= {JACCARD_THRESHOLD}
"""


def _no_aqe(spark: SparkSession) -> SparkSession:
    """Child session (shared SparkContext) with AQE disabled.

    The LSH plan consumes the signature-cluster aggregate THREE times
    (both self-join sides + the within-cluster branch). Static planning
    turns the second and third consumers into ``ReusedExchange`` — the
    corpus is scanned and minhashed once. AQE (Spark 4.1) plans each
    consumer as an independent query stage and never reuses the
    exchange: 3 scans, 3 signature computations, measured 2× slower at
    sf0.1 and strictly worse at 100 TB where signatures dominate. AQE's
    skew-split is not needed here — the exact-dup collapse already
    bounds bucket skew before the join — so reuse wins. A child session
    scopes the toggle to this query without touching the caller's conf.
    """
    s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    return s


@register("dedup_minhash_lsh", oracle=_minhash_oracle(), tags=("dedup", "lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands × 4 rows) near-dup pairs.

    The scale path: shingle → minhash → **collapse identical
    signatures** → band → bucket equi-join — candidate generation is a
    shuffle on band hashes over *distinct signatures*, never an
    all-pairs product over docs. Two structural optimizations keep the
    wide stage small at 100 TB:

    - **Exact-dup collapse first.** Docs grouped by full signature into
      clusters before banding; duplicate-heavy corpora (boilerplate,
      mirrored pages) shrink the join quadratically. Doc-level pairs
      are re-expanded by a cheap codegen explode at the very end —
      output size is irreducible, the join no longer scales with it.
    - **First-matching-band filter, not dropDuplicates.** A pair
      colliding in k bands would surface k times; both full band lists
      ride the join, so rows where ``band_idx`` isn't the pair's first
      matching band die in a codegen filter — the output-sized
      dedup shuffle is gone entirely.

    Runs with AQE off (see ``_no_aqe``): static planning reuses the
    signature-cluster exchange across all three consumers — one corpus
    scan — where AQE replans each consumer separately. Bucket skew is
    already bounded by the exact-dup collapse, so AQE's skew-split
    isn't needed.
    """
    return _minhash_pairs(_no_aqe(spark), sf_dir)


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH pair generation against whatever session it is handed."""
    # fan_out: one md5 per token × 16 permutations is the CPU-dominant
    # stage — run it cluster-wide even on a single-split scan.
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    sig_cols = [f"s{i}" for i in range(NUM_HASHES)]
    band_cols = [
        F.concat_ws(
            ":", *[F.col(f"s{j * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        )
        for j in range(BANDS)
    ]
    clusters = (
        _minhash_sigs(docs)
        .groupBy(*sig_cols)
        .agg(F.collect_list("doc_id").alias("ids"))
        .select(
            F.array_min("ids").alias("rep"),
            "ids",
            F.array(*sig_cols).alias("sig"),
            F.array(*band_cols).alias("bhs"),
        )
    )
    # posexplode_outer, deliberately: plain posexplode makes the optimizer
    # infer `size(bhs) > 0`, and that filter is pushed below the signature
    # aggregate where it re-expands to all 16 minhash expressions per raw
    # row — doubling (and then some) the whole signature computation. The
    # band array is a literal 4-array, never empty, so _outer is identical
    # in output and infers no filter.
    banded = clusters.select(
        "rep", "ids", "sig", "bhs", F.posexplode_outer("bhs").alias("band_idx", "bh")
    )
    a, b = banded.alias("a"), banded.alias("b")
    first_band = (
        F.array_position(
            F.zip_with(F.col("a.bhs"), F.col("b.bhs"), lambda x, y: x == y),
            F.lit(True),
        )
        - 1
    )
    matches = F.size(
        F.filter(
            F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    cross = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.rep") < F.col("b.rep")),
        )
        .filter(F.col("a.band_idx") == first_band)
        .select(
            F.col("a.ids").alias("ids_a"),
            F.col("b.ids").alias("ids_b"),
            F.round(matches / F.lit(float(NUM_HASHES)), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= JACCARD_THRESHOLD)
        .select(F.explode("ids_a").alias("x"), "ids_b", "est_jaccard")
        .select("x", F.explode("ids_b").alias("y"), "est_jaccard")
    )
    # identical-signature pairs: est_jaccard is exactly 16/16
    within = (
        clusters.filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), y -> struct(x, y))))"
                )
            ).alias("p")
        )
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"), F.lit(1.0).alias("est_jaccard"))
    )
    return cross.unionByName(within).select(
        F.least("x", "y").alias("doc_id_a"),
        F.greatest("x", "y").alias("doc_id_b"),
        "est_jaccard",
    )


@register("dedup_cluster_keep", oracle=None, tags=("dedup", "iterative"))
def dedup_cluster_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup *cluster* assignment: connected components over the
    MinHash pair graph via min-label propagation; keep = lowest doc_id.

    The step a real dedup pipeline runs after pair generation — pairs
    alone can't answer "which docs do I drop" when A~B and B~C but A≁C.
    Label propagation: every doc starts as its own label; each round
    every doc takes the min label in its neighborhood (one join + one
    groupBy per round); the driver-side loop stops at the fixed point
    (≤ graph-diameter rounds — near-dup clusters are dense, so tiny
    diameters; pointer-doubling would get log₂ if a corpus ever needed
    it). Iterative ⇒ rows-only driver check; transitivity/minimality
    invariants are pinned in ``tests/test_operators.py``.
    """
    # Same no-AQE child session as the pair generator, so every frame in
    # the propagation loop shares one session/conf.
    spark = _no_aqe(spark)
    pairs = _minhash_pairs(spark, sf_dir).select("doc_id_a", "doc_id_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # undirected edge list, both directions
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_id_b").alias("doc_id_a"), F.col("doc_id_a").alias("doc_id_b")
        )
    ).persist()
    labels = docs.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(32):  # bound >> log2(diameter) of any near-dup cluster
        neighbor_min = (
            edges.join(labels, edges.doc_id_b == labels.doc_id)
            .groupBy("doc_id_a")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("doc_id_a", "doc_id")
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "label"
                ),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        if labels.is_cached:
            labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("is_keeper"),
    )


# ------------------------------------------------------- cascade verify

_CASCADE_DOT = " + ".join(
    f"CAST(a.embedding[{i + 1}] AS DOUBLE) * CAST(b.embedding[{i + 1}] AS DOUBLE)"
    for i in range(64)
)
_CASCADE_NRM = " + ".join(
    f"CAST(embedding[{i + 1}] AS DOUBLE) * CAST(embedding[{i + 1}] AS DOUBLE)"
    for i in range(64)
)

CASCADE_ORACLE = f"""
WITH mh AS (
    SELECT * FROM ({{minhash}}) t
), eb AS (
    SELECT vec_id, embedding, sqrt({_CASCADE_NRM}) AS nrm FROM embeddings
)
SELECT m.doc_id_a, m.doc_id_b, m.est_jaccard,
       ROUND(({_CASCADE_DOT}) / (a.nrm * b.nrm), 6) AS cos_sim
FROM mh m
JOIN eb a ON a.vec_id = m.doc_id_a
JOIN eb b ON b.vec_id = m.doc_id_b
"""


@register(
    "dedup_cascade_verify",
    oracle=CASCADE_ORACLE.format(minhash=_minhash_oracle()),
    tags=("dedup", "lsh", "cascade"),
)
def dedup_cascade_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade dedup: cheap textual candidates (MinHash LSH) verified by
    embedding cosine — the two-tier shape production pipelines run.

    Tier 1 (shingle/minhash/band join) is pennies per document and
    recall-oriented; tier 2 attaches exact semantic similarity to the
    *candidate pairs only* — never the corpus cross product — via two
    hash joins against the embedding table keyed on doc id. At 100 TB
    the tier-2 join cost scales with candidate-pair count (output-sized)
    while the embedding table is only probed, making expensive semantic
    verification affordable exactly where it matters. Pairs without
    embeddings (coverage is partial by design) drop out — inner join.
    """
    spark = _no_aqe(spark)
    pairs = _minhash_pairs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    eb = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ).alias("nrm"),
    )
    a = eb.select(
        F.col("vec_id").alias("doc_id_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = eb.select(
        F.col("vec_id").alias("doc_id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("emb_a"), F.col("emb_b"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            "est_jaccard",
            F.round(dot / (F.col("nrm_a") * F.col("nrm_b")), 6).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------- SimHash


# per-token 32-bit integer hash (first 8 md5 hex chars), then per-bit
# majority vote over integer shifts — integer ops, not string probing.
_TOK32_DUCK = "CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)"


def _simhash_value_sql_duckdb() -> str:
    """SimHash32 over the integer `hashes` list, as a DuckDB expression."""
    bit_terms = []
    for b in range(SIMHASH_BITS):
        vote = (
            f"list_sum(list_transform(hashes, h -> CASE WHEN (h >> {b}) & 1 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        bit_terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << b} ELSE 0 END)")
    return "CAST(" + " + ".join(bit_terms) + " AS BIGINT)"


def _simhash_value_col() -> Column:
    """Same SimHash32, as a generated Spark SQL expression over `hashes`."""
    terms = []
    for b in range(SIMHASH_BITS):
        vote = (
            f"aggregate(hashes, 0, (acc, h) -> acc + (CASE WHEN "
            f"(shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << b} ELSE 0 END)")
    return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")


SIMHASH_ORACLE = f"""
WITH h AS (
    SELECT doc_id, source,
           list_transform(list_distinct(string_split(text, ' ')),
                          t -> {_TOK32_DUCK}) AS hashes
    FROM documents
)
SELECT doc_id, source, {_simhash_value_sql_duckdb()} AS simhash32
FROM h
"""


@register("simhash_signatures", oracle=SIMHASH_ORACLE, tags=("dedup", "simhash"))
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (majority vote over token-hash bits).

    Pure higher-order expressions over the token array — per-row, no
    shuffle, whole-stage codegen. Pair generation on top (Hamming ≤ t)
    is `simhash_near_dup`.
    """
    # fan_out: 32 per-bit majority votes per row are CPU-dense enough to
    # deserve full width even on a single-split scan.
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    h = docs.select(
        "doc_id",
        "source",
        F.transform(
            F.array_distinct(F.split("text", " ")),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
        ).alias("hashes"),
    )
    return h.select("doc_id", "source", _simhash_value_col().alias("simhash32"))


SIMHASH_PAIRS_ORACLE = f"""
WITH h AS (
    SELECT doc_id, source,
           list_transform(list_distinct(string_split(text, ' ')),
                          t -> {_TOK32_DUCK}) AS hashes
    FROM documents
), s AS (
    SELECT doc_id, source, {_simhash_value_sql_duckdb()} AS simhash32 FROM h
)
SELECT a.doc_id AS doc_id_a,
       b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.simhash32, b.simhash32)) AS INTEGER) AS hamming
FROM s a
JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash32, b.simhash32)) <= {HAMMING_THRESHOLD}
"""


@register("simhash_near_dup", oracle=SIMHASH_PAIRS_ORACLE, tags=("dedup", "simhash"))
def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming(sig_a, sig_b) ≤ 6 within blocks.

    Blocked self-join on the source key; at corpus scale the block key
    would be simhash bit-prefixes (each signature probed into 4 rotated
    prefix tables), which keeps candidate generation an equi-join exactly
    like the MinHash band join.
    """
    sigs = simhash_signatures(spark, sf_dir)
    a, b = sigs.alias("a"), sigs.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash32").bitwiseXOR(F.col("b.simhash32"))
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_THRESHOLD)
    )
