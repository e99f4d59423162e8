"""Corpus-curation operators for large-scale training-data pipelines.

Beyond the reference's surface (SURVEY §2.7 lists only basic string/date
functions): the filtering / splitting / decontamination stages a 100 TB
document pipeline runs between ingestion and tokenization. Everything
here is either a pure map stage over the parquet scan (repetition stats,
cleaning, PII scrub, split assignment — shuffle-free, whole-stage
codegen) or an explicitly shuffle-bounded aggregation (top-token,
quantiles, contamination semi-join with a broadcast benchmark side).

Cross-engine parity notes baked into every oracle:

- DuckDB ``regexp_replace`` replaces the FIRST match unless the ``'g'``
  flag is passed; Spark replaces all — every oracle passes ``'g'``.
- Patterns avoid backslash escapes (``[.]`` not ``\\.``) so Java regex
  (Spark) and RE2 (DuckDB) parse them identically.
- Hash-based bucketing reuses the md5-prefix→integer trick from
  ``functions/dedup.py``: md5 is the one hash both engines compute
  identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_flink_parent_spark.functions.stopwords import _STOP_SQL, STOPWORDS
from gmall_flink_parent_spark.plans.registry import (
    register,
    release_caches,
    retain_latest,
    scoped_persist,
)
from gmall_flink_parent_spark.sources.tables import fan_out, load_table

# ------------------------------------------------------------ repetition

REPETITION_ORACLE = """
WITH t AS (
    SELECT doc_id,
           string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n
    FROM documents
), g AS (
    SELECT doc_id, n,
           1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n AS r1,
           CASE WHEN n >= 2 THEN list_distinct(list_transform(
               range(1, greatest(n, 1)),
               i -> concat_ws(' ', toks[i], toks[i + 1]))) ELSE [] END AS g2,
           CASE WHEN n >= 3 THEN list_distinct(list_transform(
               range(1, greatest(n - 1, 1)),
               i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))) ELSE [] END AS g3
    FROM t
)
SELECT doc_id,
       ROUND(r1, 6) AS dup_token_ratio,
       ROUND(CASE WHEN n >= 2
                  THEN 1.0 - CAST(len(g2) AS DOUBLE) / (n - 1) ELSE 0.0 END,
             6) AS dup_2gram_ratio,
       ROUND(CASE WHEN n >= 3
                  THEN 1.0 - CAST(len(g3) AS DOUBLE) / (n - 2) ELSE 0.0 END,
             6) AS dup_3gram_ratio
FROM g
"""


def _ngrams(toks: Column, n_col: Column, n: int) -> Column:
    """Distinct word n-grams as a JVM-side higher-order expression."""
    grams = F.transform(
        F.sequence(F.lit(1), n_col - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k) for k in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(n_col >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate token / 2-gram / 3-gram
    fractions per document.

    High duplicate-n-gram fractions mark boilerplate and generated spam;
    corpus filters drop docs above a threshold (e.g. dup-2gram > 0.2).
    Pure higher-order array expressions — per-row, shuffle-free; at
    100 TB this is a map stage fused into the scan. The registered form
    is the ``dup_*_ratio`` columns of ``corpus_filter_pipeline`` (signals
    and verdict come from one scan); this standalone frame remains for
    library use.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    n = F.col("n")
    r1 = F.lit(1.0) - F.size(F.array_distinct("toks")).cast("double") / n
    g2 = F.size(_ngrams(F.col("toks"), n, 2))
    g3 = F.size(_ngrams(F.col("toks"), n, 3))
    r2 = F.when(n >= 2, F.lit(1.0) - g2.cast("double") / (n - 1)).otherwise(0.0)
    r3 = F.when(n >= 3, F.lit(1.0) - g3.cast("double") / (n - 2)).otherwise(0.0)
    return t.select(
        "doc_id",
        F.round(r1, 6).alias("dup_token_ratio"),
        F.round(r2, 6).alias("dup_2gram_ratio"),
        F.round(r3, 6).alias("dup_3gram_ratio"),
    )


# ------------------------------------------------------------- top token

TOP_TOKEN_ORACLE = """
WITH e AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), c AS (
    SELECT doc_id, tok, count(*) AS cnt FROM e GROUP BY doc_id, tok
), r AS (
    SELECT doc_id, tok, cnt,
           row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok) AS rn,
           sum(cnt) OVER (PARTITION BY doc_id) AS n_tokens
    FROM c
)
SELECT doc_id,
       tok AS top_token,
       CAST(cnt AS BIGINT) AS top_count,
       ROUND(CAST(cnt AS DOUBLE) / n_tokens, 6) AS top_token_ratio
FROM r WHERE rn = 1
"""


@register("doc_top_token", oracle=TOP_TOKEN_ORACLE, tags=("text", "quality"))
def doc_top_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent token per document and its frequency ratio.

    The distributed shape (explode → partial-agg groupBy → per-doc
    window) is the 100 TB path: token counting gets map-side combine, and
    the window partitions by doc_id so no single reducer sees more than
    one document's vocabulary. Deterministic tie-break (count desc, token
    asc) keeps the result engine-independent.
    """
    docs = load_table(spark, sf_dir, "documents")
    e = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    c = e.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("doc_id")
    r = c.select(
        "doc_id",
        "tok",
        "cnt",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("tok")))
        .alias("rn"),
        F.sum("cnt").over(w).alias("n_tokens"),
    )
    return r.filter(F.col("rn") == 1).select(
        "doc_id",
        F.col("tok").alias("top_token"),
        F.col("cnt").alias("top_count"),
        F.round(F.col("cnt").cast("double") / F.col("n_tokens"), 6).alias(
            "top_token_ratio"
        ),
    )


# ------------------------------------------------------------- cleaning

CLEAN_ORACLE = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               '  +', ' ', 'g'))) AS clean_fp,
       CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                       '  +', ' ', 'g'))) AS BIGINT) AS n_clean_chars
FROM documents
"""


@register("doc_clean_normalize", oracle=CLEAN_ORACLE, tags=("text", "clean"))
def doc_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization pass: lowercase → strip non-alphanumerics → collapse
    whitespace → trim; emits the cleaned-text fingerprint and length.

    The canonicalization that feeds exact dedup and tokenization. Pure
    regex/codegen map stage; the fingerprint (rather than the full
    cleaned text) keeps the output narrow, and value-hash comparison
    against the oracle pins byte-exact regex parity between engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), "  +", " "
        )
    )
    return docs.select(
        "doc_id",
        F.md5(cleaned).alias("clean_fp"),
        F.length(cleaned).cast("long").alias("n_clean_chars"),
    )


# ------------------------------------------------------------- PII scrub

# Patterns avoid backslashes so Java regex and RE2 agree: [.] not \\.
_EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+"
_NUM_PAT = "[0-9]+"

PII_SCRUB_ORACLE = f"""
SELECT event_id,
       CAST(len(regexp_extract_all(props, '{_NUM_PAT}')) AS BIGINT) AS n_num_redactions,
       CAST(len(regexp_extract_all(props, '{_EMAIL_PAT}')) AS BIGINT) AS n_email_redactions,
       regexp_replace(regexp_replace(props, '{_EMAIL_PAT}', '[EMAIL]', 'g'),
                      '{_NUM_PAT}', '[NUM]', 'g') AS scrubbed
FROM events
"""


@register("pii_scrub", oracle=PII_SCRUB_ORACLE, tags=("text", "clean", "pii"))
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over semi-structured payloads: emails and number
    runs replaced with typed placeholders, with per-row redaction counts.

    Runs on ``events.props`` (the JSON payload column) where numeric
    identifiers actually occur. Order matters — emails first, so digits
    inside an address aren't half-redacted by the number pass. Per-row
    regex, shuffle-free; at 100 TB this fuses into the scan like the
    cleaning pass. Real deployments add SSN/phone/credit-card patterns
    to the same chain.
    """
    events = load_table(spark, sf_dir, "events")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("props"), _EMAIL_PAT, "[EMAIL]"), _NUM_PAT, "[NUM]"
    )
    return events.select(
        "event_id",
        F.size(F.expr(f"regexp_extract_all(props, '{_NUM_PAT}', 0)"))
        .cast("long")
        .alias("n_num_redactions"),
        F.size(F.expr(f"regexp_extract_all(props, '{_EMAIL_PAT}', 0)"))
        .cast("long")
        .alias("n_email_redactions"),
        scrubbed.alias("scrubbed"),
    )


# ---------------------------------------------------------- sample/split

SAMPLE_SPLIT_ORACLE = """
WITH b AS (
    SELECT doc_id,
           CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 100 AS INTEGER) AS bucket
    FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       bucket < 10 AS in_10pct_sample
FROM b
"""


@register("doc_sample_split", oracle=SAMPLE_SPLIT_ORACLE, tags=("text", "sampling"))
def doc_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment + 10% sample flag via
    content-stable hash bucketing (md5(doc_id) → bucket ∈ [0,100)).

    Hash-based splits are the only splits that survive reprocessing at
    100 TB: no RNG state, no ordering dependence — a doc lands in the
    same split on every run, on any cluster, under any partitioning.
    ``rand(seed)`` cannot promise that across engines or repartitions;
    the md5 trick (shared with the MinHash pipeline) can.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    ).cast("int")
    b = docs.select("doc_id", bucket.alias("bucket"))
    return b.select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
        .alias("split"),
        (F.col("bucket") < 10).alias("in_10pct_sample"),
    )


# ------------------------------------------------------------- quantiles

LENGTH_QUANTILES_ORACLE = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       ROUND(quantile_cont(n, 0.5), 6) AS p50_tokens,
       ROUND(quantile_cont(n, 0.9), 6) AS p90_tokens,
       ROUND(quantile_cont(n, 0.99), 6) AS p99_tokens,
       ROUND(avg(n), 6) AS avg_tokens
FROM (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents)
GROUP BY source
"""


@register("doc_length_quantiles", oracle=LENGTH_QUANTILES_ORACLE, tags=("text", "stats"))
def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length distribution: exact p50/p90/p99 + mean.

    The length histogram that drives truncation and packing decisions.
    Exact ``percentile`` (linear interpolation, same definition as
    DuckDB's ``quantile_cont``) — one shuffle on the low-cardinality
    source key. At 100 TB swap in ``approx_percentile`` for a
    sketch-mergeable single-pass version; the query shape is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " ")).cast("long")
    return (
        docs.select("source", n.alias("n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.percentile("n", F.lit(0.5)), 6).alias("p50_tokens"),
            F.round(F.percentile("n", F.lit(0.9)), 6).alias("p90_tokens"),
            F.round(F.percentile("n", F.lit(0.99)), 6).alias("p99_tokens"),
            F.round(F.avg("n"), 6).alias("avg_tokens"),
        )
    )


@register("doc_length_quantiles_approx", oracle=None, tags=("text", "stats", "approx"))
def doc_length_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``doc_length_quantiles``: ``approx_percentile``
    (Greenwald–Khanna sketch, rel. error ≤ 1/accuracy) in the same
    single-shuffle plan shape.

    The sketch is MERGEABLE — partial sketches combine map-side exactly
    like partial sums, so the shuffle carries one bounded-size sketch
    per (source, partition) instead of every length value; that is the
    difference between this plan and the exact one at corpus scale.
    Rows-only by design: DuckDB's approx_quantile uses a different
    sketch, so there is no hash oracle — the invariant test bounds it
    against the exact query instead (``tests/test_operators.py``).
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " ")).cast("long")
    acc = F.lit(10000)  # rel. error <= 1e-4 of the rank
    return (
        docs.select("source", n.alias("n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_percentile("n", F.lit(0.5), acc).alias("p50_tokens"),
            F.approx_percentile("n", F.lit(0.9), acc).alias("p90_tokens"),
            F.approx_percentile("n", F.lit(0.99), acc).alias("p99_tokens"),
            F.round(F.avg("n"), 6).alias("avg_tokens"),
        )
    )


# ------------------------------------------------------ filter pipeline

# Thresholds sit at discriminative points of the corpus distributions
# (quality ≈ median, dup-2-gram ≈ p80) so the verdict actually splits
# the corpus rather than rubber-stamping it.
_MIN_QUALITY = 0.35
_MAX_DUP2 = 0.05
_MIN_TOKENS, _MAX_TOKENS = 10, 1000

FILTER_PIPELINE_ORACLE = f"""
WITH sig AS (
    SELECT doc_id,
           md5(lower(trim(text))) AS fp,
           len(string_split(text, ' ')) AS n,
           string_split(text, ' ') AS toks
    FROM documents
), flags AS (
    SELECT doc_id, fp,
           ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n, 6)
               AS dup_token_ratio,
           ROUND(CASE WHEN n >= 2 THEN 1.0 - CAST(len(list_distinct(list_transform(
                range(1, greatest(n, 1)),
                i -> concat_ws(' ', toks[i], toks[i + 1])))) AS DOUBLE) / (n - 1)
                ELSE 0.0 END, 6) AS dup_2gram_ratio,
           ROUND(CASE WHEN n >= 3 THEN 1.0 - CAST(len(list_distinct(list_transform(
                range(1, greatest(n - 1, 1)),
                i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS DOUBLE)
                / (n - 2) ELSE 0.0 END, 6) AS dup_3gram_ratio,
           ROUND(
             0.4 * least(n, 200) / 200.0
           + 0.3 * least(CAST(len(list_distinct(toks)) AS DOUBLE) / n, 1.0)
           + 0.3 * least(CAST(len(list_filter(toks, t -> t IN ({{stop}}))) AS DOUBLE)
                         / n * 5.0, 1.0)
           , 6) >= {_MIN_QUALITY} AS pass_quality,
           (CASE WHEN n >= 2 THEN 1.0 - CAST(len(list_distinct(list_transform(
                range(1, greatest(n, 1)),
                i -> concat_ws(' ', toks[i], toks[i + 1])))) AS DOUBLE) / (n - 1)
                ELSE 0.0 END) <= {_MAX_DUP2} AS pass_repetition,
           n BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS} AS pass_length
    FROM sig
), keepers AS (
    SELECT fp, min(doc_id) AS keeper FROM sig GROUP BY fp
)
SELECT f.doc_id,
       f.dup_token_ratio, f.dup_2gram_ratio, f.dup_3gram_ratio,
       f.pass_quality, f.pass_repetition, f.pass_length,
       f.doc_id = k.keeper AS is_canonical,
       (f.pass_quality AND f.pass_repetition AND f.pass_length
        AND f.doc_id = k.keeper) AS keep
FROM flags f JOIN keepers k USING (fp)
"""


@register(
    "corpus_filter_pipeline",
    oracle=FILTER_PIPELINE_ORACLE.format(stop=_STOP_SQL),
    tags=("text", "quality", "pipeline"),
)
def corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation verdict: Gopher-style repetition signals +
    quality ∧ repetition ∧ length ∧ exact-dup canonicality per document,
    one scan + one shuffle.

    The end-to-end decision a training-data pipeline actually executes,
    with the raw repetition ratios (duplicate token / 2-gram / 3-gram
    fractions) emitted alongside the boolean verdicts so downstream
    threshold tuning needs no second scan. Every per-row signal
    (repetition ratios, quality score, token count, fingerprint) is
    computed in a single projection over one scan; the only wide op is
    the fingerprint groupBy that elects the canonical copy — at 100 TB
    that shuffle carries (128-bit key, min-id), nothing else.
    Re-deriving the signals inline rather than joining the individual
    signal queries keeps it at 1 corpus scan instead of 5.
    """
    # fan_out: the 2-/3-gram construction per row is the CPU-dominant
    # stage — don't let a single-split scan pin it to one task.
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    sig = docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
        toks.alias("toks"),
        F.size(toks).alias("n"),
    )
    n = F.col("n")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    quality = F.round(
        F.lit(0.4) * F.least(n, F.lit(200)) / F.lit(200.0)
        + F.lit(0.3)
        * F.least(F.size(F.array_distinct("toks")).cast("double") / n, F.lit(1.0))
        + F.lit(0.3)
        * F.least(
            F.size(F.filter("toks", lambda t: F.array_contains(stop_arr, t))).cast(
                "double"
            )
            / n
            * 5.0,
            F.lit(1.0),
        ),
        6,
    )
    r1 = F.lit(1.0) - F.size(F.array_distinct("toks")).cast("double") / n
    dup2 = F.when(
        n >= 2,
        F.lit(1.0) - F.size(_ngrams(F.col("toks"), n, 2)).cast("double") / (n - 1),
    ).otherwise(0.0)
    dup3 = F.when(
        n >= 3,
        F.lit(1.0) - F.size(_ngrams(F.col("toks"), n, 3)).cast("double") / (n - 2),
    ).otherwise(0.0)
    flags = sig.select(
        "doc_id",
        "fp",
        F.round(r1, 6).alias("dup_token_ratio"),
        F.round(dup2, 6).alias("dup_2gram_ratio"),
        F.round(dup3, 6).alias("dup_3gram_ratio"),
        (quality >= _MIN_QUALITY).alias("pass_quality"),
        (dup2 <= _MAX_DUP2).alias("pass_repetition"),
        n.between(_MIN_TOKENS, _MAX_TOKENS).alias("pass_length"),
    )
    keepers = sig.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    j = flags.join(keepers, "fp")
    is_canon = F.col("doc_id") == F.col("keeper")
    return j.select(
        "doc_id",
        "dup_token_ratio",
        "dup_2gram_ratio",
        "dup_3gram_ratio",
        "pass_quality",
        "pass_repetition",
        "pass_length",
        is_canon.alias("is_canonical"),
        (
            F.col("pass_quality")
            & F.col("pass_repetition")
            & F.col("pass_length")
            & is_canon
        ).alias("keep"),
    )


# ----------------------------------------------------- corpus reporting

VOCAB_TOPK = 50

VOCAB_ORACLE = f"""
SELECT tok, n_occurrences, n_docs, rnk
FROM (
    SELECT tok,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           row_number() OVER (ORDER BY count(*) DESC, tok) AS rnk
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
)
WHERE rnk <= {VOCAB_TOPK}
"""


@register("vocab_top_tokens", oracle=VOCAB_ORACLE, tags=("text", "stats"))
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: global top-50 tokens by occurrence.

    The canonical wordcount shape at 100 TB: explode → partial count
    map-side (the combine absorbs Zipf skew — hot tokens reduce to one
    row per task before the shuffle) → final count → ``orderBy().
    limit(k)``, which Catalyst compiles to **TakeOrderedAndProject**:
    every partition keeps a k-row heap and only those heads merge — no
    global sort, no single-partition WindowExec, the vocabulary never
    moves. Rank numbers for the 50 survivors come from a 50×50
    count-rows-before self-join (constant-sized by construction).
    Deterministic tie-break (count desc, token asc) makes the order
    total, so the rank equals row_number.
    """
    docs = load_table(spark, sf_dir, "documents")
    e = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    counts = e.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("tok")).limit(VOCAB_TOPK)
    x, y = top.alias("x"), top.alias("y")
    before = (F.col("y.n_occurrences") > F.col("x.n_occurrences")) | (
        (F.col("y.n_occurrences") == F.col("x.n_occurrences"))
        & (F.col("y.tok") < F.col("x.tok"))
    )
    return (
        x.join(y, before, "left")
        .groupBy("x.tok", "x.n_occurrences", "x.n_docs")
        .agg((F.count("y.tok") + 1).cast("int").alias("rnk"))
        .select("tok", "n_occurrences", "n_docs", "rnk")
    )


CORPUS_SUMMARY_ORACLE = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       ROUND(avg(len(string_split(text, ' '))), 6) AS avg_tokens
FROM documents
GROUP BY lang
"""


def corpus_token_projection(docs: DataFrame) -> DataFrame:
    """The (lang, source, n_chars, n_tokens) map-stage projection shared
    by batch ``corpus_summary`` and the streaming
    ``corpus_summary_job`` partials — one definition of "a token" so
    the batch query and its partial-store twin cannot drift."""
    n = F.size(F.split("text", " "))
    return docs.select("lang", "source", "n_chars", n.alias("n_tokens"))


@register("corpus_summary", oracle=CORPUS_SUMMARY_ORACLE, tags=("text", "stats"))
def corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language dataset-card statistics: doc/source/token/char totals.

    The reporting rollup every curated corpus ships with. One partial-
    aggregated shuffle on the language key (single digits of groups);
    token counting stays a per-row array expression in the map stage.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        corpus_token_projection(docs)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
    )


# ----------------------------------------------------- sequence packing

_PACK_CAP = 2048  # tokens per packed training sequence

PACK_BINS_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), c AS (
    SELECT doc_id, source, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum_before // {_PACK_CAP} AS BIGINT) AS seq_id,
       CAST(cum_before % {_PACK_CAP} AS BIGINT) AS seq_offset
FROM c
"""


@register("doc_pack_bins", oracle=PACK_BINS_ORACLE, tags=("text", "packing"))
def doc_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each doc a target
    training sequence (cap 2048 tokens) and its token offset.

    GPT-style pretraining packs documents by concatenation into
    fixed-length sequences; the assignment is a running token sum per
    shard (source) — one window pass, deterministic under any cluster
    partitioning because the order key (source, doc_id) is total. At
    100 TB each shard's prefix sum is independent, so shards scale out
    embarrassingly; no global coordination, unlike RNG-based shuffling.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " ")).cast("long")
    t = docs.select("doc_id", "source", n.alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
    )
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(F.col("cum_before") / _PACK_CAP).cast("long").alias("seq_id"),
        (F.col("cum_before") % _PACK_CAP).cast("long").alias("seq_offset"),
    )


# -------------------------------------------------------- contamination

_CONTAM_N = 4  # word-4-grams: discriminative but not vanishing at small SF
_BENCH_MOD = 97  # benchmark set = docs with doc_id % 97 == 0

CONTAMINATION_ORACLE = f"""
WITH sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - {_CONTAM_N - 2}, 1)),
               i -> concat_ws(' ', string_split(text, ' ')[i],
                              string_split(text, ' ')[i + 1],
                              string_split(text, ' ')[i + 2],
                              string_split(text, ' ')[i + 3])))) AS g
    FROM documents
), bench AS (
    SELECT DISTINCT g FROM sh WHERE doc_id % {_BENCH_MOD} = 0
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_ngrams
FROM sh s JOIN bench USING (g)
WHERE s.doc_id % {_BENCH_MOD} <> 0
GROUP BY s.doc_id
"""


def contamination_shingles(docs: DataFrame) -> DataFrame:
    """Distinct word-{_CONTAM_N}-gram shingles per document — the shared
    core of batch ``contamination_4gram`` and the streaming
    ``contamination_job`` (one construction, so batch and stream cannot
    drift). Input needs (doc_id, text); output is (doc_id, g).

    The token array is materialized in its own projection BEFORE
    building shingles: inlining split(text) into the transform lambda
    would re-split the document once per element_at (~5× per gram) — a
    10× scan-stage slowdown observed at sf0.1.
    """
    t = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    grams = _ngrams(F.col("toks"), F.size("toks"), _CONTAM_N)
    return t.select("doc_id", F.explode(grams).alias("g"))


def contamination_counts(sh: DataFrame, bench: DataFrame) -> DataFrame:
    """Per-doc contaminated-shingle counts: broadcast the (tiny)
    benchmark shingle set, hash-join at scan speed, one per-doc agg —
    shared by the batch query and the streaming job."""
    return (
        sh.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )


@register("contamination_4gram", oracle=CONTAMINATION_ORACLE, tags=("text", "decontam"))
def contamination_4gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    4-gram with the held-out benchmark set, with overlap counts.

    The standard eval-set leakage check. Shape: shingle both sides →
    **broadcast** the benchmark shingle set (benchmarks are tiny — MMLU
    et al. are megabytes against 100 TB of training data) → hash
    semi-join at scan speed, then a groupBy on doc_id for the counts.
    No shuffle of the corpus-side shingles beyond the final per-doc agg.
    The benchmark here is a deterministic slice (doc_id % {_BENCH_MOD} == 0)
    of the same table, standing in for an external eval corpus.
    """
    # fan_out: shingle construction + explode is the CPU-dominant stage.
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    sh = contamination_shingles(docs)
    bench = sh.filter(F.col("doc_id") % _BENCH_MOD == 0).select("g").distinct()
    return contamination_counts(sh.filter(F.col("doc_id") % _BENCH_MOD != 0), bench)


# ------------------------------------------------------------ data mixing


def corpus_mix_weighted(
    docs: DataFrame, weights: dict[str, float], seed: str = "mix-v1"
) -> DataFrame:
    """Deterministic weighted data mixing — the per-source sampling step
    that turns a curated corpus into a training mixture (e.g. wiki 3.0x,
    web 0.3x, code 1.0x).

    Weight semantics per source ``s`` with ``w = weights[s]`` (sources
    absent from ``weights`` default to 0.0 — excluded):

    - ``w < 1``: downsample — keep each doc with probability ``w``;
    - ``w >= 1``: epoched upsample — ``floor(w)`` full copies of every
      doc plus one extra copy with probability ``w - floor(w)``.

    Output grain is (doc_id, source, epoch): epoch numbers the copies
    0..floor(w), so downstream packing/shuffling can interleave epochs
    instead of concatenating them.

    Scale design (the properties that matter at 100 TB):

    - **Hash-decided, not RNG-decided.** Keep/drop for (doc, epoch)
      comes from ``md5(seed:epoch:doc_id)`` — the same content-stable
      trick as ``doc_sample_split`` — so the mixture is reproducible
      across runs, engines, partitionings, and restarts, and a re-run
      over yesterday's corpus + today's delta makes exactly the same
      decisions about yesterday's docs (no global state to carry).
    - **No shuffle.** The weight table rides a broadcast join; epochs
      come from ``explode(sequence(...))``; the fractional-copy filter
      is whole-stage codegen. Cost is one corpus scan.
    - **Per-source counts concentrate**: kept-count per source is a sum
      of independent per-doc indicators, so observed/expected deviates
      by O(1/sqrt(n)) — the property test pins a 5-sigma envelope.
    """
    wrows = [(s, int(w), float(w - int(w))) for s, w in weights.items() if w > 0]
    if not wrows:  # every source weighted 0 (or no weights): empty mixture
        return (
            docs.select("doc_id", "source")
            .withColumn("epoch", F.lit(0).cast("int"))
            .limit(0)
        )
    wdf = docs.sparkSession.createDataFrame(
        wrows, "source string, n_full int, frac double"
    )
    # u ∈ [0,1): first 8 md5 hex digits of (seed:epoch:doc_id) / 2^32
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(seed), F.col("epoch").cast("string"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    return (
        docs.join(F.broadcast(wdf), "source")
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("n_full"))))
        .filter((F.col("epoch") < F.col("n_full")) | (u < F.col("frac")))
        .select("doc_id", "source", "epoch")
    )


def _mid_pid() -> Column:
    """Partition id from the ``monotonically_increasing_id`` layout
    (31-bit partition id << 33 | 33-bit record number)."""
    return F.shiftright("__mid", 33)


def _mid_local_offset() -> Column:
    """Record offset within its partition, from the
    ``monotonically_increasing_id`` layout (31-bit partition id << 33 |
    33-bit record number)."""
    return F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))


def _range_sorted_positions(
    df: DataFrame, sort_cols: list[str], eager: bool = False
) -> DataFrame:
    """The shared global-position core of ``training_order`` and
    ``pack_sequences``: range-partition on the sort key (Spark samples
    bounds; each partition sorts locally — never a single-reducer total
    sort), then stamp ``__mid`` = ``monotonically_increasing_id`` over
    the sorted partitions. Decode with ``_mid_pid`` /
    ``_mid_local_offset``. The frame is PERSISTED (query-scoped)
    because every caller reads it from two branches (a tiny per-pid
    summary and the full output): without one materialization the
    branches could re-execute the range exchange with different sampled
    bounds and disagree on partition membership."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return scoped_persist(
        df.repartitionByRange(n_parts, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("__mid", F.monotonically_increasing_id()),
        eager=eager,
    )


def _partition_offsets(part: DataFrame, value: Column, name: str) -> DataFrame:
    """Cumulative per-partition offsets from a #partitions-row summary:
    sum ``value`` per pid, then an exclusive running total in pid order.
    The tiny-summary trick shared with ``user_value_distribution``."""
    totals = part.groupBy(_mid_pid().alias("pid")).agg(F.sum(value).alias("v"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    return totals.select(
        "pid", F.coalesce(F.sum("v").over(w_off), F.lit(0)).alias(name)
    )


def training_order(mix: DataFrame, seed: str = "order-v1") -> DataFrame:
    """Deterministic global shuffle of a (doc_id, source, epoch) mixture
    into training order — the step after ``corpus_mix_weighted``.

    The order key is ``md5(seed:epoch:doc_id)``: content-stable, so the
    order is reproducible across runs/clusters (resumable training needs
    to know exactly which sample was step N), and statistically uniform,
    so consecutive samples are decorrelated — epochs and sources
    interleave instead of concatenating, and a doc's repeat copies land
    far apart with overwhelming probability. ``sample_idx`` is the
    0-based global position. When composing with ``corpus_mix_weighted``
    the two seeds MUST differ (``assemble_training_mixture`` salts
    them): with the same seed the mixing keep-variate IS the sort key,
    so every fractionally-kept row sorts into the low end of the stream
    instead of interleaving.

    Scale shape: ONE range-partitioned sort (Spark samples key bounds,
    each partition sorts locally — no single-reducer total sort). Local
    positions come from ``monotonically_increasing_id`` over the sorted
    partitions — (partition << 33) | row-offset, read back with a shift
    and mask — NOT from a ``row_number`` window, which would demand a
    second full-data hash exchange on the partition id that the range
    exchange already clustered. Global position = local offset + the
    partition's cumulative count (the same tiny-summary offset trick as
    ``user_value_distribution``'s rank). The sorted frame is persisted
    (query-scoped) because BOTH the counts summary and the final select
    read it: without one materialization the two branches could
    re-execute the range exchange with different sampled bounds and
    disagree on partition membership. ``sample_idx`` itself is
    boundary-independent either way — it reproduces the total
    (__k, doc_id, epoch) order wherever the range bounds fall.
    """
    release_caches()  # one live full-data cache per call, like the
    # registered-query cadence — a loop re-deriving streams must not
    # accumulate a mixture-sized cache per iteration
    key = F.md5(
        F.concat_ws(
            ":",
            F.lit(seed),
            F.col("epoch").cast("string"),
            F.col("doc_id").cast("string"),
        )
    )
    part = _range_sorted_positions(
        mix.withColumn("__k", key), ["__k", "doc_id", "epoch"]
    )
    offsets = _partition_offsets(part, F.lit(1).cast("long"), "off")
    return (
        part.withColumn("pid", _mid_pid())
        .join(F.broadcast(offsets), "pid")
        .select(
            (F.col("off") + _mid_local_offset()).alias("sample_idx"),
            "doc_id",
            "source",
            "epoch",
        )
    )


def assemble_training_mixture(
    spark: SparkSession,
    sf_dir: str,
    weights: dict[str, float],
    seed: str = "pipe-v1",
) -> DataFrame:
    """The composed end-to-end assembly a training run consumes:
    curation verdict → canonical keepers → weighted mixing → training
    order. Returns (sample_idx, doc_id, source, epoch) — the exact
    sample stream a data loader would read.

    Composition of already-tested stages, sharing their guarantees:
    ``corpus_filter_pipeline``'s keep verdict (quality ∧ repetition ∧
    length ∧ exact-dup canonicality, 1 scan + 1 fingerprint shuffle),
    ``corpus_mix_weighted`` (hash-decided, shuffle-free), and
    ``training_order`` (one range sort + tiny offset pass). End to end
    that is two corpus scans (verdict, mix) + the keep semi-join + one
    range sort — and the whole stream is reproducible from (corpus,
    weights, seed) alone, so a crashed training job can re-derive
    sample N exactly.

    The two stages are salted with DIFFERENT derived seeds: both hash
    ``md5(seed:epoch:doc_id)``, so feeding one seed to both would make
    the mixing keep-variate equal the sort key — every fractionally
    kept row (downsampled sources, fractional epochs) would sort into
    the front of the stream instead of interleaving uniformly.
    """
    kept = (
        corpus_filter_pipeline(spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .join(kept, "doc_id", "left_semi")
    )
    return training_order(
        corpus_mix_weighted(docs, weights, f"{seed}:mix"), f"{seed}:order"
    )


def pack_sequences(stream: DataFrame, cap: int = _PACK_CAP) -> DataFrame:
    """Concat-and-chunk the ORDERED training stream into fixed-token
    sequences: every sample gets (seq_id, seq_offset) from the global
    running token count over ``sample_idx`` order — the last stage of
    mix → order → pack. Input needs (sample_idx, doc_id, n_tokens);
    output adds ``seq_id = cum_before // cap`` and
    ``seq_offset = cum_before % cap`` (the same chunk math as
    ``doc_pack_bins``, but over the training order instead of per
    source).

    Every input column passes through (source/epoch accounting over
    packed sequences needs no join back); only ``seq_id``/``seq_offset``
    are added.

    The global prefix sum never serializes: range-partition on
    ``sample_idx`` (each partition holds a contiguous index range),
    cumsum WITHIN each partition via an Arrow ``mapInPandas`` pass that
    preserves partitioning and order (a window by partition id would
    re-shuffle the full stream just to prove clustering Catalyst
    already has), then add each partition's broadcast cumulative token
    offset — a #partitions-row summary (``_partition_offsets``). One
    range exchange moves the data; the persisted frame
    (``_range_sorted_positions``) keeps the counts and output branches
    on one materialization.
    """
    # Downstream-stage cadence: persist + EAGER-fill the range-sorted
    # frame while the upstream stage's cache (training_order's sorted
    # mixture, when composed) is still alive — the shared lineage runs
    # once — then drop everything but this frame (`retain_latest`):
    # same one-live-cache end state as training_order, without
    # recomputing the verdict/mix subtree during the fill.
    part = _range_sorted_positions(stream, ["sample_idx"], eager=True)
    retain_latest()

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in part.schema.fields
    ) + ", cum_in_part long"

    def cumsum(batches):
        offset = 0
        for pdf in batches:
            # accumulate in int64: an int32 n_tokens column would wrap
            # silently once a partition's running total passes 2^31
            toks = pdf["n_tokens"].astype("int64")
            pdf = pdf.assign(cum_in_part=offset + toks.cumsum() - toks)
            offset += int(toks.sum())
            yield pdf

    cum = part.mapInPandas(cumsum, schema=schema)
    offsets = _partition_offsets(part, F.col("n_tokens").cast("long"), "part_off")
    return (
        cum.withColumn("pid", _mid_pid())
        .join(F.broadcast(offsets), "pid")
        .withColumn("cum_before", F.col("part_off") + F.col("cum_in_part"))
        .select(
            *stream.columns,
            # `div` = long integral division: float `/` loses exactness
            # past ~2^52 cumulative tokens (quotient rounds up at block
            # boundaries), while div matches the oracle's `//` at any
            # scale; `%` on longs is already exact
            F.expr(f"cum_before div {int(cap)}").cast("long").alias("seq_id"),
            (F.col("cum_before") % cap).cast("long").alias("seq_offset"),
        )
    )


# ------------------------------------- registered mixture-pipeline heads
#
# Driver-checkable forms of the mix → order → pack stages. The frame
# functions above are the library surface; these registered heads pin
# them against a DuckDB oracle, which is possible precisely BECAUSE the
# pipeline is hash-decided (md5 — the one hash both engines compute
# identically) rather than RNG-decided: the exact mixture, order, and
# packing are reproducible from (corpus, weights, seed) alone on any
# engine. An RNG-based sampler could never have a cross-engine oracle.

# Fixed head weights covering all three weight regimes per source class:
# src0,4,8,...  → 2.5 (epoched upsample with a fractional extra copy)
# src1,5,9,...  → 1.0 (keep exactly once)
# src2,6,10,... → 0.3 (downsample)
# src3,7,11,... → 0.0 (excluded)
_MIX_HEAD_WEIGHTS = {
    f"src{i}": (2.5, 1.0, 0.3, 0.0)[i % 4] for i in range(20)
}
_MIX_HEAD_SEED = "mix-q1"
_PIPE_HEAD_SEED = "pipe-q1"


def _mix_weight_values_sql() -> str:
    """The (source, n_full, frac) weight table as a SQL VALUES list,
    generated from the SAME dict the Spark head uses so the two sides
    cannot drift."""
    rows = [
        f"('{s}', {int(w)}, CAST({w - int(w)!r} AS DOUBLE))"
        for s, w in _MIX_HEAD_WEIGHTS.items()
        if w > 0
    ]
    return ", ".join(rows)


def _mix_u_sql(seed: str) -> str:
    """DuckDB expression for the keep-variate u ∈ [0,1): first 8 md5 hex
    digits of seed:epoch:doc_id over 2^32 — byte-identical to the Spark
    side's conv(substring(md5(...), 1, 8), 16, 10) / 2^32."""
    return (
        "CAST(CAST('0x' || substr(md5("
        f"'{seed}' || ':' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)"
        "), 1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0"
    )


def _mix_cte_sql(doc_source: str, seed: str) -> str:
    """Shared mix CTE body: explode epochs 0..n_full per (doc, source)
    against the weight table, keep full epochs plus the hash-decided
    fractional copy."""
    return f"""
w(source, n_full, frac) AS (VALUES {_mix_weight_values_sql()}),
exploded AS (
    SELECT d.doc_id, d.source, CAST(t.e AS INT) AS epoch,
           w.n_full, w.frac
    FROM {doc_source} d JOIN w USING (source),
         unnest(range(0, w.n_full + 1)) AS t(e)
),
mix AS (
    SELECT doc_id, source, epoch FROM exploded
    WHERE epoch < n_full OR {_mix_u_sql(seed)} < frac
)"""


MIX_HEAD_ORACLE = f"""
WITH {_mix_cte_sql("documents", f"{_MIX_HEAD_SEED}")}
SELECT doc_id, source, epoch FROM mix
"""


@register(
    "training_mix_weighted",
    oracle=MIX_HEAD_ORACLE,
    tags=("text", "mixing"),
    past_window=True,
)
def training_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered head of ``corpus_mix_weighted``: the deterministic
    weighted training mixture over the raw corpus at fixed weights
    spanning all three regimes (epoched upsample 2.5×, keep 1.0×,
    downsample 0.3×, excluded 0.0×).

    Scale shape is the library function's: broadcast weight table +
    epoch explode + codegen hash filter — one corpus scan, no shuffle.
    The oracle reproduces the mixture row-for-row in DuckDB because the
    keep decision is md5-derived, not RNG-derived.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return corpus_mix_weighted(docs, _MIX_HEAD_WEIGHTS, seed=_MIX_HEAD_SEED)


def _order_key_sql(seed: str) -> str:
    """DuckDB expression for the training-order sort key."""
    return (
        f"md5('{seed}' || ':' || CAST(epoch AS VARCHAR)"
        " || ':' || CAST(doc_id AS VARCHAR))"
    )


TRAINING_MIXTURE_ORACLE = f"""
WITH verdict AS ({{filter_oracle}}),
kept AS (
    SELECT d.doc_id, d.source
    FROM documents d JOIN verdict v USING (doc_id)
    WHERE v.keep
),
{_mix_cte_sql("kept", f"{_PIPE_HEAD_SEED}:mix")}
SELECT CAST(row_number() OVER (
           ORDER BY {_order_key_sql(f"{_PIPE_HEAD_SEED}:order")}, doc_id, epoch
       ) - 1 AS BIGINT) AS sample_idx,
       doc_id, source, epoch
FROM mix
"""


@register(
    "training_mixture",
    oracle=TRAINING_MIXTURE_ORACLE.format(
        filter_oracle=FILTER_PIPELINE_ORACLE.format(stop=_STOP_SQL)
    ),
    tags=("text", "mixing", "pipeline"),
    past_window=True,
)
def training_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered head of ``assemble_training_mixture``: curation
    verdict → keepers → weighted mix → deterministic global training
    order, returning the (sample_idx, doc_id, source, epoch) stream a
    data loader would read.

    The oracle recomputes the entire pipeline in DuckDB — filter CTE,
    md5 mixture, and ``row_number() OVER (ORDER BY md5_key)`` — and
    must agree on every sample's global position, which pins the range
    -partitioned distributed sort (``training_order``) to the semantics
    of a total order without ever building one reducer's total sort.
    """
    return assemble_training_mixture(
        spark, sf_dir, _MIX_HEAD_WEIGHTS, seed=_PIPE_HEAD_SEED
    )


PACKED_STREAM_ORACLE = f"""
WITH verdict AS ({{filter_oracle}}),
kept AS (
    SELECT d.doc_id, d.source
    FROM documents d JOIN verdict v USING (doc_id)
    WHERE v.keep
),
{_mix_cte_sql("kept", f"{_PIPE_HEAD_SEED}:mix")},
ordered AS (
    SELECT CAST(row_number() OVER (
               ORDER BY {_order_key_sql(f"{_PIPE_HEAD_SEED}:order")}, doc_id, epoch
           ) - 1 AS BIGINT) AS sample_idx,
           doc_id, source, epoch
    FROM mix
),
stream AS (
    SELECT o.sample_idx, o.doc_id, o.source, o.epoch,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
    FROM ordered o JOIN documents d USING (doc_id)
),
c AS (
    SELECT *,
           COALESCE(SUM(n_tokens) OVER (
               ORDER BY sample_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM stream
)
SELECT sample_idx, doc_id, source, epoch, n_tokens,
       CAST(cum_before // {_PACK_CAP} AS BIGINT) AS seq_id,
       CAST(cum_before % {_PACK_CAP} AS BIGINT) AS seq_offset
FROM c
"""


@register(
    "packed_training_stream",
    oracle=PACKED_STREAM_ORACLE.format(
        filter_oracle=FILTER_PIPELINE_ORACLE.format(stop=_STOP_SQL)
    ),
    tags=("text", "mixing", "packing", "pipeline"),
    past_window=True,
)
def packed_training_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered head of the full mix → order → pack pipeline: the
    ordered training stream with each sample's packed-sequence
    assignment (seq_id, seq_offset) under the global running token sum.

    This is the one head whose oracle checks a GLOBAL prefix sum (the
    packing offsets) computed distributively on the Spark side — range
    partitioning on sample_idx, per-partition Arrow cumsum, broadcast
    partition offsets (``pack_sequences``) — against DuckDB's
    single-node window. Agreement on every (seq_id, seq_offset) proves
    the distributed prefix sum is exact, not approximately ordered.
    """
    stream = assemble_training_mixture(
        spark, sf_dir, _MIX_HEAD_WEIGHTS, seed=_PIPE_HEAD_SEED
    )
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return pack_sequences(stream.join(toks, "doc_id"))


# ------------------------------------------------ mixture weight planning

_MIX_ALPHA = 0.3  # temperature exponent: <1 upweights low-resource sources
_MIX_TOKEN_BUDGET = 500_000  # target mixture size in tokens


MIX_BUDGET_ORACLE = f"""
WITH tok AS (
    SELECT source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_total
    FROM documents GROUP BY source
), sm AS (
    SELECT source, n_tokens_total,
           POW(CAST(n_tokens_total AS DOUBLE) / SUM(n_tokens_total) OVER (),
               {_MIX_ALPHA}) AS s
    FROM tok
)
SELECT source, n_tokens_total,
       ROUND(s / SUM(s) OVER (), 6) AS token_share,
       ROUND({_MIX_TOKEN_BUDGET} * (s / SUM(s) OVER ()) / n_tokens_total, 6)
           AS mix_weight
FROM sm
"""


@register(
    "mixture_budget_weights",
    oracle=MIX_BUDGET_ORACLE,
    tags=("text", "mixing", "planning"),
    past_window=True,
)
def mixture_budget_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed mixture weights from corpus statistics: the
    planning step that turns per-source token totals into the
    ``corpus_mix_weighted`` weight dict for a fixed token budget.

    Standard multilingual/temperature sampling: source shares are
    raised to alpha=0.3 (alpha < 1 upweights low-resource
    sources, the mT5/XLM-R recipe), renormalized, and scaled so the
    expected mixture hits the 500k-token budget —
    ``mix_weight`` is directly the per-source keep/epoch multiplier the
    mixing stage consumes (w<1 downsample, w≥1 epoched upsample).

    Scale shape: one corpus scan → 20-group agg; the share/weight math
    runs over the #sources-row summary (window over a constant-size
    frame), so at 100 TB this costs exactly one map-side-combined
    shuffle of (source, partial token sum) pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("source", F.size(F.split("text", " ")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").cast("long").alias("n_tokens_total"))
    )
    w_all = Window.partitionBy()
    s = F.pow(
        F.col("n_tokens_total").cast("double")
        / F.sum("n_tokens_total").over(w_all),
        F.lit(_MIX_ALPHA),
    )
    sm = tok.select("source", "n_tokens_total", s.alias("s"))
    share = F.col("s") / F.sum("s").over(w_all)
    return sm.select(
        "source",
        "n_tokens_total",
        F.round(share, 6).alias("token_share"),
        F.round(
            F.lit(_MIX_TOKEN_BUDGET) * share / F.col("n_tokens_total"), 6
        ).alias("mix_weight"),
    )


# -------------------------------------------------- training-stream I/O

_SHARD_BLOCK = 100_000  # samples per shard directory


def write_training_shards(
    stream: DataFrame, path: str, block: int = _SHARD_BLOCK
) -> None:
    """Lay the ordered training stream down as ``sample_block=N/``
    hive-partitioned parquet (block = ``sample_idx // block``), the
    layout a resumable data loader reads.

    Why this layout at 100 TB: a crashed training run resumes at step S
    by reading ONLY the shard directories overlapping [S, end) —
    partition pruning eliminates every earlier shard at plan time
    (``read_training_slice`` pins this), so resume cost is proportional
    to the remaining stream, not the full corpus. Blocks are contiguous
    sample ranges because ``sample_idx`` is the loader's read order:
    one shard = one sequential chunk of training.

    The write repartitions by ``sample_block`` so each shard directory
    is produced by one task writing one file — without it, every
    upstream task would append a file to every shard directory
    (#tasks × #shards small files, the classic partitionBy explosion).
    ``sortWithinPartitions`` keeps rows in loader order inside each
    file, which also gives parquet monotone ``sample_idx`` row-group
    stats for the in-shard range filter.
    """
    (
        stream.withColumn(
            "sample_block", F.floor(F.col("sample_idx") / block).cast("long")
        )
        .repartition("sample_block")
        # the partition column leads the sort: the dynamic-partition
        # writer REQUIRES child ordering on [sample_block] — sorting by
        # sample_idx alone makes Spark insert its own (stability-
        # uncontracted) sort on top, and the in-file loader order would
        # then be luck rather than guarantee
        .sortWithinPartitions("sample_block", "sample_idx")
        .write.mode("overwrite")
        .partitionBy("sample_block")
        .parquet(path)
    )
    # Record the block size beside the data (underscore-prefixed dirs
    # are invisible to Spark's data-file listing): the reader's pruning
    # math divides by it, and a mismatched divisor would silently skip
    # shard directories mid-slice rather than erroring.
    stream.sparkSession.createDataFrame([(block,)], "block long").write.mode(
        "overwrite"
    ).parquet(f"{path}/_shard_meta")


def read_training_slice(
    spark: SparkSession, path: str, lo: int, hi: int, block: int | None = None
) -> DataFrame:
    """Read samples ``lo <= sample_idx < hi`` from a sharded training
    stream, touching only the shard directories that can contain them.

    The slice filter is expressed on BOTH columns: the ``sample_block``
    bounds are partition filters (directory pruning at plan time — no
    file of an excluded shard is even listed into the scan), and the
    ``sample_idx`` bounds push down to parquet row-group stats inside
    the surviving shards. The resume-at-step-S read is therefore
    O(remaining stream), never a corpus scan; the pruned plan shape is
    pinned in tests.

    The block size defaults to the ``_shard_meta`` sidecar the writer
    recorded; passing one explicitly is validated against it, because a
    mismatched divisor would prune directories that still hold rows of
    [lo, hi) — a silently incomplete resume.
    """
    from pyspark.errors import AnalysisException

    stored: int | None = None
    try:
        stored = spark.read.parquet(f"{path}/_shard_meta").collect()[0]["block"]
    except AnalysisException:  # sidecar absent (pre-sidecar layout):
        pass  # caller must supply the size. Real I/O errors (throttle,
        # permissions, corrupt footer) must PROPAGATE — swallowing them
        # would silently disable the divisor validation this sidecar
        # exists for, the exact incomplete-resume bug it guards against.
    if block is None:
        if stored is None:
            raise ValueError(
                f"{path} has no _shard_meta sidecar; pass the block size it "
                "was written with"
            )
        block = stored
    elif stored is not None and block != stored:
        raise ValueError(
            f"slice block={block} != store's written block={stored}: the "
            "pruning math would silently skip shard directories"
        )
    df = spark.read.parquet(path)
    if stored is None:
        # Sidecar-less store with a caller-supplied divisor: a crash
        # between the data write and the sidecar write leaves exactly
        # this state, and accepting the block unvalidated would let a
        # wrong divisor silently prune shard directories that still
        # hold rows of [lo, hi) — the incomplete-resume bug the sidecar
        # guards against. The layout itself is the check: under the
        # true divisor every row satisfies
        # blk*block <= sample_idx < (blk+1)*block for its directory.
        # One column-pruned scan, paid only on legacy/crashed stores.
        inconsistent = (
            df.filter(
                (F.col("sample_idx") < F.col("sample_block") * block)
                | (F.col("sample_idx") >= (F.col("sample_block") + 1) * block)
            )
            .limit(1)
            .count()
        )
        if inconsistent:
            raise ValueError(
                f"slice block={block} contradicts {path}'s observed "
                "sample_block boundaries (no _shard_meta sidecar to "
                "validate against): the pruning math would silently "
                "skip shard directories mid-slice"
            )
    return df.filter(
        (F.col("sample_block") >= lo // block)
        & (F.col("sample_block") <= max(hi - 1, lo) // block)
        & (F.col("sample_idx") >= lo)
        & (F.col("sample_idx") < hi)
    )


# ------------------------------------------------- unigram LM scoring

UNIGRAM_ORACLE = """
WITH e AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
    SELECT tok, CAST(count(*) AS DOUBLE) AS cnt FROM e GROUP BY tok
), tot AS (
    SELECT SUM(cnt) AS total FROM vocab
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       ROUND(-SUM(log2(v.cnt / t.total)) / count(*), 6) AS bits_per_token
FROM e JOIN vocab v USING (tok) CROSS JOIN tot t
GROUP BY doc_id
"""


def doc_term_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, tf) doc-term counts — the unigram feature-store
    grain. Per-doc independent AND mergeable (a doc's rows land whole
    in whichever ingest batch carries the doc; corpus vocabulary counts
    are sums of stored tf), so this one frame serves both run-once-at-
    ingest accumulation (``vocab_store_job``) and the one-shot batch
    query through the same scoring core. Map-side combine collapses
    repeated tokens before the (doc_id, tok) shuffle — the frame is
    distinct-terms-sized, smaller than the token-instance explode it
    replaces."""
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def unigram_logprob_frame(tf: DataFrame) -> DataFrame:
    """Corpus unigram probabilities + per-doc cross-entropy over a
    (doc_id, tok, tf) doc-term frame — the shared core of the batch
    ``doc_unigram_logprob`` and the store head
    ``doc_unigram_logprob_from_store`` (one scoring implementation, so
    batch and store verdicts cannot drift). Callers persist ``tf``
    when it is not already materialized: both the vocab agg and the
    prob join read it.

    tf-weighted sums are exact: n_tokens = Σ tf, and the instance-level
    Σ log2(p) equals Σ tf·log2(p) because every instance of a (doc,
    tok) pair contributes the same log-probability.
    """
    vocab = tf.groupBy("tok").agg(F.sum("tf").cast("double").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    p = F.col("cnt") / F.col("total")
    probs = vocab.crossJoin(F.broadcast(total)).select("tok", p.alias("p"))
    return (
        tf.join(probs, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                -F.sum(F.col("tf") * F.log2("p")) / F.sum("tf"), 6
            ).alias("bits_per_token"),
        )
    )


@register(
    "doc_unigram_logprob",
    oracle=UNIGRAM_ORACLE,
    tags=("text", "quality", "lm"),
    past_window=True,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM cross-entropy per document (bits/token) — the
    perplexity-proxy quality signal of CCNet-style filtering: documents
    whose tokens are improbable under the corpus unigram distribution
    (gibberish, wrong-language, boilerplate-free spam) score high and
    get filtered or bucketed.

    Exact form: token probabilities from the full corpus vocabulary
    (count/total), per-doc tf-weighted mean negative log2 over the
    shared ``doc_term_counts`` → ``unigram_logprob_frame`` core (the
    same two stages ``vocab_store_job`` + its store head run, so batch
    and store cannot drift) — two map-side-combined shuffles (doc-term
    counts, vocab counts) plus the token-keyed prob join carrying
    distinct (doc, tok) rows rather than token instances. The
    corpus-total scalar rides a 1-row broadcast (constant side, the
    allowlisted BNLJ shape). At 100 TB the exact prob join keys on the
    full vocabulary; the scale variant broadcasts the top-V head of
    the (Zipfian) vocab with one OOV fallback probability — same plan
    with the join replaced by a broadcast lookup, trading tail-token
    exactness for zero vocab shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    # persisted (query-scoped): the vocab agg and the prob join both
    # read the doc-term frame — without it the explode+count runs twice
    return unigram_logprob_frame(scoped_persist(doc_term_counts(docs)))


_TOPV = 24  # broadcast vocabulary head size for the scale variant; the
# synthetic corpus has a 31-token vocabulary, so 24 leaves a real tail —
# both the head (byte-identical) and OOV paths execute at every SF


@register(
    "doc_unigram_logprob_topv",
    oracle=None,  # approximation of doc_unigram_logprob; no exact SQL twin
    tags=("text", "quality", "lm", "approx"),
)
def doc_unigram_logprob_topv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``doc_unigram_logprob``: broadcast the top-V
    head of the (Zipfian) vocabulary and score tail tokens with one
    shared OOV probability (the remaining probability mass spread over
    the distinct tail tokens).

    Replaces the full-vocabulary shuffle join with a broadcast hash
    lookup: the corpus side is scored at scan speed, and the only
    full-data shuffle left is the per-doc agg. Head-token probabilities
    are IDENTICAL to the exact query's (count/total), so documents made
    of head tokens score byte-identically — pinned in tests, with a
    bounded deviation for tail-holding docs. Rows-only by design, like
    ``doc_length_quantiles_approx``.
    """
    docs = load_table(spark, sf_dir, "documents")
    e = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    # The vocab agg feeds both the head pick and the totals — persist it
    # (query-scoped) so the corpus explode+agg runs once, not per branch.
    vocab = scoped_persist(
        e.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    # Head via orderBy+limit = TakeOrderedAndProject (per-partition
    # partial top-V, NO single-reducer sort of the vocabulary — an
    # unpartitioned row_number window would plan Exchange
    # SinglePartition over every distinct token, exactly the
    # vocabulary-wide bottleneck this variant exists to avoid). Ties
    # break on token for determinism.
    head = vocab.orderBy(F.desc("cnt"), F.asc("tok")).limit(_TOPV)
    # Scalars from two tiny aggs (full-vocab totals; _TOPV-row head
    # totals); n_tail falls out as the difference.
    totals = vocab.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).cast("double").alias("n_vocab")
    )
    head_totals = head.agg(
        F.sum("cnt").alias("head_mass"),
        F.count(F.lit(1)).cast("double").alias("n_head"),
    )
    stats = totals.crossJoin(head_totals).select(
        "total", "head_mass", (F.col("n_vocab") - F.col("n_head")).alias("n_tail")
    )
    scored = (
        e.join(F.broadcast(head), "tok", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.coalesce(
                F.col("cnt") / F.col("total"),
                # OOV: leftover mass shared across the distinct tail
                (F.col("total") - F.col("head_mass"))
                / F.col("total")
                / F.greatest(F.col("n_tail"), F.lit(1.0)),
            ).alias("p"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(-F.sum(F.log2("p")) / F.count(F.lit(1)), 6).alias(
            "bits_per_token"
        ),
    )


MIX_COMPOSITION_ORACLE = f"""
WITH {_mix_cte_sql("documents", f"{_MIX_HEAD_SEED}")},
tok AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), avail AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs_available
    FROM documents GROUP BY source
)
SELECT m.source,
       a.n_docs_available,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(count(DISTINCT m.doc_id) AS BIGINT) AS n_docs_kept,
       CAST(SUM(t.n_tokens) AS BIGINT) AS n_tokens,
       ROUND(CAST(count(*) AS DOUBLE) / a.n_docs_available, 6)
           AS effective_epochs
FROM mix m JOIN tok t USING (doc_id) JOIN avail a ON m.source = a.source
GROUP BY m.source, a.n_docs_available
"""


@register(
    "mixture_composition",
    oracle=MIX_COMPOSITION_ORACLE,
    tags=("text", "mixing", "stats"),
    past_window=True,
)
def mixture_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics of the REALIZED training mixture: per
    source, available docs, emitted samples (doc copies), distinct docs
    kept, token total, and effective epochs (samples / available) —
    what a run report prints next to the `mixture_budget_weights` plan
    so drift between intended and realized mixture is visible.

    Shape: the shuffle-free mix (broadcast weights + hash filter)
    joined to per-doc token counts, then one 20-group agg — at 100 TB
    the shuffle carries (source, partials), nothing doc-sized. The
    effective-epochs column is the observability hook: it converges to
    the configured weight by the mixture's 5-sigma concentration
    property, and a persistent gap flags a corpus/weights mismatch.
    """
    docs = load_table(spark, sf_dir, "documents")
    mix = corpus_mix_weighted(
        docs.select("doc_id", "source"), _MIX_HEAD_WEIGHTS, seed=_MIX_HEAD_SEED
    )
    tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    avail = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_available")
    )
    return (
        mix.join(tok, "doc_id")
        .join(F.broadcast(avail), "source")
        .groupBy("source", "n_docs_available")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.countDistinct("doc_id").alias("n_docs_kept"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.col("n_docs_available"), 6
            ).alias("effective_epochs"),
        )
        .select(
            "source",
            "n_docs_available",
            "n_samples",
            "n_docs_kept",
            "n_tokens",
            "effective_epochs",
        )
    )


# ----------------------------------------------------- boilerplate spans

_BOILER_DF = 5  # a 4-gram in >= this many docs is boilerplate


BOILERPLATE_ORACLE = f"""
WITH sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - {_CONTAM_N - 2}, 1)),
               i -> concat_ws(' ', string_split(text, ' ')[i],
                              string_split(text, ' ')[i + 1],
                              string_split(text, ' ')[i + 2],
                              string_split(text, ' ')[i + 3])))) AS g
    FROM documents
), boiler AS (
    SELECT g FROM sh GROUP BY g HAVING count(*) >= {_BOILER_DF}
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(b.g) AS BIGINT) AS n_boilerplate,
       ROUND(CAST(count(b.g) AS DOUBLE) / count(*), 6) AS boilerplate_frac
FROM sh s LEFT JOIN boiler b USING (g)
GROUP BY s.doc_id
"""


@register(
    "doc_boilerplate_fraction",
    oracle=BOILERPLATE_ORACLE,
    tags=("text", "quality", "dedup"),
    past_window=True,
)
def doc_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-span signal (RefinedWeb/Gopher family): a word
    4-gram appearing in ≥ 5 documents is boilerplate (navigation
    chrome, license headers, templated spam); each document reports how
    much of it is made of such spans. High-fraction docs are filtered
    or span-stripped before training.

    Reuses the decontamination shingle core (distinct 4-grams per doc):
    one shingle scan feeds a document-frequency agg (map-side combined;
    shuffle carries (gram, partial count)), the boilerplate set comes
    back as a semi-join side — corpus-frequency-thresholded so it is a
    small fraction of the gram space — and a per-doc agg closes. Same
    two-wide-op budget as ``contamination_4gram``, sharing its audited
    CPU-stage shape (`fan_out` + single-projection token array).
    """
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    # Persist the shingle frame (query-scoped): it feeds BOTH the
    # document-frequency agg and the probe side, and the explode is the
    # CPU-dominant stage — without the persist it runs twice per query.
    return boilerplate_fraction_frame(
        scoped_persist(contamination_shingles(docs))
    )


BOILER_BROADCAST_MAX_GRAMS = 1_000_000  # forced-broadcast cap on the
# PROVEN upper bound of the df-thresholded gram set (~tens of MB of gram
# strings) — the same order as spark's default broadcast-size comfort zone


def boilerplate_fraction_frame(
    sh: DataFrame, max_broadcast_grams: int = BOILER_BROADCAST_MAX_GRAMS
) -> DataFrame:
    """Document-frequency threshold + per-doc boilerplate fraction over
    a (doc_id, g) shingle frame — the shared core of the batch
    ``doc_boilerplate_fraction`` and the shingle-store head
    ``boilerplate_fraction_from_store`` (one aggregation, so batch and
    store verdicts cannot drift). Callers persist ``sh``: both branches
    (df agg, probe) read it.

    The probe join picks between two value-identical physical plans,
    size-gated like ``dedup_cascade_verify``'s tier-2 switch — because
    the boilerplate set is DATA-DEPENDENT (df-thresholded over the
    corpus gram space), a forced broadcast is a corpus-shape assumption
    that boilerplate-heavy web crawls at 100 TB would break:

    - **forced broadcast** when the set is PROVABLY small:
      ``rows(sh) // _BOILER_DF`` bounds the qualifying gram count from
      above (each df ≥ threshold gram consumes at least threshold
      shingle rows), costs only a count over the caller-persisted /
      parquet-backed frame, and guards against a stats misestimate
      shuffling the corpus-side shingles;
    - **engine-decided join** otherwise: no hint, so AQE sizes the
      REAL aggregated set at runtime and broadcasts iff it actually
      fits — the corpus-side shuffle happens only when the set is
      genuinely too big for the driver, which is exactly when the
      forced broadcast would have OOMed it.

    Both branches are pinned hash-equal against BOILERPLATE_ORACLE.
    """
    boiler = (
        sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= _BOILER_DF)
        .select("g", F.lit(1).alias("is_boiler"))
    )
    if sh.count() // _BOILER_DF <= max_broadcast_grams:
        probe = sh.join(F.broadcast(boiler), "g", "left")
    else:
        probe = sh.join(boiler, "g", "left")
    return (
        probe.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("is_boiler").alias("n_boilerplate"),
            F.round(
                F.count("is_boiler").cast("double") / F.count(F.lit(1)), 6
            ).alias("boilerplate_frac"),
        )
    )


CURATION_FUNNEL_ORACLE = f"""
WITH verdict AS ({{filter_oracle}})
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN pass_quality THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass_quality,
       CAST(SUM(CASE WHEN pass_repetition THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass_repetition,
       CAST(SUM(CASE WHEN pass_length THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass_length,
       CAST(SUM(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT)
           AS n_canonical,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS keep_rate
FROM verdict
"""


@register(
    "curation_funnel",
    oracle=CURATION_FUNNEL_ORACLE.format(
        filter_oracle=FILTER_PIPELINE_ORACLE.format(stop=_STOP_SQL)
    ),
    tags=("text", "quality", "stats", "pipeline"),
    past_window=True,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter funnel every curation run logs: how many documents
    survive each verdict axis (quality, repetition, length, exact-dup
    canonicality) and the final keep rate — one row, the run-report
    companion to ``corpus_filter_pipeline`` exactly as
    ``mixture_composition`` is to the mixture.

    Pure aggregation over the composed verdict (booleans summed
    map-side; the only wide op is the verdict's own fingerprint
    shuffle), so the funnel costs one scan more than nothing when run
    beside the verdict itself. At 100 TB this is the dashboard number
    that catches a mis-tuned threshold BEFORE a training run consumes
    the corpus.
    """
    v = corpus_filter_pipeline(spark, sf_dir)
    b = lambda c: F.sum(F.col(c).cast("long")).alias(f"n_{c}")  # noqa: E731
    return v.agg(
        F.count(F.lit(1)).alias("n_docs"),
        b("pass_quality"),
        b("pass_repetition"),
        b("pass_length"),
        F.sum(F.col("is_canonical").cast("long")).alias("n_canonical"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.round(
            F.sum(F.col("keep").cast("long")).cast("double") / F.count(F.lit(1)), 6
        ).alias("keep_rate"),
    )


SQL_MIXTURE_SEED = "sqlmix-v1"

# Reuses the SAME CTE/key builders as TRAINING_MIXTURE_ORACLE — one
# source of truth for the md5-mixture SQL on the oracle side.
SQL_MIXTURE_ORACLE = f"""
WITH {_mix_cte_sql("documents", f"{SQL_MIXTURE_SEED}:mix")}
SELECT CAST(row_number() OVER (
           ORDER BY {_order_key_sql(f"{SQL_MIXTURE_SEED}:order")}, doc_id, epoch
       ) - 1 AS BIGINT) AS sample_idx,
       doc_id, source, epoch
FROM mix
"""


@register(
    "sql_mixture_surface",
    oracle=SQL_MIXTURE_ORACLE,
    tags=("sql", "mixing"),
    past_window=True,
)
def sql_mixture_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE weighted-mixture + training-order pipeline written by a
    SQL-only user: weight table as VALUES, epoch explode, the
    ``mix_u``/``sample_key`` macros (``functions/sql_macros.py``) for
    the keep decision and order key, and a window for the global
    position — no DataFrame code at all.

    Runs the same md5-derived semantics as ``training_mixture`` (same
    macros the engine itself uses, inlined into codegen), hash-checked
    against the DuckDB oracle — which is BUILT from the same
    ``_mix_cte_sql``/``_order_key_sql`` helpers as
    ``TRAINING_MIXTURE_ORACLE``, and the VALUES list below from the
    same ``_mix_weight_values_sql``, so neither side can drift from the
    engine's mixing recipe. The ``row_number`` total-order window is
    the SQL-surface simplification; the engine's ``training_order``
    computes the identical positions with a range-partitioned sort
    (plan-shape difference only — this query pins that the SEMANTICS
    are available from pure SQL).

    Lives in this module (not ``sql_macros``) because the oracle needs
    the module-level mix-SQL builders: building it at registration time
    from ``sql_macros`` would import a partially-initialized
    ``curation`` whenever a consumer imports ``functions.curation``
    first.
    """
    from gmall_flink_parent_spark.functions.sql_macros import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        f"""
        WITH w AS (
            SELECT * FROM VALUES {_mix_weight_values_sql()}
                AS w(source, n_full, frac)
        ),
        exploded AS (
            SELECT d.doc_id, d.source, CAST(e.epoch AS INT) AS epoch,
                   w.n_full, w.frac
            FROM documents_v d
            JOIN w USING (source)
            LATERAL VIEW explode(sequence(0, w.n_full)) e AS epoch
        ),
        mix AS (
            SELECT doc_id, source, epoch FROM exploded
            WHERE epoch < n_full
               OR mix_u('{SQL_MIXTURE_SEED}:mix', epoch, doc_id) < frac
        )
        SELECT CAST(row_number() OVER (
                   ORDER BY sample_key('{SQL_MIXTURE_SEED}:order', epoch, doc_id),
                            doc_id, epoch
               ) - 1 AS BIGINT) AS sample_idx,
               doc_id, source, epoch
        FROM mix
        """
    )
