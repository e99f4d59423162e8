"""Text analysis for large-scale training-data pipelines.

Not in the reference (its string surface is listed in SURVEY §2.7); these
are the first-class text operators a 100 TB document pipeline needs:
token counting, quality scoring, language ID, document fingerprinting.
All are per-row, shuffle-free, and stay JVM-side via higher-order array
functions (``transform``/``filter``/``aggregate``) — no Python in the row
path, so they run inside whole-stage codegen at full scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_parent_spark.plans.registry import register
from gmall_flink_parent_spark.sources.tables import load_table

# Stopword list for quality / language heuristics (tiny, broadcast as a
# literal into the plan). Lives in the leaf module ``stopwords`` so
# sibling modules can import it without the plans-package init cycle.
from gmall_flink_parent_spark.functions.stopwords import _STOP_SQL, STOPWORDS  # noqa: E402,F401


def tokens(col: str = "text") -> Column:
    """Whitespace tokenizer as a JVM-side expression."""
    return F.split(F.col(col), " ")


TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
       ROUND(CAST(list_sum(list_transform(string_split(text, ' '), t -> strlen(t))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS avg_token_len,
       ROUND(CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL}))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS stopword_ratio
FROM documents
"""


@register("doc_token_stats", oracle=TOKEN_STATS_ORACLE, tags=("text",))
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count, distinct tokens, mean token length, stopword ratio.

    Built entirely from higher-order array functions — per-document, no
    explode, no shuffle: at 100 TB this is a pure map stage over the
    parquet scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    n_tokens = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_tokens"),
        F.round(sum_len.cast("double") / n_tokens, 6).alias("avg_token_len"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
    )


QUALITY_ORACLE = f"""
SELECT doc_id,
       ROUND(
         0.4 * least(len(string_split(text, ' ')), 200) / 200.0
       + 0.3 * least(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')), 1.0)
       + 0.3 * least(CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL}))) AS DOUBLE)
                     / len(string_split(text, ' ')) * 5.0, 1.0)
       , 6) AS quality_score
FROM documents
"""


@register("doc_quality_score", oracle=QUALITY_ORACLE, tags=("text",))
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score ∈ [0,1]: length + lexical diversity + stopword signal.

    Linear combination only (no transcendentals) so the score is
    bit-identical across engines; weights follow common web-corpus
    quality filters (length cap, type/token ratio, stopword presence).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    n = F.size(toks)
    uniq_ratio = F.least(F.size(F.array_distinct(toks)).cast("double") / n, F.lit(1.0))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double") / n
    score = (
        F.lit(0.4) * F.least(n, F.lit(200)) / F.lit(200.0)
        + F.lit(0.3) * uniq_ratio
        + F.lit(0.3) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    )
    return docs.select("doc_id", F.round(score, 6).alias("quality_score"))


LANG_ID_ORACLE = f"""
SELECT doc_id,
       lang AS lang_label,
       CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_SQL}))) AS DOUBLE)
                 / len(string_split(text, ' ')) >= 0.05
            THEN 'en' ELSE 'und' END AS lang_pred
FROM documents
"""


@register("doc_lang_id", oracle=LANG_ID_ORACLE, tags=("text",))
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram-heuristic family).

    Real deployments score character n-grams against per-language
    profiles; the decision layer is identical — a ratio against marker
    sets with a threshold — and that layer is what's implemented and
    oracle-checked here. Marker lists per language plug into the same
    expression.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double") / F.size(toks)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        F.when(ratio >= 0.05, "en").otherwise("und").alias("lang_pred"),
    )


# BPE-style pre-tokenizer classes, ASCII-only so Java regex (Spark) and
# RE2 (DuckDB) agree byte-for-byte: word runs, digit runs, punct runs.
_BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"

BPE_TOKEN_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT) AS n_pieces,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_word_pieces,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num_pieces,
       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]+')) AS BIGINT) AS n_other_pieces
FROM documents
"""


@register("doc_bpe_token_count", oracle=BPE_TOKEN_ORACLE, tags=("text", "tokenize"))
def doc_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counts (regex pieces, not whitespace).

    Tokenizer-aware budgeting needs piece counts, not word counts: the
    pattern splits word runs / digit runs / symbol runs the way BPE
    pre-tokenizers (GPT-2 family) do before merges. Pure regex on the
    scan — per-row, shuffle-free, whole-stage codegen. A real vocab's
    merge table would drop in as a Pandas-UDF stage downstream; the
    budget signal (piece counts) is what this query pins.
    """
    docs = load_table(spark, sf_dir, "documents")

    def n_matches(pat: str) -> Column:
        return F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)")).cast("long")

    return docs.select(
        "doc_id",
        n_matches(_BPE_PAT).alias("n_pieces"),
        n_matches("[A-Za-z]+").alias("n_word_pieces"),
        n_matches("[0-9]+").alias("n_num_pieces"),
        n_matches("[^A-Za-z0-9 ]+").alias("n_other_pieces"),
    )


FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(lower(trim(text))) AS fingerprint,
       substr(md5(lower(trim(text))), 1, 8) AS fingerprint_prefix
FROM documents
"""


@register("doc_fingerprint", oracle=FINGERPRINT_ORACLE, tags=("text", "dedup"))
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 over normalized text.

    The cheap exact-dup key — used by ``dedup_exact`` as its grouping
    hash. md5 hex is identical across Spark and DuckDB, making the
    fingerprint portable between engines (unlike xxhash64/hash()).
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fingerprint_prefix"),
    )
