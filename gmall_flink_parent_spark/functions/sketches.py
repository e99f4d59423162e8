"""Count-min sketch over the word-4-gram space: bounded-size counters
for an UNBOUNDED key domain.

Not in the reference (its aggregations are keyed by small dimensions,
SURVEY §2.6): the third member of the engine's mergeable-sketch family
— HLL bounds distinct-counting state (``approx_dau_by_day``), GK
bounds quantile state (``doc_length_quantiles_approx``), and the CMS
here bounds FREQUENCY counting when the key space is unbounded. Token
vocabularies are small enough to count exactly (``vocab_top_tokens``'s
map-side-combined wordcount shuffles ~|vocab| rows — fine), but the
4-gram space grows with the corpus: the exact gram-df aggregate behind
``doc_boilerplate_fraction`` shuffles one row per DISTINCT GRAM, which
at 100 TB of web text is billions of keys. The CMS replaces that with
``d × w`` integer counters: every partition's partial aggregate is at
most d·w rows no matter how many grams it saw, the shuffle carries
≤ #partitions · d · w rows TOTAL, and merged counters answer
frequency queries with one-sided error (estimate ≥ truth, over by at
most εN with probability 1−δ; Cormode & Muthukrishnan 2005).

Everything is md5-derived and integer, so DuckDB reproduces the
counters AND the estimates bit-for-bit — the sketch is oracle-backed,
not rows-only: determinism of the sketch CONTENT is part of the
contract (a re-run or a re-partitioning lands the identical sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_parent_spark.functions.curation import _CONTAM_N, contamination_shingles
from gmall_flink_parent_spark.functions.selection import _H32_DUCK, _h32
from gmall_flink_parent_spark.plans.registry import register
from gmall_flink_parent_spark.sources.tables import fan_out, load_table

_CMS_D = 4  # hash rows
_CMS_W = 512  # counters per row
_CMS_PROBE_MOD = 97  # probe grams come from docs with doc_id % 97 == 0


def cms_counters(sh: DataFrame) -> DataFrame:
    """(i, cell, n) count-min counters over a (doc_id, g) frame.

    Each gram instance increments one cell per hash row; the groupBy
    (i, cell) is map-side combined, so a partition contributes at most
    ``d·w`` partial rows REGARDLESS of how many grams it scanned —
    that bound, not the gram count, sizes the shuffle. Cell hashes are
    ``hash32('cms<i>:' || g) % w`` (the engine-portable md5 primitive),
    making the merged counter table deterministic at any parallelism.
    """
    inst = sh.select(
        "g", F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("i")
    )
    cell = (
        _h32(F.concat(F.lit("cms"), F.col("i").cast("string"), F.lit(":"), F.col("g")))
        % _CMS_W
    )
    return inst.groupBy("i", cell.alias("cell")).agg(
        F.count(F.lit(1)).alias("n")
    )


GRAM_CMS_ORACLE = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n
    FROM documents
), sh AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN n >= {_CONTAM_N} THEN list_transform(
            range(1, n - {_CONTAM_N - 2}),
            i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2], toks[i + 3]))
        ELSE [] END)) AS g
    FROM t
), inst AS (
    SELECT g, CAST(t2.i AS BIGINT) AS i FROM sh, unnest(range({_CMS_D})) AS t2(i)
), counters AS (
    SELECT i,
           {_H32_DUCK.format(x="concat('cms', CAST(i AS VARCHAR), ':', g)")} % {_CMS_W}
               AS cell,
           COUNT(*) AS n
    FROM inst GROUP BY 1, 2
), probe AS (
    SELECT DISTINCT g FROM sh WHERE doc_id % {_CMS_PROBE_MOD} = 0
), est AS (
    SELECT p.g, MIN(c.n) AS cms_df
    FROM probe p
    JOIN counters c
      ON c.cell = {_H32_DUCK.format(x="concat('cms', CAST(c.i AS VARCHAR), ':', p.g)")}
               % {_CMS_W}
    GROUP BY p.g
)
SELECT g, CAST(cms_df AS BIGINT) AS cms_df FROM est
"""


@register(
    "gram_df_cms_estimate",
    oracle=GRAM_CMS_ORACLE,
    tags=("text", "sketch", "approx"),
    past_window=True,
)
def gram_df_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch document-frequency estimates for a probe set of
    grams — the 100 TB form of the exact gram-df aggregate behind
    ``doc_boilerplate_fraction``.

    Build: one scan → doc-local distinct grams → d hash rows per
    instance → map-side-combined (i, cell) counters, shuffle bounded
    by ``#partitions · d · w`` rows (never by the gram count). Query:
    the probe grams (here the deterministic ``doc_id % 97 == 0``
    slice's grams, standing in for whatever gram set a curation run
    interrogates) join the ≤ d·w-row counter table per hash row and
    take the row-wise MIN — the CMS estimate, ≥ the true df always and
    within εN with probability 1−δ (ε = e/w, δ = e^−d). Counters and
    estimates are md5-derived integers, so the sketch is HASH-CHECKED
    against DuckDB — re-runs and re-partitionings land the identical
    sketch, which is what makes an approximate answer auditable. The
    one-sided-error invariant (estimate ≥ exact df for every probe
    gram) is pinned in ``tests/test_operators.py``.
    """
    # contamination_shingles is already distinct-per-doc (the _ngrams
    # core array_distincts DOC-LOCALLY — df semantics cost zero shuffle)
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    sh = contamination_shingles(docs)
    counters = cms_counters(sh)
    probe = (
        sh.filter(F.col("doc_id") % _CMS_PROBE_MOD == 0).select("g").distinct()
    )
    # each probe gram pre-computes its d (i, cell) lookup keys so the
    # counter lookup is a plain broadcast EQUI-join on (i, cell) — not
    # a nested-loop over the counter table
    probe_cells = probe.select(
        "g",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (
                            _h32(F.concat(F.lit(f"cms{i}:"), F.col("g")))
                            % _CMS_W
                        ).alias("cell"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("g", F.col("p.i").alias("i"), F.col("p.cell").alias("cell"))
    joined = probe_cells.join(F.broadcast(counters), ["i", "cell"])
    return joined.groupBy("g").agg(F.min("n").cast("long").alias("cms_df"))
