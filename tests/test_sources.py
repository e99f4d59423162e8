"""JSONL corpus ingestion: pinned schema, corrupt-line quarantine,
n_chars derivation, gzip transparency, and the streaming twin."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from gmall_flink_parent_spark import plans  # noqa: F401  (import-order contract)
from gmall_flink_parent_spark.sources.documents import (
    read_documents_jsonl,
    split_corrupt,
)

_GOOD = [
    {"doc_id": 1, "text": "a b c", "lang": "en", "source": "src0", "n_chars": 5},
    {"doc_id": 2, "text": "d e", "lang": "en", "source": "src1"},  # no n_chars
]
_BAD_JSON = '{"doc_id": 3, "text": "broken'  # unterminated — parse failure
_BAD_NULL = {"doc_id": None, "text": "orphan"}  # parses, fails the contract


def _write_corpus(tmp_path, gz: bool = False) -> str:
    lines = [json.dumps(r) for r in _GOOD] + [_BAD_JSON, json.dumps(_BAD_NULL)]
    d = tmp_path / ("corpus_gz" if gz else "corpus")
    d.mkdir()
    if gz:
        with gzip.open(d / "part-0.jsonl.gz", "wt") as f:
            f.write("\n".join(lines))
    else:
        (d / "part-0.jsonl").write_text("\n".join(lines))
    return str(d)


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    raw = read_documents_jsonl(spark, _write_corpus(tmp_path))
    clean, quarantine = split_corrupt(raw)

    rows = {r["doc_id"]: r.asDict() for r in clean.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_chars"] == 5
    assert rows[2]["n_chars"] == len("d e")  # derived when absent
    assert clean.columns == ["doc_id", "text", "lang", "source", "n_chars"]

    q = quarantine.collect()
    assert len(q) == 2
    by_flag = {r["parse_failed"]: r["raw_line"] for r in q}
    assert by_flag[True] == _BAD_JSON  # the unparseable line, verbatim
    assert "orphan" in by_flag[False]  # the contract-failing parsed row


def test_jsonl_gzip_transparent(spark, tmp_path):
    clean, quarantine = split_corrupt(
        read_documents_jsonl(spark, _write_corpus(tmp_path, gz=True))
    )
    assert clean.count() == 2 and quarantine.count() == 2


def test_jsonl_streaming_twin_matches_batch(spark, tmp_path):
    """The readStream form over the same schema lands the same clean
    rows as the batch read — the front door of the ingest jobs."""
    path = _write_corpus(tmp_path)
    stream_clean, _ = split_corrupt(read_documents_jsonl(spark, path, streaming=True))
    assert stream_clean.isStreaming
    q = (
        stream_clean.writeStream.format("memory")
        .queryName("jsonl_ingest")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM jsonl_ingest").collect()
    }
    want = {
        tuple(r)
        for r in split_corrupt(read_documents_jsonl(spark, path))[0].collect()
    }
    assert got == want and len(want) == 2


def test_jsonl_feeds_the_engine(spark, tmp_path):
    """Clean JSONL rows satisfy the documents contract downstream — the
    chunker runs unchanged on them."""
    from gmall_flink_parent_spark.functions.chunks import chunk_windows_frame

    clean, _ = split_corrupt(read_documents_jsonl(spark, _write_corpus(tmp_path)))
    chunks = chunk_windows_frame(clean.select("doc_id", "text"))
    assert chunks.count() == 2  # one short chunk per doc
    assert chunks.filter(F.col("chunk_id").isNull()).count() == 0


def test_range_clustered_write_prunes_from_footers(spark, sf_dir, tmp_path):
    """The clustered layout must make footer min/max ranges (a) cover
    the same rows, (b) be pairwise near-disjoint on the cluster key,
    and (c) let a selective time predicate skip most files — while the
    arrival-order layout skips none. This is the pruning contract a
    100 TB reader depends on, proved from the actual parquet metadata."""
    from gmall_flink_parent_spark.sources.layout import (
        footer_ranges,
        pruned_fraction,
        write_range_clustered,
    )
    from gmall_flink_parent_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    clustered, arrival = str(tmp_path / "clustered"), str(tmp_path / "arrival")
    write_range_clustered(events, clustered, ["ts"], n_files=8)
    events.repartition(8).write.mode("overwrite").parquet(arrival)

    # same rows either way
    assert (
        spark.read.parquet(clustered).orderBy("event_id").collect()
        == events.orderBy("event_id").collect()
    )

    cr = footer_ranges(clustered, "ts")
    ar = footer_ranges(arrival, "ts")
    assert len(cr) == 8 and len(ar) == 8
    # clustered: ranges pairwise disjoint up to the boundary value
    cr_sorted = sorted(cr)
    overlaps = sum(1 for a, b in zip(cr_sorted, cr_sorted[1:]) if b[0] < a[1])
    assert overlaps == 0, cr_sorted
    # a one-day slice in the middle of the 30-day span
    lo = events.selectExpr("timestamp'2024-01-15 00:00:00'").first()[0]
    hi = events.selectExpr("timestamp'2024-01-16 00:00:00'").first()[0]
    assert pruned_fraction(cr, lo, hi) >= 0.75
    assert pruned_fraction(ar, lo, hi) == 0.0


def test_zorder_write_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering must buy REAL footer pruning on BOTH keys —
    the property single-key clustering cannot have (its second key's
    ranges span the table) — while preserving the rows exactly."""
    from gmall_flink_parent_spark.sources.layout import (
        footer_ranges,
        pruned_fraction,
        write_range_clustered,
        write_zorder_clustered,
    )
    from gmall_flink_parent_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    zpath, tpath = str(tmp_path / "zorder"), str(tmp_path / "ts_only")
    write_zorder_clustered(events, zpath, "ts", "user_id", n_files=16)
    write_range_clustered(events, tpath, ["ts"], n_files=16)

    assert (
        spark.read.parquet(zpath).orderBy("event_id").collect()
        == events.orderBy("event_id").collect()
    )

    ts_lo = events.selectExpr("timestamp'2024-01-14 00:00:00'").first()[0]
    ts_hi = events.selectExpr("timestamp'2024-01-17 00:00:00'").first()[0]
    zr_ts = footer_ranges(zpath, "ts")
    zr_uid = footer_ranges(zpath, "user_id")
    # both dimensions prune meaningfully under z-order...
    assert pruned_fraction(zr_ts, ts_lo, ts_hi) >= 0.25
    assert pruned_fraction(zr_uid, 10, 20) >= 0.25
    # ...whereas ts-only clustering prunes ts well and user_id not at all
    tr_uid = footer_ranges(tpath, "user_id")
    assert pruned_fraction(tr_uid, 10, 20) == 0.0


def _write_warc(path, records, gz=False):
    """records: list of (warc_type, uri, payload bytes)."""
    import gzip

    buf = b""
    for wtype, uri, payload in records:
        hdr = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {wtype}\r\n".encode()
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        buf += hdr + payload + b"\r\n\r\n"
    if gz:
        with gzip.open(path, "wb") as fh:
            fh.write(buf)
    else:
        with open(path, "wb") as fh:
            fh.write(buf)


def test_warc_source_reads_plain_and_gzip_per_file_partitions(spark, tmp_path):
    """The warclite DataSource must parse the WARC/1.0 grammar from
    plain AND gzipped archives, keep binary payloads byte-exact, and
    plan exactly one input partition per archive file — the crawl
    container's parallelism unit."""
    from gmall_flink_parent_spark.sources.warc import register_warc_source

    d = tmp_path / "crawl"
    d.mkdir()
    _write_warc(
        str(d / "seg-0.warc"),
        [
            ("warcinfo", "", b"crawler=test"),
            ("response", "http://a.example/x", b"hello world \xff\xfe raw"),
            ("response", "http://a.example/y", b"second doc"),
        ],
    )
    _write_warc(
        str(d / "seg-1.warc.gz"),
        [("response", "http://b.example/z", b"gzipped doc body")],
        gz=True,
    )
    register_warc_source(spark)
    df = spark.read.format("warclite").option("path", str(d)).load()
    assert df.rdd.getNumPartitions() == 2
    rows = sorted(
        (r.warc_file, r.record_seq, r.warc_type, r.target_uri, bytes(r.payload))
        for r in df.collect()
    )
    assert rows == [
        ("seg-0.warc", 0, "warcinfo", "", b"crawler=test"),
        ("seg-0.warc", 1, "response", "http://a.example/x", b"hello world \xff\xfe raw"),
        ("seg-0.warc", 2, "response", "http://a.example/y", b"second doc"),
        ("seg-1.warc.gz", 0, "response", "http://b.example/z", b"gzipped doc body"),
    ]


def test_warc_documents_bridge_feeds_text_heads(spark, tmp_path):
    """load_warc_documents maps response records to the documents
    schema (stable md5 doc_ids, replacement-decoded text) so the
    existing text pipeline runs on crawl data unchanged."""
    from gmall_flink_parent_spark.functions.curation import corpus_token_projection
    from gmall_flink_parent_spark.sources.warc import load_warc_documents

    d = tmp_path / "crawl"
    d.mkdir()
    _write_warc(
        str(d / "seg-0.warc"),
        [
            ("response", "http://a/x", b"alpha beta gamma"),
            ("warcinfo", "", b"skipped"),
            ("response", "http://a/y", b"bad \xff utf8 here"),
        ],
    )
    docs = load_warc_documents(spark, str(d))
    rows = {r.text: r for r in docs.collect()}
    assert set(rows) == {"alpha beta gamma", "bad � utf8 here"}
    assert all(r.source == "seg-0.warc" and r.lang == "und" for r in rows.values())
    assert len({r.doc_id for r in rows.values()}) == 2
    # re-read gives identical doc_ids (stability contract)
    again = {r.text: r.doc_id for r in load_warc_documents(spark, str(d)).collect()}
    assert {t: r.doc_id for t, r in rows.items()} == again
    # the standard text projection runs on it unchanged
    proj = corpus_token_projection(docs).collect()
    assert {p.n_tokens for p in proj} == {3, 4}


def test_warc_source_fails_loudly_on_corrupt_magic(spark, tmp_path):
    from gmall_flink_parent_spark.sources.warc import register_warc_source

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "bad.warc").write_bytes(b"NOT-A-WARC\r\n\r\n")
    register_warc_source(spark)
    df = spark.read.format("warclite").option("path", str(d)).load()
    import pytest as _pt

    with _pt.raises(Exception, match="bad WARC magic|PythonException|ValueError"):
        df.collect()


def test_warc_source_recursive_dirs_and_glob(spark, tmp_path):
    """Crawl drops arrive as nested dump/segment trees; the reader must
    walk them (and accept globs), and two segments with the SAME
    basename in different subdirs must keep distinct archive names —
    doc_id derives from (name, seq) and must not collide."""
    from gmall_flink_parent_spark.sources.warc import (
        load_warc_documents,
        register_warc_source,
    )

    d = tmp_path / "crawl"
    (d / "2024-10").mkdir(parents=True)
    (d / "2024-18" / "sub").mkdir(parents=True)
    _write_warc(
        str(d / "2024-10" / "part-0.warc"), [("response", "u://a", b"dump ten")]
    )
    _write_warc(
        str(d / "2024-18" / "sub" / "part-0.warc"),
        [("response", "u://b", b"dump eighteen")],
    )
    register_warc_source(spark)
    df = spark.read.format("warclite").option("path", str(d)).load()
    names = sorted(r.warc_file for r in df.collect())
    assert names == ["2024-10/part-0.warc", "2024-18/sub/part-0.warc"]
    # same-basename segments produce distinct doc_ids through the bridge
    docs = load_warc_documents(spark, str(d)).collect()
    assert len({r.doc_id for r in docs}) == 2
    # glob form resolves the same tree, names relative to the static prefix
    dfg = (
        spark.read.format("warclite")
        .option("path", str(d / "**" / "*.warc"))
        .load()
    )
    assert sorted(r.warc_file for r in dfg.collect()) == names
    # direct-file form
    df1 = (
        spark.read.format("warclite")
        .option("path", str(d / "2024-10" / "part-0.warc"))
        .load()
    )
    assert [r.warc_file for r in df1.collect()] == ["part-0.warc"]


def test_warc_quarantine_mode_counts_and_skips_mid_archive_dirt(spark, tmp_path):
    """One corrupt crawl segment must not kill the ingest: quarantine
    mode salvages the records around mid-archive dirt (resync to the
    next WARC/ magic), counts the loss per archive — clean archives
    included at count 0 — and keeps strict mode's loud failure."""
    import pytest as _pt

    from gmall_flink_parent_spark.sources.warc import (
        load_warc_documents,
        register_warc_source,
        warc_quarantine_counts,
    )

    d = tmp_path / "crawl"
    d.mkdir()
    # archive 1: good record, garbage blob, good record, truncated tail
    good1 = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u://a\r\n"
        b"Content-Length: 5\r\n\r\nfirst\r\n\r\n"
    )
    garbage = b"}} random mid-archive dirt, not a record\r\nmore dirt\r\n"
    good2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u://b\r\n"
        b"Content-Length: 6\r\n\r\nsecond\r\n\r\n"
    )
    truncated = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u://c\r\n"
        b"Content-Length: 9999\r\n\r\nshort"
    )
    (d / "dirty.warc").write_bytes(good1 + garbage + good2 + truncated)
    _write_warc(str(d / "clean.warc"), [("response", "u://d", b"fine")])
    register_warc_source(spark)
    # strict (default): the dirty archive fails the read
    with _pt.raises(Exception, match="bad WARC magic|PythonException|ValueError"):
        spark.read.format("warclite").option("path", str(d)).load().collect()
    # quarantine: salvages both good records, counts 2 malformed
    raw = (
        spark.read.format("warclite")
        .option("path", str(d))
        .option("mode", "quarantine")
        .load()
    )
    rows = raw.collect()
    responses = sorted(
        bytes(r.payload) for r in rows if r.warc_type == "response"
    )
    assert responses == [b"fine", b"first", b"second"]
    counts = {
        r.warc_file: r.n_malformed
        for r in warc_quarantine_counts(raw).collect()
    }
    assert counts == {"dirty.warc": 2, "clean.warc": 0}
    # the documents bridge passes the mode through; summaries never leak
    docs = load_warc_documents(spark, str(d), mode="quarantine").collect()
    assert sorted(r.text for r in docs) == ["fine", "first", "second"]
    # bad mode string fails fast
    with _pt.raises(Exception, match="strict|quarantine"):
        spark.read.format("warclite").option("path", str(d)).option(
            "mode", "lenient"
        ).load().collect()


def test_warc_parser_rejects_truncated_payload():
    """Pure-parser contract: a Content-Length that overruns the file
    fails loudly with the record offset, never yields a short row."""
    import io

    import pytest as _pt

    from gmall_flink_parent_spark.sources.warc import _iter_warc_records

    raw = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99\r\n\r\nshort"
    with _pt.raises(ValueError, match="record 0: truncated payload"):
        list(_iter_warc_records(io.BytesIO(raw)))


def test_warc_quarantine_counts_bad_content_length_record_once():
    """One physical record with an unparseable Content-Length must count
    as ONE malformed entry, even though its unconsumed payload forces a
    resync scan — the scan belongs to the same physical record. Records
    on both sides survive. (A payload line that itself starts with
    'WARC/' can still resync early — inherent to magic-line framing and
    documented as approximate; this pins the common no-bait case.)"""
    import io

    from gmall_flink_parent_spark.sources.warc import _iter_warc_records

    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4\r\n\r\ngood\r\n\r\n"
        # bad Content-Length; multi-line payload left unconsumed in the
        # stream, so the resync scanner must swallow it without counting
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
        b"junk payload line one\r\njunk line two\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 5\r\n\r\nafter\r\n\r\n"
    )
    stats: dict = {}
    recs = list(_iter_warc_records(io.BytesIO(raw), strict=False, stats=stats))
    assert [bytes(p) for _, _, p in recs] == [b"good", b"after"]
    assert stats["malformed"] == 1


def test_warc_gzip_per_record_members(spark, tmp_path):
    """Common Crawl frames ONE gzip member per record; Python's gzip
    reads concatenated members transparently, so the reader must parse
    that framing identically to a single-member archive."""
    import gzip

    from gmall_flink_parent_spark.sources.warc import register_warc_source

    d = tmp_path / "crawl"
    d.mkdir()
    recs = [("response", "http://a/1", b"one"), ("response", "http://a/2", b"two")]
    with open(str(d / "seg.warc.gz"), "wb") as fh:
        for wtype, uri, payload in recs:
            member = (
                b"WARC/1.0\r\n"
                + f"WARC-Type: {wtype}\r\nWARC-Target-URI: {uri}\r\n".encode()
                + f"Content-Length: {len(payload)}\r\n\r\n".encode()
                + payload
                + b"\r\n\r\n"
            )
            fh.write(gzip.compress(member))
    register_warc_source(spark)
    df = spark.read.format("warclite").option("path", str(d)).load()
    rows = sorted((r.record_seq, r.target_uri, bytes(r.payload)) for r in df.collect())
    assert rows == [(0, "http://a/1", b"one"), (1, "http://a/2", b"two")]


# ---------------------------------------------- load_table handle cache


def test_load_table_handle_cache_hits_and_invalidates(spark, sf_dir, tmp_path):
    """r14: load_table memoizes the PLAN HANDLE per (session, path, file
    signature) — ~130 ms of re-planning per call on the bench path. The
    cache must (a) return the same lazy frame for an unchanged path,
    (b) drop the handle the moment the file's bytes change (tests
    rewrite corpora in place), and (c) never leak rows: a rewritten
    path must be re-read from disk."""
    import shutil

    from gmall_flink_parent_spark.sources import tables

    a = tables.load_table(spark, sf_dir, "nation")
    b = tables.load_table(spark, sf_dir, "nation")
    assert a is b, "unchanged path must hit the handle cache"

    work = tmp_path / "nation.parquet"
    shutil.copy(f"{sf_dir}/nation.parquet", work)
    c1 = tables.load_table(spark, str(tmp_path), "nation")
    n_full = c1.count()
    assert n_full == 25
    assert c1 is not a, "different path must not share a handle"

    # rewrite the file with a 1-row slice: new (mtime, size) signature
    import pyarrow.parquet as pq

    t = pq.read_table(str(work))
    pq.write_table(t.slice(0, 1), str(work))
    c2 = tables.load_table(spark, str(tmp_path), "nation")
    assert c2 is not c1, "rewritten file must invalidate the handle"
    assert c2.count() == 1, "fresh handle must read the rewritten bytes"
