"""Multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; decode / feature-extract run as Arrow-batched
``mapInPandas`` stages. The container has no image/audio libraries, so
the decode kernel is STUBBED (``decode_media`` raises
``NotImplementedError`` for real codecs and provides a deterministic
fake for tests) — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested.

The test corpus has no binary column, so ``documents.text`` is encoded
to UTF-8 bytes to stand in for a media payload.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_parent_spark.plans.registry import register
from gmall_flink_parent_spark.sources.tables import load_table

# byte i (1-based) of the payload, recovered from the hex dump — the
# engine-neutral way to read binary content in the oracle
_BYTE_AT = "CAST(concat('0x', substr(hex(encode(text)), 2*{i} - 1, 2)) AS BIGINT)"

MULTIMODAL_META_FEATURES_ORACLE = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       substr(hex(encode(text)), 1, 8) AS head_hex,
       'text/plain' AS mime,
       CAST(CASE WHEN octet_length(encode(text)) = 0 THEN -1
                 ELSE {_BYTE_AT.format(i=1)} END AS INTEGER) AS first_byte,
       CAST(COALESCE(list_sum(list_transform(
                range(1, least(octet_length(encode(text)), 256) + 1),
                i -> {_BYTE_AT.format(i="i")})), 0) % 997 AS INTEGER) AS byte_sum_mod
FROM documents
"""


@register(
    "multimodal_meta_features",
    oracle=MULTIMODAL_META_FEATURES_ORACLE,
    tags=("multimodal",),
)
def multimodal_meta_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata (JVM-side) + decode features (Arrow ``mapInPandas``)
    over an opaque binary payload column, one row per media item.

    Byte length and magic-prefix sniffing happen JVM-side on the binary
    column — the pattern for routing media rows to per-codec decode
    stages without touching Python; the feature columns then ride the
    Arrow batch through the stubbed decode kernel (``decode_media``).
    The oracle recomputes the fake-decode's byte stats from the hex dump
    (engine-neutral binary access), so the whole pipeline — including
    the Python stage — is hash-checked, not rows-only.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    meta = docs.select(
        "doc_id",
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.substring(F.hex(payload), 1, 8).alias("head_hex"),
        F.lit("text/plain").alias("mime"),
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode_media(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
            out = pdf[["doc_id", "n_bytes", "head_hex", "mime"]].copy()
            out["first_byte"] = pd.Series(
                [f["first_byte"] for f in feats], index=pdf.index, dtype="int32"
            )
            out["byte_sum_mod"] = pd.Series(
                [f["byte_sum_mod"] for f in feats], index=pdf.index, dtype="int32"
            )
            yield out

    return meta.mapInPandas(
        extract,
        "doc_id long, n_bytes long, head_hex string, mime string, "
        "first_byte int, byte_sum_mod int",
    )


def decode_media(payload: bytes, mime: str) -> dict:
    """Decode kernel stub.

    Real codecs (PIL / libav / soundfile) are not in this container —
    STUB: any real media mime raises. ``text/plain`` gets a
    deterministic fake "decode" (byte stats standing in for pixels /
    samples) so the distributed plumbing is exercised end-to-end.
    """
    if mime != "text/plain":
        raise NotImplementedError(
            f"decode for {mime!r} requires media libraries not present in this "
            "container; plug a real kernel into extract_media_features"
        )
    n = len(payload)
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else -1,
        "byte_sum_mod": sum(payload[:256]) % 997,
    }


def extract_media_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``mapInPandas`` keeps batches columnar through Arrow; each batch is
    decoded in Python once per ~10k rows, not per row. Output schema is
    fixed and typed, so downstream stages stay relational. Partitioning
    is inherited from the scan — no shuffle is introduced.
    """

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode_media(p, m) for p, m in zip(pdf[payload_col], pdf["mime"])]
            out = pd.DataFrame(feats)
            out["doc_id"] = pdf["doc_id"].values
            yield out[["doc_id", "n_bytes", "first_byte", "byte_sum_mod"]]

    return df.mapInPandas(
        extract, "doc_id long, n_bytes long, first_byte int, byte_sum_mod int"
    )


N_FRAMES = 4


def sample_frames(payload: bytes, mime: str, n_frames: int = N_FRAMES) -> list[bytes]:
    """Frame-sampling kernel stub.

    Real video decode (libav/ffmpeg) is not in this container — STUB:
    real media mimes raise. ``text/plain`` payloads are sliced into
    ``n_frames`` deterministic chunks standing in for sampled frames, so
    the fan-out plumbing (one row in, N typed rows out) is exercised.
    """
    if mime != "text/plain":
        raise NotImplementedError(
            f"frame sampling for {mime!r} requires media libraries not present "
            "in this container; plug a real decoder into frame_sample_rows"
        )
    if not payload:
        return [b""] * n_frames
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)]


def resize_frame(frame: bytes, target: int = 16) -> bytes:
    """Resize kernel stub: deterministic downsample of the byte stream
    (every k-th byte to ``target`` length) standing in for pixel
    interpolation. Real codecs raise upstream in ``sample_frames``."""
    if len(frame) <= target:
        return frame
    step = len(frame) / target
    return bytes(frame[int(i * step)] for i in range(target))


def frame_sample_rows(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """One media row → N (frame_idx, frame, thumb) rows via mapInPandas.

    The fan-out shape of every video pipeline: frames multiply row
    counts N×, so this stage runs *after* any filtering and the output
    carries only (id, idx, bytes) — never the source payload. Arrow
    batches keep the bytes columnar; partitioning is inherited from the
    scan, no shuffle.
    """

    def explode_frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": [], "thumb": []}
            for doc_id, payload, mime in zip(
                pdf["doc_id"], pdf[payload_col], pdf["mime"]
            ):
                for i, fr in enumerate(sample_frames(payload, mime)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(fr)
                    out["thumb"].append(resize_frame(fr))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        explode_frames, "doc_id long, frame_idx int, frame binary, thumb binary"
    )


# Frame-slice arithmetic mirrored into SQL: step = max(L // N, 1);
# frame i = payload[i*step : (i+1)*step]  (length clamp(L - i*step, 0, step));
# thumb = frame downsampled to ≤16 bytes. The oracle reads frame content
# through the payload hex dump, so the mapInPandas fan-out — Python
# kernel included — is hash-checked end to end.
FRAME_SAMPLE_ORACLE = f"""
WITH p AS (
    SELECT doc_id,
           hex(encode(text)) AS hx,
           octet_length(encode(text)) AS L,
           greatest(octet_length(encode(text)) // {N_FRAMES}, 1) AS step
    FROM documents
), f AS (
    SELECT doc_id, hx, L, step, unnest(range({N_FRAMES})) AS frame_idx FROM p
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(least(greatest(L - frame_idx * step, 0), step) AS BIGINT) AS frame_len,
       substr(hx, 2 * frame_idx * step + 1,
              least(least(greatest(L - frame_idx * step, 0), step) * 2, 8))
           AS frame_head_hex,
       CAST(least(least(greatest(L - frame_idx * step, 0), step), 16) AS BIGINT)
           AS thumb_len
FROM f
"""


@register("multimodal_frame_sample", oracle=FRAME_SAMPLE_ORACLE, tags=("multimodal",))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling + thumbnail resize over binary payloads.

    N deterministic frames per document with a resized thumb each — the
    decode kernel is stubbed (container has no media libs), the
    distributed fan-out (``frame_sample_rows``: one row in, N typed rows
    out through Arrow) is real. The registered output is the frames'
    byte stats (length + head hex + thumb length) computed JVM-side from
    the actual binary frames, which a hex/length-math oracle reproduces
    — hash-checked, not rows-only; the raw binary rows are value-pinned
    in ``tests/test_operators.py``.
    """
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )
    frames = frame_sample_rows(with_payload)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame").cast("long").alias("frame_len"),
        F.substring(F.hex("frame"), 1, 8).alias("frame_head_hex"),
        F.length("thumb").cast("long").alias("thumb_len"),
    )
