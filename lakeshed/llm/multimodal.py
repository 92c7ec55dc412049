"""Multimodal columns — binary payloads with typed metadata.

Images/audio/video ride through the engine as opaque ``binary`` columns
plus a typed metadata struct; decode/feature-extraction runs in
Arrow-batched ``mapInPandas`` (the ONE place Python belongs: per-batch
codec work, 10-100× over row-at-a-time UDFs). The actual codecs (PIL,
ffmpeg, torchaudio) are not in this container, so the decode kernel is a
clearly-marked deterministic STUB — the Spark-side plumbing (schema,
batching, partition flow) is real and tested.

At 100 TB: binary payloads dominate row size, so the pattern is (1) keep
payloads OUT of shuffles — extract features first, join features later;
(2) size ``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits
executor memory; (3) push metadata-only predicates (mime, size) down to
parquet before any decode runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes int, checksum bigint, "
    "feature array<float>"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          mime: str = "application/octet-stream") -> DataFrame:
    """Test-fixture adapter: materialize a binary column (UTF-8 payload of
    the text) + metadata struct, the schema a real image/audio table has:
    (id, payload binary, meta struct<mime,byte_len>)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).alias("byte_len"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> list[float]:
    """STUB for the real codec. Deterministic fake 'embedding': byte-value
    histogram over 8 buckets, normalized. A real implementation would be
    e.g. PIL.Image.open(io.BytesIO(payload)) → resize → pixel tensor.
    """
    if payload is None:
        raise NotImplementedError("real decoder not available in this env")
    counts = [0] * 8
    for b in payload:
        counts[b >> 5] += 1
    total = max(len(payload), 1)
    return [round(c / total, 6) for c in counts]


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams column batches through Python once; the decode
    loop is per-batch vectorizable when the real codec supports it.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # NULL payload → NULL features, SQL-style (r11 review wave
            # 13: len(None) killed the whole job on one null row)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [None if m is None else m["mime"]
                             for m in pdf["meta"]],
                    "n_bytes": payloads.map(
                        lambda p: None if p is None else len(p)),
                    # cheap stand-in checksum: sum of bytes mod 2^31
                    "checksum": payloads.map(
                        lambda p: None if p is None
                        else sum(p) % (1 << 31)),
                    "feature": payloads.map(
                        lambda p: None if p is None else _decode_stub(p)),
                }
            )

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, payload binary, meta struct<mime:string, byte_len:int>"


def resize_payloads(df: DataFrame, target_bytes: int = 256) -> DataFrame:
    """'Resize' kernel — the image-thumbnail shape: payload in, smaller
    payload + refreshed metadata out, 1:1 rows, Arrow-batched.

    The codec being stubbed, resize = deterministic stride downsample of
    the byte stream to ``target_bytes`` (a real kernel would be
    PIL resize / ffmpeg scale). Payloads already small pass through;
    NULL payloads pass through as NULL (r11 review wave 13)."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(p: bytes) -> bytes | None:
                if p is None or len(p) <= target_bytes:
                    return p
                step = len(p) / target_bytes
                return bytes(p[int(i * step)] for i in range(target_bytes))

            out = pdf["payload"].map(shrink)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "meta": [
                        None if m is None and p is None
                        else {"mime": None if m is None else m["mime"],
                              "byte_len": None if p is None else len(p)}
                        for m, p in zip(pdf["meta"], out)
                    ],
                }
            )

    return df.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def sample_frames(df: DataFrame, frame_bytes: int = 64,
                  every_nth: int = 4) -> DataFrame:
    """Frame-sampling kernel — the video shape: one row in, 0..n frame
    rows out (``mapInPandas`` is the explode-capable Python boundary).

    The payload is treated as a concatenation of fixed-size frames
    (codec stub); every ``every_nth`` complete frame is emitted. Rows
    with fewer than one complete frame produce nothing. A real kernel
    would be ffmpeg keyframe extraction with the same batch shape. NULL
    payloads produce no frames (r11 review wave 13)."""
    if frame_bytes <= 0 or every_nth <= 0:
        raise ValueError(
            f"frame_bytes and every_nth must be positive, got "
            f"frame_bytes={frame_bytes}, every_nth={every_nth}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    continue
                n_frames = len(p) // frame_bytes
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(p[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(kernel, schema=FRAME_SCHEMA)
