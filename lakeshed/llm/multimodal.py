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
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len).astype("int32"),
                    # cheap stand-in checksum: sum of bytes mod 2^31
                    "checksum": payloads.map(
                        lambda p: sum(p) % (1 << 31)
                    ).astype("int64"),
                    "feature": payloads.map(_decode_stub),
                }
            )

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)
