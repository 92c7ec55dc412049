"""Structured-Streaming changelog ingestion (SURVEY §2.9, §3.3).

The Spark-first rebuild of the reference's Flink jobs
(``src/main/java/com/arecadata/clickstream/IcebergStream.java``,
``PaimonStream.java``): unbounded source → malformed-record filter →
typed changelog parse → continuously-merged table state, with micro-batch
triggers playing the role of Flink checkpoint barriers (T1/T2).
"""

from lakeshed.streaming.changelog import (  # noqa: F401
    changelog_upsert,
    diff_versions,
    parse_changelog,
    rate_changelog_source,
    socket_lines,
    windowed_rollup,
)
from lakeshed.streaming.stateful import (  # noqa: F401
    sessionize_batch,
    sessionize_stream,
    with_flush_sentinels,
)
