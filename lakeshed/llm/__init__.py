"""LLM-data-pipeline operators (BASELINE.json mandate, beyond SURVEY §2).

Everything a large-scale training-data pipeline runs over a corpus —
deduplication, similarity search, text analysis, multimodal plumbing —
expressed as pure-Catalyst plans wherever possible (``pyspark.sql.functions``
higher-order functions keep the hot path JVM-side; Pandas UDFs appear only
at the multimodal decode boundary where real codecs would live).

Modules:
- :mod:`lakeshed.llm.text` — token counts, quality scoring, language ID,
  fingerprinting.
- :mod:`lakeshed.llm.dedup` — exact, MinHash-LSH, SimHash, n-gram Jaccard.
- :mod:`lakeshed.llm.similarity` — cosine top-k (brute force + LSH-bucketed).
- :mod:`lakeshed.llm.multimodal` — binary-column schema + stubbed decode.
- :mod:`lakeshed.llm.queries` — CORRECTNESS registry entries.
"""

from lakeshed.llm import dedup, multimodal, sampling, similarity, text  # noqa: F401
from lakeshed.llm._persist import release_persisted  # noqa: F401
