"""Deterministic sampling & corpus-assembly operators for training data.

A training-data pipeline does not use ``rand()`` sampling: runs must be
reproducible bit-for-bit across engines, retries, and cluster sizes, and
a document's fate must not depend on partitioning. Everything here keys
off a content hash of the document id (+ a salt), so:

- the same (id, salt) always makes the same keep/drop decision — adding
  machines or re-running changes nothing;
- changing the salt draws an independent sample;
- the DuckDB oracle can replay the exact arithmetic (md5-prefix →
  bigint, the same trick the SimHash oracle uses), so these operators
  are value-checked end to end, not just row-counted.

Scale notes: :func:`deterministic_sample` and :func:`mixture_sample` are
shuffle-free narrow filters (they stream through the scan);
:func:`hash_rank_sample` and :func:`pack_tokens` cost one window shuffle
on the stratum key each. None of them ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakeshed.llm.text import tokens

# 15 hex chars = 60 bits: fits a signed 64-bit lossless on both engines
_BUCKETS = 1_000_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from md5(id || salt) — byte-identical to
    DuckDB's ``CAST('0x' || substr(md5(id || salt), 1, 15) AS BIGINT) %
    1000000`` (md5 of the utf-8 bytes on both sides)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)).cast("binary"))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"), F.lit(_BUCKETS)
    )


def deterministic_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep ≈``rate`` of rows, decided per-row by content hash — a
    Bernoulli sample that is reproducible and partitioning-independent
    (unlike ``df.sample``, whose draw depends on the split layout).
    Narrow filter: no shuffle, no driver involvement."""
    # round, don't truncate: 0.29 * 1e6 is 289999.99... in binary floats
    # and int() would silently shift the threshold one bucket off the
    # decimal rate an oracle would hand-write
    return df.where(
        _hash_bucket(F.col(id_col), salt) < int(round(rate * _BUCKETS))
    )


def weighted_sample(
    df: DataFrame,
    weight: Column | str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-row Bernoulli keep with probability ``weight`` (a column or
    expression in [0, 1]), decided by content hash — the
    quality-WEIGHTED resampling step of modern curation pipelines
    (DCLM/RefinedWeb shape: high-quality documents survive with high
    probability, low-quality ones are down-sampled instead of
    hard-filtered), reproducible and partitioning-independent like
    :func:`deterministic_sample`. A row keeps iff its md5 bucket falls
    below ``round(weight * 1e6)``, so the same engine/oracle bucket
    arithmetic replays exactly (Spark ``round`` and DuckDB ``round``
    agree half-up for non-negatives). Weights outside [0, 1] clamp
    (≥1 always keeps, ≤0 never); NULL weights drop — no evidence, no
    draw. Narrow filter: no shuffle, no driver involvement."""
    w = F.col(weight) if isinstance(weight, str) else weight
    # when-chain, NOT least/greatest: those IGNORE nulls (least(NULL,
    # 1.0) is 1.0), which would silently always-keep a NULL-weight row
    # instead of dropping it
    clamped = F.when(w < 0, F.lit(0.0)).when(w > 1, F.lit(1.0)).otherwise(w)
    thr = F.round(clamped * _BUCKETS).cast("bigint")
    return df.where(_hash_bucket(F.col(id_col), salt) < thr)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Dataset mixture weighting: each stratum (source, language, domain)
    is down/up-weighted by its own keep-rate — how corpora are rebalanced
    before training (e.g. cap web text, keep all books). One narrow
    filter; the CASE over strata is a tiny expression regardless of
    corpus size. Strata missing from ``rates`` get ``default_rate``."""
    rate = F.lit(int(round(default_rate * _BUCKETS)))
    for k, v in sorted(rates.items()):
        rate = F.when(
            F.col(key_col) == F.lit(k), F.lit(int(round(v * _BUCKETS)))
        ).otherwise(rate)
    return df.where(_hash_bucket(F.col(id_col), salt) < rate)


def hash_rank_sample(
    df: DataFrame,
    k: int,
    by: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``k`` rows per stratum (or all, if the stratum is smaller):
    rank rows inside each stratum by content hash and keep the k
    smallest — a deterministic reservoir. The hash order is uniform, so
    the k rows are an unbiased sample, yet stable across runs. One window
    shuffle on the stratum key; ties broken by id (hash collisions)."""
    w = Window.partitionBy(by).orderBy(
        _hash_bucket(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def pack_tokens(
    df: DataFrame,
    budget: int,
    by: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a fixed-size token window (context-window
    packing): documents are laid out in deterministic ``order_col`` order
    per stratum, and a document belongs to the pack where its first token
    lands (``pack_id = floor(start_offset / budget)``) — the contiguous
    stream-chunking strategy. Emits the in-pack offset so a downstream
    tokenizer can materialize the windows without re-scanning.

    One window shuffle per stratum; the cumulative sum is a single pass.
    Documents longer than ``budget`` still get exactly one pack (their
    start pack) — splitting oversize docs is the tokenizer's job.
    """
    if budget <= 0:
        # non-ANSI Spark turns x/0 and pmod(x, 0) into NULL — every row
        # would get a NULL pack silently (r11 review wave 13)
        raise ValueError(f"budget must be positive, got {budget}")
    n_tok = F.size(tokens(text_col))
    w = (
        Window.partitionBy(by)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tok).over(w)
    start = (cum - n_tok).alias("start_offset")
    return df.select(
        F.col(order_col),
        F.col(by),
        n_tok.alias("n_tokens"),
        start,
        F.floor((cum - n_tok) / budget).alias("pack_id"),
        F.pmod(cum - n_tok, F.lit(budget)).alias("pack_offset"),
    )


def shard_assign(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle → training shards: every document gets
    a shard (content-hash mod ``n_shards``) and a stable position inside
    it (rank by hash, ties by id) — the reproducible data-order step
    before writing training shards, independent of input partitioning.

    Never a global sort: the one window shuffle partitions BY SHARD, so
    ordering work parallelizes across shards and each shard's sort fits
    its own executors — at 100 TB you raise ``n_shards`` (it doubles as
    the write parallelism), not the partition size."""
    if n_shards <= 0:
        # pmod(x, 0) is NULL in non-ANSI Spark — every row would get a
        # NULL shard and one global window partition (r11 wave 13)
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    b = _hash_bucket(F.col(id_col), salt)
    staged = df.select(
        F.col(id_col),
        b.alias("__b"),
        F.pmod(b, F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("__b").asc(), F.col(id_col).asc()
    )
    return staged.select(
        F.col(id_col),
        "shard",
        F.row_number().over(w).alias("pos"),
    )


def leakage_safe_split(
    labels: DataFrame,
    fractions: dict[str, float],
    label_col: str = "cluster",
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment that can never leak near-duplicates
    across splits: the hash is taken over the CLUSTER label (from
    :func:`lakeshed.llm.dedup.dedup_clusters`), so every member of a
    near-dup component lands in the same split — hashing the document id
    instead would independently coin-flip each duplicate and leak eval
    text into training. One narrow projection over the labeled frame; at
    100 TB the expensive part is the clustering you already ran for
    dedup, the split itself is shuffle-free.

    ``fractions`` maps split name → fraction; fractions must sum to 1.
    Assignment uses the same md5-bucket arithmetic as the samplers
    (reproducible across engines/partitionings): cumulative thresholds
    over the sorted split names."""
    if any(f < 0 for f in fractions.values()):
        # a negative fraction can still sum to 1 and silently produce an
        # empty/mis-sized split (r11 review wave 13)
        raise ValueError(f"fractions must be non-negative: {fractions}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {total}, expected 1.0")
    b = _hash_bucket(F.col(label_col), salt)
    expr = None
    acc = 0.0
    # deterministic threshold order: sorted by split name
    names = sorted(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = b < int(round(acc * _BUCKETS))
        expr = (
            F.when(cond, F.lit(name)) if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return labels.withColumn("split", expr)
