"""Corpus-construction operators — the steps between "scored documents"
and "training shards": deterministic sharding, hash-based domain mixing,
sequence packing, and benchmark decontamination.

Beyond the reference surface (it has no corpus tooling at all); these are
the operations a 100 TB training-data pipeline runs after per-document
scoring/dedup (text.py, neardup.py) to assemble the final dataset.

Determinism policy matches text.py: randomness comes from md5 of the
document key (bit-identical on every engine), never from engine RNG — so
unlike seeded ``sample()``, every selection here hash-matches an external
oracle exactly. The uniform variate is the integer value of the first 4
hex chars of the md5 (65536 levels), extracted with ``instr`` arithmetic
that any SQL engine reproduces.

Scale notes: sharding/mixing/packing are map-only or one partitioned
window — no global sort, no driver-side state. Decontamination is an
equi-join on the shingle key with the (small) benchmark side broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.text import tokens, word_shingles

_HEX = "0123456789abcdef"
HEX_LEVELS = 16**4  # resolution of the md5-derived uniform variate


def hex_uniform(hash_col: str, n_chars: int = 4) -> Column:
    """Integer in [0, 16^n_chars) from the first hex chars of an md5
    column — the engine-portable uniform variate (instr + integer
    arithmetic only; identical in Spark SQL and ANSI oracles)."""
    return F.expr(
        " + ".join(
            f"(instr('{_HEX}', substring({hash_col}, {i + 1}, 1)) - 1)"
            f" * {16 ** (n_chars - 1 - i)}"
            for i in range(n_chars)
        )
    )


def hash_shard(
    df: DataFrame,
    n_shards: int = 32,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Assign every row a deterministic output shard: md5(key:salt) mod
    n_shards. This is the write-path partitioner for training shards —
    content-stable (re-runs and other engines agree), uniform, and
    map-only (at 100 TB it fuses into the scan; the only data movement is
    the final partitionBy("shard") write)."""
    out = df.withColumn(
        "__h", F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    )
    return out.withColumn(
        "shard", (hex_uniform("__h") % n_shards).cast("int")
    ).drop("__h")


def domain_mix(
    docs: DataFrame,
    quotas: dict[str, float],
    lang_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Domain/language rebalancing: keep each document with probability
    ``quotas[domain]`` (missing domains drop), decided by the md5-derived
    uniform variate — NOT engine RNG, so the kept set is deterministic,
    engine-portable, and stable under re-partitioning (the property that
    makes incremental corpus rebuilds reproducible). Map-only filter."""
    out = docs.withColumn(
        "__h", F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    )
    quota: Column = F.lit(0.0)
    for domain, q in sorted(quotas.items()):
        quota = F.when(F.col(lang_col) == domain, F.lit(float(q))).otherwise(quota)
    u = hex_uniform("__h").cast("double") / float(HEX_LEVELS)
    return out.where(u < quota).drop("__h")


def pack_concat_split(
    docs: DataFrame,
    budget_tokens: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing, concat-and-split policy: within each shard,
    documents concatenate in key order and split into fixed
    ``budget_tokens`` windows; each document reports the sequence it
    starts in and its token offset there (documents may straddle a
    boundary — that is this policy, the one used when loss masking
    handles joins; strict greedy bin-packing is a stateful scan like
    eventtime.grouped_ema).

    All integer arithmetic over one partitioned window (running token
    count per shard) — no global sort; shards are independent, so at 100
    TB parallelism is n_shards x window-partition parallelism."""
    base = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(prev / budget_tokens).cast("bigint").alias("seq_idx"),
        (prev % budget_tokens).cast("bigint").alias("offset_tokens"),
    )


def contamination_check(
    docs: DataFrame,
    benchmark_ids_mod: int = 20,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: which training documents share k-word
    shingles with the held-out benchmark set (here: doc_id % mod == 0, a
    deterministic fixture stand-in for an external eval suite). Returns
    per contaminated document the count of overlapping shingles and of
    benchmark documents hit.

    Shape: distinct-shingle explode on both sides, equi-join on the
    shingle. The benchmark side is small by construction (eval suites are
    MBs, corpora are TBs) so it broadcasts — the corpus never shuffles."""
    shingled = (
        docs.select(id_col, F.col(text_col).alias("__t"))
        .withColumn("__tok", tokens("__t"))
        .select(id_col, F.explode(word_shingles("__tok", k)).alias("shingle"))
    )
    bench = shingled.where(F.col(id_col) % benchmark_ids_mod == 0).select(
        F.col(id_col).alias("bench_id"), "shingle"
    )
    cand = shingled.where(F.col(id_col) % benchmark_ids_mod != 0)
    return (
        cand.join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shared_shingles"),
            F.count_distinct("bench_id").alias("n_benchmarks_hit"),
        )
        .orderBy(id_col)
    )
