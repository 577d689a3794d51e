"""Bloom-filter join pruning — the scan-side prefilter for selective
semi-joins.

At 100 TB the cost of ``fact SEMI JOIN dim_subset`` is dominated by
shuffling the fact side; when the key set is small and selective, a Bloom
filter of the keys drops most fact rows AT THE SCAN, before any exchange.
Spark's own runtime row-group filtering covers simple cases; this operator
makes the sketch explicit so it can be built once, persisted, and applied
across queries/batches.

Everything is native expressions:

* build — each key row expands to ``num_hashes`` bit positions
  (``pmod(xxhash64(key, seed), n_bits)``), positions fold into 64-bit
  words with ``bit_or``; only ``n_bits/64`` longs ever reach the driver
  (a bounded sketch, same contract as the HLL store in sketch.py).
* probe — ``bit_get`` against the words as a broadcast literal array;
  whole-stage-codegen, no shuffle, no UDF.

False positives are inherent — :func:`bloom_semi_join` therefore follows
the prefilter with an exact semi-join, so results are EXACT; the sketch
only prunes the shuffle.  Never use a Bloom filter alone for anti-join
semantics (a false positive would wrongly drop a surviving row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom(
    keys: DataFrame,
    key: str,
    n_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> list[int]:
    """Aggregate the distinct values of ``keys[key]`` into a Bloom bitmap;
    returns the dense ``n_bits/64``-long word list (the broadcastable
    sketch).  Deterministic: seeded xxhash64, no RNG."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(n_bits))
                    for s in range(num_hashes)
                ]
            )
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("widx"),
            (F.col("pos") % 64).cast("int").alias("bitpos"),
        )
        .select("widx", F.expr("shiftleft(1L, bitpos)").alias("mask"))
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    dense = [0] * (n_bits // 64)
    for r in words:
        dense[r["widx"]] = r["word"]
    return dense


def bloom_might_contain(
    key_col: Column | str,
    words: list[int],
    num_hashes: int = 5,
) -> Column:
    """Membership predicate over a :func:`build_bloom` sketch — pure
    expression (usable in ``.filter`` / ``.where`` on any frame).

    The probed column must have EXACTLY the type the sketch was built
    from: xxhash64 hashes INT and BIGINT (etc.) differently, so a type
    mismatch yields false negatives.  :func:`bloom_semi_join` normalizes
    this automatically."""
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    n_bits = len(words) * 64
    words_lit = F.array(*[F.lit(int(w)).cast("long") for w in words])
    checks = []
    for s in range(num_hashes):
        pos = F.pmod(F.xxhash64(col, F.lit(s)), F.lit(n_bits))
        word = F.element_at(words_lit, (pos / 64).cast("int") + 1)
        checks.append(F.bit_get(word, (pos % 64).cast("int")) == 1)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    n_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT ``big SEMI JOIN small`` with a Bloom prefilter on the big
    side: the sketch (built from the small side's keys with one bounded
    aggregation) prunes big rows before the shuffle; the broadcast
    semi-join then removes Bloom false positives."""
    small_key = small_key or big_key
    # xxhash64 hashes e.g. INT and BIGINT differently, so a type mismatch
    # between the two key columns would produce FALSE NEGATIVES (members
    # failing the prefilter before the corrective join).  Normalize the
    # build side to the probe side's exact type.
    big_type = big.schema[big_key].dataType
    keyed_small = small.select(
        F.col(small_key).cast(big_type).alias(big_key)
    )
    words = build_bloom(keyed_small, big_key, n_bits=n_bits, num_hashes=num_hashes)
    pruned = big.filter(
        bloom_might_contain(big_key, words, num_hashes=num_hashes)
    )
    return pruned.join(
        F.broadcast(keyed_small.distinct()),
        on=big_key,
        how="left_semi",
    )
