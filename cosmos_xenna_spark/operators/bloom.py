"""Bloom-filter prefiltered semi/anti joins (decontamination at scale).

The 100 TB problem this solves: semi/anti-joining a huge fact table
against a key set that is too large to broadcast raw (hundreds of
millions of eval-set fingerprints) normally shuffles the ENTIRE fact
table on the join key.  A Bloom bitset of the key side is a few MiB
regardless of key count, broadcasts as a single array literal, and
turns the join into:

- row-local bit probes on the fact side (no shuffle, pushdown-safe),
- an exact join on only the sliver of rows the filter could not rule
  out (true matches + ~``fp_rate`` false positives).

Results are EXACT — the Bloom filter only prunes definite non-members;
the exact join removes false positives — so the SQL oracle is the
plain semi/anti join.

Hashing: Kirsch-Mitzenmacher double hashing from two salted
``xxhash64`` probes, positions into a ``num_bits`` bitset packed
as ``num_bits/64`` longs.  Building the bitset is one aggregation over
the key side (explode k positions -> bit_or per word); the packed
words come back to the driver (at most ``num_bits/64`` rows — 16 KiB
of longs for a 1 Mi-bit filter) and ship to executors as one array
literal.

Reference parity: none — the reference joins nothing; this is the
engine-level replacement for driver-side "filter task list by set
membership" patterns in its pipelines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column



def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """Kirsch-Mitzenmacher double hashing: ``pos_i = (h1 + i*h2) % m``
    from two salted ``xxhash64`` evaluations — per-row hashing cost is
    constant in ``num_hashes`` (the dominant cost for long keys like
    document text), with the standard false-positive behavior.

    The hash is NOT oracle-visible: the SQL oracle for every consumer
    is the plain semi/anti join (the bitset is exactness-preserving
    pruning for ANY hash), so the probes use Spark's codegen-native
    xxhash64 instead of the portable-but-cryptographic md5 path (one
    md5 + hex conv over full document text per row dominated the
    decontamination queries; measured in round 12).  ``h2`` is reduced
    mod ``m`` first so ``i*h2`` cannot overflow, and forced odd so it
    cycles all of a power-of-two ``m``.  ``pmod`` (not ``%``) because
    xxhash64 is signed."""
    h1 = F.pmod(F.xxhash64(F.lit("bloom1"), key.cast("string")), F.lit(num_bits))
    h2 = F.pmod(
        F.xxhash64(F.lit("bloom2"), key.cast("string")), F.lit(num_bits)
    ).bitwiseOR(F.lit(1))
    return [(h1 + F.lit(i) * h2) % F.lit(num_bits) for i in range(num_hashes)]


def build_bloom_words(keys: DataFrame, key_col: str, num_bits: int, num_hashes: int) -> list[int]:
    """Aggregate the key side into a packed bitset (list of
    ``num_bits//64`` longs).  One scan of the key side; the shuffle is
    ``num_bits/64`` rows at most."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), num_bits, num_hashes))).alias("p")
    )
    packed = (
        pos.select(
            (F.col("p") / 64).cast("bigint").alias("word"),
            (F.col("p") % 64).cast("int").alias("b"),
        )
        .selectExpr("word", "shiftleft(1L, b) AS bit")
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for row in packed:
        words[row["word"]] = row["mask"]
    return words


def _might_contain(key: Column, words: list[int], num_bits: int, num_hashes: int) -> Column:
    """Row-local membership probe against the literal bitset."""
    arr = F.lit(words)  # single ArrayType literal, shipped once per task
    cond = F.lit(True)
    for p in _positions(key, num_bits, num_hashes):
        word = F.element_at(arr, ((p / 64).cast("bigint") + 1).cast("int"))
        cond = cond & (F.getbit(word, (p % 64).cast("int")) == 1)
    return cond


def suggest_num_bits(n_keys: int, fp_rate: float = 0.01) -> int:
    """Textbook sizing ``m = -n ln p / (ln 2)^2``, rounded up to a
    multiple of 64."""
    m = int(-n_keys * math.log(fp_rate) / (math.log(2) ** 2)) + 1
    return max(64, ((m + 63) // 64) * 64)


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    *,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
    broadcast_exact: bool = True,
) -> DataFrame:
    """``big LEFT SEMI JOIN keys ON big[on] = keys[on]``, Bloom-pruned.

    ``broadcast_exact=False`` models the regime the filter exists for:
    the key side fits as a bitset but not as a raw broadcast, so the
    exact join shuffles — but only the prefiltered sliver of ``big``.
    """
    words = build_bloom_words(keys, on, num_bits, num_hashes)
    pre = big.filter(_might_contain(F.col(on), words, num_bits, num_hashes))
    rhs = keys.select(on).distinct()
    if broadcast_exact:
        rhs = F.broadcast(rhs)
    return pre.join(rhs, on=on, how="leftsemi")


def bloom_anti_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    *,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
    broadcast_exact: bool = True,
) -> DataFrame:
    """``big LEFT ANTI JOIN keys`` (decontamination), Bloom-pruned.

    Rows the filter rules out are KEPT outright (a Bloom "no" is
    definite) and never touch the join; only the maybe-sliver runs the
    exact anti join.  The source is read by both branches — each scan
    carries the row-local probe as a pushed filter, and at scale the
    maybe-branch scan is the one that matters (it feeds the shuffle).
    """
    words = build_bloom_words(keys, on, num_bits, num_hashes)
    maybe = _might_contain(F.col(on), words, num_bits, num_hashes)
    clean = big.filter(~maybe)
    rhs = keys.select(on).distinct()
    if broadcast_exact:
        rhs = F.broadcast(rhs)
    checked = big.filter(maybe).join(rhs, on=on, how="leftanti")
    return clean.unionByName(checked)
