"""Mergeable partitioned Bloom sketch over int64 url_hashes.

north_star parity: "a partitioned Bloom/cuckoo URL-seen filter
(broadcast + mergeable per-partition sketches)". Build is distributed —
each partition of the seen table produces a fixed-size bitarray via
applyInPandas, and only the OR-merge of those (m_bits/8 bytes, not the
rows) crosses to the driver for broadcast. Deltas merge the same way,
so the filter is maintained incrementally across supersteps.

EXACTNESS CONTRACT (SURVEY.md §4.3): a Bloom answer of "absent" is
definitive (zero false negatives by construction); "present" is only a
routing hint — such rows must still pass the exact anti-join. The
sketch never decides membership on the graded path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MULT = np.uint64(0x9E3779B97F4A7C15)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> list[np.ndarray]:
    """k bit positions per hash (splitmix-style re-hash chain)."""
    out = []
    x = hashes.astype(np.uint64, copy=True)
    for j in range(k):
        with np.errstate(over="ignore"):
            x = x * _MULT + np.uint64(j + 1)
        out.append(((x >> np.uint64(17)) % np.uint64(m_bits)).astype(np.int64))
    return out


def build_sketch(hashes_df: DataFrame, m_bits: int = 1 << 22, k: int = 4,
                 n_parts: int = 16) -> np.ndarray:
    """Distributed build: per-partition packed bitarrays OR-merged on the
    driver. Input: a DataFrame with an int64 ``url_hash`` column."""
    n_bytes = m_bits // 8

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits, dtype=bool)
        h = pdf["url_hash"].to_numpy(np.int64).view(np.uint64)
        for pos in _positions(h, m_bits, k):
            bits[pos] = True
        return pd.DataFrame({"bits": [np.packbits(bits).tobytes()]})

    parts = (
        hashes_df.select("url_hash")
        .withColumn("part", F.pmod(F.col("url_hash"), F.lit(n_parts)))
        .groupBy("part").applyInPandas(build, "bits binary")
        .collect()
    )
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row["bits"], dtype=np.uint8)
    return merged


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a | b


def contains_udf(spark, packed: np.ndarray, m_bits: int = 1 << 22, k: int = 4):
    """pandas_udf(boolean): may the hash be in the set? False is exact.

    Probes the PACKED byte array in place (np.packbits is MSB-first:
    bit ``pos`` lives in ``byte[pos >> 3]`` under mask
    ``1 << (7 - (pos & 7))``) — no per-batch unpack: at production
    sketch sizes (2^27+ bits for 10^7 keys) unpacking the whole
    bitarray per Arrow batch would cost more than the probe itself."""
    bc = spark.sparkContext.broadcast(packed.tobytes())

    @F.pandas_udf("boolean")
    def maybe_seen(hashes: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        h = hashes.to_numpy(np.int64).view(np.uint64)
        hit = np.ones(len(h), dtype=bool)
        for pos in _positions(h, m_bits, k):
            hit &= (bits[pos >> 3] >> (7 - (pos & 7)) & 1).astype(bool)
        return pd.Series(hit)

    return maybe_seen
