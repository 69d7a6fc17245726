"""Recall proof for the LSH-bucketed embedding near-dup operator.

The driver's DuckDB hash-match at sf0.01 only proves no-false-positives
(the synthetic embeddings top out at cos ≈ 0.6, so the true pair set is
empty there). This test PLANTS near-duplicate pairs — perturbed copies
above, at, and just below the 0.98 threshold — and asserts the banded
plan returns exactly the brute-force pair set: full recall on true
pairs, no false positives from the residual filter.
"""

import numpy as np
import pandas as pd
import pytest

from web_crawler_spark.plans.pipeline_ops import dedup_embedding_cosine_df


def _planted(dim=48, n_base=120, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i]) for i in range(n_base)]
    nxt = n_base
    # 25 planted near-dups at varied closeness: tiny perturbations land
    # cos in ~[0.98, 1); larger ones fall below the threshold
    for k in range(25):
        src = base[k * 3 % n_base]
        eps = [1e-4, 3e-3, 0.02, 0.08, 0.22][k % 5]
        v = src + eps * rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        rows.append((nxt, v))
        nxt += 1
    return rows


def _brute_pairs(rows, theta=0.98):
    ids = np.array([r[0] for r in rows])
    m = np.stack([r[1] for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = np.round(m @ m.T, 4)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cos[i, j] >= theta:
                out.add((int(ids[i]), int(ids[j])))
    return out


def test_banded_equals_brute_force(spark):
    rows = _planted()
    expected = _brute_pairs(rows)
    assert len(expected) >= 8  # the plant worked: true pairs exist
    pdf = pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1].astype(np.float32).tolist() for r in rows]})
    e = spark.createDataFrame(pdf)
    got = {(r["a_id"], r["b_id"])
           for r in dedup_embedding_cosine_df(e).collect()}
    assert got == expected


def test_no_pairs_below_threshold(spark):
    rng = np.random.default_rng(11)
    m = rng.standard_normal((80, 32))
    pdf = pd.DataFrame({"vec_id": range(80), "embedding": [v.astype(np.float32).tolist() for v in m]})
    got = dedup_embedding_cosine_df(spark.createDataFrame(pdf)).collect()
    assert got == []  # random gaussians never reach cos 0.98
