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
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# T7' clustered-corpus measurement (round 5): the ann_lsh docstring
# claims "a real corpus with near-dup structure wants longer codes
# (16x16) where the same plan scans a vanishing fraction". Turn the
# knob story into numbers: a corpus of tight clusters (in-cluster cos
# ~0.95, cross-cluster ~0.2) through 16 tables x 16-bit codes must
# (a) scan < 5% of the all-pairs space and (b) hit recall@3 >= 0.9
# against brute force on a query subset.

def _clustered(dim=32, n_clusters=50, per_cluster=40, noise=0.3, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            # per-dim sigma = noise/sqrt(dim) so the TOTAL noise norm is
            # ~noise (cos with the center ~1/sqrt(1+noise^2) ~ 0.96);
            # an unscaled per-dim sigma would make the noise norm rival
            # the unit center and the "cluster" dissolve (cos ~ 0.5)
            v = centers[c] + (noise / np.sqrt(dim)) * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_clustered_corpus_scan_fraction_and_recall(spark):
    from web_crawler_spark.plans.pipeline_ops import (
        ann_lsh_candidates,
        ann_lsh_topk,
    )

    rows = _clustered()
    n = len(rows)
    e = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    cand = ann_lsh_candidates(e, n_tables=16, bits=16)
    n_cand = cand.count()
    scan_fraction = n_cand / (n * (n - 1))
    assert scan_fraction < 0.05, f"scanned {scan_fraction:.3%} of all pairs"

    # recall@3 vs brute force for a fixed query subset
    k, n_check = 3, 24
    res = ann_lsh_topk(e, n_tables=16, bits=16, k=k)
    got = {(r["q_id"], r["c_id"])
           for r in res.filter(F.col("q_id") < n_check).collect()}
    ids = np.array([r[0] for r in rows])
    m = np.stack([np.asarray(r[1]) for r in rows])
    cos = np.round(m @ m.T, 6)
    np.fill_diagonal(cos, -2.0)
    truth = set()
    for q in range(n_check):
        order = np.lexsort((ids, -cos[q]))[:k]
        truth |= {(q, int(ids[j])) for j in order}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall@3 {recall:.3f} on the clustered corpus"
    # and the measurement itself should show real pruning, not luck:
    # in-cluster pairs alone are ~2% of all pairs, so the candidate set
    # must be the same order of magnitude (no all-pairs fallback)
    assert n_cand < 10 * 50 * 40 * 39, n_cand
