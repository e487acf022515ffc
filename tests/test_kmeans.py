"""T22 k-means: deterministic init, partitioning invariance, exact
integer distances, empty-cluster carry."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR
from mapnik_vector_tile_spark.operators import similarity as S


def _emb_df(spark, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
        }
    )
    return spark.createDataFrame(pdf)


def test_init_points_have_zero_distance(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(20, 8).astype(np.float32) * 0.3
    out = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in S.kmeans_clusters(_emb_df(spark, vecs), k=4, iters=1).collect()
    }
    # round 0 centroids ARE the k lowest-id vectors: self-distance 0
    for cid in range(4):
        assert out[cid] == (cid, 0)
    assert len(out) == 20


def test_partitioning_invariance(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(50, 6).astype(np.float32) * 0.4
    df = _emb_df(spark, vecs)
    a = sorted(
        map(tuple, S.kmeans_clusters(df, k=5, iters=3).collect())
    )
    b = sorted(
        map(tuple, S.kmeans_clusters(df.repartition(7), k=5, iters=3).collect())
    )
    assert a == b


def test_two_blobs_separate(spark):
    # two tight blobs far apart: after 2 rounds every point lands with
    # its blob regardless of which blob the init centroids came from
    rng = np.random.RandomState(5)
    a = rng.randn(12, 4).astype(np.float32) * 0.01 + 1.0
    b = rng.randn(12, 4).astype(np.float32) * 0.01 - 1.0
    vecs = np.vstack([a, b])
    out = S.kmeans_clusters(_emb_df(spark, vecs), k=2, iters=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    groups = sorted(by_cluster.values(), key=min)
    assert groups == [set(range(12)), set(range(12, 24))]


def test_duplicate_init_vectors_keep_empty_centroid(spark):
    # vec 0 and 1 identical: in round 1 cluster 1 never wins the
    # tiebreak and stays EMPTY — the update must carry its centroid
    # over (not crash, not NaN); the carried centroid stays at
    # (0.5, 0.5) and may legitimately re-win points later once
    # cluster 0's centroid has drifted to the global mean
    vecs = [[0.5, 0.5], [0.5, 0.5], [0.4, 0.6], [-0.5, -0.5], [-0.4, -0.6]]
    df = _emb_df(spark, vecs)
    r1 = S.kmeans_clusters(df, k=2, iters=1).collect()
    assert {r["cluster"] for r in r1} == {0}  # tie -> lowest cid
    # iters=2 -> exactly ONE update: cluster 1 was empty, so its
    # centroid must still be the quantized (0.5, 0.5) in the final
    # assignment — its members' d2 prove the carry happened
    r3 = S.kmeans_clusters(df, k=2, iters=2).collect()
    assert len(r3) == 5 and {r["cluster"] for r in r3} == {0, 1}
    for r in r3:
        if r["cluster"] == 1:
            q = np.round(np.float64(vecs[r["vec_id"]]) * (1 << 20))
            c = np.round(np.float64([0.5, 0.5]) * (1 << 20))
            assert r["d2"] == int(((q - c) ** 2).sum())


def test_assignment_plan_is_udf_free(spark):
    vecs = np.eye(4, dtype=np.float32).tolist()
    df = S.kmeans_clusters(_emb_df(spark, vecs), k=2, iters=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semdedup_planted_duplicates(spark):
    """Planted near-identical vectors drop (keep=False) under
    first-occurrence-by-id; the earliest copy and all dissimilar
    vectors survive; everything co-clusters sanely."""
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]     # cos ~0.9999 vs base
    far = [0.0, 1.0, 0.0, 0.0]         # orthogonal
    near_far = [0.01, 0.999, 0.0, 0.0]  # near-dup of far
    vecs = [base, near, far, near_far]
    out = {
        r.vec_id: r
        for r in S.semdedup(
            _emb_df(spark, vecs), k=2, iters=2, tau_num=95
        ).collect()
    }
    assert len(out) == 4
    assert out[0].keep and not out[1].keep          # 1 dups 0
    assert out[2].keep and not out[3].keep          # 3 dups 2
    assert out[0].cluster == out[1].cluster
    assert out[2].cluster == out[3].cluster
    assert out[0].cluster != out[2].cluster


def test_semdedup_chain_is_greedy_not_transitive(spark):
    """The scan-order rule: v drops iff an EARLIER-id vector passes
    the test, even if that earlier vector itself dropped."""
    a = [1.0, 0.0]
    b = [0.999, 0.02]   # dups a
    c = [0.998, 0.04]   # dups both a and b
    out = {
        r.vec_id: r.keep
        for r in S.semdedup(
            _emb_df(spark, [a, b, c]), k=1, iters=1, tau_num=95
        ).collect()
    }
    assert out == {0: True, 1: False, 2: False}


def test_semdedup_overflow_guard(spark):
    """Non-unit-norm embeddings that would overflow the int64 cosine
    gate must fail LOUDLY (raise_error), not wrap and silently keep
    true duplicates. Norm ~2 at SD_SCALE=2^12 exceeds the
    Cauchy-Schwarz-derived limit isqrt(2^63-1)//tau_den."""
    import pytest

    big = [2.0] * 64  # norm^2 = 256, quantized n2 ~ 256*2^24 >> limit
    with pytest.raises(Exception, match="exact-int64 gate limit"):
        S.semdedup(_emb_df(spark, [big, big]), k=1, iters=1).collect()

    # Slightly-over-unit norms (~1.2) still pass the guard.
    ok = [0.6, 0.6, 0.6, 0.6]
    rows = S.semdedup(_emb_df(spark, [ok, ok]), k=1, iters=1).collect()
    assert {r.vec_id: r.keep for r in rows} == {0: True, 1: False}


def test_hard_negatives_excludes_same_label(spark):
    """T34: every mined negative has a different label than its
    anchor, ranks are contiguous from 1, and the top negative is the
    max-cosine different-label row within the anchor's bucket."""
    import numpy as np

    from mapnik_vector_tile_spark.operators.similarity import (
        hard_negatives,
        with_lsh_bucket,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = hard_negatives(emb, k=3).collect()
    assert len(out) > 0
    by_anchor = {}
    for r in out:
        assert labels[r.nbr] != labels[r.vec_id]
        assert labels[r.nbr] == r.nbr_label
        by_anchor.setdefault(r.vec_id, []).append(r.rnk)
    for rnks in by_anchor.values():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))

    # spot-verify one anchor against a local recomputation
    be = {
        r.vec_id: (r.bucket, np.array(r.embedding, dtype=np.float64))
        for r in with_lsh_bucket(emb).collect()
    }
    anchor = next(iter(by_anchor))
    ab, av = be[anchor]
    cands = [
        (vid, np.round(
            float(v @ av)
            / (np.linalg.norm(v) * np.linalg.norm(av)), 9))
        for vid, (b, v) in be.items()
        if b == ab and labels[vid] != labels[anchor]
    ]
    cands.sort(key=lambda t: (-t[1], t[0]))
    got_first = min(
        (r for r in out if r.vec_id == anchor), key=lambda r: r.rnk
    )
    assert got_first.nbr == cands[0][0]


def test_alignment_filter_gate_and_guard(spark):
    """T36: keep iff integer-exact cosine >= tau; zero vector ->
    keep=false, cos9=0.0 (no NaN); overflow guard raises loudly."""
    import pytest
    from pyspark.sql import functions as F

    u = [1.0, 0.0, 0.0, 0.0]
    close = [0.9, 0.1, 0.0, 0.0]   # cos ~ 0.994
    ortho = [0.0, 1.0, 0.0, 0.0]   # cos = 0
    zero = [0.0, 0.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(0, u, close), (1, u, ortho), (2, u, zero)],
        "pair_id long, img_vec array<double>, txt_vec array<double>",
    )
    out = {
        r.pair_id: (r.align_keep, r.cos9)
        for r in S.alignment_filter(df, tau_num=28).collect()
    }
    # cos9 is the QUANTIZED-grid cosine: within ~2/SD_SCALE of float
    assert out[0][0] is True and abs(out[0][1] - 0.99388373) < 5e-4
    assert out[1] == (False, 0.0)
    assert out[2] == (False, 0.0)

    big = spark.createDataFrame(
        [(0, [3.0] * 4, [3.0] * 4)],
        "pair_id long, img_vec array<double>, txt_vec array<double>",
    )
    with pytest.raises(Exception, match="exact-int64 gate limit"):
        S.alignment_filter(big).collect()


# --- T27 product quantization -------------------------------------------------


def test_pq_codes_separate_obvious_clusters(spark):
    """Two tight blobs per subspace -> codes split them; ADC of a
    vector identical to the query is the query's own-cell lut entry."""
    rng = np.random.RandomState(11)
    lo = rng.randn(10, 8).astype(np.float32) * 0.01
    hi = lo + 5.0
    vecs = np.vstack([lo, hi])
    out = S.pq_encode(_emb_df(spark, vecs), m=2, ksub=2, iters=3).collect()
    rows = {r["vec_id"]: r for r in out}
    # blob membership must be consistent per subspace
    for j in ("code0", "code1"):
        lo_codes = {rows[i][j] for i in range(10)}
        hi_codes = {rows[i][j] for i in range(10, 20)}
        assert len(lo_codes) == 1 and len(hi_codes) == 1
        assert lo_codes != hi_codes
    # adc is nonneg and identical for all members of the query's blob
    adc_lo = {rows[i]["adc"] for i in range(10)}
    assert len(adc_lo) == 1 and min(adc_lo) >= 0


def test_pq_partitioning_invariance(spark):
    rng = np.random.RandomState(5)
    vecs = rng.randn(30, 8).astype(np.float32)
    df = _emb_df(spark, vecs)
    a = sorted(map(tuple, S.pq_encode(df, m=2, ksub=4, iters=2).collect()))
    b = sorted(
        map(tuple, S.pq_encode(df.repartition(7), m=2, ksub=4, iters=2).collect())
    )
    assert a == b


def test_pq_rejects_bad_shapes(spark):
    import pytest

    rng = np.random.RandomState(1)
    df = _emb_df(spark, rng.randn(6, 7).astype(np.float32))
    with pytest.raises(ValueError):
        S.pq_encode(df, m=2, ksub=2)  # 7 dims not divisible by 2
    df2 = _emb_df(spark, rng.randn(3, 8).astype(np.float32))
    with pytest.raises(ValueError):
        S.pq_encode(df2, m=2, ksub=8)  # fewer vectors than ksub
