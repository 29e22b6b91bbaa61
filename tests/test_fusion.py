"""Fusion transforms vs the oracle, incl. degenerate branches and quirks."""

from collections import defaultdict

import numpy as np
import pytest

from fusion_spark import fusion, oracle, synth


@pytest.fixture(scope="module")
def score_rows(query_rows):
    return synth.make_score_lists(query_rows, n_docs=64)


@pytest.fixture(scope="module")
def score_df(spark, score_rows):
    return spark.createDataFrame(score_rows).cache()


def _oracle_input(score_rows):
    by = defaultdict(lambda: defaultdict(list))
    for r in sorted(score_rows, key=lambda x: (x["system"], x["qid"], x["rank"])):
        by[r["system"]][r["qid"]].append((r["doc_id"], r["score"]))
    return {s: dict(qs) for s, qs in by.items()}


def _collect_fused(df):
    got = defaultdict(list)
    for r in df.orderBy("qid", "rank").collect():
        got[r["qid"]].append((r["doc_id"], r["score"]))
    return got


def _compare(got, exp, tol):
    assert set(got) == set(exp)
    for qid in exp:
        assert [d for d, _ in got[qid]] == [d for d, _ in exp[qid]], f"qid {qid}"
        for (_, a), (_, b) in zip(got[qid], exp[qid]):
            assert a == pytest.approx(b, rel=tol, abs=tol)


@pytest.mark.parametrize("method", ["bcf", "rrf"])
def test_rank_based_fusion_identity(score_df, score_rows, method):
    got = _collect_fused(fusion.fuse(score_df, method=method, return_topk=None))
    exp = oracle.fuse(_oracle_input(score_rows), method=method)
    _compare(got, {q: v for q, v in exp.items()}, tol=1e-12)


@pytest.mark.parametrize("norm", ["min-max", "z-score", "arctan"])
def test_nsf_fusion_identity_float32(score_df, score_rows, norm):
    got = _collect_fused(
        fusion.fuse(score_df, method="nsf", normalization=norm, return_topk=None, dtype="float32")
    )
    exp = oracle.fuse(_oracle_input(score_rows), method="nsf", normalization=norm)
    _compare(got, exp, tol=1e-5)


def test_minmax_degenerate_all_ones(spark):
    rows = [
        {"system": "s", "qid": 1, "doc_id": d, "score": 5.0, "rank": r}
        for r, d in enumerate([3, 1, 2], start=1)
    ]
    df = fusion.minmax_normalize(spark.createDataFrame(rows))
    assert all(r["score"] == 1.0 for r in df.collect())


def test_zscore_degenerate_all_zeros(spark):
    rows = [
        {"system": "s", "qid": 1, "doc_id": d, "score": 5.0, "rank": r}
        for r, d in enumerate([3, 1, 2], start=1)
    ]
    df = fusion.zscore_normalize(spark.createDataFrame(rows))
    assert all(r["score"] == 0.0 for r in df.collect())


def test_borda_top1_quirk(spark):
    rows = [
        {"system": "s", "qid": 1, "doc_id": d, "score": float(10 - r), "rank": r}
        for r, d in enumerate([7, 8, 9, 10], start=1)
    ]
    df = fusion.borda_count(spark.createDataFrame(rows))
    by_rank = {r["rank"]: r["score"] for r in df.collect()}
    assert by_rank[1] == pytest.approx((4 + 1) / 4)  # (n+1)/n, hybrid.py:249
    assert by_rank[4] == pytest.approx(2 / 4)


def test_rrf_constant_60(spark):
    rows = [{"system": "s", "qid": 1, "doc_id": 5, "score": 9.0, "rank": 1}]
    df = fusion.reciprocal_rank(spark.createDataFrame(rows))
    assert df.collect()[0]["score"] == pytest.approx(1 / 61)


def test_percentile_rank_and_nce(score_df, score_rows):
    distr = {
        s: np.linspace(0.0, 30.0, 101).tolist() for s in ("bm25", "dense", "sparse")
    }
    for norm in ("percentile-rank", "normal-curve-equivalent"):
        got = _collect_fused(
            fusion.fuse(
                score_df, method="nsf", normalization=norm,
                distributions=distr, return_topk=None,
            )
        )
        exp = oracle.fuse(
            _oracle_input(score_rows), method="nsf", normalization=norm,
            distributions={k: np.asarray(v) for k, v in distr.items()},
        )
        _compare(got, exp, tol=1e-5)


def test_weighted_nsf_missing_system_contributes_zero(spark):
    rows = [
        {"system": "a", "qid": 1, "doc_id": 1, "score": 1.0, "rank": 1},
        {"system": "a", "qid": 1, "doc_id": 2, "score": 0.5, "rank": 2},
        {"system": "b", "qid": 1, "doc_id": 1, "score": 1.0, "rank": 1},
    ]
    fused = fusion.fuse(
        spark.createDataFrame(rows), method="nsf", normalization=None,
        weights={"a": 0.25, "b": 0.75}, return_topk=None,
    )
    by_doc = {r["doc_id"]: r["score"] for r in fused.collect()}
    assert by_doc[1] == pytest.approx(0.25 * 1.0 + 0.75 * 1.0)
    assert by_doc[2] == pytest.approx(0.25 * 0.5)  # system b absent → +0


def test_score_distribution_builder(spark):
    rows = (
        [{"system": "s", "qid": 1, "doc_id": d, "score": 0.0, "rank": d + 1} for d in range(3)]
        + [
            {"system": "s", "qid": 1, "doc_id": 10 + i, "score": float(v), "rank": i + 4}
            for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
        ]
    )
    out = fusion.score_distribution(spark.createDataFrame(rows), n_points=4).collect()
    assert len(out) == 1
    q = out[0]["quantiles"]
    # reference quirk (hybrid.py:392): the 2-smallest-distinct set is taken
    # over ALL scores INCLUDING zeros → excluded values are {0, 1}; zeros are
    # also dropped by the nonzero filter → surviving data is 2..10
    assert q[0] == pytest.approx(2.0) and q[-1] == pytest.approx(10.0)
    assert len(q) == 5

    # without zeros, both smallest nonzero values are excluded → 3..10
    rows_nz = [r for r in rows if r["score"] != 0.0]
    out2 = fusion.score_distribution(spark.createDataFrame(rows_nz), n_points=4).collect()
    q2 = out2[0]["quantiles"]
    assert q2[0] == pytest.approx(3.0) and q2[-1] == pytest.approx(10.0)


def test_missing_weight_fails_loudly(spark):
    import pytest as _pytest

    rows = [
        {"system": "a", "qid": 1, "doc_id": 1, "score": 1.0, "rank": 1},
        {"system": "b", "qid": 1, "doc_id": 1, "score": 1.0, "rank": 1},
    ]
    fused = fusion.fuse(
        spark.createDataFrame(rows), method="nsf", normalization=None,
        weights={"a": 1.0}, return_topk=None,  # system b has no weight
    )
    # reference parity: Aggregator.fuse raises KeyError (hybrid.py:289) — a
    # silent NULL would drop system b's contribution from the fused sum
    with _pytest.raises(Exception, match="missing fusion weight"):
        fused.collect()
