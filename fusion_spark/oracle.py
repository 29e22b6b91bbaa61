"""Pure-Python reference oracle — the acceptance ground truth for tests.

Clean-room re-statement of the reference's in-scope math (cited; NOT copied):
  * TFIDF/BM25/Atire index + scoring  /root/reference/src/retrievers/bm25.py:33-173
  * fusion transforms (Aggregator)    /root/reference/src/retrievers/hybrid.py:222-307
  * IR metrics                        /root/reference/src/utils/metrics.py

Deliberately tiny and dict-free-of-Spark so pytest can diff Spark output
against it at unit scale. Float semantics preserved: all index/score math in
IEEE double (like the reference's Python floats); fusion normalizations in
numpy float32 with ddof=1 std (like the reference's torch float32 tensors,
hybrid.py:255-264).
"""

from __future__ import annotations

import math
from statistics import NormalDist, mean

import numpy as np


# --------------------------- tokenization ----------------------------------

def simple_tokenize(text: str) -> list[str]:
    return text.lower().split()


# --------------------------- index + scoring -------------------------------

class OracleIndex:
    """Mirror of the reference index semantics over a doc_id→text corpus."""

    def __init__(self, corpus: dict[int, str], variant: str = "bm25", tokenizer=simple_tokenize):
        self.variant = variant
        self.tokenizer = tokenizer
        self.doc_ids = sorted(corpus)  # ascending doc_id = insertion order contract
        self.toks = {d: tokenizer(corpus[d]) for d in self.doc_ids}
        self.n = len(self.doc_ids)
        self.dl = {d: len(self.toks[d]) for d in self.doc_ids}
        self.avgdl = mean(self.dl.values()) if self.dl else 0.0
        self.tf: dict[str, dict[int, int]] = {}
        self.df: dict[str, int] = {}
        for d in self.doc_ids:
            seen = set()
            for t in self.toks[d]:
                self.tf.setdefault(t, {})
                self.tf[t][d] = self.tf[t].get(d, 0) + 1
                seen.add(t)
            for t in seen:
                self.df[t] = self.df.get(t, 0) + 1
        self.idf = {t: self._idf(self.df[t]) for t in self.df}

    def _idf(self, df: int) -> float:
        # log10 in every variant (bm25.py:87,147,173); BM25 idf may be negative.
        if self.variant == "bm25":
            return math.log10((self.n - df + 0.5) / (df + 0.5))
        return math.log10((self.n + 1) / (df + 1))

    def score_one(self, query: str, doc_id: int, k1: float, b: float) -> float:
        s = 0.0
        for t in self.tokenizer(query):  # duplicates each contribute (bm25.py:151)
            tf = self.tf.get(t, {}).get(doc_id, 0)
            idf = self.idf.get(t, 0.0)
            if self.variant == "tfidf":
                s += tf * idf
            else:
                if tf == 0 and k1 == 0:
                    continue  # engine divergence note in scoring.py (0/0 in ref)
                # avgdl == 0 (all-empty corpus): reference raises; we define 0
                norm = b * self.dl[doc_id] / self.avgdl if self.avgdl else 0.0
                s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + norm))
        return s

    def search(self, query: str, top_k: int, k1: float = 1.5, b: float = 0.75) -> list[tuple[int, float]]:
        """Exhaustive scoring of every doc + stable desc sort (bm25.py:100-106):
        ties and the zero tail resolve by ascending doc_id."""
        rows = [(d, self.score_one(query, d, k1, b)) for d in self.doc_ids]
        rows.sort(key=lambda x: (-x[1], x[0]))
        return rows[:top_k]

    def search_all(self, queries: dict[int, str], top_k: int, k1=1.5, b=0.75):
        return {q: self.search(text, top_k, k1, b) for q, text in queries.items()}


# --------------------------- fusion ----------------------------------------

def borda(ranked_ids: list[int]) -> dict[int, float]:
    # (n - idx + 1)/n, idx 0-based — top-1 gets (n+1)/n, quirk kept (hybrid.py:247-249)
    n = len(ranked_ids)
    return {pid: (n - i + 1) / n for i, pid in enumerate(ranked_ids)}


def rrf(ranked_ids: list[int]) -> dict[int, float]:
    return {pid: 1.0 / (60 + i + 1) for i, pid in enumerate(ranked_ids)}  # hybrid.py:251-252


def minmax_norm(scores: dict[int, float]) -> dict[int, float]:
    v = np.asarray(list(scores.values()), dtype=np.float32)
    lo, hi = v.min(), v.max()
    out = np.ones_like(v) if lo == hi else (v - lo) / (hi - lo)  # hybrid.py:254-258
    return dict(zip(scores.keys(), out.tolist()))


def zscore_norm(scores: dict[int, float]) -> dict[int, float]:
    v = np.asarray(list(scores.values()), dtype=np.float32)
    mu = v.mean()
    sd = v.std(ddof=1) if v.size > 1 else np.float32(0.0)  # torch.std default unbiased
    out = np.zeros_like(v) if sd == 0 else (v - mu) / sd  # hybrid.py:260-264
    return dict(zip(scores.keys(), out.tolist()))


def arctan_norm(scores: dict[int, float]) -> dict[int, float]:
    v = np.asarray(list(scores.values()), dtype=np.float32)
    out = (2 / math.pi) * np.arctan(np.float32(0.1) * v)  # hybrid.py:266-269
    return dict(zip(scores.keys(), out.tolist()))


def percentile_rank_norm(scores: dict[int, float], distr: np.ndarray, nce: bool = False) -> dict[int, float]:
    v = np.asarray(list(scores.values()), dtype=np.float32)
    d = np.asarray(distr, dtype=np.float32)
    idx = np.abs(d[:, None] - v[None, :]).argmin(axis=0)  # first-min tie rule
    out = idx / d.shape[0]
    if nce:  # hybrid.py:276-277 (incl. the /100 quirk)
        nd = NormalDist()
        out = np.asarray([nd.inv_cdf(min(max(p / 100, 1e-12), 1 - 1e-12)) for p in out]) * 21.06 + 50
    return dict(zip(scores.keys(), [float(x) for x in out]))


def aggregate(*score_dicts: dict[int, float]) -> list[tuple[int, float]]:
    # sum across systems, missing system contributes 0 (hybrid.py:293-307);
    # tie-break pinned to doc_id ASC (measure-zero in ref, contract in ours)
    acc: dict[int, float] = {}
    for d in score_dicts:
        for pid, s in d.items():
            acc[pid] = acc.get(pid, 0.0) + float(s)
    return sorted(acc.items(), key=lambda x: (-x[1], x[0]))


def fuse(
    ranked_lists: dict[str, dict[int, list[tuple[int, float]]]],
    method: str,
    normalization: str | None = None,
    weights: dict[str, float] | None = None,
    distributions: dict[str, np.ndarray] | None = None,
) -> dict[int, list[tuple[int, float]]]:
    """ranked_lists: system → qid → [(doc_id, score) desc]. Mirrors
    Aggregator.fuse (hybrid.py:170-220) with per-query outputs."""
    qids = sorted(next(iter(ranked_lists.values())).keys())
    out = {}
    for q in qids:
        per_system = []
        for system, by_q in ranked_lists.items():
            pairs = by_q[q]
            ids = [p for p, _ in pairs]
            sc = {p: s for p, s in pairs}
            if method == "bcf":
                res = borda(ids)
            elif method == "rrf":
                res = rrf(ids)
            elif method == "nsf":
                if normalization == "min-max":
                    res = minmax_norm(sc)
                elif normalization == "z-score":
                    res = zscore_norm(sc)
                elif normalization == "arctan":
                    res = arctan_norm(sc)
                elif normalization in ("percentile-rank", "normal-curve-equivalent"):
                    res = percentile_rank_norm(
                        sc, distributions[system], nce=(normalization == "normal-curve-equivalent")
                    )
                else:
                    res = sc
                w = weights[system] if weights else 1.0 / len(ranked_lists)
                res = {p: s * w for p, s in res.items()}
            else:
                raise ValueError(method)
            per_system.append(res)
        out[q] = aggregate(*per_system)
    return out


# --------------------------- metrics ---------------------------------------

def recall_at(gt: list[int], preds: list[int], k: int) -> float:
    return sum(1 for d in preds[:k] if d in gt) / len(gt)


def precision_at(gt: list[int], preds: list[int], k: int) -> float:
    cut = preds[:k]
    return sum(1 for d in cut if d in gt) / len(cut) if cut else 0.0


def average_precision_at(gt: list[int], preds: list[int], k: int) -> float:
    s = 0.0
    for i, d in enumerate(preds[:k]):
        if d in gt:
            s += precision_at(gt, preds, i + 1)
    return s / len(gt)


def mrr_at(gt: list[int], preds: list[int], k: int) -> float:
    best = 0.0
    for i, d in enumerate(preds[:k]):
        if d in gt:
            best = max(best, 1.0 / (i + 1))
    return best


def ndcg_at(gt: list[int], preds: list[int], k: int) -> float:
    # reference index convention: rel_0 raw; rel_i / log2(i+1) for i ≥ 1
    # (metrics.py:97-110) — NOT the standard log2(i+2).
    rel = [1 if d in gt else 0 for d in preds[:k]]
    dcg = (rel[0] if rel else 0) + sum(rel[i] / math.log2(i + 1) for i in range(1, len(rel)))
    idcg = 1 + sum(1 / math.log2(i + 1) for i in range(1, len(gt)))
    return dcg / idcg if idcg != 0 else 0.0


def r_precision(gt: list[int], preds: list[int]) -> float:
    r = len(gt)
    return sum(1 for d in preds[:r] if d in gt) / r


def compute_all_metrics(
    all_gt: list[list[int]],
    all_preds: list[list[int]],
    recall_k=(5, 10, 20, 50, 100, 200, 500, 1000),
    map_k=(10, 100),
    mrr_k=(10, 100),
    ndcg_k=(10, 100),
) -> dict[str, float]:
    out = {}
    for k in recall_k:
        out[f"recall@{k}"] = mean(recall_at(g, p, k) for g, p in zip(all_gt, all_preds))
    for k in map_k:
        out[f"map@{k}"] = mean(average_precision_at(g, p, k) for g, p in zip(all_gt, all_preds))
    for k in mrr_k:
        out[f"mrr@{k}"] = mean(mrr_at(g, p, k) for g, p in zip(all_gt, all_preds))
    for k in ndcg_k:
        out[f"ndcg@{k}"] = mean(ndcg_at(g, p, k) for g, p in zip(all_gt, all_preds))
    out["r-precision"] = mean(r_precision(g, p) for g, p in zip(all_gt, all_preds))
    return out
