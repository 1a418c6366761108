"""PQ configuration sweep: recall@10 of product quantization vs exact
squared-L2 over the embeddings table, across (m_subspaces, k_codes)
and raw-vs-IVF-residual encoding — the measurement behind the
COVERAGE.md index matrix and the adopted PQ-32x256 configuration
(round-5 VERDICT directive #5).

Offline numpy harness ON PURPOSE: it answers the *selection* question
("which config is worth shipping") fast, while the registry queries
(`ann_pq_adopted_recall_eval`, contract twins) measure the shipped
Spark pipeline itself. Deterministic: fixed seed, fixed query band
(50 highest ids), stable argsort.

Usage: python tools/pq_sweep.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line per config.
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np

CONFIGS = [(8, 16), (8, 64), (8, 256), (16, 16), (16, 64), (16, 256),
           (32, 16), (32, 64), (32, 256)]
RESIDUAL_CONFIGS = [(8, 256), (16, 256)]
N_QUERIES = 50
SEED = 0


def _kmeans(S: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    rng = np.random.RandomState(SEED)
    C = S[rng.choice(len(S), size=min(k, len(S)), replace=False)].copy()
    for _ in range(iters):
        d2 = (S**2).sum(1)[:, None] - 2 * S @ C.T + (C**2).sum(1)[None, :]
        a = d2.argmin(1)
        for j in range(C.shape[0]):
            m = a == j
            if m.any():
                C[j] = S[m].mean(0)
    return C


def _recall(X, Z, m_sub, k, gt, qidx, assign=None, coarse=None) -> float:
    """ADC recall of PQ(m_sub, k) trained/encoded on Z (= X raw, or
    residuals); with assign/coarse set, LUTs use per-bucket residual
    queries (exhaustive over buckets — isolates quantization loss)."""
    n, dim = X.shape
    d_sub = dim // m_sub
    books = [_kmeans(Z[:, i * d_sub:(i + 1) * d_sub], k) for i in range(m_sub)]
    codes = np.stack(
        [((Z[:, i * d_sub:(i + 1) * d_sub][:, None, :] - books[i][None]) ** 2)
         .sum(2).argmin(1) for i in range(m_sub)], 1)
    rec = []
    for qi in qidx:
        d = np.zeros(n)
        if assign is None:
            for i in range(m_sub):
                lut = ((books[i] - X[qi, i * d_sub:(i + 1) * d_sub]) ** 2).sum(1)
                d += lut[codes[:, i]]
        else:
            for c_id in range(coarse.shape[0]):
                mask = assign == c_id
                if not mask.any():
                    continue
                qr = X[qi] - coarse[c_id]
                for i in range(m_sub):
                    lut = ((books[i] - qr[i * d_sub:(i + 1) * d_sub]) ** 2).sum(1)
                    d[mask] += lut[codes[mask, i]]
        d[qi] = np.inf
        top = set(np.argsort(d, kind="stable")[:10])
        rec.append(len(top & gt[qi]) / 10)
    return float(np.mean(rec))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    X = np.array(
        duckdb.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
            "ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    n = len(X)
    qidx = np.arange(n - N_QUERIES, n)
    gt = {}
    for qi in qidx:
        d2 = ((X - X[qi]) ** 2).sum(1)
        d2[qi] = np.inf
        gt[qi] = set(np.argsort(d2, kind="stable")[:10])
    for m_sub, k in CONFIGS:
        r = _recall(X, X, m_sub, k, gt, qidx)
        print(json.dumps({"encoding": "raw", "m": m_sub, "k": k,
                          "bytes_per_vec": m_sub * (1 if k <= 256 else 2),
                          "recall_at_10": round(r, 3), "n": n}))
    coarse = _kmeans(X, 16, 15)
    assign = (((X[:, None, :] - coarse[None]) ** 2).sum(2)).argmin(1)
    R = X - coarse[assign]
    for m_sub, k in RESIDUAL_CONFIGS:
        r = _recall(X, R, m_sub, k, gt, qidx, assign=assign, coarse=coarse)
        print(json.dumps({"encoding": "ivf16_residual", "m": m_sub, "k": k,
                          "bytes_per_vec": m_sub,
                          "recall_at_10": round(r, 3), "n": n}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
