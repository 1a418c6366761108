"""Composed IVF-PQ probe sweep: recall@10 AND real scanned-candidate
fraction of (coarse quantizer x nprobe) over ADOPTED PQ-32x256 codes —
the measurement behind the composed-index adoption row in COVERAGE.md
(round-6/8 VERDICT directive: the 3-of-12 probe restriction measured
0.446 @10 with no published sweep, so a 100 TB deployment had no
measured config combining partition-pruned probing AND 8x compression
at >= 0.7 recall).

Offline numpy harness ON PURPOSE, same contract as tools/pq_sweep.py:
it answers the *selection* question fast; the registry query
(`ann_ivfpq_adopted_recall_eval`) measures the shipped Spark pipeline
at the adopted config. Deterministic: fixed seed, fixed query band
(50 highest ids), stable argsort.

Coarse quantizers swept:
- ``sampled12``: the registry eval's deterministic centroid set
  (vec_id % 37 == 0, lowest 12) — verifiability-first, untrained.
- ``kmeans16`` / ``kmeans32``: Lloyd-trained coarse centroids (what a
  real deployment ships; build_ivfpq_index takes any centroid table).

Cost is reported as the MEASURED mean fraction of the corpus scanned
per query (probed-bucket population / n), not nprobe/n_centroids —
bucket sizes are skewed, so the nominal fraction understates hot
buckets.

Usage: python tools/ivfpq_probe_sweep.py [sf_dir]
       (default /root/testdata/sf0.1; prints one JSON line per config)
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np

M_SUB = 32
K_CODES = 256
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


def _pq(X: np.ndarray):
    d_sub = X.shape[1] // M_SUB
    books = [
        _kmeans(X[:, i * d_sub:(i + 1) * d_sub], K_CODES)
        for i in range(M_SUB)
    ]
    codes = np.stack(
        [
            ((X[:, i * d_sub:(i + 1) * d_sub][:, None, :] - books[i][None]) ** 2)
            .sum(2)
            .argmin(1)
            for i in range(M_SUB)
        ],
        1,
    )
    return books, codes


def _sweep(X, books, codes, coarse, gt, qidx, nprobes, label):
    n, dim = X.shape
    d_sub = dim // M_SUB
    # centroid distances per data row (bucket assignment) and per query
    a = (
        (X**2).sum(1)[:, None] - 2 * X @ coarse.T + (coarse**2).sum(1)[None, :]
    ).argmin(1)
    out = []
    for nprobe in nprobes:
        rec, frac = [], []
        for qi in qidx:
            qd = ((coarse - X[qi]) ** 2).sum(1)
            probed = set(np.argsort(qd, kind="stable")[:nprobe])
            mask = np.isin(a, list(probed))
            mask[qi] = False  # self-exclusion, same as the registry eval
            d = np.zeros(n)
            for i in range(M_SUB):
                lut = ((books[i] - X[qi, i * d_sub:(i + 1) * d_sub]) ** 2).sum(1)
                d += lut[codes[:, i]]
            d[~mask] = np.inf
            top = set(np.argsort(d, kind="stable")[:10])
            rec.append(len(top & gt[qi]) / 10)
            frac.append(mask.sum() / n)
        out.append(
            {
                "coarse": label,
                "n_centroids": int(coarse.shape[0]),
                "nprobe": int(nprobe),
                "scan_frac": round(float(np.mean(frac)), 3),
                "recall_at_10": round(float(np.mean(rec)), 3),
                "pq": f"m{M_SUB}xk{K_CODES}",
                "n": int(n),
            }
        )
        print(json.dumps(out[-1]))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rel = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchnumpy()
    ids = rel["vec_id"]
    X = np.array(rel["embedding"].tolist(), dtype=np.float64)
    n = len(X)
    qidx = np.arange(n - N_QUERIES, n)
    gt = {}
    for qi in qidx:
        d2 = ((X - X[qi]) ** 2).sum(1)
        d2[qi] = np.inf
        gt[qi] = set(np.argsort(d2, kind="stable")[:10])

    books, codes = _pq(X)

    # the registry eval's deterministic sampled centroids
    samp = np.where(ids % 37 == 0)[0][:12]
    _sweep(X, books, codes, X[samp], gt, qidx,
           [1, 2, 3, 4, 6, 8, 10, 12], "sampled12")
    for k in (16, 32):
        coarse = _kmeans(X, k, 15)
        _sweep(X, books, codes, coarse, gt, qidx,
               [1, 2, 3, 4, 6, 8, 12], f"kmeans{k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
