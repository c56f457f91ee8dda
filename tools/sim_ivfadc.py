"""Numpy simulation of the deterministic IVFADC pipeline (l45c design
dial): replicates kmeans_fit (smallest-id init, 6 dp rounding,
lowest-index tie-break) for the coarse quantizer and the per-subspace PQ
codebooks, then sweeps n_probe x shortlist and reports top-10 recall vs
exact L2 plus the scanned-candidate fraction. Offline tooling only."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd


def det_kmeans(X: np.ndarray, k: int, iters: int) -> np.ndarray:
    cents = np.round(X[:k].astype(np.float64), 6)
    for _ in range(iters):
        d = np.round(
            ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 6
        )
        assign = d.argmin(axis=1)  # argmin takes lowest index on ties
        new = cents.copy()
        for c in range(k):
            mask = assign == c
            if mask.any():
                new[c] = np.round(X[mask].mean(axis=0), 6)
        cents = new
    return cents


def det_assign(X: np.ndarray, cents: np.ndarray) -> np.ndarray:
    d = np.round(((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), 6)
    return d.argmin(axis=1)


def main(sf_dir: str) -> None:
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    n, dim = X.shape
    qids = [i for i in range(0, min(n, 5050), 101)]
    Q = X[qids]
    print(f"n={n} dim={dim} queries={len(qids)}")

    # exact ground truth (squared L2, ties by id via stable argsort)
    d_exact = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    truth = [set(np.argsort(d_exact[i], kind="stable")[:10]) for i in range(len(qids))]

    # coarse quantizer: k=16, iters=3 (the l3_ivf params)
    coarse = det_kmeans(X, 16, 3)
    cell = det_assign(X, coarse)
    qd = np.round(((Q[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2), 6)

    # PQ books: m=4, k=16, iters=2 (the l45 params)
    m, pk, sub = 4, 16, dim // 4
    books = [det_kmeans(X[:, i * sub:(i + 1) * sub], pk, 2) for i in range(m)]
    codes = np.stack(
        [det_assign(X[:, i * sub:(i + 1) * sub], books[i]) for i in range(m)],
        axis=1,
    )
    luts = [
        np.round(
            ((Q[:, None, i * sub:(i + 1) * sub] - books[i][None, :, :]) ** 2).sum(axis=2),
            6,
        )
        for i in range(m)
    ]
    adc = sum(luts[i][:, codes[:, i]] for i in range(m))  # (q, n)

    for n_probe in (2, 4, 6, 8, 12, 16):
        probed = np.argsort(qd, axis=1, kind="stable")[:, :n_probe]
        for short in (50, 100, 200):
            recs, fracs = [], []
            for i in range(len(qids)):
                cand = np.where(np.isin(cell, probed[i]))[0]
                fracs.append(len(cand) / n)
                order = cand[np.argsort(adc[i, cand], kind="stable")][:short]
                ex = ((Q[i] - X[order]) ** 2).sum(axis=1)
                final = set(order[np.argsort(ex, kind="stable")[:10]])
                recs.append(len(final & truth[i]) / 10)
            print(
                f"n_probe={n_probe:2d} short={short:3d} "
                f"recall={np.mean(recs):.3f} scanned_frac={np.mean(fracs):.3f}"
            )



def residual_variant(sf_dir: str) -> None:
    """Compare plain-PQ IVFADC vs residual-PQ IVFADC (Jégou's actual
    construction: PQ trained on x - centroid, per-cell query LUTs)."""
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    n, dim = X.shape
    qids = [i for i in range(0, min(n, 5050), 101)]
    Q = X[qids]
    d_exact = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    truth = [set(np.argsort(d_exact[i], kind="stable")[:10]) for i in range(len(qids))]
    coarse = det_kmeans(X, 16, 3)
    cell = det_assign(X, coarse)
    qd = np.round(((Q[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2), 6)
    R = X - coarse[cell]  # residuals
    m, pk, sub = 4, 16, dim // 4
    for tag, base in (("plain", X), ("residual", R)):
        books = [det_kmeans(base[:, i*sub:(i+1)*sub], pk, 2) for i in range(m)]
        codes = np.stack([det_assign(base[:, i*sub:(i+1)*sub], books[i]) for i in range(m)], axis=1)
        for n_probe, short in ((6, 200), (4, 100)):
            probed = np.argsort(qd, axis=1, kind="stable")[:, :n_probe]
            recs, fracs = [], []
            for i in range(len(qids)):
                cand = np.where(np.isin(cell, probed[i]))[0]
                fracs.append(len(cand) / n)
                if tag == "residual":
                    # per-cell LUT: query residual vs that cell's centroid
                    qr = Q[i][None, :] - coarse[cell[cand]]
                    ad = np.zeros(len(cand))
                    for s_i in range(m):
                        # distance from query residual slice to the candidate's code centroid
                        lut = np.round(((qr[:, s_i*sub:(s_i+1)*sub][:, :, None] - books[s_i].T[None, :, :])**2).sum(axis=1), 6)
                        ad += lut[np.arange(len(cand)), codes[cand, s_i]]
                else:
                    luts = [np.round(((Q[i][None, i2*sub:(i2+1)*sub] - books[i2])**2).sum(axis=1), 6) for i2 in range(m)]
                    ad = sum(luts[i2][codes[cand, i2]] for i2 in range(m))
                order = cand[np.argsort(ad, kind="stable")][:short]
                ex = ((Q[i] - X[order]) ** 2).sum(axis=1)
                final = set(order[np.argsort(ex, kind="stable")[:10]])
                recs.append(len(final & truth[i]) / 10)
            print(f"{tag:8s} n_probe={n_probe} short={short}: recall={np.mean(recs):.3f} frac={np.mean(fracs):.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
