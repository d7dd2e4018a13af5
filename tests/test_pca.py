"""PCA power iteration (operators/pca.py) — parity against a numpy
replay of the same fixed-round spec, and against numpy's eigh."""

import numpy as np

from agnes_spark.operators.pca import pca_power_top


def _numpy_replay(vecs, rounds, scale):
    q = np.round(np.asarray(vecs, dtype=np.float64) * scale)
    n = len(q)
    mu = q.sum(axis=0) / n
    c = (q.T @ q - n * np.outer(mu, mu)) / (n - 1)
    v = np.ones(q.shape[1])
    for _ in range(rounds):
        w = c @ v
        v = w / np.sqrt((w * w).sum())
    w = c @ v
    lam = float(w @ v)
    return lam, w / lam, c


def test_pca_matches_numpy(spark):
    rng = np.random.RandomState(11)
    # anisotropic cloud: one dominant direction
    base = rng.randn(200, 6) * np.array([5.0, 1.0, 0.5, 0.25, 0.1, 0.05])
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    got = pca_power_top(df, "v", rounds=6, scale=1000, n_components_out=4).collect()[0]
    lam, comps, c = _numpy_replay(base, 6, 1000)
    # numpy uses BLAS association orders, so compare loosely
    assert abs(got.eigenvalue - lam) / lam < 1e-9
    for k in range(4):
        assert abs(got[f"c{k}"] - comps[k]) < 1e-9
    # the eigenvalue is genuinely the top one (vs full eigh)
    top = np.linalg.eigvalsh(c).max()
    assert abs(got.eigenvalue - top) / top < 1e-3


def test_pca_two_point_cloud_exact_direction(spark):
    # two antipodal clusters on the x-axis: top component is e_x
    rows = [(i, [10.0 if i % 2 else -10.0, 0.001 * i]) for i in range(40)]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    got = pca_power_top(df, "v", rounds=6, scale=1000, n_components_out=2).collect()[0]
    assert abs(abs(got.c0) - abs(got.eigenvalue) / got.eigenvalue) < 1e-6
    assert abs(got.c1) < 1e-3
