"""Pallas fused dist+top-k preselection kernel (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from velo_tpu.pallas.dist_topk import dist_topk


@pytest.mark.parametrize("n,q,bf", [(3072, 1000, 4), (4096, 512, 16)])
def test_recall_and_distances(rng, n, q, bf):
    t = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    tm = rng.random(n) > 0.1
    qs = (t[rng.integers(0, n, q)]
          + rng.normal(0, 0.5, (q, 3))).astype(np.float32)

    d2, idx = dist_topk(jnp.asarray(t), jnp.asarray(tm), jnp.asarray(qs),
                        k=16, bin_factor=bf, interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)

    D = ((qs[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    D[:, ~tm] = 1e30
    exact_idx = np.argsort(D, axis=1)[:, :16]

    recall = np.mean([len(set(idx[i]) & set(exact_idx[i])) / 16
                      for i in range(q)])
    assert recall > 0.97, recall
    # The nearest neighbor itself must essentially never be lost.
    assert np.mean(idx[:, 0] == exact_idx[:, 0]) > 0.995
    # Returned d2 matches the actual distance of the returned index.
    d2_true = np.take_along_axis(D, idx, 1)
    assert np.abs(d2 - d2_true).max() < 1e-2
    # Ascending order.
    assert np.all(np.diff(d2, axis=1) >= -1e-3)


def test_masked_targets_never_returned(rng):
    n, q = 1024, 256
    t = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    tm = np.zeros(n, bool)
    tm[: n // 8] = True  # only the first 128 targets are real
    qs = rng.uniform(-5, 5, (q, 3)).astype(np.float32)
    d2, idx = dist_topk(jnp.asarray(t), jnp.asarray(tm), jnp.asarray(qs),
                        k=16, bin_factor=4, interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    # Lanes with small distances must point at unmasked targets.
    real = d2 < 1e20
    assert real.any()
    assert np.all(tm[idx[real]])


def test_padding_keeps_recall(rng):
    """Appending masked padding rows changes the bin structure (the result
    is approximate and legitimately reorders), but recall against the exact
    answer must stay high and padding must never be returned."""
    n, q, k = 1024, 256, 8
    t = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    qs = rng.uniform(-10, 10, (q, 3)).astype(np.float32)
    D = ((qs[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    exact = np.argsort(D, axis=1)[:, :k]

    t2 = np.concatenate([t, rng.uniform(-1, 1, (1024, 3)).astype(np.float32)])
    tm2 = np.concatenate([np.ones(n, bool), np.zeros(1024, bool)])
    d2, idx = dist_topk(jnp.asarray(t2), jnp.asarray(tm2),
                        jnp.asarray(qs), k=k, bin_factor=4, interpret=True)
    idx = np.asarray(idx)
    recall = np.mean([len(set(idx[i]) & set(exact[i])) / k
                      for i in range(q)])
    assert recall > 0.95, recall
    assert np.all(idx[np.asarray(d2) < 1e20] < n)  # padding never returned
