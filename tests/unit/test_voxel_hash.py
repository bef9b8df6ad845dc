"""Voxel-hash grid vs scipy cKDTree oracle (SURVEY.md §4.2 item C9)."""
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from velo_tpu.mapping import voxel_hash


def random_cloud(rng, n, extent=40.0):
    return (rng.random((n, 3)) * 2 - 1).astype(np.float32) * extent


def test_knn_exact_within_voxel_radius(rng):
    pts = random_cloud(rng, 4000)
    queries = random_cloud(rng, 512)
    mask = np.ones(len(pts), bool)
    qmask = np.ones(len(queries), bool)
    voxel = 1.0
    grid = voxel_hash.build_grid(jnp.asarray(pts), jnp.asarray(mask), voxel)
    idx, dist, valid = voxel_hash.knn(
        grid, jnp.asarray(queries), jnp.asarray(qmask), k=3, max_dist=voxel,
        occupancy=8,
    )
    tree = cKDTree(pts)
    d_ref, i_ref = tree.query(queries, k=3, distance_upper_bound=voxel)

    idx, dist, valid = map(np.asarray, (idx, dist, valid))
    grid_pts = np.asarray(grid.pts)
    for qi in range(len(queries)):
        ref_valid = np.isfinite(d_ref[qi])
        assert valid[qi].sum() == ref_valid.sum(), qi
        # Distances must match the KD-tree exactly (same neighbor set).
        np.testing.assert_allclose(
            np.sort(dist[qi][valid[qi]]), np.sort(d_ref[qi][ref_valid]),
            atol=1e-4,
        )
        # And the gathered points are the true neighbors.
        if ref_valid.any():
            ref_pts = pts[i_ref[qi][ref_valid]]
            got_pts = grid_pts[idx[qi][valid[qi]]]
            np.testing.assert_allclose(
                np.sort(got_pts, axis=0), np.sort(ref_pts, axis=0), atol=1e-5
            )


def test_masked_targets_excluded(rng):
    pts = random_cloud(rng, 1000, extent=5.0)
    mask = rng.random(1000) > 0.5
    queries = pts[:64]
    grid = voxel_hash.build_grid(jnp.asarray(pts), jnp.asarray(mask), 1.0)
    idx, dist, valid = voxel_hash.knn(
        grid, jnp.asarray(queries), jnp.asarray(np.ones(64, bool)), k=2,
        max_dist=1.0,
    )
    tree = cKDTree(pts[mask])
    d_ref, _ = tree.query(queries, k=2, distance_upper_bound=1.0)
    got = np.where(np.asarray(valid), np.asarray(dist), np.inf)
    np.testing.assert_allclose(
        np.sort(got, axis=1), np.sort(d_ref, axis=1), atol=1e-4
    )


def test_masked_queries_invalid(rng):
    pts = random_cloud(rng, 500, extent=5.0)
    grid = voxel_hash.build_grid(
        jnp.asarray(pts), jnp.asarray(np.ones(500, bool)), 1.0
    )
    qmask = np.zeros(10, bool)
    _, _, valid = voxel_hash.knn(
        grid, jnp.asarray(pts[:10]), jnp.asarray(qmask), k=2, max_dist=1.0
    )
    assert not np.asarray(valid).any()


def test_payload_carried(rng):
    pts = random_cloud(rng, 300, extent=5.0)
    payload = np.arange(300, dtype=np.int32)[:, None]
    grid = voxel_hash.build_grid(
        jnp.asarray(pts), jnp.asarray(np.ones(300, bool)), 1.0,
        payload=jnp.asarray(payload),
    )
    # Payload row i must describe grid.pts row i.
    np.testing.assert_allclose(
        np.asarray(grid.pts), pts[np.asarray(grid.payload)[:, 0]], atol=0
    )


def test_voxel_downsample(rng):
    # Many duplicate-ish points in few voxels -> one survivor per voxel.
    base = np.array([[0.1, 0.1, 0.1], [5.2, 0.1, 0.1], [0.1, 7.3, 0.1]],
                    np.float32)
    pts = np.repeat(base, 50, axis=0) + rng.random((150, 3)).astype(np.float32) * 0.05
    mask = np.ones(150, bool)
    keep = voxel_hash.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 1.0)
    assert int(np.asarray(keep).sum()) == 3
    # Masked input points never survive.
    mask[:75] = False
    keep2 = voxel_hash.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 1.0)
    assert not np.asarray(keep2)[:75].any()


def test_dense_nn_matches_kdtree(rng):
    """MXU brute-force engine vs scipy cKDTree (same contract as hash knn)."""
    from velo_tpu.mapping import dense_nn

    pts = random_cloud(rng, 3000)
    queries = random_cloud(rng, 256)
    mask = rng.random(3000) > 0.3
    targets = dense_nn.make_targets(jnp.asarray(pts), jnp.asarray(mask))
    idx, dist, valid = dense_nn.knn(
        targets, jnp.asarray(queries), jnp.ones(256, dtype=bool), k=3,
        max_dist=2.0,
    )
    tree = cKDTree(pts[mask])
    d_ref, _ = tree.query(queries, k=3, distance_upper_bound=2.0)
    got = np.where(np.asarray(valid), np.asarray(dist), np.inf)
    np.testing.assert_allclose(
        np.sort(got, axis=1), np.sort(d_ref, axis=1), atol=1e-3
    )


def test_dense_nn_masked_queries(rng):
    from velo_tpu.mapping import dense_nn

    pts = random_cloud(rng, 100, extent=2.0)
    targets = dense_nn.make_targets(jnp.asarray(pts),
                                    jnp.ones(100, dtype=bool))
    _, _, valid = dense_nn.knn(targets, jnp.asarray(pts[:10]),
                               jnp.zeros(10, dtype=bool), k=2, max_dist=5.0)
    assert not np.asarray(valid).any()
