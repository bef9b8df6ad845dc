"""KITTI I/O helpers (C1): image read-ahead."""


def test_image_prefetcher_order_and_content():
    """Read-ahead must return exactly fetch(i) for sequential access, and
    tolerate out-of-order (random) access via synchronous fallback."""
    import numpy as np

    from velo_tpu.io.kitti import ImagePrefetcher

    calls = []

    def fetch(i):
        calls.append(i)
        return np.full((2, 2), float(i))

    pf = ImagePrefetcher(fetch, n_frames=10, depth=3, workers=2)
    for i in range(10):
        np.testing.assert_array_equal(pf.get(i), np.full((2, 2), float(i)))
    # Every frame fetched exactly once in the sequential pattern.
    assert sorted(calls) == list(range(10))
    pf.close()

    calls.clear()
    pf = ImagePrefetcher(fetch, n_frames=10, depth=2, workers=1)
    np.testing.assert_array_equal(pf.get(7), np.full((2, 2), 7.0))
    pf.close()
