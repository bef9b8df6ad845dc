from velo_tpu.lidar import curvature, deskew, features, rangeimage  # noqa: F401
