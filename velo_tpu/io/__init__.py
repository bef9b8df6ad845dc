from velo_tpu.io import kitti  # noqa: F401
