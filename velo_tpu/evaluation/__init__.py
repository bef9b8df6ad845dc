from velo_tpu.evaluation import kitti_metric  # noqa: F401
