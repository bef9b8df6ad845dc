from velo_tpu.pipeline import odometry  # noqa: F401
