from velo_tpu.geom import se3, camera  # noqa: F401
