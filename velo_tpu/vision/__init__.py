from velo_tpu.vision import corners, depth_assoc, klt, pyramid, tracks  # noqa: F401
