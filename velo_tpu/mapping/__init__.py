from velo_tpu.mapping import local_map, voxel_hash  # noqa: F401
