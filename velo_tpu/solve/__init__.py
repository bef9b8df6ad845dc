from velo_tpu.solve import icp, lm, residuals  # noqa: F401
