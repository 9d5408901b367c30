from nrt_ray.kernels import efp, fit, monitors, outliers, regressors, stats  # noqa: F401
