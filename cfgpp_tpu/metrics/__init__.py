from cfgpp_tpu.metrics.fid import compute_stats, fid_from_features, frechet_distance
from cfgpp_tpu.metrics.functional import mnc, mse, psnr

__all__ = ["compute_stats", "fid_from_features", "frechet_distance",
           "mnc", "mse", "psnr"]
