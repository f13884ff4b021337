from dpfx.utils.profiling import profile_sampling, time_fn, trace
from dpfx.utils.viz import save_cloud_montage

__all__ = ["save_cloud_montage", "profile_sampling", "time_fn", "trace"]
