from dpfx.utils.viz import save_cloud_montage

__all__ = ["save_cloud_montage"]
