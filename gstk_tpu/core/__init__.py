from gstk_tpu.core.cameras import Camera, CameraModel, camera_matrices
from gstk_tpu.core.gaussians import GaussianScene

__all__ = ["Camera", "CameraModel", "camera_matrices", "GaussianScene"]
