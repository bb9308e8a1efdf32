from ldso_tpu.camera.models import CameraModel, distort_coordinates  # noqa: F401
from ldso_tpu.camera.calib import Calibration  # noqa: F401
from ldso_tpu.camera.undistort import Undistorter, PhotometricCalib  # noqa: F401
