"""Dataset readers: TUM monoVO (zip or folder), KITTI odometry, EuRoC.

Rebuild of examples/DatasetReader.h (SURVEY.md §2 C32). The reference
needs libzip + OpenCV; here python's zipfile + PIL decode on host and hand
raw arrays to the device preprocessing pipeline (ops/preprocess.py).
"""

from __future__ import annotations

import io as _io
import os
import re
import zipfile
from typing import List, Optional

import numpy as np

try:
    from PIL import Image
    _HAS_PIL = True
except ImportError:          # pragma: no cover
    _HAS_PIL = False

from ldso_tpu.camera.undistort import Undistorter, PhotometricCalib


def _decode_image(data: bytes) -> np.ndarray:
    if not _HAS_PIL:
        raise RuntimeError("PIL unavailable; cannot decode images")
    img = Image.open(_io.BytesIO(data))
    if img.mode not in ("L", "I;16"):
        img = img.convert("L")
    return np.asarray(img)


def _read_image_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return _decode_image(f.read())


class ImageFolderReader:
    """TUM monoVO / KITTI / EuRoC reader (DatasetReader.h:78-416).

    dataset_type: 'tum' | 'kitti' | 'euroc'."""

    def __init__(self, path: str, calib_file: str,
                 gamma_file: Optional[str] = None,
                 vignette_file: Optional[str] = None,
                 dataset_type: str = "tum"):
        self.path = path
        self.dataset_type = dataset_type
        self.is_zipped = path.endswith(".zip")
        self.zip = None
        self.files: List[str] = []
        self.timestamps: List[float] = []
        self.exposures: List[float] = []

        if self.is_zipped:
            self.zip = zipfile.ZipFile(path)
            names = [n for n in self.zip.namelist()
                     if n.lower().endswith((".png", ".jpg"))]
            self.files = sorted(names)
        elif dataset_type == "kitti":
            self._load_kitti()
        elif dataset_type == "euroc":
            self._load_euroc()
        else:
            img_dir = path
            self.files = sorted(
                os.path.join(img_dir, f) for f in os.listdir(img_dir)
                if f.lower().endswith((".png", ".jpg")))

        if dataset_type == "tum":
            self._load_tum_times()

        vig = None
        if vignette_file and os.path.exists(vignette_file):
            vig = _read_image_file(vignette_file)
        self.undistorter = Undistorter.from_file(calib_file, gamma_file, vig)
        # benchmark fault-injection knobs (benchmark_varNoise /
        # benchmark_varBlurNoise / benchmark_noiseGridsize,
        # Setting.cc:95-101; applied where the reference does — inside the
        # undistortion stage, Undistort.cc:372-470). CLI: noise= / blur=.
        self.var_noise = 0.0
        self.var_blur = 0.0
        self.noise_grid_size = 3

    # ------------------------------------------------------------- loaders
    def _load_kitti(self):
        """times.txt + image_0/%06d.png (DatasetReader.h:285-320)."""
        times = os.path.join(self.path, "times.txt")
        with open(times) as f:
            for line in f:
                line = line.strip()
                if line:
                    self.timestamps.append(float(line))
        for i in range(len(self.timestamps)):
            self.files.append(os.path.join(self.path, "image_0", f"{i:06d}.png"))

    def _load_euroc(self):
        """cam0 data.csv: '<ns>,<filename>' (DatasetReader.h:254-283)."""
        csv = os.path.join(self.path, "data.csv")
        with open(csv) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                parts = line.strip().split(",")
                if len(parts) >= 2 and parts[0]:
                    self.timestamps.append(float(parts[0]) * 1e-9)
                    self.files.append(os.path.join(self.path, "data",
                                                   parts[1].strip()))

    def _load_tum_times(self):
        """times.txt: 'id stamp [exposure]' with zero-exposure repair
        (DatasetReader.h:322-393)."""
        base = self.path[:-4] if self.is_zipped else self.path
        candidates = [os.path.join(os.path.dirname(base), "times.txt"),
                      os.path.join(base, "times.txt"),
                      re.sub(r"images.*$", "times.txt", base)]
        times_file = next((c for c in candidates if os.path.exists(c)), None)
        if times_file is None:
            return
        stamps, expos = [], []
        with open(times_file) as f:
            for line in f:
                t = line.split()
                if len(t) >= 3:
                    stamps.append(float(t[1]))
                    expos.append(float(t[2]))
                elif len(t) == 2:
                    stamps.append(float(t[1]))
                    expos.append(0.0)
        expos = np.asarray(expos, np.float32)
        good = len(expos) == self.num_images()
        for i in range(len(expos)):
            if expos[i] == 0:
                nb = [expos[j] for j in (i - 1, i + 1)
                      if 0 <= j < len(expos) and expos[j] > 0]
                if nb:
                    expos[i] = float(np.mean(nb))
            if expos[i] == 0:
                good = False
        if len(stamps) != self.num_images():
            stamps, expos, good = [], [], False
        self.timestamps = list(stamps)
        self.exposures = list(expos) if good else []

    # ------------------------------------------------------------- access
    def num_images(self) -> int:
        return len(self.files)

    def get_raw(self, idx: int) -> np.ndarray:
        if self.is_zipped:
            return _decode_image(self.zip.read(self.files[idx]))
        return _read_image_file(self.files[idx])

    def get_image(self, idx: int):
        """Returns (rectified photometric-linear image, exposure, timestamp)
        — the reference's ImageAndExposure (DatasetReader.h:193).

        The image is an ON-DEVICE jax.Array: only the raw 8/16-bit frame
        crosses the host->device link; photometric correction + remap run
        fused on device (preprocess_frame) and FullSystem.add_active_frame
        accepts the device handle directly, so the rectified float image
        never makes a round trip. `np.asarray(img)` recovers the host copy
        when one is needed."""
        import jax.numpy as jnp
        from ldso_tpu.ops.preprocess import preprocess_frame

        raw = self.get_raw(idx)
        u = self.undistorter
        pc = u.photometric
        G = (jnp.asarray(pc.G) if pc is not None and pc.valid else None)
        vig = (jnp.asarray(pc.vignette_inv)
               if pc is not None and pc.vignette_inv is not None else None)
        pyr = preprocess_frame(jnp.asarray(raw), G, vig,
                               jnp.asarray(u.remap_x), jnp.asarray(u.remap_y),
                               None, 1)
        img = pyr.dI[0][..., 0]
        if self.var_noise > 0.0 or self.var_blur > 0.0:
            import jax
            from ldso_tpu.ops.perturb import benchmark_perturb
            # deterministic per-frame key (the reference uses unseeded
            # rand() here — a nondeterminism SURVEY §4 says to avoid)
            img = benchmark_perturb(img, jax.random.PRNGKey(idx),
                                    self.var_noise, self.var_blur,
                                    self.noise_grid_size)
        expo = self.exposures[idx] if self.exposures else 1.0
        ts = self.timestamps[idx] if self.timestamps else 0.0
        return img, float(expo), float(ts)

    def get_photometric_gamma(self) -> Optional[np.ndarray]:
        pc = self.undistorter.photometric
        if pc is None or not pc.valid:
            return None
        return pc.G

    def calibration(self):
        return self.undistorter.calibration()
