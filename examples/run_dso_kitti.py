#!/usr/bin/env python
"""KITTI odometry runner (reference: examples/run_dso_kitti.cc).

Usage:
  python examples/run_dso_kitti.py files=<sequence_dir> calib=camera.txt \
      [preset=0] [mode=1] [loopclosing=1] [output=results.txt]
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from run_common import parse_args, run  # noqa: E402

if __name__ == "__main__":
    opts = parse_args(sys.argv[1:])
    if "mode" not in [a.split("=")[0] for a in sys.argv[1:]]:
        opts["mode"] = 1  # KITTI has no photometric calibration
    run(opts, dataset_type="kitti", kitti_output=True)
