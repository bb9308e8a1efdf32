#!/usr/bin/env python
"""EuRoC MAV runner, cam0 (reference: examples/run_dso_euroc.cc).

Usage:
  python examples/run_dso_euroc.py files=<mav0/cam0> calib=camera.txt \
      [preset=0] [loopclosing=1] [output=results.txt]
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from run_common import parse_args, run  # noqa: E402

if __name__ == "__main__":
    run(parse_args(sys.argv[1:]), dataset_type="euroc")
