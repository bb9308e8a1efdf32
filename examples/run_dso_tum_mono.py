#!/usr/bin/env python
"""TUM monoVO runner (reference: examples/run_dso_tum_mono.cc).

Usage:
  python examples/run_dso_tum_mono.py files=<sequence.zip|dir> \
      calib=camera.txt gamma=pcalib.txt vignette=vignette.png \
      [vocab=orbvoc.txt] [preset=0] [loopclosing=1] [output=results.txt]
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from run_common import parse_args, run  # noqa: E402

if __name__ == "__main__":
    run(parse_args(sys.argv[1:]), dataset_type="tum")
