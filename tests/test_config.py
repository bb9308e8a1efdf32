"""Config-time mode interlocks (Config.validate).

Mirrors the reference's startup conflict check: loop closing without LDSO
point selection is a hard error (run_dso_tum_mono.cc:284-289 exits -1).
"""

import dataclasses

import pytest

from ldso_tpu.config import Config, SOLVER_MOMENTUM, preset

pytestmark = pytest.mark.smoke


def test_defaults_validate():
    for p in (0, 1, 2, 3):
        preset(p).validate()


def test_loop_closing_requires_ldso_selection():
    cfg = dataclasses.replace(Config(), point_selection=0)
    with pytest.raises(ValueError, match="point_selection"):
        cfg.validate()
    # disabling loop closing makes DSO selection legal again
    dataclasses.replace(cfg, enable_loop_closing=False).validate()


def test_momentum_device_lm_interlock():
    cfg = dataclasses.replace(
        Config(), solver_mode=Config().solver_mode | SOLVER_MOMENTUM,
        force_accept_step=False, ba_device_lm=True)
    with pytest.raises(ValueError, match="SOLVER_MOMENTUM"):
        cfg.validate()
    # the supported spelling: host LM loop
    dataclasses.replace(cfg, ba_device_lm=False).validate()
