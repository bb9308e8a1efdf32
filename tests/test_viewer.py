"""Live viewer tests (SURVEY.md §2 C31: PangolinDSOViewer equivalent —
HTTP/JSON live state server, ldso_tpu/viz_live.py)."""

import json
import urllib.request

import numpy as np
import pytest

from ldso_tpu.viz_live import LiveViewer
from ldso_tpu.slam_map import FrameShell, GlobalMap


@pytest.mark.smoke
class TestLiveViewer:
    def test_endpoints_and_publish_hooks(self):
        v = LiveViewer(port=0).start()
        try:
            sh = FrameShell(id=3, timestamp=0.1, exposure=1.0)
            sh.T_cw = np.eye(4)
            sh.T_cw[0, 3] = -1.0
            v.publish_cam_pose(sh)

            gm = GlobalMap()
            sh.kf_id = 0
            gm.add_keyframe(sh)
            # a loop edge shows up in the n_loops counter
            sh.add_pose_rel(0, np.eye(4), is_loop=True)
            v.publish_keyframes(gm)
            v.publish_frame(np.random.RandomState(0).rand(48, 64) * 255)

            base = f"http://127.0.0.1:{v.port}"
            st = json.loads(urllib.request.urlopen(
                base + "/state", timeout=10).read())
            assert st["frame_id"] == 3
            # camera center = inv(T_cw)[:3,3] = (1, 0, 0)
            assert st["traj_odo"] == [[1.0, -0.0, -0.0]]
            assert st["n_kfs"] == 1
            assert st["n_loops"] == 1
            assert len(st["traj_opt"]) == 1
            assert len(st["frusta"]) == 1

            html = urllib.request.urlopen(base + "/", timeout=10).read()
            assert b"ldso_tpu live viewer" in html
            png = urllib.request.urlopen(base + "/frame", timeout=10).read()
            assert png[:4] == b"\x89PNG"
        finally:
            v.stop()

    def test_full_system_attach(self):
        """FullSystem.set_viewer publishes per-frame poses (the reference's
        setViewer + publishCamPose wiring, FullSystem.cc:866+)."""
        from ldso_tpu.synthetic import default_calib
        from ldso_tpu.system.full_system import FullSystem
        from ldso_tpu.config import Config
        import dataclasses

        cfg = dataclasses.replace(Config(), enable_loop_closing=False)
        fs = FullSystem(default_calib(64, 48), cfg)
        v = LiveViewer(port=0).start()
        try:
            fs.set_viewer(v)
            assert fs.viewer is v
        finally:
            v.stop()
