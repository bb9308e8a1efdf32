"""Public map data model + global map.

Rebuild of the reference's public layer (src/Frame.cc, src/Point.cc,
src/Map.cc; SURVEY.md §2 C4-C6, C27): host-side records that outlive the
optimization window. The optimization-side state (the reference's
FrameHessian / PointHessian internals) lives in the device Window; a
FrameShell here is what remains after marginalization — exactly the
reference's dual data model (include/Frame.h:24-46).

Poses:
  * T_cw: SE(3) worldToCam from odometry (the reference's Tcw)
  * S_cw: Sim(3) worldToCam after pose-graph optimization (TcwOpti)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class MapPointRecord:
    """A retired (marginalized) map point: world position support.
    (reference Point: computed from host Sim3 pose x inverse depth,
    src/Point.cc:34-45)."""
    host_kf_id: int
    u: float
    v: float
    idepth: float


@dataclasses.dataclass
class FrameShell:
    """Host record of a frame (reference Frame, include/Frame.h)."""
    id: int
    timestamp: float = 0.0
    T_cw: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(4))
    aff: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(2))
    exposure: float = 1.0
    pose_valid: bool = True
    is_keyframe: bool = False
    kf_id: int = -1
    # Sim(3) pose after loop closing (TcwOpti); starts as the SE3 pose
    S_cw: Optional[np.ndarray] = None
    # relative Sim(3) edges: kf_id -> (S_this_other 4x4, info 7x7, is_loop)
    pose_rel: Dict[int, Tuple[np.ndarray, np.ndarray, bool]] = \
        dataclasses.field(default_factory=dict)
    # retired map points hosted by this KF (filled at marginalization)
    map_points: List[MapPointRecord] = dataclasses.field(default_factory=list)
    # ORB features for loop closing (filled on keyframes when enabled)
    feat_uv: Optional[np.ndarray] = None       # (N,2)
    feat_desc: Optional[np.ndarray] = None     # (N,32) uint8
    feat_idepth: Optional[np.ndarray] = None   # (N,) -1 if unknown
    bow_vector: Optional[dict] = None

    def get_S_cw(self) -> np.ndarray:
        return self.S_cw if self.S_cw is not None else self.T_cw.copy()

    def add_pose_rel(self, other_kf_id: int, S_rel: np.ndarray,
                     info: Optional[np.ndarray] = None, is_loop: bool = False):
        if info is None:
            info = np.eye(7)
        self.pose_rel[other_kf_id] = (S_rel, info, is_loop)


class GlobalMap:
    """Keyframe set + Sim(3) pose-graph edges (reference Map, src/Map.cc)."""

    def __init__(self):
        self.keyframes: Dict[int, FrameShell] = {}
        self.latest_optimized_kf_id: int = -1

    def add_keyframe(self, fr: FrameShell):
        fr.is_keyframe = True
        self.keyframes[fr.kf_id] = fr

    def num_frames(self) -> int:
        return len(self.keyframes)

    def get_all_kfs(self) -> List[FrameShell]:
        return [self.keyframes[k] for k in sorted(self.keyframes)]

    def point_cloud(self) -> np.ndarray:
        """World positions of all retired points under the current
        (optionally loop-corrected) keyframe poses (Point::ComputeWorldPos)."""
        pts = []
        for kf in self.keyframes.values():
            if not kf.map_points:
                continue
            S_wc = np.linalg.inv(kf.get_S_cw())
            # intrinsics are stored per run; caller bakes them in the record
            for mp in kf.map_points:
                if mp.idepth <= 0:
                    continue
                z = 1.0 / mp.idepth
                pc = np.array([mp.u * z, mp.v * z, z, 1.0])
                pts.append((S_wc @ pc)[:3])
        return np.array(pts) if pts else np.zeros((0, 3))
