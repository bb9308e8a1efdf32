"""Asynchronous tracking / mapping / loop-closing pipeline.

Rebuild of the reference's thread architecture (SURVEY.md §2.3): the
tracking caller, a mapping thread consuming `unmappedTrackedFrames` with
frame-skipping catch-up (FullSystem::deliverTrackedFrame + mappingLoop,
FullSystem.cc:160-177, 1809-1870), and a loop-closing thread polling a KF
queue (LoopClosing::Run, LoopClosing.cc:38-93).

The TPU translation: tracking and mapping are independent jitted program
sequences; the mapping thread owns the EnergyFunctional device state while
tracking reads only the double-buffered TrackerRef (the reference's
coarseTracker / coarseTracker_forNewKF swap, FullSystem.cc:104-111).
Host threads only move small queue entries; all heavy compute stays on
device. `linearize_operation=True` degenerates to the reference's
synchronous determinism mode (run_dso_tum_mono.cc:36 playbackSpeed==0).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

from ldso_tpu.system.full_system import FullSystem


class AsyncPipeline:
    """Wraps a FullSystem with the reference's mapping-thread handoff."""

    def __init__(self, fs: FullSystem, linearize_operation: bool = False,
                 max_queue: int = 8):
        self.fs = fs
        self.linearize_operation = linearize_operation
        self.queue: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self.running = not linearize_operation
        self.exc: Optional[BaseException] = None
        self._lock = threading.Lock()
        self.thread = None
        if self.running:
            self.thread = threading.Thread(target=self._mapping_loop,
                                           daemon=True)
            self.thread.start()

    # ------------------------------------------------------------- tracking
    def add_active_frame(self, image, frame_id, exposure=1.0, timestamp=0.0):
        """Tracking-side entry; keyframes are handed to the mapping thread
        (deliverTrackedFrame, FullSystem.cc:160-177)."""
        if self.exc:
            raise self.exc
        fs = self.fs
        if self.linearize_operation or not fs.initialized:
            with self._lock:
                return fs.add_active_frame(image, frame_id, exposure, timestamp)

        import jax.numpy as jnp
        import numpy as np
        from ldso_tpu.ops.preprocess import make_pyramid
        from ldso_tpu.slam_map import FrameShell

        shell = FrameShell(id=frame_id, timestamp=timestamp, exposure=exposure)
        fs.all_frames.append(shell)
        # fused pyramid+track; the trace commit stays with the mapping
        # thread, which owns the candidate arena (tracking-side commits
        # would race with mapping-side removals)
        ok = fs._track_new_coarse(shell, image, commit_trace=False)
        pyr = fs._frame_pyr
        if not ok:
            fs.is_lost = True
            return shell
        need_kf = fs._keyframe_decision(shell)
        # mapping thread consumes (shell, pyr, need_kf); non-KFs may be
        # dropped under load exactly like the reference's catch-up logic
        # (mappingLoop, FullSystem.cc:1821-1846)
        try:
            self.queue.put((shell, pyr, need_kf),
                           block=need_kf)  # KFs must not be dropped
        except queue.Full:
            pass  # drop a non-keyframe when mapping is behind
        return shell

    # -------------------------------------------------------------- mapping
    def _mapping_loop(self):
        while self.running or not self.queue.empty():
            try:
                item = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            shell, pyr, need_kf = item
            try:
                with self._lock:
                    if need_kf:
                        self.fs.make_keyframe(shell, pyr)
                    else:
                        self.fs.make_non_keyframe(shell, pyr)
            except BaseException as e:  # noqa: BLE001
                self.exc = e
                self.running = False

    def block_until_mapping_is_finished(self):
        """blockUntilMappingIsFinished (FullSystem.cc:384-409)."""
        self.running = False
        if self.thread is not None:
            self.thread.join(timeout=600)
        if self.exc:
            raise self.exc
        fs = self.fs
        if fs.loop_closing is not None and fs.global_map.num_frames() > 4:
            from ldso_tpu.loop import posegraph
            posegraph.run_pose_graph(fs.global_map)
