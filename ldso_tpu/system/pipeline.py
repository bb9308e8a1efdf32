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

Keyframe policy under load (mappingLoop, FullSystem.cc:1825-1864): a
popped frame becomes a keyframe ONLY when the queue is empty behind it
and a keyframe demand is pending against the current newest KF; while the
queue is non-empty every popped frame is a non-keyframe, and in catch-up
mode (queue ran past 3) every other queued frame is skipped outright (its
shell pose was already set by tracking). The pending-demand bookkeeping
is `needNewKFAfter = <tracking ref id at demand time>` — upstream DSO
semantics; LDSO's copy declares the field (FullSystem.h:310) but lost the
assignment, leaving its async mode KF-starved unless
setting_realTimeMaxKF is on. We implement the intended semantics.
"""

from __future__ import annotations

import collections
import os
import threading
from typing import Optional

import numpy as np

from ldso_tpu.system.full_system import FullSystem


def _pyr_row(pyrs, row):
    """Slice one frame's pyramid out of a batched dispatch as ONE program."""
    global _pyr_row_jit
    if _pyr_row_jit is None:
        import jax
        _pyr_row_jit = jax.jit(
            lambda ps, r: jax.tree_util.tree_map(lambda x: x[r], ps))
    return _pyr_row_jit(pyrs, row)


_pyr_row_jit = None


class _PackedGroup:
    """One ingest batch's packed tracking results: a single (B, P) device
    transfer shared by B per-frame pending entries.

    When a downloader pool is given, the host pull starts IMMEDIATELY on
    that thread: over the relay `is_ready()` never reports true and even a
    `copy_to_host_async`-backed pull costs a full ~30 ms round-trip when
    issued from the consuming thread (BASELINE.md tunnel constants), so
    prefetching is the only way the tracking thread sees landed data."""
    __slots__ = ("h", "_np", "_fut")

    def __init__(self, h, pool=None):
        self.h = h
        self._np = None
        self._fut = pool.submit(np.asarray, h, np.float64) \
            if pool is not None else None

    def is_ready(self) -> bool:
        if self._np is not None:
            return True
        if self._fut is not None:
            return self._fut.done()
        return self.h.is_ready()

    def rows(self) -> np.ndarray:
        if self._np is None:
            self._np = (self._fut.result() if self._fut is not None
                        else np.asarray(self.h, np.float64))
        return self._np


class DeterministicPipeline:
    """Speculative lookahead driver for the SYNCHRONOUS (determinism) mode.

    The strict sync loop (FullSystem.add_active_frame per frame) pays one
    ~30 ms tunnel round-trip per frame: the keyframe decision needs the
    tracked pose before the next frame may be dispatched. But the decision
    is only *consumed* at keyframes (~1 in 5 frames): this driver
    speculatively dispatches up to `depth` frames against the current
    tracking reference (device-resident TrackChain — the same machinery as
    AsyncPipeline), consumes results strictly in order, and on discovering
    a keyframe re-dispatches the still-in-flight frames against the new
    reference. Every decision is data-driven (no queue-timing dependence),
    so two runs over the same frames produce identical trajectories —
    unlike AsyncPipeline, whose keyframe policy depends on mapping-thread
    timing (the reference's own async mode, FullSystem.cc:1825-1864).
    Mapping (keyframe creation, BA) runs INLINE at consume time, exactly
    like the reference's linearizeOperation mode (FullSystem.cc:160-167).
    """

    def __init__(self, fs: FullSystem, depth: int = 3):
        self.fs = fs
        self.depth = depth
        self.pending = collections.deque()   # (shell, image, pyr, packed, ref_shell)
        self._slast = None
        self._sprelast = None
        self._dl_pool = None                 # lazy ThreadPoolExecutor(1)

    def _prefetch(self, packed):
        """Start the packed result's host pull on the downloader thread the
        moment it is dispatched: over the relay a pull issued from the
        consuming thread costs the full ~30 ms round-trip even after
        copy_to_host_async (see _PackedGroup), which would serialize one
        round-trip per frame into the sync loop. Prefetched, the pull
        overlaps the next `depth` frames' dispatches. Determinism is
        unaffected: values and consume order are identical."""
        if self._dl_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._dl_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ldso-sync-dl")
        return _PackedGroup(packed, self._dl_pool)

    def add_active_frame(self, image, frame_id, exposure=1.0, timestamp=0.0):
        fs = self.fs
        if fs.is_lost:
            return None
        if not fs.initialized or fs.tracker_ref is None:
            self._drain_all()
            return fs.add_active_frame(image, frame_id, exposure, timestamp)
        from ldso_tpu.slam_map import FrameShell
        if not self.pending:
            fs.chain_reset()
        shell = FrameShell(id=frame_id, timestamp=timestamp,
                           exposure=exposure)
        shell.pose_valid = False            # until consumed, in order
        fs.all_frames.append(shell)
        pyr, packed, ref_shell = fs.track_chain_dispatch(shell, image)
        self.pending.append((shell, image, pyr, self._prefetch(packed),
                             ref_shell))
        # consume on a FIXED cadence (exactly one once the window is full),
        # never opportunistically by transfer readiness: which frames get
        # device-continued vs host-reset chain state must be a pure
        # function of the data, or two runs diverge at f32 rounding level
        while len(self.pending) > self.depth and not fs.is_lost:
            self._consume_one()
        return shell

    def block_until_mapping_is_finished(self):
        self._drain_all()
        fs = self.fs
        if fs.loop_closing is not None and fs.global_map.num_frames() > 4:
            from ldso_tpu.loop import posegraph
            posegraph.run_pose_graph(fs.global_map)

    def _drain_all(self):
        while self.pending and not self.fs.is_lost:
            self._consume_one()

    def _redispatch_inflight(self):
        """The tracking reference (or chain state) changed: re-dispatch
        every still-pending frame against it, in order."""
        fs = self.fs
        old = list(self.pending)
        self.pending.clear()
        fs.chain_reset()
        for shell, image, _, _, _ in old:
            pyr, packed, ref_shell = fs.track_chain_dispatch(shell, image)
            self.pending.append((shell, image, pyr, self._prefetch(packed),
                                 ref_shell))

    def _consume_one(self):
        fs = self.fs
        if self.pending:
            shell, image, pyr, packed, ref_shell = self.pending.popleft()
            if type(packed) is _PackedGroup:
                packed = packed.rows()
            if fs.track_chain_consume(shell, packed, ref_shell):
                shell.pose_valid = True
            else:
                # gate tripped: host retry sweep against the current ref
                ok = fs._track_new_coarse(
                    shell, image, commit_trace=False,
                    neighbors=(self._slast, self._sprelast))
                shell.pose_valid = bool(ok)
                if not ok:
                    fs.is_lost = True
                    for sh, *_ in self.pending:
                        sh.pose_valid = False
                    return
                ref_shell = fs._last_track_ref
                pyr = fs._frame_pyr
                if self.pending:        # chain continued from a bad pose
                    self._redispatch_inflight()
            self._sprelast, self._slast = self._slast, shell
            need_kf = fs._keyframe_decision(shell, ref=ref_shell)
            if need_kf:
                fs.make_keyframe(shell, pyr)
                if fs.is_lost:
                    return
                if self.pending:        # new tracking reference
                    self._redispatch_inflight()
            else:
                fs.make_non_keyframe(shell, pyr)


class AsyncPipeline:
    """Wraps a FullSystem with the reference's mapping-thread handoff."""

    # catch-up engages when the queue runs past this (FullSystem.cc:1836)
    KETCHUP_THRESHOLD = 3
    # hard backpressure bound: each queued entry pins a pyramid in HBM; the
    # reference's deque is unbounded but catch-up skipping drains 2 frames
    # per mapping iteration so it stays shallow in practice
    MAX_QUEUE = 32

    # max in-flight chain-dispatched frames. Consuming frame i's packed
    # result can only be as fast as the device finishing frame i's
    # programs plus the result's relay transit (~30-60 ms end to end);
    # depth 12 (1.5 ingest batches) gives each consume that much slack so
    # the tracking thread waits on device THROUGHPUT, not latency. Frames
    # in flight track against the dispatch-time reference — the same
    # staleness the reference's double-buffered coarseTracker swap allows
    # under mapping load (FullSystem.cc:104-111); the retrack gate catches
    # the rare failure. (Depth 16 measured: stale-ref gate trips at every
    # keyframe once the ref publish lags — keep depth <= 1.5 batches.)
    CHAIN_DEPTH = 12

    # frames per host->device upload: the tunnel charges a ~8 ms fixed
    # overhead per transfer message on top of bandwidth (measured: one
    # 0.3 MB uint8 frame 11.2 ms, one 1.2 MB message 20 ms), so staging
    # frames into ONE upload costs ~4 ms/frame instead of ~11 (an 8-frame
    # 2.4 MB message amortizes the fixed cost to ~1 ms/frame; the r5
    # IB=8 A/B measured window-0 101.9 fps vs 86.6 at IB=4).
    # Adds up to INGEST_BATCH-1 frames of latency on the tracked-pose
    # stream — the same class of tradeoff as the reference's mapping
    # queue. 1 disables staging.
    INGEST_BATCH = 8

    def __init__(self, fs: FullSystem, linearize_operation: bool = False,
                 max_queue: Optional[int] = None):
        self.fs = fs
        self.linearize_operation = linearize_operation
        self.max_queue = max_queue or self.MAX_QUEUE
        self.unmapped = collections.deque()
        self.cond = threading.Condition()
        self.need_new_kf_after = -1     # FullSystem.h:310
        self.need_ketchup = False
        self.running = not linearize_operation
        self.exc: Optional[BaseException] = None
        self._map_lock = threading.Lock()
        # chain-tracking state (tracking thread only)
        self.pending = collections.deque()   # (shell, image, pyr, packed, ref_shell)
        self._ingest = []                    # staged (shell, host image)
        # host->device serialization of a frame batch costs ~3-4 ms/frame
        # of pure host CPU (the relay encodes the transfer message); a
        # dedicated uploader thread overlaps that with the tracking
        # thread's consume waits. Futures resolve IN ORDER (1 worker), so
        # chain dispatch order is preserved.
        self._upload_pool = None             # lazy ThreadPoolExecutor(1)
        self._dl_pool = None                 # lazy ThreadPoolExecutor(1)
        self._upl_q = collections.deque()    # (staged list, future(batch))
        self._chain_dirty = True
        self._slast = None
        self._sprelast = None
        self._kf_finish = None   # deferred keyframe consume (mapping thread)
        self.thread = None
        # compile the rare-path retrack executables NOW: the gate can trip
        # mid-window, and a first-compile over the relay costs >10 s
        if not linearize_operation and fs.initialized:
            fs.warm_retrack_programs()
        if self.running:
            # XLA's compile passes recurse deeply; the platform-default
            # thread stack (8 MB here) can overflow when a fused keyframe
            # program is first compiled on the mapping thread (observed as
            # a segfault inside backend_compile_and_load). Give the mapping
            # thread a roomy stack, then restore the default.
            old = threading.stack_size(64 * 1024 * 1024)
            try:
                self.thread = threading.Thread(target=self._mapping_loop,
                                               daemon=True)
                self.thread.start()
            finally:
                threading.stack_size(old)

    # ------------------------------------------------------------- tracking
    def add_active_frame(self, image, frame_id, exposure=1.0, timestamp=0.0):
        """Tracking-side entry; tracked frames are handed to the mapping
        thread (deliverTrackedFrame, FullSystem.cc:160-177).

        Steady state uses the device-resident tracking chain: the frame
        program is dispatched immediately (~1 ms queued) with its motion
        hypothesis computed on device from the previous frames' poses; the
        packed result is consumed a few frames later when its async pull
        has landed. The tracking thread therefore never blocks on the
        tunnel round-trip unless CHAIN_DEPTH frames are already in
        flight."""
        if self.exc:
            raise self.exc
        fs = self.fs
        if self.linearize_operation or not fs.initialized:
            with self._map_lock:
                shell = fs.add_active_frame(image, frame_id, exposure,
                                            timestamp)
                if not self.linearize_operation and fs.initialized:
                    fs.warm_retrack_programs()   # free once compiled
                return shell

        from ldso_tpu.slam_map import FrameShell

        if self._chain_dirty:
            # flush frames still in flight on the (possibly bad) chain;
            # _drain rebuilds the chain from host state once empty
            self._flush_ingest()
            self._drain(block=True)
            if fs.is_lost:
                return None
        shell = FrameShell(id=frame_id, timestamp=timestamp, exposure=exposure)
        shell.pose_valid = False        # until its chain result is consumed
        fs.all_frames.append(shell)
        self._ingest.append((shell, image))
        if len(self._ingest) >= max(1, self.INGEST_BATCH):
            self._flush_ingest()
        self._drain(block=False)
        return shell

    @staticmethod
    def _upload_batch(staged):
        """Uploader-thread body: serialize the staged frames into ONE
        host->device transfer (pure host CPU + async enqueue)."""
        import numpy as np
        import jax.numpy as jnp
        from ldso_tpu.ops.preprocess import upload_image
        if all(isinstance(img, np.ndarray) for _, img in staged):
            return jnp.asarray(np.stack([img for _, img in staged]))
        return [upload_image(img) for _, img in staged]  # device handles

    def _flush_ingest(self):
        """Hand the staged frames to the uploader thread as ONE transfer;
        their chain programs are dispatched (in order) by
        `_dispatch_ready` once the upload future resolves."""
        if not self._ingest:
            return
        with self.fs.timer.stage("pipe.ingest"):
            staged, self._ingest = self._ingest, []
            if self._upload_pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._upload_pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="ldso-upload")
            self._upl_q.append(
                (staged, self._upload_pool.submit(self._upload_batch, staged)))
            self._dispatch_ready(block=len(self._upl_q) > 2)

    def _dispatch_ready(self, block: bool):
        """Dispatch chain programs for every staged batch whose upload has
        landed (all of them when block=True). Tracking-thread only — the
        chain state update is sequential."""
        fs = self.fs
        while self._upl_q and (block or self._upl_q[0][1].done()):
            staged, fut = self._upl_q.popleft()
            with fs.timer.stage("pipe.upload_wait"):
                batch = fut.result()
            if (len(staged) == self.INGEST_BATCH
                    and not isinstance(batch, list)):
                # fused multi-frame chain program: one dispatch, one
                # (B, P) result transfer for the whole staged batch
                shells = [sh for sh, _ in staged]
                pyrs, packed_all, ref_shell = fs.track_chain_dispatch_batch(
                    shells, batch)
                if self._dl_pool is None:
                    from concurrent.futures import ThreadPoolExecutor
                    self._dl_pool = ThreadPoolExecutor(
                        max_workers=1, thread_name_prefix="ldso-download")
                grp = _PackedGroup(packed_all, self._dl_pool)
                for k, (shell, image) in enumerate(staged):
                    self.pending.append((shell, image, (pyrs, k),
                                         (grp, k), ref_shell))
            else:
                # PARTIAL batch (post-trip redispatch remainder, shutdown
                # drain): per-frame chain program from the HOST images.
                # The batched scan program's B is a compile-time shape —
                # a partial B would trigger a fresh ~30 s remote compile
                # per distinct size (measured: window collapsed to 1 fps
                # on the first redispatch remainder); the per-frame
                # program is compiled from round 1, and a device-array
                # row slice would itself compile getitem programs
                for shell, image in staged:
                    pyr, packed, ref_shell = fs.track_chain_dispatch(
                        shell, image)
                    self.pending.append((shell, image, pyr, packed,
                                         ref_shell))

    def _redispatch_inflight(self):
        """Re-dispatch every not-yet-consumed frame (in flight, awaiting
        upload, or staged) against the current tracker ref and a chain
        rebuilt from the host mirrors. Called after a gate trip's host
        retrack: the stale in-flight results would each trip the gate
        again. Tracking-thread only."""
        fs = self.fs
        old = [(sh, img) for sh, img, _, _, _ in self.pending]
        self.pending.clear()
        for staged, fut in self._upl_q:
            fut.cancel()          # a running upload just goes unused
            old.extend(staged)
        self._upl_q.clear()
        old.extend(self._ingest)
        self._ingest = []
        fs.chain_reset()
        self._chain_dirty = False
        for sh, img in old:
            self._ingest.append((sh, img))
            if len(self._ingest) >= max(1, self.INGEST_BATCH):
                self._flush_ingest()

    def _drain(self, block: bool):
        """Consume landed chain-step results in order.

        block=False (steady state): consume results that have already
        landed, plus — blocking — just enough to bring the in-flight
        count back under CHAIN_DEPTH. Never drains the queue to empty;
        that would stall the tracking thread on its own freshest
        dispatches (pull ≈ full round-trip) instead of on results whose
        async transfer finished frames ago.
        block=True (chain rebuild / shutdown): consume everything."""
        fs = self.fs
        self._dispatch_ready(block=False)
        while (self.pending
               or (block and (self._upl_q or self._ingest))) and not fs.is_lost:
            if not self.pending:
                if self._ingest:        # partial batch left by a redispatch
                    self._flush_ingest()
                self._dispatch_ready(block=True)
                continue
            head = self.pending[0][3]
            head = head[0] if type(head) is tuple else head
            if (not block and len(self.pending) <= self.CHAIN_DEPTH
                    and not head.is_ready()):
                return
            shell, image, pyr, packed, ref_shell = self.pending.popleft()
            with fs.timer.stage("pipe.consume"):
                if type(packed) is tuple:           # row of a batched pull
                    grp, row = packed
                    packed = grp.rows()[row]
                consumed = fs.track_chain_consume(shell, packed, ref_shell)
            if not consumed:
                if os.environ.get("LDSO_TPU_DEBUG_TRIPS"):
                    pk = np.asarray(packed, np.float64) if not isinstance(
                        packed, np.ndarray) else packed
                    cur = fs._tracker_ref_pair[1]
                    print(f"[trip] frame={shell.id} res0={pk[20]:.3f} "
                          f"ok={pk[18]} last_rmse={fs.last_coarse_rmse[0]:.3f} "
                          f"dispatch_ref={ref_shell.id} "
                          f"current_ref={cur.id if cur else '?'}",
                          flush=True)
                # gate tripped: host retry sweep against the CURRENT ref
                # (the reference also retracks against the newest KF,
                # FullSystem.cc:104-123)
                with fs.timer.stage("pipe.retrack"):
                    ok = fs._track_new_coarse(
                        shell, image, commit_trace=False,
                        neighbors=(self._slast, self._sprelast))
                if not ok:
                    fs.is_lost = True
                    # frames still in flight (or staged) were never
                    # tracked: their shells must not count as posed
                    # (they were appended with pose_valid=False)
                    return
                # the retrack ran against the CURRENT tracker ref, so the
                # flow/affine quantities on the shell are relative to it —
                # base the keyframe decision on the same ref, not the
                # dispatch-time one
                ref_shell = fs._last_track_ref
                # the retracked pose must be visible to the chain rebuild
                shell.pose_valid = True
                # the device chain continued from the bad pose and the
                # other in-flight frames likely rode the same stale ref:
                # consuming their results would trip (and pay a ~130 ms
                # host retrack) for every one of them — measured cascade:
                # 12 retracks in one 48-frame window. Re-dispatch them
                # all against the rebuilt chain instead.
                self._redispatch_inflight()
            shell.pose_valid = True
            self._sprelast, self._slast = self._slast, shell
            need_kf = fs._keyframe_decision(shell, ref=ref_shell)
            if need_kf and os.environ.get("LDSO_TPU_DEBUG_KF"):
                print(f"[kf-demand] frame={shell.id} ref={ref_shell.id} "
                      f"qlen={len(self.unmapped)}", flush=True)
            # slice this frame's pyramid out of a batched dispatch (plain
            # tuple; FramePyramid itself is a NamedTuple, so match exactly).
            # One jitted program (row traced): an eager tree_map getitem is
            # ~a dozen separate dispatches, several ms of host CPU per frame
            # on this single-core box
            if type(pyr) is tuple:
                with fs.timer.stage("pipe.pyr_row"):
                    pyrs, row = pyr
                    pyr = _pyr_row(pyrs, np.int32(row))
            with self.cond:
                while len(self.unmapped) >= self.max_queue and self.running:
                    with fs.timer.stage("pipe.backpressure"):
                        self.cond.wait(0.05)    # backpressure (HBM-bounded)
                self.unmapped.append((shell, pyr))
                if need_kf:
                    # DSO: needNewKFAfter = shell->trackingRef->id
                    self.need_new_kf_after = max(self.need_new_kf_after,
                                                 ref_shell.id)
                self.cond.notify_all()
        # rebuild only once EVERY added frame has been tracked: staged
        # (not yet dispatched) frames sit in all_frames with placeholder
        # poses, and chain_reset reads the newest posed shells
        if (self._chain_dirty and not self.pending and not self._ingest
                and not self._upl_q):
            fs.chain_reset()
            self._chain_dirty = False

    # -------------------------------------------------------------- mapping
    def _finish_kf(self):
        """Run a deferred keyframe consume (pose sync, tracker-ref publish,
        frame marginalization, loop closing). Mapping thread only, under
        _map_lock."""
        fin = self._kf_finish
        if fin is None:
            return
        self._kf_finish = None
        if os.environ.get("LDSO_TPU_DEBUG_KF"):
            print(f"[kf-finish] consuming (ready={fin.ready()})", flush=True)
        with self.fs.timer.stage("pipe.map_kf_finish"):
            fin()

    def _mapping_loop(self):
        fs = self.fs
        while True:
            with self.cond:
                while not self.unmapped and self.running:
                    fin = self._kf_finish
                    if fin is not None and fin.ready():
                        break    # idle and the KF results LANDED: consume
                    # short poll while a consume is pending (its transfers
                    # land within ~100 ms); relaxed wait otherwise
                    self.cond.wait(timeout=0.005 if fin is not None
                                   else 0.1)
                if not self.unmapped:
                    if self._kf_finish is not None:
                        item = None            # consume-only iteration
                    elif not self.running:
                        return
                    else:
                        continue
                else:
                    item = self.unmapped.popleft()
                    if len(self.unmapped) > self.KETCHUP_THRESHOLD:
                        self.need_ketchup = True
                qlen = len(self.unmapped)
                self.cond.notify_all()
            try:
                with self._map_lock:
                    if item is None:
                        self._finish_kf()
                        continue
                    # a ready keyframe-finish publishes the new tracking
                    # reference: consume it BEFORE mapping more frames.
                    # Deferring it while the queue stays busy lets the
                    # tracking thread run tens of frames against a stale
                    # ref (measured: dispatch_ref 67 frames behind ->
                    # retrack-gate trips at ~600 ms each); the reference
                    # bounds the same staleness with its one-deep
                    # coarseTracker_forNewKF swap (FullSystem.cc:104-111)
                    fin = self._kf_finish
                    if fin is not None and fin.ready():
                        self._finish_kf()
                    shell, pyr = item
                    if fs.global_map.num_frames() <= 2:
                        # guaranteed KFs for the first two tracked frames;
                        # synchronous: the num_frames() gate itself depends
                        # on the consume half having run
                        self._finish_kf()
                        with fs.timer.stage("pipe.map_kf"):
                            fs.make_keyframe(shell, pyr)
                    elif qlen > 0:
                        # other frames waiting: mapping is behind
                        with fs.timer.stage("pipe.map_nonkf"):
                            fs.make_non_keyframe(shell, pyr)
                        if self.need_ketchup:
                            with self.cond:
                                if self.unmapped:
                                    # skip one queued frame outright
                                    # (FullSystem.cc:1845-1852)
                                    self.unmapped.popleft()
                                    self.cond.notify_all()
                    else:
                        newest_id = (fs.window_frames[-1].id
                                     if fs.window_frames else -1)
                        if os.environ.get("LDSO_TPU_DEBUG_KF"):
                            print(f"[kf-gate] frame={shell.id} "
                                  f"need_after={self.need_new_kf_after} "
                                  f"newest={newest_id} "
                                  f"make={self.need_new_kf_after >= newest_id}",
                                  flush=True)
                        if self.need_new_kf_after >= newest_id:
                            # the consume half of the PREVIOUS keyframe
                            # must land before the next dispatch (window
                            # renumbering, kf_id allocation)
                            self._finish_kf()
                            with fs.timer.stage("pipe.map_kf"):
                                self._kf_finish = fs.make_keyframe_dispatch(
                                    shell, pyr)
                            self.need_ketchup = False
                        else:
                            with fs.timer.stage("pipe.map_nonkf"):
                                fs.make_non_keyframe(shell, pyr)
            except BaseException as e:  # noqa: BLE001
                self.exc = e
                self.running = False
                return

    def block_until_mapping_is_finished(self):
        """blockUntilMappingIsFinished (FullSystem.cc:384-409)."""
        self._flush_ingest()         # dispatch any staged frames
        self._drain(block=True)      # land in-flight chain-tracked frames
        with self.cond:
            self.running = False
            self.cond.notify_all()
        if self.thread is not None:
            self.thread.join(timeout=600)
        if self.exc:
            raise self.exc
        fs = self.fs
        if fs.loop_closing is not None and fs.global_map.num_frames() > 4:
            from ldso_tpu.loop import posegraph
            posegraph.run_pose_graph(fs.global_map)
