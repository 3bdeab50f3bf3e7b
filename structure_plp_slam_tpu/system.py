"""System facade: the public API of the framework.

TPU-native replacement for PLPSLAM::system (src/PLPSLAM/system.{h,cc} —
construction wires modules, spawns mapping/loop threads, exposes
feed_*_frame, trajectory save, pause/resume/reset). Differences by design:

* The reference runs tracking on the caller's thread and mapping/loop
  closing on two background threads sharing the map under a global mutex.
  Here the map is immutable-functional device state: every module step is a
  jitted transformation ``MapState -> MapState`` issued by this facade.
  JAX's async dispatch overlaps device work with host bookkeeping — the
  role the threads played — without any locking.
* Frame feeding returns the tracked pose (host numpy) for the caller.
* Keyframe/landmark capacities are static; the facade owns slot counters.

Usage:
    sys = System(config)
    sys.startup()
    for img, ts in frames:
        pose = sys.feed_monocular_frame(img, ts)
    sys.save_frame_trajectory("traj.txt", fmt="tum")
    sys.shutdown()
"""

from __future__ import annotations

import enum
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.data import map_state as ms
from structure_plp_slam_tpu.io import trajectory as traj_io
from structure_plp_slam_tpu.models import (
    frontend as frontend_mod,
    initializer,
    mapper,
    tracker,
)
from structure_plp_slam_tpu.camera import CameraSetup
from structure_plp_slam_tpu.utils.types import round_up


class TrackerState(enum.Enum):
    NOT_INITIALIZED = "NotInitialized"
    TRACKING = "Tracking"
    LOST = "Lost"


class System:
    def __init__(
        self,
        config: Config,
        *,
        max_keyframes: int = 256,
        max_landmarks: int = 32768,
        seed: int = 0,
        enable_mapping: bool = True,
        num_triangulation_neighbors: int = 2,
        max_kf_interval: Optional[int] = None,
    ):
        # Condition A1 of the keyframe decision (keyframe_inserter.cc:76):
        # force a keyframe when this many frames passed since the last one.
        # The reference uses the camera fps.
        self.max_kf_interval = (
            max_kf_interval if max_kf_interval is not None else int(config.camera.fps)
        )
        self.config = config
        self.camera = config.camera
        cap = round_up(
            frontend_mod.orb_ops.OrbExtractor(
                config.camera.rows, config.camera.cols, config.orb
            ).capacity,
            8,
        )
        self.frontend = frontend_mod.Frontend(config.camera, config.orb, pad_to=cap)
        self.state = ms.create(max_keyframes, cap, max_landmarks)
        self.max_keyframes = max_keyframes
        self.max_landmarks = max_landmarks
        self.num_tri_neighbors = num_triangulation_neighbors
        self.enable_mapping = enable_mapping

        self.tracking_state = TrackerState.NOT_INITIALIZED
        self.key = jax.random.PRNGKey(seed)
        self.next_kf = 0
        self.next_lm = 0
        self.frames_since_kf = 0
        self.num_frames = 0

        # Tracker recurrent state.
        eye = np.eye(3, dtype=np.float32)
        self.pose = (jnp.asarray(eye), jnp.zeros((3,), jnp.float32))
        self.vel = (jnp.asarray(eye), jnp.zeros((3,), jnp.float32))
        self.last_kp_lm = jnp.full((cap,), -1, jnp.int32)
        self.ref_kf = 0

        # Mono initialization buffer.
        self._init_feats = None
        self._init_ts = None

        # Frame trajectory: (ts, ref_kf, rel_pose_cw_to_ref [3,4], lost).
        self._frame_stats: List[Tuple[float, int, np.ndarray, bool]] = []
        self._running = False

    # ------------------------------------------------------------------
    # Lifecycle (reference: system::startup/shutdown/reset).
    # ------------------------------------------------------------------
    def startup(self, need_initialize: bool = True):
        self._running = True
        if not need_initialize:
            self.tracking_state = TrackerState.LOST

    def shutdown(self):
        self._running = False

    def reset(self):
        self.state = ms.create(
            self.max_keyframes, self.frontend.pad_to, self.max_landmarks
        )
        self.tracking_state = TrackerState.NOT_INITIALIZED
        self.next_kf = 0
        self.next_lm = 0
        self._init_feats = None
        self.last_kp_lm = jnp.full((self.frontend.pad_to,), -1, jnp.int32)
        self._frame_stats.clear()

    # ------------------------------------------------------------------
    # Frame feeding (reference: system::feed_*_frame).
    # ------------------------------------------------------------------
    def feed_monocular_frame(self, img, timestamp: float):
        feats = self.frontend.mono(img)
        return self._track(feats, timestamp)

    def feed_RGBD_frame(self, img, depthmap, timestamp: float):
        feats = self.frontend.rgbd(img, depthmap)
        return self._track(feats, timestamp)

    def feed_stereo_frame(self, img_left, img_right, timestamp: float):
        feats = self.frontend.stereo(img_left, img_right)
        return self._track(feats, timestamp)

    # ------------------------------------------------------------------
    def _split_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _track(self, feats, ts: float) -> Optional[np.ndarray]:
        self.num_frames += 1
        if self.tracking_state is TrackerState.NOT_INITIALIZED:
            ok = self._initialize(feats, ts)
            if not ok:
                return None
            return self._record_frame(ts, lost=False)

        # Motion-model prediction.
        Rv, tv = self.vel
        Rp, tp = self.pose
        R_pred = Rv @ Rp
        t_pred = Rv @ tp + tv

        res = tracker.track_frame(
            self.camera,
            self.state,
            feats,
            R_pred,
            t_pred,
            self.last_kp_lm,
            self.frontend.inv_sigma_sq,
            num_levels=self.frontend.extractor.params.num_levels,
            scale_factor=self.frontend.extractor.params.scale_factor,
        )
        num_tracked = int(res.num_tracked)
        if num_tracked < 12:
            # Lost: keep last pose, do not update the motion model
            # (relocalization lands with the loop-closing subsystem).
            self.tracking_state = TrackerState.LOST
            self._record_frame(ts, lost=True)
            return None
        self.tracking_state = TrackerState.TRACKING

        # Update landmark observed/visible statistics on device.
        st = self.state
        self.state = st._replace(
            lm_n_vis=st.lm_n_vis + res.lm_vis.astype(jnp.int32),
            lm_n_fnd=st.lm_n_fnd + res.lm_fnd.astype(jnp.int32),
        )

        # Motion model update.
        R_new, t_new = res.R, res.t
        R_last, t_last = self.pose
        self.vel = (
            R_new @ R_last.T,
            t_new - (R_new @ R_last.T) @ t_last,
        )
        self.pose = (R_new, t_new)
        self.last_kp_lm = res.kp_lm
        self.ref_kf = int(res.ref_kf)
        self.frames_since_kf += 1

        # Keyframe decision (reference: keyframe_inserter.cc:54-114
        # condition B: tracked < 0.9 * reliable-in-ref; A-conditions are
        # satisfied by construction since mapping is synchronous).
        if self.enable_mapping and self.next_kf < self.max_keyframes:
            min_obs = 3 if self.next_kf > 2 else 1
            ref_tracked = int(
                tracker.count_trackable_in_ref(
                    self.camera, self.state, res.ref_kf, min_obs
                )
            )
            lm_headroom = self.next_lm < self.max_landmarks - 2 * self.frontend.pad_to
            cond_b = num_tracked < 0.9 * max(ref_tracked, 1)
            cond_a1 = self.frames_since_kf >= self.max_kf_interval
            need = (
                (cond_b or cond_a1)
                and num_tracked > 15
                and self.frames_since_kf >= 1
                and lm_headroom
            )
            if need:
                self._insert_keyframe(feats, ts, res)

        return self._record_frame(ts, lost=False)

    # ------------------------------------------------------------------
    def _initialize(self, feats, ts: float) -> bool:
        if self.camera.setup in (CameraSetup.RGBD, CameraSetup.STEREO):
            pose = jnp.concatenate(
                [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], 1
            )
            self.state, created = mapper.insert_keyframe(
                self.camera,
                self.state,
                0,
                pose,
                ts,
                feats,
                jnp.full((self.frontend.pad_to,), -1, jnp.int32),
                0,
            )
            n = int(created)
            if n < 30:
                self.state = ms.create(
                    self.max_keyframes, self.frontend.pad_to, self.max_landmarks
                )
                return False
            self.next_kf = 1
            self.next_lm = n
            self.last_kp_lm = self.state.kf_lm_idx[0]
            self.pose = (jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32))
            self.vel = (jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32))
            self.tracking_state = TrackerState.TRACKING
            self.frames_since_kf = 0
            return True

        # Monocular.
        if self._init_feats is None:
            if int(np.asarray(feats["valid"]).sum()) >= 100:
                self._init_feats = feats
                self._init_ts = ts
            return False

        res = initializer.try_initialize_mono(
            self.camera, self._init_feats, feats, self._split_key()
        )
        if not bool(res.success):
            # Too little structure: restart from the current frame.
            if int(np.asarray(feats["valid"]).sum()) >= 100:
                self._init_feats = feats
                self._init_ts = ts
            return False

        pts, t2, s = initializer.scale_to_median_depth(
            res.points_w, res.point_ok, res.t_2w
        )

        f1 = self._init_feats
        N = self.frontend.pad_to
        good = np.asarray(res.point_ok)
        m12 = np.asarray(res.matches)
        count = int(good.sum())

        slots = jnp.cumsum(res.point_ok.astype(jnp.int32)) - 1  # compact ids
        lm1 = jnp.where(res.point_ok, slots, -1)
        # Frame-2 keypoint association.
        m_safe = jnp.clip(res.matches, 0, N - 1)
        lm2 = jnp.full((N,), -1, jnp.int32)
        lm2 = lm2.at[jnp.where(res.point_ok, m_safe, N)].set(
            jnp.where(res.point_ok, slots, -1), mode="drop"
        )

        pose1 = jnp.concatenate(
            [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], 1
        )
        pose2 = jnp.concatenate([res.R_2w, t2[:, None]], 1)

        self.state = ms.add_keyframe(self.state, 0, pose1, self._init_ts, f1, lm1)
        self.state = ms.add_keyframe(self.state, 1, pose2, ts, feats, lm2)

        dist = jnp.linalg.norm(pts, axis=-1)
        sf = self.frontend.extractor.params.scale_factor
        nlv = self.frontend.extractor.params.num_levels
        level_scale = jnp.power(sf, f1["level"].astype(jnp.float32))
        dist_max = dist * level_scale
        dist_min = dist_max / (sf ** (nlv - 1))
        view = pts / jnp.maximum(dist[:, None], 1e-9)
        self.state = ms.add_landmarks(
            self.state,
            slots,
            pts,
            f1["desc"],
            view,
            dist_min,
            dist_max,
            jnp.zeros((N,), jnp.int32),
            res.point_ok,
        )
        self.next_kf = 2
        self.next_lm = count

        # Initial global BA over the two views (reference: initializer.cc
        # :306-307 runs 20 iterations of global BA).
        self.state, _ = mapper.local_ba(
            self.camera,
            self.state,
            1,
            self.frontend.inv_sigma_sq,
            max_opt=4,
            max_fix=4,
            max_lms=4096,
        )

        self.pose = (res.R_2w, t2)
        self.vel = (jnp.eye(3, dtype=jnp.float32), jnp.zeros((3,), jnp.float32))
        self.last_kp_lm = self.state.kf_lm_idx[1]
        self.ref_kf = 1
        self.tracking_state = TrackerState.TRACKING
        self.frames_since_kf = 0
        self._init_feats = None
        return True

    # ------------------------------------------------------------------
    def _insert_keyframe(self, feats, ts: float, res: tracker.TrackResult):
        slot = self.next_kf
        pose = jnp.concatenate([res.R, res.t[:, None]], 1)
        self.state, created = mapper.insert_keyframe(
            self.camera, self.state, slot, pose, ts, feats, res.kp_lm, self.next_lm
        )
        self.next_kf += 1
        self.next_lm += int(created)
        self.frames_since_kf = 0

        # Landmark culling for recent landmarks.
        self.state, _ = mapper.cull_landmarks(self.state, slot)

        # Monocular triangulation with top covisible neighbors.
        if self.camera.setup is CameraSetup.MONOCULAR or True:
            W = np.array(ms.covisibility_matrix(self.state)[slot])
            W[slot] = 0
            order = np.argsort(-W)
            neighbors = [int(k) for k in order[: self.num_tri_neighbors] if W[k] >= 15]
            for nb in neighbors:
                if self.next_lm >= self.max_landmarks - self.frontend.pad_to:
                    break
                self.state, n_new = mapper.triangulate_pair(
                    self.camera, self.state, slot, nb, self.next_lm
                )
                self.next_lm += int(n_new)

        # Fuse duplicates with the local map.
        kf_mask = jnp.zeros((self.max_keyframes,), bool).at[slot].set(True)
        lm_local = ms.local_landmark_mask(self.state, kf_mask)
        self.state, _ = mapper.fuse_into_keyframe(
            self.camera, self.state, slot, lm_local
        )

        # Local BA.
        if self.next_kf >= 3:
            self.state, _ = mapper.local_ba(
                self.camera, self.state, slot, self.frontend.inv_sigma_sq
            )
        # Keyframe culling.
        if self.next_kf >= 5:
            self.state, _ = mapper.cull_keyframes(self.state, slot)

        # Refresh current-frame associations from the stored keyframe.
        self.last_kp_lm = self.state.kf_lm_idx[slot]
        self.ref_kf = slot

    # ------------------------------------------------------------------
    def _record_frame(self, ts: float, lost: bool) -> Optional[np.ndarray]:
        R, t = self.pose
        P = np.asarray(jnp.concatenate([R, t[:, None]], 1))
        ref = self.ref_kf
        # Relative pose to the reference keyframe for later refinement
        # (reference: frame_statistics).
        kf_pose = np.asarray(self.state.kf_pose[ref])
        R_ref, t_ref = kf_pose[:, :3], kf_pose[:, 3]
        R_rel = P[:, :3] @ R_ref.T
        t_rel = P[:, 3] - R_rel @ t_ref
        self._frame_stats.append(
            (ts, ref, np.concatenate([R_rel, t_rel[:, None]], 1), lost)
        )
        return P

    # ------------------------------------------------------------------
    # Output (reference: io/trajectory_io, publish/map_publisher).
    # ------------------------------------------------------------------
    def frame_trajectory(self):
        """Frame poses recomposed against current keyframe poses."""
        kf_poses = np.asarray(self.state.kf_pose)
        out = []
        for ts, ref, rel, lost in self._frame_stats:
            if lost:
                continue
            Pk = kf_poses[ref]
            R = rel[:, :3] @ Pk[:, :3]
            t = rel[:, :3] @ Pk[:, 3] + rel[:, 3]
            out.append((ts, np.concatenate([R, t[:, None]], 1)))
        return out

    def keyframe_trajectory(self):
        kf_poses = np.asarray(self.state.kf_pose)
        kf_valid = np.asarray(self.state.kf_valid)
        kf_ts = np.asarray(self.state.kf_timestamp)
        order = np.argsort(kf_ts)
        return [
            (float(kf_ts[k]), kf_poses[k]) for k in order if kf_valid[k]
        ]

    def save_frame_trajectory(self, path: str, fmt: str = "tum"):
        saver = traj_io.save_tum if fmt == "tum" else traj_io.save_kitti
        saver(path, self.frame_trajectory())

    def save_keyframe_trajectory(self, path: str, fmt: str = "tum"):
        saver = traj_io.save_tum if fmt == "tum" else traj_io.save_kitti
        saver(path, self.keyframe_trajectory())

    def get_landmarks(self) -> np.ndarray:
        valid = np.asarray(self.state.lm_valid)
        return np.asarray(self.state.lm_pos)[valid]

    @property
    def num_keyframes(self) -> int:
        return int(np.asarray(self.state.kf_valid).sum())

    @property
    def num_landmarks(self) -> int:
        return int(np.asarray(self.state.lm_valid).sum())
