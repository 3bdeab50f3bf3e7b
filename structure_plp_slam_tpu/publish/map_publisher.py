"""Map publisher: viewer-facing accessors over the MapState.

Reference: src/PLPSLAM/publish/map_publisher.cc:80-160 — thread-safe
getters for current pose, all/local landmarks, planes (with display
colors), lines. Here the MapState is immutable-functional, so accessors
simply snapshot the arrays; ``export_ply`` replaces the Pangolin/socket
viewers' 3D display with a standard point-cloud file any viewer opens.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class MapPublisher:
    def __init__(self, system):
        self._sys = system
        self._current_pose: Optional[np.ndarray] = None

    # -- reference API parity ------------------------------------------
    def set_current_cam_pose(self, pose_cw: np.ndarray):
        self._current_pose = np.asarray(pose_cw)

    def get_current_cam_pose(self) -> Optional[np.ndarray]:
        return self._current_pose

    def get_landmarks(self) -> np.ndarray:
        st = self._sys.state
        valid = np.asarray(st.lm_valid)
        return np.asarray(st.lm_pos)[valid]

    def get_landmark_colors(self) -> np.ndarray:
        """Per-landmark RGB: plane-owned landmarks get the plane's color
        (reference: planes carry a random display color)."""
        st = self._sys.state
        valid = np.asarray(st.lm_valid)
        plane = np.asarray(st.lm_plane)[valid]
        rng = np.random.default_rng(0)
        palette = rng.integers(64, 255, size=(int(st.pl_coef.shape[0]), 3))
        colors = np.full((valid.sum(), 3), 180, np.uint8)
        owned = plane >= 0
        colors[owned] = palette[plane[owned] % len(palette)]
        return colors

    def get_keyframe_poses(self) -> np.ndarray:
        st = self._sys.state
        valid = np.asarray(st.kf_valid)
        return np.asarray(st.kf_pose)[valid]

    def get_lines(self) -> np.ndarray:
        """[M, 6] world endpoint pairs of valid 3D lines."""
        st = self._sys.state
        valid = np.asarray(st.ln_valid)
        return np.asarray(st.ln_endpoints)[valid]

    def get_planes(self) -> np.ndarray:
        """[P, 4] plane coefficients."""
        st = self._sys.state
        valid = np.asarray(st.pl_valid)
        return np.asarray(st.pl_coef)[valid]

    # -- export --------------------------------------------------------
    def export_html(self, path: str, max_points: int = 20000):
        """Interactive single-file HTML map viewer (publish/html_viewer.py —
        the static equivalent of the reference's web viewer)."""
        from structure_plp_slam_tpu.publish.html_viewer import export_html

        export_html(path, self, max_points=max_points)

    def export_ply(self, path: str, with_trajectory: bool = True):
        """Write landmarks (+ keyframe centers) as an ASCII PLY cloud."""
        pts = self.get_landmarks()
        cols = self.get_landmark_colors()
        rows = [pts]
        colrows = [cols]
        if with_trajectory:
            kf = self.get_keyframe_poses()
            centers = np.stack([-P[:, :3].T @ P[:, 3] for P in kf]) if len(kf) else np.zeros((0, 3))
            rows.append(centers)
            colrows.append(np.tile([255, 0, 0], (len(centers), 1)))
        allp = np.concatenate(rows)
        allc = np.concatenate(colrows).astype(int)
        with open(path, "w") as f:
            f.write(
                "ply\nformat ascii 1.0\n"
                f"element vertex {len(allp)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                "end_header\n"
            )
            for p, c in zip(allp, allc):
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {c[0]} {c[1]} {c[2]}\n")
