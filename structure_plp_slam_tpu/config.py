"""YAML configuration, compatible with the reference's config files.

Reference: src/PLPSLAM/config.{h,cc} — loads camera model/setup, ORB
parameters, depth threshold and depthmap factor from per-dataset YAML
(e.g. example/tum_rgbd/TUM_RGBD_mono_3.yaml). The same YAML files drive
this framework unchanged: keys ``Camera.*``, ``Feature.*``,
``depth_threshold``, ``depthmap_factor``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml

from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
from structure_plp_slam_tpu.ops.orb import OrbParams


@dataclasses.dataclass(frozen=True)
class Config:
    camera: Camera
    orb: OrbParams
    raw: Dict[str, Any]

    @property
    def true_depth_threshold(self) -> float:
        return self.camera.true_depth_threshold

    @property
    def depthmap_factor(self) -> float:
        return self.camera.depthmap_factor


def _get(d: Dict[str, Any], key: str, default=None):
    return d.get(key, default)


def load_config(path: Optional[str] = None, yaml_text: Optional[str] = None) -> Config:
    """Parse a reference-format YAML config into Camera + OrbParams."""
    if yaml_text is None:
        with open(path, "r") as f:
            yaml_text = f.read()
    # Reference YAMLs start with "%YAML:1.0" (OpenCV FileStorage dialect);
    # strip the directive for PyYAML.
    lines = [
        ln for ln in yaml_text.splitlines() if not ln.strip().startswith("%YAML")
    ]
    d = yaml.safe_load("\n".join(lines)) or {}

    # The reference spells these "RGBD" / "monocular" / "perspective" etc.
    # (config.cc:55-85); accept any case.
    model = CameraModel(str(_get(d, "Camera.model", "perspective")).lower())
    setup = CameraSetup(str(_get(d, "Camera.setup", "monocular")).lower())
    camera = Camera(
        name=_get(d, "Camera.name", "unnamed"),
        setup=setup,
        model=model,
        cols=int(_get(d, "Camera.cols", 640)),
        rows=int(_get(d, "Camera.rows", 480)),
        fps=float(_get(d, "Camera.fps", 30.0)),
        fx=float(_get(d, "Camera.fx", 0.0)),
        fy=float(_get(d, "Camera.fy", 0.0)),
        cx=float(_get(d, "Camera.cx", 0.0)),
        cy=float(_get(d, "Camera.cy", 0.0)),
        k1=float(_get(d, "Camera.k1", 0.0)),
        k2=float(_get(d, "Camera.k2", 0.0)),
        p1=float(_get(d, "Camera.p1", 0.0)),
        p2=float(_get(d, "Camera.p2", 0.0)),
        k3=float(_get(d, "Camera.k3", 0.0)),
        k4=float(_get(d, "Camera.k4", 0.0)),
        focal_x_baseline=float(_get(d, "Camera.focal_x_baseline", 0.0)),
        depth_threshold=float(_get(d, "depth_threshold", 40.0)),
        depthmap_factor=float(_get(d, "depthmap_factor", 1.0)),
    )
    orb = OrbParams(
        max_num_keypts=int(_get(d, "Feature.max_num_keypoints", 2000)),
        scale_factor=float(_get(d, "Feature.scale_factor", 1.2)),
        num_levels=int(_get(d, "Feature.num_levels", 8)),
        ini_fast_thr=float(_get(d, "Feature.ini_fast_threshold", 20)),
        min_fast_thr=float(_get(d, "Feature.min_fast_threshold", 7)),
        mask_rects=tuple(
            tuple(float(v) for v in rect)
            for rect in (_get(d, "Feature.mask_rectangles", []) or [])
        ),
    )
    return Config(camera=camera, orb=orb, raw=d)
