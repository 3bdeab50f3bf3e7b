"""Per-frame feature frontend: image -> padded feature SoA.

Replaces the reference's data::frame construction (src/PLPSLAM/data/
frame.h:87-164 — 12 constructors for {mono, stereo, RGB-D} x options;
frame.cc ORB extraction, undistortion, bearing computation, stereo depth,
grid assignment). Here one jitted function per input modality produces the
fixed-capacity feature arrays the MapState stores per keyframe:

  xy [N,2] undistorted level-0 coords   xr [N] right x (<0 mono)
  depth [N]                              level [N], angle [N]
  desc [N,8] u32                         bearing [N,3]
  valid [N] bool

Grid-cell bucketing disappears: windowed matching uses dense masked
distance matrices (ops/matching.py), so no spatial index is needed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from structure_plp_slam_tpu.camera import base as cam_base
from structure_plp_slam_tpu.ops import image as image_ops
from structure_plp_slam_tpu.ops import orb as orb_ops


@functools.partial(
    jax.jit,
    static_argnames=("max_lines", "rows", "cols", "depthmap_factor",
                     "focal_x_baseline", "mode"),
)
def _lines_impl(img, key, aux, *, max_lines, rows, cols, depthmap_factor,
                focal_x_baseline, mode):
    """The WHOLE line front-end as one jitted dispatch: detection,
    band descriptors, endpoint depths (RGB-D median sampling or stereo
    row-SAD). Previously this path ran as ~50 eager ops whose per-dispatch
    RPC overhead alone cost ~100 ms/frame on the tunnel-attached chip
    (the full-PLP configuration's fps collapse)."""
    from structure_plp_slam_tpu.ops import lines as line_ops

    gray = image_ops.to_grayscale(img)
    seg, valid, _ = line_ops.detect_line_segments_multiscale(
        gray, key, max_lines=max_lines
    )
    desc = line_ops.line_band_descriptors(gray, seg, valid)
    H, W = rows, cols
    if mode == "stereo":
        from structure_plp_slam_tpu.ops import stereo as stereo_ops

        ML = seg.shape[0]
        fracs = jnp.asarray([0.05, 0.1, 0.15, 0.85, 0.9, 0.95])
        x = seg[None, :, 0] + fracs[:, None] * (seg[None, :, 2] - seg[None, :, 0])
        y = seg[None, :, 1] + fracs[:, None] * (seg[None, :, 3] - seg[None, :, 1])
        pts = jnp.stack([x.reshape(-1), y.reshape(-1)], axis=-1)
        grayR = image_ops.to_grayscale(aux)
        d, ok = stereo_ops.depth_at_points(
            gray, grayR, pts, focal_x_baseline=focal_x_baseline
        )
        d = jnp.where(ok, d, 0.0).reshape(6, ML)
        seg_depth = jnp.stack(
            [jnp.median(d[:3], axis=0), jnp.median(d[3:], axis=0)], axis=1
        )
    elif mode == "depth":
        dm = aux.astype(jnp.float32) * (1.0 / depthmap_factor)

        def sample_depth(frac):
            xs = seg[:, 0] + frac * (seg[:, 2] - seg[:, 0])
            ys = seg[:, 1] + frac * (seg[:, 3] - seg[:, 1])
            xi = jnp.clip(xs.astype(jnp.int32), 0, W - 1)
            yi = jnp.clip(ys.astype(jnp.int32), 0, H - 1)
            return dm[yi, xi]

        d1 = jnp.median(
            jnp.stack([sample_depth(f) for f in (0.05, 0.1, 0.15)]), axis=0
        )
        d2 = jnp.median(
            jnp.stack([sample_depth(f) for f in (0.85, 0.9, 0.95)]), axis=0
        )
        seg_depth = jnp.stack([d1, d2], axis=1)
    else:
        seg_depth = jnp.zeros((seg.shape[0], 2), jnp.float32)
    return seg, desc, valid, seg_depth


class Frontend:
    """Feature extraction pipeline bound to a camera + ORB params.

    ``pad_to``: output slot count (the MapState per-keyframe capacity).
    """

    _JIT_CACHE: dict = {}

    def __init__(self, camera, orb_params: orb_ops.OrbParams, pad_to: int,
                 with_lines: bool = False, max_lines: int = 64):
        self.with_lines = with_lines
        self.max_lines = max_lines
        self.camera = camera
        self.extractor = orb_ops.OrbExtractor(camera.rows, camera.cols, orb_params)
        if pad_to < self.extractor.capacity:
            raise ValueError(
                f"pad_to={pad_to} < extractor capacity {self.extractor.capacity}"
            )
        self.pad_to = pad_to
        self.scale_factors = jnp.asarray(
            orb_params.scale_factors(), jnp.float32
        )
        # Per-level information weights: inv_sigma_sq = 1 / scale^2
        # (reference: orb_params.h inv_level_sigma_sq).
        self.inv_sigma_sq = 1.0 / (self.scale_factors**2)
        # Static exclusion mask from the config's normalized rectangles
        # (reference: orb_extractor::create_rectangle_mask,
        # orb_extractor.cc:297-314; value 0 = excluded).
        if orb_params.mask_rects:
            import numpy as np

            m = np.ones((camera.rows, camera.cols), bool)
            for x0, x1, y0, y1 in orb_params.mask_rects:
                m[int(round(camera.rows * y0)):int(round(camera.rows * y1)),
                  int(round(camera.cols * x0)):int(round(camera.cols * x1))] = False
            self._rect_mask = jnp.asarray(m)
        else:
            self._rect_mask = None
        # Jitted executables shared across Frontend instances with the same
        # config (instance-bound jax.jit retraces per instance — a fresh
        # System would otherwise pay the full frontend compile again).
        key = (camera, orb_params, pad_to)
        fns = Frontend._JIT_CACHE.get(key)
        if fns is None:
            fns = (
                jax.jit(self._mono_impl),
                jax.jit(self._rgbd_impl),
                jax.jit(self._stereo_impl),
            )
            Frontend._JIT_CACHE[key] = fns
        self._mono, self._rgbd, self._stereo = fns

    # ------------------------------------------------------------------
    def _lines(self, img, out, key, depth_map=None, img_right=None):
        """Attach line-segment features (reference: the ±line frame
        constructors, frame.h:87-164 line variants + LineFeatureTracker).
        One jitted dispatch — see :func:`_lines_impl`."""
        import jax

        if key is None:
            key = jax.random.PRNGKey(0)
        if img_right is not None:
            mode, aux = "stereo", jnp.asarray(img_right)
        elif depth_map is not None:
            mode, aux = "depth", jnp.asarray(depth_map)
        else:
            mode, aux = "none", jnp.zeros((1, 1), jnp.float32)
        seg, desc, valid, seg_depth = _lines_impl(
            jnp.asarray(img), key, aux,
            max_lines=self.max_lines, rows=self.camera.rows,
            cols=self.camera.cols,
            depthmap_factor=float(self.camera.depthmap_factor),
            focal_x_baseline=float(self.camera.focal_x_baseline),
            mode=mode,
        )
        out["seg"] = seg
        out["seg_desc"] = desc
        out["seg_valid"] = valid
        out["seg_depth"] = seg_depth
        return out

    def _eff_mask(self, mask):
        """Combine the per-frame mask image (reference: feed_*_frame's
        ``mask`` argument, 0 = excluded) with the static rectangle mask."""
        if mask is None:
            return self._rect_mask
        m = jnp.asarray(mask) != 0
        return m if self._rect_mask is None else (m & self._rect_mask)

    def mono(self, img_gray, key=None, mask=None):
        """uint8/f32 [H, W] grayscale -> feature SoA (mono)."""
        out = self._mono(jnp.asarray(img_gray), self._eff_mask(mask))
        if self.with_lines:
            out = self._lines(img_gray, dict(out), key)
        return out

    def rgbd(self, img_gray, depth, key=None, mask=None):
        """Adds per-keypoint depth sampled from the registered depth map and
        a virtual right-x coordinate (reference: frame.cc RGBD ctor
        computes x_right = x - fx*baseline/depth)."""
        out = self._rgbd(
            jnp.asarray(img_gray), jnp.asarray(depth), self._eff_mask(mask)
        )
        if self.with_lines:
            out = self._lines(img_gray, dict(out), key, depth_map=depth)
        return out

    def stereo(self, img_left, img_right, key=None, mask=None):
        """Rectified stereo pair: left features + disparity-derived depth
        (reference: frame.cc stereo ctor runs L/R ORB on two std::threads
        then match::stereo; here both extractions are independent jit
        subgraphs XLA schedules concurrently). With lines enabled, line
        segments are detected on the left image and endpoint depths come
        from a row disparity search (the stereo line frame ctor,
        frame.h:87-164 / run_kitti_slam_with_line.cc:191-233)."""
        out = self._stereo(
            jnp.asarray(img_left), jnp.asarray(img_right), self._eff_mask(mask)
        )
        if self.with_lines:
            out = self._lines(img_left, dict(out), key, img_right=img_right)
        return out

    # ------------------------------------------------------------------
    def _pad(self, arr, fill=0):
        n = arr.shape[0]
        if n == self.pad_to:
            return arr
        pad_width = [(0, self.pad_to - n)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, pad_width, constant_values=fill)

    def _base(self, img, mask=None):
        gray = image_ops.to_grayscale(img)
        feats = self.extractor(gray)
        valid = feats["valid"]
        if mask is not None:
            # Keypoints in excluded regions are dropped on their raw
            # (distorted) coords, the coords detection ran on. The
            # reference masks FAST detection itself; masking validity is
            # equivalent downstream (a masked cell's budget is small).
            xi = jnp.clip(feats["xy"][:, 0].astype(jnp.int32), 0,
                          self.camera.cols - 1)
            yi = jnp.clip(feats["xy"][:, 1].astype(jnp.int32), 0,
                          self.camera.rows - 1)
            valid = valid & mask[yi, xi]
        xy_und = cam_base.undistort_keypoints(self.camera, feats["xy"])
        bearing = cam_base.bearings(self.camera, xy_und)
        return {
            "xy": self._pad(xy_und),
            "level": self._pad(feats["level"]),
            "angle": self._pad(feats["angle"]),
            "desc": self._pad(feats["desc"]),
            "bearing": self._pad(bearing),
            "valid": self._pad(valid),
            "response": self._pad(feats["response"]),
            # raw (distorted) coords for depth-map sampling
            "_xy_raw": self._pad(feats["xy"]),
        }

    def _mono_impl(self, img, mask=None):
        out = self._base(img, mask)
        n = self.pad_to
        out["xr"] = jnp.full((n,), -1.0, jnp.float32)
        out["depth"] = jnp.zeros((n,), jnp.float32)
        out.pop("_xy_raw")
        return out

    def _rgbd_impl(self, img, depth_map, mask=None):
        out = self._base(img, mask)
        cam = self.camera
        xy = out.pop("_xy_raw")
        xs = jnp.clip(xy[:, 0].astype(jnp.int32), 0, cam.cols - 1)
        ys = jnp.clip(xy[:, 1].astype(jnp.int32), 0, cam.rows - 1)
        d = depth_map[ys, xs].astype(jnp.float32) * (1.0 / cam.depthmap_factor)
        has_depth = d > 1e-6
        safe_d = jnp.where(has_depth, d, 1.0)
        xr = jnp.where(
            has_depth, out["xy"][:, 0] - cam.focal_x_baseline / safe_d, -1.0
        )
        out["depth"] = jnp.where(has_depth, d, 0.0)
        out["xr"] = xr
        return out

    def _stereo_impl(self, imgL, imgR, mask=None):
        from structure_plp_slam_tpu.ops import matching, stereo as stereo_ops

        out = self._base(imgL, mask)
        grayL = image_ops.to_grayscale(imgL)
        grayR = image_ops.to_grayscale(imgR)
        featsR = self.extractor(grayR)
        bitsL = matching.unpack_desc_bits(out["desc"])
        bitsR = matching.unpack_desc_bits(self._pad(featsR["desc"]))
        xr, depth, ok = stereo_ops.match_stereo(
            grayL,
            grayR,
            out.pop("_xy_raw"),
            out["level"],
            bitsL,
            out["valid"],
            self._pad(featsR["xy"]),
            self._pad(featsR["level"]),
            bitsR,
            self._pad(featsR["valid"]),
            self.scale_factors,
            focal_x_baseline=self.camera.focal_x_baseline,
        )
        out["xr"] = jnp.where(ok, xr, -1.0)
        out["depth"] = jnp.where(ok, depth, 0.0)
        return out

    def obs_inv_sigma_sq(self, level):
        """Per-observation information from pyramid level ``[N] i32``."""
        return self.inv_sigma_sq[jnp.clip(level, 0, self.inv_sigma_sq.shape[0] - 1)]
