"""Synthetic renderable scene for end-to-end SLAM tests.

A textured plane at z = PLANE_Z rendered through a perspective camera —
gives exact GT poses, exact depth maps, and enough texture for ORB.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from structure_plp_slam_tpu.ops import image as image_ops
from structure_plp_slam_tpu.ops import lie

PLANE_Z = 6.0
PLANE_HALF = 5.0  # plane spans [-5, 5]^2
# Foreground plane patch (gives the scene real 3D structure; a single plane
# is a degenerate mono case: H-only geometry + shallow-parallax depths).
FG_Z = 3.5
FG_X = (-1.1, 1.1)
FG_Y = (-0.9, 0.9)


def make_texture(rng, size=768, grid: bool = False):
    tex = rng.uniform(0, 255, size=(size, size)).astype(np.float32)
    tex = np.array(image_ops.gaussian_blur(jnp.asarray(tex), 7, 1.5))
    for _ in range(int(size * 0.6)):
        cy, cx = rng.integers(10, size - 20, 2)
        s = rng.integers(4, 14)
        tex[cy : cy + s, cx : cx + s] = rng.uniform(0, 255)
    if grid:
        # Dark lines -> real 3D line structure on the plane. Irregular
        # spacing and varying thickness/intensity keep the lines
        # individually distinguishable (a perfectly regular grid is
        # pathologically aliased for ANY line descriptor).
        g = np.random.default_rng(7)
        pos = np.cumsum(g.integers(70, 190, size=12))
        for i, p in enumerate(pos[pos < size - 8]):
            w = 3 + (i % 3)
            tex[p : p + w, :] = 5.0 + 12.0 * (i % 4)
            q = int(pos[::-1][i % len(pos)] * 0.83) % (size - 8)
            tex[:, q : q + w] = 5.0 + 12.0 * ((i + 2) % 4)
    return tex


def render(camera, tex, R_cw, t_cw, plane_half: float = PLANE_HALF):
    """Render image + depth of two textured planes (bg z=6, fg patch z=3.5)."""
    H, W = camera.rows, camera.cols
    ys, xs = np.mgrid[0:H, 0:W]
    d = np.stack(
        [
            (xs - camera.cx) / camera.fx,
            (ys - camera.cy) / camera.fy,
            np.ones_like(xs, np.float64),
        ],
        -1,
    )
    R_wc = R_cw.T
    C = -R_cw.T @ t_cw
    dw = d @ R_wc.T
    denom = np.where(np.abs(dw[..., 2]) < 1e-9, 1e-9, dw[..., 2])
    size = tex.shape[0]

    def hit_plane(z_plane):
        lam = (z_plane - C[2]) / denom
        pw = C + lam[..., None] * dw
        return lam, pw

    lam_bg, pw_bg = hit_plane(PLANE_Z)
    lam_fg, pw_fg = hit_plane(FG_Z)
    fg_mask = (
        (lam_fg > 0)
        & (pw_fg[..., 0] >= FG_X[0])
        & (pw_fg[..., 0] <= FG_X[1])
        & (pw_fg[..., 1] >= FG_Y[0])
        & (pw_fg[..., 1] <= FG_Y[1])
    )
    pw = np.where(fg_mask[..., None], pw_fg, pw_bg)

    def sample(pw, half, offset):
        u = (pw[..., 0] + half) / (2 * half) * (size - 1)
        v = (pw[..., 1] + half) / (2 * half) * (size - 1)
        ui = np.clip((u + offset).astype(int), 0, size - 1)
        vi = np.clip(v.astype(int), 0, size - 1)
        return tex[vi, ui]

    # Foreground samples a shifted region of the texture so the two planes
    # don't share appearance.
    img_bg = sample(pw_bg, plane_half, 0)
    img_fg = sample(pw_fg, 2.0, size // 3)
    img = np.where(fg_mask, img_fg, img_bg).astype(np.float32)

    pc = (pw - C) @ R_cw.T  # camera-frame points
    depth = pc[..., 2].astype(np.float32)
    return img, depth


def render_fisheye(camera, tex, R_cw, t_cw, plane_half: float = PLANE_HALF):
    """Render through a Kannala-Brandt fisheye camera (distorted image +
    depth). Per-pixel rays come from the camera model's own undistortion,
    so the image is consistent with what the frontend will undo."""
    import jax.numpy as jnp

    from structure_plp_slam_tpu.camera import fisheye as fe

    H, W = camera.rows, camera.cols
    ys, xs = np.mgrid[0:H, 0:W]
    pix = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32)
    und = np.array(fe.undistort_keypoints(camera, jnp.asarray(pix)))
    d = np.stack(
        [
            (und[:, 0] - camera.cx) / camera.fx,
            (und[:, 1] - camera.cy) / camera.fy,
            np.ones(len(und)),
        ],
        -1,
    ).reshape(H, W, 3)
    R_wc = R_cw.T
    C = -R_cw.T @ t_cw
    dw = d @ R_wc.T
    denom = np.where(np.abs(dw[..., 2]) < 1e-9, 1e-9, dw[..., 2])
    size = tex.shape[0]
    lam_bg = (PLANE_Z - C[2]) / denom
    pw_bg = C + lam_bg[..., None] * dw
    lam_fg = (FG_Z - C[2]) / denom
    pw_fg = C + lam_fg[..., None] * dw
    fg_mask = (
        (lam_fg > 0)
        & (pw_fg[..., 0] >= FG_X[0]) & (pw_fg[..., 0] <= FG_X[1])
        & (pw_fg[..., 1] >= FG_Y[0]) & (pw_fg[..., 1] <= FG_Y[1])
    )
    pw = np.where(fg_mask[..., None], pw_fg, pw_bg)

    def sample(p, half, offset):
        u = (p[..., 0] + half) / (2 * half) * (size - 1)
        v = (p[..., 1] + half) / (2 * half) * (size - 1)
        ui = np.clip((u + offset).astype(int), 0, size - 1)
        vi = np.clip(v.astype(int), 0, size - 1)
        return tex[vi, ui]

    img = np.where(
        fg_mask, sample(pw_fg, 2.0, size // 3), sample(pw_bg, plane_half, 0)
    ).astype(np.float32)
    pc = (pw - C) @ R_cw.T
    depth = pc[..., 2].astype(np.float32)
    return img, depth


def render_equirect(camera, tex, R_cw, t_cw, box_half: float = 6.0):
    """Render a 360° lat/long image from inside a textured cube room.

    Every bearing direction hits a wall, exercising the full-sphere
    observability of the equirectangular model (points behind the 'front'
    hemisphere included). Returns (image, range-map) — range is ray length,
    the equirectangular depth convention."""
    from structure_plp_slam_tpu.camera import equirectangular as eq

    H, W = camera.rows, camera.cols
    ys, xs = np.mgrid[0:H, 0:W]
    pix = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], 1).astype(np.float32)
    b = np.asarray(eq.bearings(camera, jnp.asarray(pix))).reshape(H, W, 3)
    R_wc = R_cw.T
    C = -R_cw.T @ t_cw
    dw = b.astype(np.float64) @ R_wc.T
    size = tex.shape[0]
    best_lam = np.full((H, W), np.inf)
    img = np.zeros((H, W), np.float32)
    face = 0
    for ax, u_ax, v_ax in ((0, 1, 2), (1, 0, 2), (2, 0, 1)):
        for sign in (1.0, -1.0):
            denom = dw[..., ax]
            denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            lam = (sign * box_half - C[ax]) / denom
            pw_u = C[u_ax] + lam * dw[..., u_ax]
            pw_v = C[v_ax] + lam * dw[..., v_ax]
            hit = (
                (lam > 0.05)
                & (np.abs(pw_u) <= box_half + 1e-6)
                & (np.abs(pw_v) <= box_half + 1e-6)
                & (lam < best_lam)
            )
            u = (pw_u + box_half) / (2 * box_half) * (size - 1)
            v = (pw_v + box_half) / (2 * box_half) * (size - 1)
            off = (face * size) // 7  # per-face texture shift
            ui = (np.clip(u.astype(int), 0, size - 1) + off) % size
            vi = np.clip(v.astype(int), 0, size - 1)
            img = np.where(hit, tex[vi, ui], img)
            best_lam = np.where(hit, lam, best_lam)
            face += 1
    return img.astype(np.float32), best_lam.astype(np.float32)


def trajectory(num_frames, step=0.06, rot=0.004):
    """A gentle arc: translate along +x with slight yaw."""
    poses = []
    for i in range(num_frames):
        phi = np.array([0.0, rot * i, 0.0])
        R = np.array(lie.so3_exp(jnp.asarray(phi[None], jnp.float32)))[0].astype(
            np.float64
        )
        C = np.array([step * i, 0.015 * np.sin(i * 0.4), 0.01 * i])
        t = -R @ C
        poses.append((R, t))
    return poses


def make_sequence(rng, camera, num_frames=20, step=0.06):
    tex = make_texture(rng)
    poses = trajectory(num_frames, step=step)
    frames = []
    for i, (R, t) in enumerate(poses):
        img, depth = render(camera, tex, R, t)
        frames.append((img, depth, float(i) / 30.0))
    return frames, poses
