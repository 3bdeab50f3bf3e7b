"""Benchmark: tracked frames/sec on one TPU chip (synthetic sequence).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's per-frame tracking cost on CPU. Its authors'
notes put motion-model tracking at ~4 ms and the drivers pace at dataset
fps (30); the honest comparable number is the full per-frame pipeline
(ORB + association + motion-only LM), for which the reference README
reports real-time (30 fps) operation on CPU. vs_baseline is measured
frames/s divided by 30.
"""

import json
import time

import numpy as np


def main(breakdown: bool = False):
    import jax
    import jax.numpy as jnp

    from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
    from structure_plp_slam_tpu.data import map_state as ms
    from structure_plp_slam_tpu.models import frontend as frontend_mod
    from structure_plp_slam_tpu.models import tracker
    from structure_plp_slam_tpu.ops.orb import OrbParams

    # TUM-like geometry: 640x480, 1000 keypoints, 8 levels.
    cam = Camera(
        name="bench",
        setup=CameraSetup.MONOCULAR,
        model=CameraModel.PERSPECTIVE,
        cols=640,
        rows=480,
        fx=525.0,
        fy=525.0,
        cx=319.5,
        cy=239.5,
    )
    orb = OrbParams(max_num_keypts=1000, num_levels=8)
    fe = frontend_mod.Frontend(cam, orb, pad_to=1024 + 512)

    rng = np.random.default_rng(0)
    imgs = []
    base = rng.uniform(0, 255, size=(480, 640)).astype(np.float32)
    for i in range(8):
        imgs.append(np.roll(base, shift=3 * i, axis=1))

    # A populated map for the tracking step.
    K, N, L = 64, fe.pad_to, 16384
    state = ms.create(K, N, L)
    feats0 = fe.mono(imgs[0])
    state = ms.add_keyframe(
        state,
        0,
        jnp.concatenate([jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], 1),
        0.0,
        feats0,
        jnp.where(feats0["valid"], jnp.arange(N, dtype=jnp.int32), -1),
    )
    pts = np.concatenate(
        [rng.uniform(-3, 3, (L, 2)), rng.uniform(3, 9, (L, 1))], axis=1
    ).astype(np.float32)
    state = state._replace(
        lm_pos=jnp.asarray(pts),
        lm_valid=jnp.ones((L,), bool),
        lm_desc=feats0["desc"][jnp.arange(L) % N],
        lm_dist_min=jnp.full((L,), 0.5, jnp.float32),
        lm_dist_max=jnp.full((L,), 40.0, jnp.float32),
    )
    R = jnp.eye(3, dtype=jnp.float32)
    t = jnp.zeros((3,), jnp.float32)
    last = state.kf_lm_idx[0]

    from structure_plp_slam_tpu.data import map_state as ms

    ind = ms.observation_indicator(state)

    def step(img, R, t, last):
        feats = fe.mono(img)
        return tracker.track_frame(
            cam, state, feats, R, t, last, jnp.int32(0), fe.inv_sigma_sq,
            ind, num_levels=8, scale_factor=1.2,
        )

    # Warmup/compile.
    out = step(imgs[0], R, t, last)
    out.R.block_until_ready()

    # Sequential WITH pose feedback: frame i consumes frame i-1's pose and
    # associations, exactly like live tracking — no pipelining flattery.
    n_iter = 60
    Rc, tc, lastc = R, t, last
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = step(imgs[i % len(imgs)], Rc, tc, lastc)
        Rc, tc, lastc = out.R, out.t, out.kp_lm
    out.R.block_until_ready()
    dt = time.perf_counter() - t0
    fps = n_iter / dt

    if breakdown:
        import jax

        def timeit(fn, *args, n=30):
            # Amortized device time over a dispatch chain. Per-call
            # blocking would measure the host<->device sync round trip
            # (milliseconds of tunnel RTT in this environment), not the
            # kernel; the chain amortizes that away. The headline fps
            # below is the honest end-to-end number (sequential WITH
            # pose feedback, one final sync).
            r = fn(*args)
            jax.tree_util.tree_leaves(r)[0].block_until_ready()
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn(*args)
            jax.tree_util.tree_leaves(r)[0].block_until_ready()
            return (time.perf_counter() - t0) / n * 1000.0

        from structure_plp_slam_tpu.ops import matching as m
        from structure_plp_slam_tpu.models import pose_opt

        img0 = jnp.asarray(imgs[0])
        t_fe = timeit(fe.mono, img0)
        feats = fe.mono(img0)
        kp_bits = m.unpack_desc_bits(feats["desc"])
        lm_bits = m.unpack_desc_bits(state.lm_desc)
        t_mat = timeit(
            jax.jit(
                lambda a, b: m.distance_matrix_mxu(a, b, state.lm_valid, feats["valid"])
            ),
            lm_bits,
            kp_bits,
        )
        pts = state.lm_pos[jnp.clip(last, 0, L - 1)]
        t_po = timeit(
            lambda: pose_opt.optimize_pose(
                cam, R, t, pts, feats["xy"], feats["xr"],
                fe.obs_inv_sigma_sq(feats["level"]), last >= 0,
            )
        )
        t_full = timeit(lambda im: step(im, R, t, last), imgs[0])
        print(json.dumps({
            "frontend_ms": round(t_fe, 3),
            "dist_matmul_ms": round(t_mat, 3),
            "pose_opt_ms": round(t_po, 3),
            "full_track_ms": round(t_full, 3),
        }))

    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec_1chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    import sys

    main(breakdown="--breakdown" in sys.argv)
