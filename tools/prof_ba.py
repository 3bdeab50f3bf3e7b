"""Break local_ba's 42 ms down: per-iteration slope vs fixed setup, and
the cost of the Cholesky + assemble pieces."""

import sys
import time

import numpy as np


def timeit(fn, n=8):
    import jax

    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_compile_cache_plpslam_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, ".")
    from bench import make_system
    from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
    from structure_plp_slam_tpu.config import Config
    from structure_plp_slam_tpu.data import map_state as ms
    from structure_plp_slam_tpu.models import mapper
    from structure_plp_slam_tpu.ops.orb import OrbParams
    from tests import synthetic_scene as sc

    cam = Camera(
        name="bench", setup=CameraSetup.RGBD, model=CameraModel.PERSPECTIVE,
        cols=640, rows=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5,
        fps=30.0, focal_x_baseline=40.0, depth_threshold=40.0,
        depthmap_factor=5000.0,
    )
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=1000, num_levels=8),
                 raw={})
    rng = np.random.default_rng(0)
    tex = sc.make_texture(rng)
    poses = sc.trajectory(96, step=0.05)
    slam = make_system(cfg)
    slam.startup()
    for i, (R, t) in enumerate(poses):
        img, depth = sc.render(cam, tex, R, t)
        seg = np.where(depth < 4.5, 1, 2).astype(np.uint8)
        slam.feed_RGBD_frame(np.clip(img, 0, 255).astype(np.uint8),
                             np.clip(depth * 5000.0, 0, 65535).astype(np.uint16),
                             float(i) / 30.0, seg_mask=seg)
    np.asarray(slam.state.kf_pose)
    print("warmed", file=sys.stderr, flush=True)

    st = slam.state
    fe = slam.frontend
    slot = slam.ref_kf
    ind = ms.observation_indicator(st)

    for ni in (1, 2, 5, 10):
        t = timeit(lambda ni=ni: mapper.local_ba(
            cam, st, slot, fe.inv_sigma_sq, ind=ind)
            if ni == 10 else _ba_iters(cam, st, slot, fe, ind, ni), n=5)
        print(f"local_ba num_iters={ni:2d}  {t:8.2f} ms", flush=True)

    # Cholesky alone at [192,192].
    S = jnp.eye(192) * 3.0 + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (192, 192))
    S = S @ S.T
    rhs = jnp.ones((192,))

    @jax.jit
    def chol(S, rhs):
        L, low = jax.scipy.linalg.cho_factor(S, lower=True)
        return jax.scipy.linalg.cho_solve((L, low), rhs)

    t = timeit(lambda: chol(S, rhs), n=20)
    print(f"cho_factor+solve 192  {t:8.2f} ms", flush=True)

    @jax.jit
    def lstsq_solve(S, rhs):
        return jnp.linalg.solve(S, rhs)

    t = timeit(lambda: lstsq_solve(S, rhs), n=20)
    print(f"linalg.solve 192      {t:8.2f} ms", flush=True)
    slam.shutdown()


def _ba_iters(cam, st, slot, fe, ind, ni):
    from structure_plp_slam_tpu.models import mapper

    # monkeypatched-iteration local_ba: call ba_solve directly with the
    # same window by reusing mapper.local_ba's internals is complex; use
    # the public knob instead.
    import structure_plp_slam_tpu.models.bundle_adjustment as ba
    orig = ba.ba_solve
    out = {}

    def wrap(camera, prob, lines=None, **kw):
        kw["num_iters"] = ni
        kw["cull_at_iters"] = (min(ni - 1, 4),) if ni > 1 else ()
        return orig(camera, prob, lines, **kw)

    ba.ba_solve = wrap
    try:
        res = mapper.local_ba(cam, st, slot, fe.inv_sigma_sq, ind=ind)
    finally:
        ba.ba_solve = orig
    return res


if __name__ == "__main__":
    main()
