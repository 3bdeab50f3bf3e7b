"""Where do the with_lines milliseconds go? (TPU, live client mode)."""

import sys
import time

import numpy as np


def timeit(fn, n=5):
    import jax

    out = fn()
    jax.block_until_ready(out)
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
    from bench import _bench_camera, load_frames
    from structure_plp_slam_tpu.config import Config
    from structure_plp_slam_tpu.ops.orb import OrbParams
    from structure_plp_slam_tpu.system import System

    _ = np.array(jnp.arange(8.0))  # live mode
    cam = _bench_camera()
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=1000, num_levels=8),
                 raw={})
    frames = load_frames(96, kind="plp")
    frames_dev = [
        (jax.device_put(i), jax.device_put(d), jax.device_put(s), ts)
        for (i, d, s, ts) in frames
    ]
    slam = System(cfg, max_keyframes=256, max_landmarks=32768,
                  with_lines=True)
    slam.startup()
    t0 = time.perf_counter()
    for i, (img, dep, seg, ts) in enumerate(frames_dev[:48]):
        slam.feed_RGBD_frame(img, dep, ts, seg_mask=seg)
        if i in (5, 15, 30, 45):
            np.asarray(slam.state.kf_pose)
            print(f"  frame {i}: {time.perf_counter()-t0:.1f}s elapsed",
                  file=sys.stderr, flush=True)
    np.asarray(slam.state.kf_pose)
    print(f"warmup 48 frames in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    st = slam.state
    fe = slam.frontend
    img_d, dep_d, seg_d, _ts = frames_dev[40]

    key = jax.random.PRNGKey(3)
    t = timeit(lambda: fe.rgbd(img_d, dep_d))
    print(f"frontend.rgbd (no lines)  {t:8.2f}", flush=True)
    t = timeit(lambda: fe.rgbd(img_d, dep_d, key))
    print(f"frontend.rgbd (lines)     {t:8.2f}", flush=True)

    feats = fe.rgbd(img_d, dep_d, key)
    from structure_plp_slam_tpu.data import map_state as ms
    from structure_plp_slam_tpu.system import _TrackCarry, _track_step

    carry = _TrackCarry(
        R=slam.pose[0], t=slam.pose[1], Rv=slam.vel[0], tv=slam.vel[1],
        last_kp_lm=slam.last_kp_lm, ref_kf=slam._ref_kf_dev,
    )
    ind = ms.observation_indicator(st)
    t = timeit(lambda: _track_step(
        cam, st, feats, carry, fe.inv_sigma_sq, ind, jnp.int32(3),
        slam.next_lm, num_levels=8,
        scale_factor=fe.extractor.params.scale_factor, with_lines=False))
    print(f"track_step no-lines       {t:8.2f}", flush=True)
    t = timeit(lambda: _track_step(
        cam, st, feats, carry, fe.inv_sigma_sq, ind, jnp.int32(3),
        slam.next_lm, num_levels=8,
        scale_factor=fe.extractor.params.scale_factor, with_lines=True))
    print(f"track_step with-lines     {t:8.2f}", flush=True)

    from structure_plp_slam_tpu.models import line_mapper, mapper

    slot = slam.ref_kf
    nl = slam.next_line
    t = timeit(lambda: line_mapper.lines_from_depth(cam, st, slot, nl))
    print(f"lines_from_depth          {t:8.2f}", flush=True)
    t = timeit(lambda: line_mapper.lines_from_points(cam, st, slot, nl))
    print(f"lines_from_points         {t:8.2f}", flush=True)
    t = timeit(lambda: line_mapper.triangulate_lines_with_neighbors(
        cam, st, slot, nl))
    print(f"tri_lines_with_neighbors  {t:8.2f}", flush=True)
    t = timeit(lambda: line_mapper.cull_lines(st, slot))
    print(f"cull_lines                {t:8.2f}", flush=True)
    t = timeit(lambda: line_mapper.refresh_lines(cam, st))
    print(f"refresh_lines             {t:8.2f}", flush=True)
    t = timeit(lambda: mapper.local_ba(cam, st, slot, fe.inv_sigma_sq,
                                       with_lines=True, ind=ind), n=3)
    print(f"local_ba with-lines       {t:8.2f}", flush=True)
    t = timeit(lambda: mapper.local_ba(cam, st, slot, fe.inv_sigma_sq,
                                       with_lines=False, ind=ind), n=3)
    print(f"local_ba no-lines         {t:8.2f}", flush=True)
    slam.shutdown()


if __name__ == "__main__":
    main()
