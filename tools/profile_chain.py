"""Micro-profile: device time of the per-frame track step and the
keyframe chain at large-map steady state (warm compile cache assumed).

Feeds the first half of the loop sequence to reach steady state, then
times (a) the fused per-frame step, (b) the keyframe chain dispatch,
(c) the chain's component stages where separable.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/jax_compile_cache_plpslam_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import bench
from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.ops.orb import OrbParams
from structure_plp_slam_tpu.system import System
from structure_plp_slam_tpu.models import mapper


def timeit(fn, n=20, name=""):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / n * 1000.0
    print(f"{name:<44}{ms:>9.2f} ms")
    return ms


def main():
    cam = bench._bench_camera()
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=1000, num_levels=8),
                 raw={})
    frames_l = bench.load_frames(2 * bench.LOOP_OUT_FRAMES, kind="loop")
    n_out = len(frames_l) // 2
    dev = [
        (jax.device_put(i), jax.device_put(d), None, ts)
        for (i, d, g, ts) in frames_l[:n_out]
    ]
    jax.block_until_ready(dev[-1][0])

    sl = System(cfg, max_keyframes=256, max_landmarks=65536,
                max_kf_interval=bench.LOOP_KF_INTERVAL)
    sl.startup()
    t0 = time.perf_counter()
    for img, depth, _g, ts in dev:
        sl.feed_RGBD_frame(img, depth, ts)
    np.asarray(sl.state.kf_pose)
    print(f"steady state reached in {time.perf_counter()-t0:.1f}s: "
          f"kf={sl.metrics()['keyframes']} lm={sl.metrics()['landmarks']}")

    img, depth, _g, ts = dev[-1]

    # (a) frontend alone
    timeit(lambda: sl.frontend.rgbd(img, depth)["desc"], 20, "frontend.rgbd")

    # (b) the fused per-frame track step (without frontend)
    feats = sl.frontend.rgbd(img, depth)
    from structure_plp_slam_tpu import system as sysmod
    R, t = sl.pose
    Rv, tv = sl.vel
    carry = sysmod._TrackCarry(
        R=R, t=t, Rv=Rv, tv=tv,
        last_kp_lm=sl.last_kp_lm, ref_kf=sl._ref_kf_dev,
    )
    min_obs_dev = jnp.int32(3)

    def track():
        out = sysmod._track_step(
            sl.camera, sl._state, feats, carry,
            sl.frontend.inv_sigma_sq, sl._obs_indicator(),
            min_obs_dev, sl.next_lm,
            num_levels=sl.frontend.extractor.params.num_levels,
            scale_factor=sl.frontend.extractor.params.scale_factor,
            with_lines=False,
        )
        return out[3]
    timeit(track, 20, "track step (fused)")

    # (c) the keyframe chain (one dispatch, production kwargs)
    lc = sl.loop_closer
    slot = sl.next_kf
    pose = jnp.concatenate([jnp.eye(3, dtype=jnp.float32),
                            jnp.zeros((3, 1), jnp.float32)], 1)
    kw = dict(
        with_lines=False, has_seg=False, has_seg_lines=False,
        do_ba=True, do_cull_kf=True, stats_full=True, do_detect=True,
        two_view_lines=True,
        num_tri_neighbors=sl.num_tri_neighbors,
        planar=sl.planar, use_graph_cut=sl.use_graph_cut,
        scale_factor=sl.frontend.extractor.params.scale_factor,
        num_levels=sl.frontend.extractor.params.num_levels,
        bow_max_hamming=lc.bow.max_hamming, bow_chunk=lc.bow.chunk,
    )
    seg_mask_arg = jnp.zeros((1, 1), jnp.uint8)
    seg_line_arg = jnp.zeros((0,), jnp.int32)
    key = sl._split_key()
    kp_lm = sl.last_kp_lm

    def chain(**over):
        kw2 = {**kw, **over}
        out = sysmod._kf_chain(
            sl.camera, sl._state, slot, pose, ts, feats,
            kp_lm, sl.next_lm, seg_mask_arg, seg_line_arg,
            key, sl.next_plane, sl.next_line,
            sl.frontend.inv_sigma_sq, sl._obs_indicator(), **kw2,
        )
        return out[0].kf_pose

    timeit(lambda: chain(), 5, "kf chain (full: ba+cull+detect+stats)")
    timeit(lambda: chain(do_ba=False), 5, "kf chain (no BA)")
    timeit(lambda: chain(do_detect=False), 5, "kf chain (no detect)")
    timeit(lambda: chain(do_cull_kf=False), 5, "kf chain (no kf cull)")
    timeit(lambda: chain(stats_full=False), 5, "kf chain (stats normals-only)")
    timeit(lambda: chain(do_ba=False, do_detect=False, do_cull_kf=False,
                         stats_full=False), 5, "kf chain (minimal)")

    # (d) local BA alone at production window
    st = sl._state
    last_kf = slot - 1
    def ba():
        s2, _ = mapper.local_ba(sl.camera, st, last_kf,
                                sl.frontend.inv_sigma_sq)
        return s2.kf_pose
    timeit(ba, 5, "local BA alone (8 iters)")
    sl.shutdown()


if __name__ == "__main__":
    main()
