"""Profile the bench large-map variant with per-stage timing.

Run on the TPU chip (must be exclusive). Prints the stage timing table
plus wall f/s so the large-map bottleneck is visible.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/jax_compile_cache_plpslam_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

import bench
from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.ops.orb import OrbParams
from structure_plp_slam_tpu.ops import lie
from structure_plp_slam_tpu.system import System


def main():
    synced = "--synced" in sys.argv
    cam = bench._bench_camera()
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=1000, num_levels=8),
                 raw={})

    frames_l = bench.load_frames(2 * bench.LOOP_OUT_FRAMES, kind="loop")
    dev = [(jax.device_put(i), jax.device_put(d), None, ts)
           for (i, d, g, ts) in frames_l]
    jax.block_until_ready(dev[-1][0])
    n_out = len(dev) // 2

    def one(verbose):
        sl = System(cfg, max_keyframes=256, max_landmarks=65536,
                    max_kf_interval=3, verbose_timing=verbose)
        sl.startup()
        t0 = time.perf_counter()
        for img, depth, _g, ts in dev[:n_out]:
            sl.feed_RGBD_frame(img, depth, ts)
        np.asarray(sl.state.kf_pose)
        timed = time.perf_counter() - t0
        kf_cut = sl.next_kf // 2
        T_R = np.array(lie.so3_exp(jnp.asarray(
            np.array([[0.0, 0.05, 0.0]]), jnp.float32)))[0]
        T_t = np.array([0.9, 0.0, 0.3], np.float32)
        st = sl.state
        K = st.kf_pose.shape[0]
        kf_sel = (np.arange(K) >= kf_cut) & np.array(st.kf_valid)
        pose = np.array(st.kf_pose)
        T_R_inv = T_R.T
        T_t_inv = -T_R.T @ T_t
        for k in np.where(kf_sel)[0]:
            R, t = pose[k, :, :3], pose[k, :, 3]
            pose[k, :, :3] = R @ T_R_inv
            pose[k, :, 3] = R @ T_t_inv + t
        lm_sel = (np.array(st.lm_ref_kf) >= kf_cut) & np.array(st.lm_valid)
        lm = np.array(st.lm_pos)
        lm[lm_sel] = lm[lm_sel] @ T_R.T + T_t
        sl.state = st._replace(kf_pose=jnp.asarray(pose),
                               lm_pos=jnp.asarray(lm))
        Rp, tp = sl.pose
        sl.pose = (Rp @ jnp.asarray(T_R_inv),
                   Rp @ jnp.asarray(T_t_inv) + tp)
        t0 = time.perf_counter()
        for img, depth, _g, ts in dev[n_out:]:
            sl.feed_RGBD_frame(img, depth, ts)
        np.asarray(sl.state.kf_pose)
        timed += time.perf_counter() - t0
        return sl, len(dev) / timed

    print("warmup...", file=sys.stderr, flush=True)
    sl, fps_w = one(False)
    sl.shutdown()
    print(f"warmup fps {fps_w:.2f}; timed run (synced={synced})...",
          file=sys.stderr, flush=True)
    sl, fps = one(synced)
    mv = sl.metrics()
    print(f"fps={fps:.2f} kf={mv['keyframes']} lm={mv['landmarks']} "
          f"loops={mv['loops_closed']}")
    tm = sl.timer.summary()
    rows = [(k, v, v["mean_ms"] * v["count"]) for k, v in tm.items()]
    total = sum(r[2] for r in rows)
    for k, v, tot in sorted(rows, key=lambda r: -r[2]):
        print(f"  {k:32s} n={v['count']:5d} total={tot:9.1f}ms "
              f"mean={v['mean_ms']:8.2f} median={v['median_ms']:8.2f} "
              f"max={v['max_ms']:8.2f}")
    print(f"  TOTAL staged: {total:.1f} ms over {len(dev)} frames")
    sl.shutdown()


if __name__ == "__main__":
    main()
