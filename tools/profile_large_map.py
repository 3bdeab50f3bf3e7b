"""Profile the large-map bench variant: per-stage timing summary.

Runs the exact run_large_map scenario from bench.py (out-and-back with
drift surgery, organic loop closure) once for warmup + once timed, then
prints the System stage-timer summary sorted by total time, plus a
per-frame wall-time histogram of the second (timed) leg.

Must be the ONLY process using the TPU chip.
"""
import json
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


def main():
    cam = bench._bench_camera()
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=1000, num_levels=8),
                 raw={})
    frames_l = bench.load_frames(2 * bench.LOOP_OUT_FRAMES, kind="loop")
    dev = [
        (jax.device_put(i), jax.device_put(d), None, ts)
        for (i, d, g, ts) in frames_l
    ]
    jax.block_until_ready(dev[-1][0])
    n_out = len(dev) // 2

    def one(collect_times=False):
        sl = System(cfg, max_keyframes=256, max_landmarks=65536,
                    max_kf_interval=bench.LOOP_KF_INTERVAL)
        sl.startup()
        per_frame = []
        t0 = time.perf_counter()
        for img, depth, _g, ts in dev[:n_out]:
            tf = time.perf_counter()
            sl.feed_RGBD_frame(img, depth, ts)
            per_frame.append(time.perf_counter() - tf)
        np.asarray(sl.state.kf_pose)
        timed = time.perf_counter() - t0
        sl.state, sl.pose = bench._drift_fn()(sl.state, sl.pose,
                                              sl.next_kf // 2)
        t0 = time.perf_counter()
        for img, depth, _g, ts in dev[n_out:]:
            tf = time.perf_counter()
            sl.feed_RGBD_frame(img, depth, ts)
            per_frame.append(time.perf_counter() - tf)
        np.asarray(sl.state.kf_pose)
        timed += time.perf_counter() - t0
        return sl, len(dev) / timed, per_frame

    print("profile: warmup...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    sl, _, _ = one()
    print(f"profile: warmup done in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    sl.shutdown()
    sl, fps, per_frame = one()
    mv = sl.metrics()
    timing = mv["timing"]
    sl.shutdown()
    print(f"fps={fps:.2f} kf={mv['keyframes']} lm={mv['landmarks']} "
          f"loops={mv['loops_closed']}")
    rows = sorted(timing.items(),
                  key=lambda kv: -kv[1]["mean_ms"] * kv[1]["count"])
    print(f"{'stage':<40}{'count':>6}{'mean_ms':>10}{'med_ms':>10}"
          f"{'max_ms':>10}{'total_ms':>10}")
    for name, s in rows:
        print(f"{name:<40}{s['count']:>6}{s['mean_ms']:>10.2f}"
              f"{s['median_ms']:>10.2f}{s['max_ms']:>10.2f}"
              f"{s['mean_ms']*s['count']:>10.0f}")
    pf = np.array(per_frame) * 1000.0
    print(f"\nper-frame ms: mean={pf.mean():.1f} median={np.median(pf):.1f} "
          f"p90={np.percentile(pf, 90):.1f} p99={np.percentile(pf, 99):.1f} "
          f"max={pf.max():.1f}")
    a, b = pf[:n_out], pf[n_out:]
    print(f"leg1: mean={a.mean():.1f} median={np.median(a):.1f}  "
          f"leg2: mean={b.mean():.1f} median={np.median(b):.1f}")
    # Top-20 slowest frames with their index (keyframe stalls show up here).
    worst = np.argsort(pf)[::-1][:20]
    print("slowest frames:",
          json.dumps([[int(i), round(float(pf[i]), 1)] for i in sorted(worst)]))


if __name__ == "__main__":
    main()
