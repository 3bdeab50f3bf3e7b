"""Per-stage device-inclusive profile of the bench workload (TPU).

Runs the exact bench.py sequence with StageTimer(synced=True) so every
stage blocks on its device work — the summary then shows where the
per-frame milliseconds actually go. Serializing adds sync overhead, so
the TOTAL here is pessimistic; the per-stage split is the signal.
"""

import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_compile_cache_plpslam_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, ".")
    from bench import make_system
    from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
    from structure_plp_slam_tpu.config import Config
    from structure_plp_slam_tpu.ops.orb import OrbParams
    from structure_plp_slam_tpu.system import StageTimer
    from tests import synthetic_scene as sc

    from bench import _bench_camera, load_frames
    cam = _bench_camera()
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=1000, num_levels=8),
                 raw={})
    n_frames = 96
    frames = load_frames(n_frames)

    # Warmup (compiles) with unsynced timer.
    slam = make_system(cfg)
    slam.startup()
    for img, depth, seg, ts in frames:
        slam.feed_RGBD_frame(img, depth, ts, seg_mask=seg)
    np.asarray(slam.state.kf_pose)
    slam.shutdown()
    print("warmup done", file=sys.stderr, flush=True)

    # Profiled run: synced stages.
    slam = make_system(cfg)
    slam.timer = StageTimer(synced=True)
    slam.startup()
    t0 = time.perf_counter()
    for img, depth, seg, ts in frames:
        slam.feed_RGBD_frame(img, depth, ts, seg_mask=seg)
    np.asarray(slam.state.kf_pose)
    wall = time.perf_counter() - t0
    import json
    summ = slam.timer.summary()
    total_ms = {k: round(v["mean_ms"] * v["count"], 1) for k, v in summ.items()}
    print(json.dumps({"wall_s": round(wall, 2),
                      "synced_fps": round(n_frames / wall, 2)}))
    for k in sorted(total_ms, key=lambda k: -total_ms[k]):
        s = summ[k]
        print(f"{k:18s} count={s['count']:4d} mean={s['mean_ms']:8.2f}ms "
              f"median={s['median_ms']:8.2f}ms total={total_ms[k]:9.1f}ms")
    slam.shutdown()


if __name__ == "__main__":
    main()
