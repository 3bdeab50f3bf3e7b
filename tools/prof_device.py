"""Device-compute microbenchmark of every pipeline stage (TPU).

Times each jitted stage as: dispatch N times back-to-back, block once;
device_ms = (wall - one_rpc) / N. This amortizes the tunnel RPC latency
that drowns synced per-stage timing (~25-30 ms/round-trip observed).
"""

import sys
import time

import numpy as np


def timeit(fn, n=10):
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
    from bench import make_system
    from structure_plp_slam_tpu.camera import Camera, CameraModel, CameraSetup
    from structure_plp_slam_tpu.config import Config
    from structure_plp_slam_tpu.data import map_state as ms
    from structure_plp_slam_tpu.models import mapper, planar_mapper
    from structure_plp_slam_tpu.ops.orb import OrbParams
    from tests import synthetic_scene as sc

    from bench import _bench_camera, load_frames
    cam = _bench_camera()
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=1000, num_levels=8),
                 raw={})
    n_frames = 96
    frames = load_frames(n_frames)

    # RPC latency + upload cost first.
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(x + 1)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(x + 1)
    rpc_ms = (time.perf_counter() - t0) / 10 * 1000.0
    print(f"rpc_roundtrip_ms      {rpc_ms:8.2f}", flush=True)

    t0 = time.perf_counter()
    for i in range(10):
        a = jax.device_put(frames[i][0])
        b = jax.device_put(frames[i][1])
        jax.block_until_ready((a, b))
    up_ms = (time.perf_counter() - t0) / 10 * 1000.0
    print(f"upload_frame_ms       {up_ms:8.2f} (blocking; async overlaps)",
          flush=True)

    slam = make_system(cfg)
    slam.startup()
    for img, depth, seg, ts in frames:
        slam.feed_RGBD_frame(img, depth, ts, seg_mask=seg)
    np.asarray(slam.state.kf_pose)
    print("warmup done (map: "
          f"{int(np.asarray(slam.state.kf_valid).sum())} kfs)",
          file=sys.stderr, flush=True)

    st = slam.state
    fe = slam.frontend
    img_d = jax.device_put(frames[50][0])
    dep_d = jax.device_put(frames[50][1])
    seg_h = frames[50][2]

    t = timeit(lambda: fe.rgbd(img_d, dep_d))
    print(f"frontend.rgbd         {t:8.2f}", flush=True)

    feats = fe.rgbd(img_d, dep_d)
    from structure_plp_slam_tpu.system import _TrackCarry, _track_step

    carry = _TrackCarry(
        R=slam.pose[0], t=slam.pose[1], Rv=slam.vel[0], tv=slam.vel[1],
        last_kp_lm=slam.last_kp_lm, ref_kf=slam._ref_kf_dev,
    )
    ind = ms.observation_indicator(st)
    t = timeit(lambda: _track_step(
        cam, st, feats, carry, fe.inv_sigma_sq, ind, jnp.int32(3),
        slam.next_lm, num_levels=8, scale_factor=fe.extractor.params.scale_factor,
        with_lines=False))
    print(f"track_step            {t:8.2f}", flush=True)

    t = timeit(lambda: ms.observation_indicator(st))
    print(f"obs_indicator         {t:8.2f}", flush=True)

    slot = slam.ref_kf
    pose = jnp.concatenate([slam.pose[0], slam.pose[1][:, None]], 1)
    t = timeit(lambda: mapper.insert_keyframe(
        cam, st, slot, pose, 3.0, feats, slam.last_kp_lm, slam.next_lm))
    print(f"kf.insert             {t:8.2f}", flush=True)

    t = timeit(lambda: mapper.cull_landmarks(st, slot, ind=ind))
    print(f"kf.cull_lm            {t:8.2f}", flush=True)

    t = timeit(lambda: mapper.triangulate_with_neighbors(
        cam, st, slot, slam.next_lm, ind, num_neighbors=slam.num_tri_neighbors))
    print(f"kf.triangulate        {t:8.2f}", flush=True)

    kf_mask = jnp.zeros((slam.max_keyframes,), bool).at[slot].set(True)
    lm_local = ms.local_landmark_mask(st, kf_mask, ind)
    t = timeit(lambda: mapper.fuse_into_keyframe(
        cam, st, slot, lm_local, ind=ind))
    print(f"kf.fuse               {t:8.2f}", flush=True)

    labels = planar_mapper.label_keypoints(
        jnp.asarray(seg_h, jnp.int32), feats["xy"], feats["valid"],
        check_3x3=slam.planar.check_3x3_window)
    scale = mapper.map_scale(st, slot)
    key = jax.random.PRNGKey(7)
    t = timeit(lambda: planar_mapper.detect_planes(
        st, slot, labels, slam.next_plane, key, scale,
        max_instances=slam.planar.max_instances,
        coherent=slam.use_graph_cut, params=slam.planar))
    print(f"kf.detect_planes      {t:8.2f}", flush=True)
    t = timeit(lambda: planar_mapper.merge_planes(st, scale, params=slam.planar))
    print(f"kf.merge_planes       {t:8.2f}", flush=True)
    t = timeit(lambda: planar_mapper.refine_planes(st, scale, params=slam.planar))
    print(f"kf.refine_planes      {t:8.2f}", flush=True)
    t = timeit(lambda: planar_mapper.snap_points_to_planes(
        st, scale, params=slam.planar))
    print(f"kf.snap_points        {t:8.2f}", flush=True)

    t = timeit(lambda: mapper.local_ba(cam, st, slot, fe.inv_sigma_sq, ind=ind),
               n=5)
    print(f"local_ba (10 iters)   {t:8.2f}", flush=True)

    t = timeit(lambda: mapper.cull_keyframes(st, slot, ind=ind))
    print(f"kf.cull_kf            {t:8.2f}", flush=True)

    t = timeit(lambda: mapper.refresh_landmark_stats(
        st, ind, scale_factor=fe.extractor.params.scale_factor, num_levels=8))
    print(f"kf.refresh_stats      {t:8.2f}", flush=True)
    t = timeit(lambda: mapper.update_landmark_normals(st, ind))
    print(f"kf.update_normals     {t:8.2f}", flush=True)

    t = timeit(lambda: slam.loop_closer.detect_dispatch(st, slot, ind))
    print(f"loop.detect_dispatch  {t:8.2f}", flush=True)
    slam.shutdown()


if __name__ == "__main__":
    main()
