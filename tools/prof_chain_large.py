"""Device-time profile of the keyframe chain at LARGE-MAP sizes
(K=256, L=65536, ~70 live keyframes) — the bench large-map variant's
steady state. Same live-mode protocol as prof_chain.py."""

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
    import bench
    from structure_plp_slam_tpu.config import Config
    from structure_plp_slam_tpu.data import map_state as ms
    from structure_plp_slam_tpu.models import mapper
    from structure_plp_slam_tpu.ops.orb import OrbParams
    from structure_plp_slam_tpu.system import System, _TrackCarry, _kf_chain, _track_step

    _ = np.array(jnp.arange(8.0))  # force live mode
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(x + 1)
    t0 = time.perf_counter()
    for _i in range(10):
        jax.block_until_ready(x + 1)
    print(f"live rpc_ms        {(time.perf_counter()-t0)/10*1000:8.2f}",
          flush=True)

    cam = bench._bench_camera()
    cfg = Config(camera=cam, orb=OrbParams(max_num_keypts=1000, num_levels=8),
                 raw={})
    frames = bench.load_frames(2 * bench.LOOP_OUT_FRAMES, kind="loop")
    # Mature the map on the OUT leg only (no loop machinery needed).
    n_out = len(frames) // 2
    frames_dev = [
        (jax.device_put(i), jax.device_put(d), ts)
        for (i, d, g, ts) in frames[:n_out]
    ]
    slam = System(cfg, max_keyframes=256, max_landmarks=65536,
                  max_kf_interval=3)
    slam.startup()
    for img, dep, ts in frames_dev:
        slam.feed_RGBD_frame(img, dep, ts)
    np.asarray(slam.state.kf_pose)
    mv = slam.metrics()
    print(f"map: kf={mv['keyframes']} lm={mv['landmarks']}",
          file=sys.stderr, flush=True)

    st = slam.state
    fe = slam.frontend
    img_d, dep_d, _ts = frames_dev[-1]

    print(f"frontend.rgbd      {timeit(lambda: fe.rgbd(img_d, dep_d)):8.2f}",
          flush=True)

    feats = fe.rgbd(img_d, dep_d)

    carry = _TrackCarry(
        R=slam.pose[0], t=slam.pose[1], Rv=slam.vel[0], tv=slam.vel[1],
        last_kp_lm=slam.last_kp_lm, ref_kf=slam._ref_kf_dev,
    )
    ind = ms.observation_indicator(st)
    t = timeit(lambda: _track_step(
        cam, st, feats, carry, fe.inv_sigma_sq, ind, jnp.int32(3),
        slam.next_lm, num_levels=8,
        scale_factor=fe.extractor.params.scale_factor, with_lines=False))
    print(f"track_step         {t:8.2f}", flush=True)

    slot = slam.ref_kf
    pose = jnp.concatenate([slam.pose[0], slam.pose[1][:, None]], 1)
    lc = slam.loop_closer

    def chain(do_detect, stats_full, do_ba=True):
        return _kf_chain(
            cam, st, slot, pose, 3.0, feats, slam.last_kp_lm, slam.next_lm,
            jnp.zeros((1, 1), jnp.uint8), jnp.zeros((0,), jnp.int32),
            jax.random.PRNGKey(1),
            slam.next_plane, slam.next_line, fe.inv_sigma_sq, ind,
            with_lines=False, has_seg=False, has_seg_lines=False,
            do_ba=do_ba, do_cull_kf=True, stats_full=stats_full,
            do_detect=do_detect, two_view_lines=True,
            num_tri_neighbors=slam.num_tri_neighbors, planar=slam.planar,
            use_graph_cut=slam.use_graph_cut,
            scale_factor=fe.extractor.params.scale_factor, num_levels=8,
            bow_max_hamming=lc.bow.max_hamming, bow_chunk=lc.bow.chunk,
        )[0]

    print(f"kf_chain full      {timeit(lambda: chain(True, True), n=5):8.2f}",
          flush=True)
    print(f"kf_chain nodetect  {timeit(lambda: chain(False, True), n=5):8.2f}",
          flush=True)
    print(f"kf_chain normals   {timeit(lambda: chain(True, False), n=5):8.2f}",
          flush=True)
    print(f"kf_chain noba      {timeit(lambda: chain(True, True, do_ba=False), n=5):8.2f}",
          flush=True)

    print(f"obs_indicator      {timeit(lambda: ms.observation_indicator(st)):8.2f}",
          flush=True)
    t = timeit(lambda: mapper.local_ba(cam, st, slot, fe.inv_sigma_sq,
                                       ind=ind), n=5)
    print(f"local_ba           {t:8.2f}", flush=True)
    t = timeit(lambda: mapper.refresh_landmark_stats(
        st, ind, scale_factor=fe.extractor.params.scale_factor,
        num_levels=8), n=5)
    print(f"refresh_stats      {t:8.2f}", flush=True)
    t = timeit(lambda: mapper.triangulate_with_neighbors(
        cam, st, slot, slam.next_lm, ind,
        num_neighbors=slam.num_tri_neighbors))
    print(f"triangulate        {t:8.2f}", flush=True)
    t = timeit(lambda: mapper.fuse_into_keyframe(
        cam, st, slot, ms.local_landmark_mask(
            st, jnp.zeros((slam.max_keyframes,), bool).at[slot].set(True),
            ind), ind=ind))
    print(f"fuse               {t:8.2f}", flush=True)
    t = timeit(lambda: mapper.cull_landmarks(st, slot, ind=ind)[0])
    print(f"cull_landmarks     {t:8.2f}", flush=True)
    t = timeit(lambda: mapper.cull_keyframes(st, slot, ind=ind)[0])
    print(f"cull_keyframes     {t:8.2f}", flush=True)
    t = timeit(lambda: mapper.update_landmark_normals(st, ind))
    print(f"update_normals     {t:8.2f}", flush=True)
    slam.shutdown()


if __name__ == "__main__":
    main()
