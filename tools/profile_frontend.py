"""Micro-profile the RGB-D frontend's sub-stages on TPU."""
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
from structure_plp_slam_tpu.models.frontend import Frontend
from structure_plp_slam_tpu.ops import fast as fast_ops
from structure_plp_slam_tpu.ops import image as image_ops
from structure_plp_slam_tpu.ops import orb as orb_ops


def timeit(fn, n=30, name=""):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / n * 1000.0
    print(f"{name:<44}{ms:>9.2f} ms", flush=True)
    return ms


def main():
    cam = bench._bench_camera()
    frames = bench.load_frames(4)
    img = jax.device_put(frames[0][0])
    dep = jax.device_put(frames[0][1])
    fe = Frontend(cam, orb_ops.OrbParams(max_num_keypts=1000, num_levels=8),
                  pad_to=1152)
    ex = fe.extractor

    timeit(lambda: fe.rgbd(img, dep)["desc"], 30, "frontend.rgbd (total)")
    imgf = jnp.asarray(img, jnp.float32)
    timeit(lambda: ex(imgf)["desc"], 30, "extractor (total)")

    p = ex.params
    shapes = ex.shapes
    offs, Ha, Wa = image_ops.atlas_layout(shapes)
    atlas_fn = jax.jit(lambda im: image_ops.build_atlas(im, shapes, offs, Ha, Wa))
    atlas = atlas_fn(imgf)
    timeit(lambda: atlas_fn(imgf), 30, "build_atlas (pyramid)")

    score_fn = jax.jit(lambda a: fast_ops.nms3x3(
        fast_ops.fast_score_map(a, p.ini_fast_thr, p.min_fast_thr)))
    timeit(lambda: score_fn(atlas), 30, "fast_score_map + nms")
    mom_fn = jax.jit(orb_ops.ic_moment_maps)
    timeit(lambda: mom_fn(atlas), 30, "ic_moment_maps")
    blur_fn = jax.jit(image_ops.gaussian_blur)
    timeit(lambda: blur_fn(atlas), 30, "gaussian_blur")

    score_a = score_fn(atlas)

    def select_all(sa):
        outs = []
        for lv in range(p.num_levels):
            H, W = shapes[lv]
            y0 = offs[lv]
            score = jax.lax.slice(sa, (y0, 0), (y0 + H, W))
            cell = 16 if min(H, W) >= 64 else 8
            xy, resp, valid = fast_ops.select_keypoints(
                score, cell=cell, per_cell=4,
                max_total=ex.budgets[lv], margin=orb_ops.EDGE_MARGIN)
            outs.append(xy)
        return outs
    sel_fn = jax.jit(select_all)
    timeit(lambda: sel_fn(score_a), 30, "select_keypoints (8 levels)")


if __name__ == "__main__":
    main()
