"""A/B the line-descriptor noise-floor deflation (verdict r3 #9).

Reuses the eval test's harness to print matching precision for
clean / low-contrast / noise at several NOISE_DEFLATE values.
Run on CPU (forces cpu platform).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from structure_plp_slam_tpu.ops import lines as line_ops
from tests import synthetic_scene
from tests.test_line_frontend_eval import (
    CAM, _natural_texture, _pose, _homography, _detect, match_precision,
)


def main():
    rng = np.random.default_rng(11)
    tex = _natural_texture(rng)
    Ra, ta = _pose(0.0)
    Rb, tb = _pose(8.0)
    img_a, dep_a = synthetic_scene.render(CAM, tex, Ra, ta)
    img_b0, dep_b = synthetic_scene.render(CAM, tex, Rb, tb)
    H = _homography(Ra, ta, Rb, tb)
    seg_a = _detect(img_a, depth=dep_a)
    cases = {
        "clean": img_b0,
        "lowcon": 0.55 * img_b0 + 50.0,
        "noise": np.clip(
            img_b0 + rng.normal(0, 5.0, img_b0.shape), 0, 255
        ).astype(np.float32),
        "noise8": np.clip(
            img_b0 + rng.normal(0, 8.0, img_b0.shape), 0, 255
        ).astype(np.float32),
    }
    segs_b = {k: _detect(v, depth=dep_b) for k, v in cases.items()}
    for lam in (0.0, 0.5, 1.0, 1.5, 2.0):
        line_ops.NOISE_DEFLATE = lam
        out = []
        for name, img_b in cases.items():
            prec, n = match_precision(img_a, img_b, seg_a, segs_b[name], H)
            out.append(f"{name}={prec:.3f}({n})")
        print(f"lam={lam:>4}: " + "  ".join(out), flush=True)


if __name__ == "__main__":
    main()
