"""Dataset parser tests on fabricated directory layouts (reference:
example/util/{tum_rgbd,euroc,kitti,image}_util.h behaviors)."""

import os

import numpy as np

from structure_plp_slam_tpu.io import datasets


def test_tum_association_nearest_within_maxdiff(tmp_path):
    (tmp_path / "rgb.txt").write_text(
        "# header\n1.00 rgb/a.png\n1.50 rgb/b.png\n2.00 rgb/c.png\n"
    )
    # depth for frame b is 0.3 s away -> unassociated (monocular record).
    (tmp_path / "depth.txt").write_text(
        "1.01 depth/a.png\n1.99 depth/c.png\n"
    )
    recs = datasets.load_tum_rgbd(str(tmp_path))
    assert [r.timestamp for r in recs] == [1.0, 1.5, 2.0]
    assert recs[0].depth_path.endswith("depth/a.png")
    assert recs[1].depth_path is None
    assert recs[2].depth_path.endswith("depth/c.png")


def test_euroc_layout_and_stereo_pairing(tmp_path):
    for cam in ("cam0", "cam1"):
        os.makedirs(tmp_path / "mav0" / cam / "data")
    csv = "#ts,name\n1403636579763555584,1403636579763555584.png\n" \
          "1403636579813555456,1403636579813555456.png\n"
    (tmp_path / "mav0" / "cam0" / "data.csv").write_text(csv)
    # Only the FIRST frame has a right image on disk.
    (tmp_path / "mav0" / "cam1" / "data" / "1403636579763555584.png").touch()
    recs = datasets.load_euroc(str(tmp_path))
    assert len(recs) == 2
    assert abs(recs[0].timestamp - 1403636579.7635556) < 1e-5
    assert recs[0].right_img_path is not None
    assert recs[1].right_img_path is None
    mono = datasets.load_euroc(str(tmp_path), use_stereo=False)
    assert mono[0].right_img_path is None


def test_kitti_layout(tmp_path):
    os.makedirs(tmp_path / "image_0")
    os.makedirs(tmp_path / "image_1")
    (tmp_path / "times.txt").write_text("0.0\n0.1\n0.2\n")
    for i in range(3):
        (tmp_path / "image_0" / f"{i:06d}.png").touch()
    (tmp_path / "image_1" / "000001.png").touch()
    recs = datasets.load_kitti(str(tmp_path))
    assert len(recs) == 3
    assert np.allclose([r.timestamp for r in recs], [0.0, 0.1, 0.2])
    assert recs[0].right_img_path is None
    assert recs[1].right_img_path.endswith("image_1/000001.png")


def test_image_dir_with_masks(tmp_path):
    imgs = tmp_path / "imgs"
    masks = tmp_path / "masks"
    os.makedirs(imgs)
    os.makedirs(masks)
    for n in ("b.jpg", "a.png", "notes.txt"):
        (imgs / n).touch()
    (masks / "a.png").touch()
    recs = datasets.load_image_dir(str(imgs), fps=10.0, mask_dir=str(masks))
    # Sorted order, non-images skipped, timestamps at fps spacing.
    assert [os.path.basename(r.img_path) for r in recs] == ["a.png", "b.jpg"]
    assert np.allclose([r.timestamp for r in recs], [0.0, 0.1])
    assert recs[0].mask_path is not None and recs[1].mask_path is None
