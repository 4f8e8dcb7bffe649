"""Dataset loader tests on a synthetic KITTI-formatted directory tree
(no real dataset ships; the loader contract is what's tested)."""
import os

import numpy as np
import pytest

from vslam_tpu.datasets import synthetic
from vslam_tpu.datasets.loaders import KittiOdometry
from vslam_tpu.utils import trajectory


@pytest.fixture()
def kitti_root(tmp_path):
    from PIL import Image
    root = tmp_path / "kitti"
    seq = root / "sequences" / "00"
    img_dir = seq / "image_0"
    img_dir.mkdir(parents=True)
    (root / "poses").mkdir(parents=True)

    K = np.array([[120.0, 0, 64.0], [0, 120.0, 32.0], [0, 0, 1.0]], np.float32)
    scene = synthetic.make_scene(num_points=300, seed=0, extent=(10, 4, 25),
                                 z_min=4.0)
    poses = synthetic.make_trajectory(5, step=0.5, seed=0)
    frames = synthetic.render_sequence(K, poses, scene, 128, 64)
    for i, f in enumerate(frames):
        Image.fromarray((f * 255).astype(np.uint8), mode="L").save(
            img_dir / f"{i:06d}.png")
    with open(seq / "calib.txt", "w") as fh:
        P0 = np.hstack([K, np.zeros((3, 1))])
        fh.write("P0: " + " ".join(f"{v:.6e}" for v in P0.reshape(-1)) + "\n")
    trajectory.save_kitti(str(root / "poses" / "00.txt"), poses)
    return str(root), frames, poses, K


def test_kitti_loader_roundtrip(kitti_root):
    root, frames, poses, K = kitti_root
    ds = KittiOdometry(root, "00")
    assert len(ds) == 5
    assert abs(ds.camera.fx - 120.0) < 1e-3
    assert ds.gt_poses is not None and len(ds.gt_poses) == 5
    np.testing.assert_allclose(ds.gt_poses[:, :3, :], poses[:, :3, :], atol=1e-4)
    loaded = list(ds)
    assert len(loaded) == 5
    for i, g in loaded:
        assert g.shape == (64, 128)
        np.testing.assert_allclose(g, frames[i], atol=1.0 / 255 + 1e-6)


def test_kitti_loader_end_to_end_tracking(kitti_root):
    root, frames, poses, K = kitti_root
    # run the real pipeline over the loader output
    import dataclasses
    from vslam_tpu.config import small_config
    from vslam_tpu.pipeline import slam
    ds = KittiOdometry(root, "00")
    cfg = small_config().replace(camera=ds.camera)
    sys_ = slam.SLAMSystem(cfg, enable_ba=False)
    for i, img in ds:
        sys_.process(img)
    assert sys_.frame_idx == 5
