"""CLI configuration assembly (VERDICT weak #4: precedence bug)."""
import argparse

from vslam_tpu.cli import _build_cfg
from vslam_tpu.config import CameraConfig, VSLAMConfig


def _args(**kw):
    ns = argparse.Namespace(small=False, config=None, no_ba=False)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_dataset_camera_overrides_json_config(tmp_path):
    """--config JSON must not clobber dataset-derived calibration."""
    cfg_json = VSLAMConfig().replace(
        camera=CameraConfig(width=64, height=48, fx=1.0, fy=1.0, cx=1.0, cy=1.0)
    )
    p = tmp_path / "cfg.json"
    p.write_text(cfg_json.to_json())
    ds_cam = CameraConfig(width=1241, height=376, fx=718.0, fy=718.0,
                          cx=607.0, cy=185.0)
    cfg = _build_cfg(_args(config=str(p)), camera=ds_cam)
    assert cfg.camera == ds_cam                       # dataset wins
    assert cfg.frontend == cfg_json.frontend          # rest of JSON survives


def test_json_config_applies_without_dataset():
    cfg = _build_cfg(_args())
    assert cfg == VSLAMConfig()
