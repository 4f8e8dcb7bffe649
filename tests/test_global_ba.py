"""Global BA over all keyframes must tighten the keyframe trajectory."""
import numpy as np

from tests.test_slam import _run, _kf_ate


def test_global_ba_improves_ate():
    sys_, infos, gt = _run(num_frames=24, enable_ba=True)
    before = _kf_ate(sys_, gt)
    stats = sys_.run_global_ba()
    after = _kf_ate(sys_, gt)
    assert float(stats.final_cost) < float(stats.initial_cost)
    assert after < before * 0.8, (before, after)
