"""Global BA over all keyframes must tighten the keyframe trajectory."""
import numpy as np

from tests.test_slam import _run, _kf_ate


def test_global_ba_improves_ate():
    # Start from an UNrefined trajectory (no window BA) so global BA has
    # headroom: with window BA on, the 24-frame synthetic run is already at
    # the ~0.02 ATE noise floor and global BA moves it within noise.
    sys_, infos, gt = _run(num_frames=24, enable_ba=False)
    before = _kf_ate(sys_, gt)
    stats = sys_.run_global_ba()
    after = _kf_ate(sys_, gt)
    assert float(stats.final_cost) < float(stats.initial_cost)
    assert after < before * 0.8, (before, after)


def test_global_ba_no_regression_at_noise_floor():
    # From a window-BA-refined start, global BA must not blow up the
    # trajectory (small moves within noise are fine).
    sys_, infos, gt = _run(num_frames=24, enable_ba=True)
    before = _kf_ate(sys_, gt)
    stats = sys_.run_global_ba()
    after = _kf_ate(sys_, gt)
    assert float(stats.final_cost) < float(stats.initial_cost)
    assert after < max(2.0 * before, 0.05), (before, after)
