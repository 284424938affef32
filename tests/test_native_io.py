"""Native C++ dataset parsers: parity with the pure-Python paths."""

import numpy as np
import pytest

from gtsam_petercdev_tpu.sfm import bal
from gtsam_petercdev_tpu.utils import dataset


def test_native_lib_builds():
    from gtsam_petercdev_tpu.native import load_library

    assert load_library() is not None


def _python_only(monkeypatch):
    monkeypatch.setattr(dataset, "_parse_g2o_native", lambda p: None)
    monkeypatch.setattr(bal, "_read_bal_native", lambda p: None)


def test_g2o_pose2_parity(monkeypatch):
    path = dataset.find_example_data("noisyToyGraph.txt")
    gn, vn = dataset.read_g2o(path)
    _python_only(monkeypatch)
    gp, vp = dataset.read_g2o(path)
    assert len(vn) == len(vp)
    assert float(gn.error(vn)) == pytest.approx(float(gp.error(vp)), rel=1e-12)


def test_g2o_pose3_quat_parity(monkeypatch):
    path = dataset.find_example_data("pose3example.txt")
    gn, vn = dataset.read_g2o(path, is3D=True)
    _python_only(monkeypatch)
    gp, vp = dataset.read_g2o(path, is3D=True)
    assert len(vn) == len(vp)
    assert float(gn.error(vn)) == pytest.approx(float(gp.error(vp)), rel=1e-9)


def test_g2o_toro3d_parity(monkeypatch):
    path = dataset.find_example_data("sphere2500.txt")
    gn, vn = dataset.read_g2o(path, is3D=True, dtype=np.float32)
    _python_only(monkeypatch)
    gp, vp = dataset.read_g2o(path, is3D=True, dtype=np.float32)
    assert len(vn) == len(vp) == 2500
    assert float(gn.error(vn)) == pytest.approx(float(gp.error(vp)), rel=1e-5)


def test_bal_parity(monkeypatch):
    path = dataset.find_example_data("dubrovnik-3-7-pre.txt")
    dn = bal.read_bal(path)
    _python_only(monkeypatch)
    dp = bal.read_bal(path)
    assert dn.n_cameras == dp.n_cameras and dn.n_tracks == dp.n_tracks
    for cn, cp in zip(dn.cameras, dp.cameras):
        np.testing.assert_allclose(np.asarray(cn.R), np.asarray(cp.R), atol=1e-12)
        np.testing.assert_allclose(np.asarray(cn.t), np.asarray(cp.t), atol=1e-12)
        np.testing.assert_allclose(np.asarray(cn.cal), np.asarray(cp.cal), atol=1e-12)
    for tn, tp in zip(dn.tracks, dp.tracks):
        np.testing.assert_allclose(tn.point, tp.point, atol=1e-12)
        np.testing.assert_allclose(tn.uv, tp.uv, atol=1e-12)
        np.testing.assert_array_equal(tn.cam_idx, tp.cam_idx)
