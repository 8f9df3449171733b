"""Hardware-layer tests: the simulator closes the loop for every L3/L4
workflow the reference can only run on its optical bench.

The headline test is the full-stack round trip: calibrate the simulated rig
-> its measured px/deg gain matches the configured physics; collect a
4-corner session through the GPIO-trigger path -> the SR loaders consume it
and IBP reconstructs the scene.
"""

import json
import os

import numpy as np
import pytest

from enph459_super_resolution_tpu.hw import (
    SimBeamSteering, SimCamera, SimConfig, SimStage, SimulatedRig,
    get_xpr_angles, knife_edge_scene, pinhole_scene,
)

NOSLEEP = lambda *_: None  # noqa: E731


def small_rig(color=False, scene=None, **kw):
    cfg = SimConfig(lr_shape=(96, 128), color=color,
                    jitter_sigma_px=0.0, unsettled_jitter_px=0.0, seed=1,
                    read_noise=0.1, shot_noise_scale=0.0, **kw)
    return SimulatedRig(scene=scene, config=cfg)


def test_xpr_corner_geometry():
    a = get_xpr_angles(0.1)
    np.testing.assert_allclose(
        a, [[-0.1, 0.1], [-0.1, -0.1], [0.1, -0.1], [0.1, 0.1]])


def test_sim_camera_shift_physics():
    """Commanded tilt must move the rendered pinhole by gain*tilt px."""
    rig = small_rig(scene=pinhole_scene((192, 256), center=(96.0, 128.0)))
    xpr = SimBeamSteering(rig)
    cam = SimCamera(rig)
    from enph459_super_resolution_tpu.hw.calibrate import find_pinhole_center

    img0 = cam.capture_raw()
    cx0, cy0 = find_pinhole_center(img0, crop_radius=12)
    tilt = 0.5
    xpr.set_angles(tilt, 0.0)
    rig.sleep(0.1)
    img1 = cam.capture_raw()
    cx1, cy1 = find_pinhole_center(img1, crop_radius=12)
    assert abs((cx1 - cx0) - rig.cfg.gain_px_per_deg * tilt) < 0.05
    assert abs(cy1 - cy0) < 0.05


def test_hw_trigger_requires_pulse():
    rig = small_rig()
    xpr = SimBeamSteering(rig)
    cam = SimCamera(rig, hardware_trigger=True)
    with pytest.raises(TimeoutError):
        cam.capture_raw()
    with pytest.raises(RuntimeError):
        xpr.send_trigger_pulse()  # trigger output not configured yet
    xpr.setup_trigger_output()
    xpr.send_trigger_pulse()
    frame = cam.capture_raw()
    assert frame.shape == (96, 128)
    with pytest.raises(TimeoutError):
        cam.capture_raw()  # pulse consumed


def test_calibration_round_trip(tmp_path):
    """Calibrate the sim: shifts.csv slope must equal the physics gain."""
    from enph459_super_resolution_tpu.hw.calibrate import run_calibration

    rig = small_rig(scene=pinhole_scene((192, 256), center=(96.0, 128.0)))
    xpr = SimBeamSteering(rig)
    cam = SimCamera(rig)
    out = str(tmp_path / "cal")
    run_calibration(xpr, cam, out, tilt_min=0.1, tilt_max=0.3, tilt_steps=3,
                    num_repeats=2, sleep_fn=lambda s: rig.sleep(s),
                    save_images=False)
    assert os.path.exists(os.path.join(out, "shifts.csv"))
    assert os.path.exists(os.path.join(out, "centers.csv"))
    assert os.path.exists(os.path.join(out, "results.json"))

    from enph459_super_resolution_tpu.hw.collect import load_calibration
    cal = load_calibration(os.path.join(out, "shifts.csv"))
    # position 5 = (+x, 0): dx should be gain * tilt
    dx, dy = cal[("x", "0.30000", 5)]
    assert abs(dx - rig.cfg.gain_px_per_deg * 0.3) < 0.1
    assert abs(dy) < 0.1


def test_collect_hw_triggered_feeds_sr(tmp_path):
    """Full collection -> SR loader -> solve round trip on the simulator."""
    import scipy.ndimage as ndi
    from enph459_super_resolution_tpu.hw.collect import run_hw_triggered
    from enph459_super_resolution_tpu.sr.config import WORKLOADS
    from enph459_super_resolution_tpu.sr import make_gaussian_psf, solve
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    scene = ndi.gaussian_filter(rng.uniform(0, 255, (192, 256)), 2.0)
    rig = small_rig(scene=scene)
    xpr = SimBeamSteering(rig)
    cam = SimCamera(rig, hardware_trigger=True)

    out = str(tmp_path / "collect")
    res = run_hw_triggered(
        xpr, cam, out, calibration_csv=None, tilt_min=0.15625,
        tilt_max=0.15625, tilt_steps=1, settling_times_ms=(50.0,),
        num_repeats=2, special_run=False,
        sleep_fn=lambda s: rig.sleep(s), timestamp="testrun")
    assert res["camera_type"] == "mono"
    run_dir = os.path.join(out, "testrun")
    combos = [d for d in os.listdir(run_dir)
              if os.path.isdir(os.path.join(run_dir, d))]
    assert len(combos) == 1
    combo_dir = os.path.join(run_dir, combos[0])
    meta = json.load(open(os.path.join(combo_dir, "metadata.json")))
    assert set(meta["expected_shifts"]) == {"(-x,+y)", "(+x,+y)",
                                            "(-x,-y)", "(+x,-y)"}
    assert os.path.exists(os.path.join(run_dir, "images.csv"))

    # tilt 0.15625 * gain 3.2 = exactly 0.5 px -> barcode workload shifts
    units = WORKLOADS["mono_barcodes"].load(combo_dir)
    assert len(units) == 2  # per-rep
    assert units[0].frames.shape == (4, 96, 128)
    sol = solve(jnp.asarray(units[0].frames), make_gaussian_psf(),
                units[0].shifts, n_iter=10)
    errs = np.asarray(sol["mse_history"])
    assert errs[-1] < errs[0]  # IBP converges on simulated data


def test_stability_on_simulator(tmp_path):
    from enph459_super_resolution_tpu.hw.stability import (
        find_edge_position, run_stability,
    )

    rig = small_rig(scene=knife_edge_scene((192, 256), edge_col=128.0))
    rig.cfg.jitter_sigma_px = 0.02
    xpr = SimBeamSteering(rig)
    cam = SimCamera(rig)

    edge = find_edge_position(cam.capture_raw())
    assert abs(edge - 64.0) < 2.0  # LR grid = HR/2

    summary = run_stability(cam, xpr, str(tmp_path / "stab"),
                            tilt_deg=0.1, n_trials=2, num_frames=12,
                            sleep_fn=lambda s: rig.sleep(s))
    for p in range(4):
        s = summary["positions"][f"pos{p}"]
        assert 0.0 <= s["sigma_mean_px"] < 0.5
    assert os.path.exists(tmp_path / "stab" / "stability_trials.csv")


def test_autofocus_finds_best_focus(tmp_path):
    from enph459_super_resolution_tpu.hw.autofocus import (
        autofocus_sweep, depth_of_field, save_autofocus_result,
    )

    rig = small_rig(scene=pinhole_scene((192, 256), center=(96.0, 128.0)))
    cam = SimCamera(rig)
    stage = SimStage(rig, best_pos_mm=369.23, travel=(350.0, 390.0))

    res = autofocus_sweep(cam, stage, 350.0, 390.0, coarse_points=9,
                          fine_points=7, sleep_fn=lambda s: rig.sleep(s))
    assert abs(res["best_pos_mm"] - 369.23) < 3.0
    assert abs(stage.get_position() - res["best_pos_mm"]) < 1e-9

    dof, span = depth_of_field(res["positions"], res["values"])
    assert span[0] <= 369.23 <= span[1]
    path = save_autofocus_result(res, str(tmp_path / "af"))
    data = json.load(open(path))
    assert "dof_mm" in data


def test_fault_injection_empty_burst_retry(tmp_path):
    """Injected empty bursts exercise the stability retry path: one empty
    burst is retried and the trial succeeds; two consecutive empty bursts
    hard-fail like the reference (``rolling_stability.py:80-84``)."""
    from enph459_super_resolution_tpu.hw.stability import run_single_trial

    rig = small_rig(scene=knife_edge_scene((192, 256), edge_col=128.0))
    cam = SimCamera(rig)
    xpr = SimBeamSteering(rig)
    angles = get_xpr_angles(0.1)

    rig.cfg.fault_empty_burst = 1
    data = run_single_trial(cam, xpr, angles, num_frames=4,
                            sleep_fn=lambda s: rig.sleep(s))
    assert len(data[0]["edges"]) == 4  # retry recovered

    rig.cfg.fault_empty_burst = 2
    with pytest.raises(RuntimeError, match="0 frames"):
        run_single_trial(cam, xpr, angles, num_frames=4,
                         sleep_fn=lambda s: rig.sleep(s))


def test_fault_injection_frame_timeout():
    rig = small_rig()
    rig.cfg.fault_frame_timeout_rate = 1.0
    cam = SimCamera(rig)
    with pytest.raises(TimeoutError, match="injected"):
        cam.capture_raw()


def test_sw_triggered_collection(tmp_path):
    from enph459_super_resolution_tpu.hw.collect import run_sw_triggered

    rig = small_rig(scene=pinhole_scene((192, 256), center=(96.0, 128.0)))
    xpr = SimBeamSteering(rig)
    cam = SimCamera(rig)
    res = run_sw_triggered(xpr, cam, str(tmp_path / "sw"), tilt_min=0.1,
                           tilt_max=0.2, tilt_steps=2, num_repeats=1,
                           sleep_fn=lambda s: rig.sleep(s),
                           timestamp="swrun")
    # 2 axes x 2 tilts x 1 rep x 9 positions
    assert len(res["images"]) == 36
    run_dir = tmp_path / "sw" / "swrun"
    assert (run_dir / "results.json").exists()
    assert (run_dir / "images.csv").exists()


def test_color_rig_bayer_path_feeds_rgb_workload(tmp_path):
    """A color rig renders an RGGB mosaic whose red plane carries the
    scene, so the rgb workloads' extract_red loaders work end to end."""
    import scipy.ndimage as ndi
    from enph459_super_resolution_tpu.hw.collect import run_hw_triggered
    from enph459_super_resolution_tpu.sr.config import WORKLOADS

    rng = np.random.default_rng(4)
    scene = ndi.gaussian_filter(rng.uniform(0, 255, (192, 256)), 1.5)
    rig = small_rig(color=True, scene=scene)
    xpr = SimBeamSteering(rig)
    cam = SimCamera(rig, hardware_trigger=True)
    assert cam.is_color

    frame = rig.render(rig.cfg.base_exposure_us)
    # red sites brighter than blue sites on average (mosaic applied)
    assert frame[0::2, 0::2].mean() > frame[1::2, 1::2].mean() * 1.2

    res = run_hw_triggered(
        xpr, cam, str(tmp_path / "c"), tilt_min=0.3125, tilt_max=0.3125,
        tilt_steps=1, settling_times_ms=(50.0,), num_repeats=1,
        special_run=False, sleep_fn=lambda s: rig.sleep(s), timestamp="t")
    assert res["target_shift_px"] == 1.0  # color camera -> full-px target
    combo = os.path.join(str(tmp_path / "c"), "t", res["combos"][0])
    units = WORKLOADS["rgb_barcodes"].load(combo)
    assert units[0].frames.shape == (4, 48, 64)  # red plane = half size


def test_zaber_discover_probes_ports(monkeypatch):
    """ZaberStage._discover scans candidate serial ports and returns the
    first connection whose device chain answers (hw/real.py)."""
    from enph459_super_resolution_tpu.hw.real import ZaberStage

    opened, closed = [], []

    class FakeConn:
        def __init__(self, port, devices):
            self.port, self._devices = port, devices

        def detect_devices(self):
            if self._devices is None:
                raise RuntimeError("no response")
            return self._devices

        def close(self):
            closed.append(self.port)

    class FakeConnection:
        # /dev/fake0 opens but no devices; fake1 fails to open;
        # fake2 answers with a device chain
        table = {"/dev/fake0": [], "/dev/fake2": ["dev"]}

        @staticmethod
        def open_serial_port(port):
            opened.append(port)
            if port == "/dev/fake1":
                raise OSError("busy")
            return FakeConn(port, FakeConnection.table.get(port))

    import glob as glob_mod
    monkeypatch.setattr(glob_mod, "glob",
                        lambda pat: ["/dev/fake0", "/dev/fake1"]
                        if "USB" in pat else ["/dev/fake2"])
    # force the glob fallback even if pyserial is importable
    import sys
    monkeypatch.setitem(sys.modules, "serial", None)

    conn, devices = ZaberStage._discover(FakeConnection)
    assert conn.port == "/dev/fake2" and devices == ["dev"]
    assert opened == ["/dev/fake0", "/dev/fake1", "/dev/fake2"]
    assert closed == ["/dev/fake0"]  # opened-but-silent ports are closed


def test_zaber_discover_no_devices(monkeypatch):
    from enph459_super_resolution_tpu.hw.real import ZaberStage

    class FakeConnection:
        @staticmethod
        def open_serial_port(port):
            raise OSError("no such port")

    import glob as glob_mod
    monkeypatch.setattr(glob_mod, "glob", lambda pat: ["/dev/fakeX"])
    import sys
    monkeypatch.setitem(sys.modules, "serial", None)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="no Zaber devices"):
        ZaberStage._discover(FakeConnection)
