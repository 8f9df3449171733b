"""Vendor-SDK wrapper logic driven against fake SDK modules.

`hw/real.py` mirrors the reference's hardware wrappers
(`api/daheng_camera.py`, `api/allied_vision_camera.py`,
`api/xpr_controller.py`); the vendor SDKs are absent in CI, so these tests
inject minimal fakes into ``sys.modules`` and assert the wrapper-side
contracts: trigger configuration, timeout math, closed-loop auto exposure,
burst-callback threading, and the GPIO pulse protocol.
"""

import sys
import threading
import types

import numpy as np
import pytest


# --------------------------------------------------------------------------
# fake gxipy (Daheng)
# --------------------------------------------------------------------------

class _Feature:
    def __init__(self, value=0.0):
        self.value = value
        self.history = []

    def get(self):
        return self.value

    def set(self, v):
        self.value = v
        self.history.append(v)

    def send_command(self):
        self.history.append("sent")

    def is_implemented(self):
        return bool(self.value)


class _FakeStream:
    def __init__(self, cam):
        self._cam = cam
        self.timeouts = []

    def get_image(self, timeout=None):
        self.timeouts.append(timeout)
        if self._cam.frames is None:
            return None

        class Img:
            def __init__(self, arr):
                self._arr = arr

            def get_numpy_array(self):
                return self._arr

        return Img(self._cam.frames(self._cam))


class _FakeGxCamera:
    def __init__(self):
        self.TriggerMode = _Feature()
        self.TriggerSource = _Feature()
        self.TriggerActivation = _Feature()
        self.TriggerSoftware = _Feature()
        self.ExposureTime = _Feature(10000.0)
        self.Gain = _Feature(0.0)
        self.Width = _Feature(64)
        self.Height = _Feature(48)
        self.PixelColorFilter = _Feature(0)
        self.BalanceWhiteAuto = _Feature()
        self.data_stream = [_FakeStream(self)]
        self.frames = lambda cam: np.full((48, 64), 100, np.uint8)
        self.calls = []

    def stream_on(self):
        self.calls.append("stream_on")

    def stream_off(self):
        self.calls.append("stream_off")

    def close_device(self):
        self.calls.append("close_device")


def _install_fake_gxipy(monkeypatch, cam):
    gx = types.ModuleType("gxipy")
    gx.GxSwitchEntry = types.SimpleNamespace(ON="ON", OFF="OFF")
    gx.GxTriggerSourceEntry = types.SimpleNamespace(
        SOFTWARE="SOFTWARE", LINE0="LINE0", LINE2="LINE2", LINE3="LINE3")
    gx.GxTriggerActivationEntry = types.SimpleNamespace(
        RISINGEDGE="RISINGEDGE")
    gx.GxAutoEntry = types.SimpleNamespace(ONCE="ONCE")

    class DeviceManager:
        def update_device_list(self):
            return 1, [{"sn": "FAKE1"}]

        def open_device_by_sn(self, sn):
            cam.opened_by = ("sn", sn)
            return cam

        def open_device_by_index(self, idx):
            cam.opened_by = ("index", idx)
            return cam

    gx.DeviceManager = DeviceManager
    monkeypatch.setitem(sys.modules, "gxipy", gx)
    return gx


def test_daheng_sw_trigger_capture_and_timeout_math(monkeypatch):
    cam = _FakeGxCamera()
    _install_fake_gxipy(monkeypatch, cam)
    from enph459_super_resolution_tpu.hw.real import DahengCamera

    d = DahengCamera()
    assert cam.opened_by == ("index", 1)
    assert cam.TriggerMode.value == "ON"
    assert cam.TriggerSource.value == "SOFTWARE"
    assert "stream_on" in cam.calls

    d.exposure = 500000.0  # 0.5 s
    frame = d.capture_raw()
    assert frame.shape == (48, 64)
    # the software trigger command fired and the timeout is exposure+2 s
    # (reference `api/daheng_camera.py:54-75`)
    assert cam.TriggerSoftware.history == ["sent"]
    assert cam.data_stream[0].timeouts[-1] == int(500000 / 1000 + 2000)

    d.close()
    assert cam.calls[-2:] == ["stream_off", "close_device"]


def test_daheng_hw_trigger_line_and_timeout_error(monkeypatch):
    cam = _FakeGxCamera()
    _install_fake_gxipy(monkeypatch, cam)
    from enph459_super_resolution_tpu.hw.real import DahengCamera

    d = DahengCamera(serial="FAKE1", hardware_trigger=True,
                     trigger_line="line2")
    assert cam.opened_by == ("sn", "FAKE1")
    assert cam.TriggerSource.value == "LINE2"
    assert cam.TriggerActivation.value == "RISINGEDGE"

    cam.frames = None  # no frame arrives
    with pytest.raises(TimeoutError):
        d.capture_raw()
    # hardware-trigger mode must NOT send a software trigger
    assert cam.TriggerSoftware.history == []


def test_daheng_auto_exposure_closed_loop(monkeypatch):
    """The peak-targeted loop scales exposure toward the target and stops
    inside the +/-10-count deadband (intentional redesign documented in
    `DahengCamera.auto_exposure`)."""
    cam = _FakeGxCamera()
    _install_fake_gxipy(monkeypatch, cam)

    # frame peak proportional to exposure: peak = exposure / 100
    cam.frames = lambda c: np.full(
        (8, 8), min(c.ExposureTime.value / 100.0, 255.0), np.float64)

    from enph459_super_resolution_tpu.hw.real import DahengCamera

    d = DahengCamera()
    d.exposure = 2000.0  # peak 20, far from target 200
    final = d.auto_exposure(target_peak=200.0)
    assert abs(final / 100.0 - 200.0) < 10


# --------------------------------------------------------------------------
# fake vmbpy (Allied Vision)
# --------------------------------------------------------------------------

class _FakeVmbCamera:
    def __init__(self):
        self.features = {"Width": _Feature(32), "Height": _Feature(24),
                         "ExposureTime": _Feature(20000.0),
                         "ExposureAuto": _Feature(),
                         "Gain": _Feature(0.0)}
        self.pixel_format = None
        self.streaming = None
        self.calls = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.calls.append("cam_exit")

    def set_pixel_format(self, fmt):
        self.pixel_format = fmt

    def get_feature_by_name(self, name):
        return self.features[name]

    def get_frame(self):
        class Frame:
            def as_numpy_ndarray(self):
                return np.arange(24 * 32, dtype=np.uint8).reshape(24, 32, 1)

        return Frame()

    def start_streaming(self, handler):
        self.streaming = handler
        # deliver frames from a thread, as VmbPy does
        def pump():
            class Frame:
                def as_numpy_ndarray(self):
                    return np.zeros((24, 32, 1), np.uint8)

            for _ in range(50):
                if self.streaming is None:
                    break
                handler(self, None, Frame())

        self._t = threading.Thread(target=pump, daemon=True)
        self._t.start()

    def stop_streaming(self):
        self.streaming = None
        self.calls.append("stop_streaming")

    def queue_frame(self, frame):
        pass


def _install_fake_vmbpy(monkeypatch, cam):
    vmb = types.ModuleType("vmbpy")
    vmb.PixelFormat = types.SimpleNamespace(Mono8="Mono8")

    class VmbSystem:
        _inst = None

        @classmethod
        def get_instance(cls):
            cls._inst = cls()
            return cls._inst

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            cam.calls.append("vmb_exit")

        def get_all_cameras(self):
            return [cam]

    vmb.VmbSystem = VmbSystem
    monkeypatch.setitem(sys.modules, "vmbpy", vmb)
    return vmb


def test_allied_capture_and_exposure(monkeypatch):
    cam = _FakeVmbCamera()
    _install_fake_vmbpy(monkeypatch, cam)
    from enph459_super_resolution_tpu.hw.real import AlliedCamera

    a = AlliedCamera()
    assert cam.pixel_format == "Mono8"
    assert (a.width, a.height) == (32, 24)
    frame = a.capture()  # reference method name
    assert frame.shape == (24, 32)  # channel axis stripped
    a.auto_exposure()
    assert cam.features["ExposureAuto"].history == ["Once"]
    a.close()
    assert "cam_exit" in cam.calls and "vmb_exit" in cam.calls


def test_allied_stream_burst_collects_n_with_relative_stamps(monkeypatch):
    cam = _FakeVmbCamera()
    _install_fake_vmbpy(monkeypatch, cam)
    from enph459_super_resolution_tpu.hw.real import AlliedCamera

    a = AlliedCamera()
    seen = []
    frames, stamps = a.stream_burst(5, callback=lambda f, ms: seen.append(ms))
    assert len(frames) == 5 and len(stamps) == 5 and len(seen) == 5
    assert stamps[0] == 0.0  # relative-ms protocol
    assert all(b >= a_ for a_, b in zip(stamps, stamps[1:]))
    assert "stop_streaming" in cam.calls


# --------------------------------------------------------------------------
# fake optoICC (XPR mirror)
# --------------------------------------------------------------------------

def _install_fake_optoicc(monkeypatch):
    class Static:
        def __init__(self):
            self.values = []

        def SetAsInput(self):
            self.as_input = True

        def SetValue(self, v):
            self.values.append(v)

    class Channel:
        def __init__(self):
            self.StaticInput = Static()
            self.modes = []

        def SetControlMode(self, m):
            self.modes.append(m)

    class Gpio:
        def __init__(self):
            self.log = []

        def SetAsOutput(self):
            self.log.append("output")

        def SetValue(self, v):
            self.log.append(v)

    class ICC:
        def __init__(self):
            self.channel = [Channel(), Channel()]
            self.gpio = [Gpio()]
            self.calls = []

        def reset(self, force=False):
            self.calls.append(("reset", force))

        def go_pro(self):
            self.calls.append("go_pro")

        def disconnect(self):
            self.calls.append("disconnect")

    icc_inst = ICC()
    opto = types.ModuleType("optoICC")
    opto.connect = lambda port=None: icc_inst
    kum = types.ModuleType("optoKummenberg")
    tools = types.ModuleType("optoKummenberg.tools")
    defs = types.ModuleType("optoKummenberg.tools.definitions")
    defs.UnitType = types.SimpleNamespace(UNITLESS="UNITLESS")
    monkeypatch.setitem(sys.modules, "optoICC", opto)
    monkeypatch.setitem(sys.modules, "optoKummenberg", kum)
    monkeypatch.setitem(sys.modules, "optoKummenberg.tools", tools)
    monkeypatch.setitem(sys.modules, "optoKummenberg.tools.definitions", defs)
    return icc_inst


def test_xpr_connect_protocol_and_angles(monkeypatch):
    icc = _install_fake_optoicc(monkeypatch)
    from enph459_super_resolution_tpu.hw.real import XPRController

    x = XPRController()
    # reference `api/xpr_controller.py:10-27`: reset -> go_pro -> both
    # channels StaticInput/UNITLESS
    assert icc.calls[:2] == [("reset", True), "go_pro"]
    for ch in icc.channel:
        assert ch.modes == ["UNITLESS"] and ch.StaticInput.as_input

    x.set_angles(0.28, -0.28)
    assert icc.channel[0].StaticInput.values[-1] == 0.28
    assert icc.channel[1].StaticInput.values[-1] == -0.28
    x.set_home()
    assert icc.channel[0].StaticInput.values[-1] == 0.0

    x.close()
    assert icc.calls[-1] == "disconnect"


def test_gui_roi_mapping_headless():
    """Drag-ROI rubber-band geometry (Qt-free core of `hw/gui.py`): the
    pixmap is centered in the widget; selections map through offset+scale
    into clamped frame coordinates."""
    from enph459_super_resolution_tpu.hw.gui import map_widget_rect_to_frame

    # widget 200x100, pixmap 100x50 centered -> offsets (50, 25);
    # frame 480x640 -> scale x 6.4, y 9.6
    roi = map_widget_rect_to_frame((60, 35, 80, 45), (200, 100), (100, 50),
                                   (480, 640))
    assert roi == (96, 192, 64, 192)

    # selection hanging off the pixmap edge clamps to the frame
    r0, r1, c0, c1 = map_widget_rect_to_frame(
        (0, 0, 300, 200), (200, 100), (100, 50), (480, 640))
    assert (r0, c0) == (0, 0) and (r1, c1) == (480, 640)

    # degenerate pixmap -> None; a selection entirely left of the pixmap
    # clamps to the 1-px frame edge (original rubber-band semantics)
    assert map_widget_rect_to_frame((0, 0, 10, 10), (200, 100), (0, 0),
                                    (480, 640)) is None
    assert map_widget_rect_to_frame((0, 0, 10, 10), (200, 100), (100, 50),
                                    (480, 640)) == (0, 1, 0, 1)


def test_xpr_gpio_pulse_protocol(monkeypatch):
    icc = _install_fake_optoicc(monkeypatch)
    from enph459_super_resolution_tpu.hw.real import XPRController

    x = XPRController()
    with pytest.raises(RuntimeError, match="setup_trigger_output"):
        x.send_trigger_pulse()
    x.setup_trigger_output()
    x.send_trigger_pulse(width_us=10.0)
    # output mode, idle-low init, then a 1 -> 0 pulse
    assert icc.gpio[0].log == ["output", 0, 1, 0]


# --------------------------------------------------------------------------
# fake zaber_motion (3-axis stage: lockstep X + Y/Z)
# --------------------------------------------------------------------------

class _FakeZaberAxis:
    def __init__(self, settings=None, fail_settings=False):
        self._settings = settings or {}
        self._fail = fail_settings
        self.pos = 0.0
        self.moves = []
        self.homed = 0
        ax = self

        class _Settings:
            def get(self, name, units):
                if ax._fail or name not in ax._settings:
                    raise RuntimeError(f"setting {name} unavailable")
                return ax._settings[name]

        self.settings = _Settings()

    def move_absolute(self, pos, units):
        self.pos = float(pos)
        self.moves.append(float(pos))

    def get_position(self, units):
        return self.pos

    def home(self):
        self.homed += 1


class _FakeZaberDevice:
    """Reference rig: lockstep group 1 over two X motors, plain Y=3, Z=4
    (``calibration_autofocus/calibrate_autofocus.py:474-481``)."""

    def __init__(self, has_lockstep=True, axis_settings=None):
        axis_settings = axis_settings or {}
        self._has_lockstep = has_lockstep
        self.axes = {n: _FakeZaberAxis(**axis_settings.get(n, {}))
                     for n in (1, 3, 4)}
        self.lockstep = _FakeZaberAxis()  # no settings of its own

    def get_lockstep(self, n):
        if not self._has_lockstep:
            raise RuntimeError("no lockstep group")
        return self.lockstep

    def get_axis(self, n):
        return self.axes[n]


def _install_fake_zaber(monkeypatch, device):
    zm = types.ModuleType("zaber_motion")

    class Units:
        LENGTH_MILLIMETRES = "mm"

    zm.Units = Units
    ascii_mod = types.ModuleType("zaber_motion.ascii")

    class Connection:
        alerts = 0
        closed = 0

        @classmethod
        def open_serial_port(cls, port):
            conn = cls()
            conn.port = port
            return conn

        def enable_alerts(self):
            Connection.alerts += 1

        def detect_devices(self):
            return [device]

        def close(self):
            Connection.closed += 1

    ascii_mod.Connection = Connection
    zm.ascii = ascii_mod
    monkeypatch.setitem(sys.modules, "zaber_motion", zm)
    monkeypatch.setitem(sys.modules, "zaber_motion.ascii", ascii_mod)
    return Connection


def test_zaber_three_axis_layout_and_limits(monkeypatch):
    """Lockstep X preferred (limits from the PHYSICAL axis 1), Y=axis 3,
    Z=axis 4, limits from device settings with (0, 100) fallback."""
    from enph459_super_resolution_tpu.hw.real import ZaberStage

    dev = _FakeZaberDevice(axis_settings={
        1: {"settings": {"limit.min": 5.0, "limit.max": 595.0}},
        3: {"settings": {"limit.min": 0.0, "limit.max": 80.0}},
        4: {"fail_settings": True},  # unreadable -> (0, 100) fallback
    })
    conn = _install_fake_zaber(monkeypatch, dev)
    st = ZaberStage(port="/dev/ttyFAKE0")
    assert conn.alerts >= 1
    assert st.axes == ["X", "Y", "Z"]
    assert st.limits["X"] == (5.0, 595.0)   # from phys axis 1
    assert st.limits["Y"] == (0.0, 80.0)
    assert st.limits["Z"] == (0.0, 100.0)   # fallback
    # X moves drive the LOCKSTEP group, not the physical axis
    st.move_axis("X", 10.0)
    assert dev.lockstep.moves == [10.0]
    assert dev.axes[1].moves == []
    # Stage protocol drives the focus axis (default Z = axis 4)
    st.move_absolute(42.0)
    assert dev.axes[4].moves == [42.0]
    assert st.get_position() == 42.0
    st.home()
    assert dev.axes[4].homed == 1
    with pytest.raises(ValueError, match="soft limits"):
        st.move_axis("Y", 81.0)
    st.close()
    assert conn.closed == 1


def test_zaber_lockstep_fallback_and_focus_axis(monkeypatch):
    """Rigs without a lockstep group fall back to plain axis 1 for X
    (reference ``:477-479``); focus_axis is selectable by name."""
    from enph459_super_resolution_tpu.hw.real import ZaberStage

    dev = _FakeZaberDevice(has_lockstep=False)
    _install_fake_zaber(monkeypatch, dev)
    st = ZaberStage(port="/dev/ttyFAKE0", focus_axis="X",
                    soft_limits_mm={"X": (0.0, 600.0)})
    st.move_absolute(123.0)
    assert dev.axes[1].moves == [123.0]  # plain axis, no lockstep
    assert st.limits["X"] == (0.0, 600.0)
    with pytest.raises(ValueError, match="focus_axis"):
        ZaberStage(port="/dev/ttyFAKE0", focus_axis="Q")


def test_autofocus_sweep_by_axis_name_on_sim_3axis():
    """The autofocus core drives a named axis of the 3-axis sim twin and
    recovers the rig's best focus on it."""
    from enph459_super_resolution_tpu.hw.autofocus import autofocus_sweep
    from enph459_super_resolution_tpu.hw.sim import (
        SimCamera, SimConfig, SimStage3Axis, SimulatedRig, pinhole_scene)

    cfg = SimConfig(lr_shape=(96, 128), jitter_sigma_px=0.0,
                    unsettled_jitter_px=0.0, seed=1, read_noise=0.1,
                    shot_noise_scale=0.0)
    rig = SimulatedRig(scene=pinhole_scene((192, 256), center=(96.0, 128.0)),
                       config=cfg)
    cam = SimCamera(rig)
    stage = SimStage3Axis(rig, best_pos_mm=369.23, focus_axis="Z",
                          limits={"X": (0.0, 600.0), "Y": (0.0, 100.0),
                                  "Z": (350.0, 390.0)})
    y_before = stage.axis_position("Y")
    res = autofocus_sweep(cam, stage, 355.0, 385.0, coarse_points=7,
                          fine_points=5, settle_s=0.0, sleep_fn=lambda s: None,
                          axis="Z")
    assert res["axis"] == "Z"
    assert abs(res["best_pos_mm"] - 369.23) < 3.0
    assert stage.axis_position("Y") == y_before  # other axes untouched
    # X is a lockstep pair: both motors track together
    stage.move_axis("X", 50.0)
    assert stage.lockstep_positions == (50.0, 50.0)
    # a single-axis stage rejects axis= requests
    from enph459_super_resolution_tpu.hw.sim import SimStage
    with pytest.raises(ValueError, match="multi-axis"):
        autofocus_sweep(cam, SimStage(rig), 355.0, 385.0, axis="Z")
