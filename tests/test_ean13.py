"""EAN-13 codec + the hermetic end-to-end decode story.

The headline test reproduces the reference project's whole purpose without
hardware or zxing: a barcode rendered at 2 px/module into the HR scene is
UNDECODABLE from any single-frame upsample of the captured LR frames
(1 px/module), while 4-frame SAA+IBP recovers a 100% jittered-decode
confidence.
"""

import numpy as np
import pytest

from enph459_super_resolution_tpu.eval import ean13
from enph459_super_resolution_tpu.eval.decode import decode_confidence

DIGITS = "5901234123457"


def test_checksum():
    assert ean13.checksum("590123412345") == 7
    assert ean13.checksum("400638133393") == 1


def test_encode_validates():
    with pytest.raises(ValueError):
        ean13.encode_bits("12345")  # wrong length
    with pytest.raises(ValueError):
        ean13.encode_bits("5901234123450")  # bad check digit
    bits = ean13.encode_bits("590123412345")  # 12 digits: checksum appended
    assert bits.shape == (95,)
    assert list(bits[:3]) == [1, 0, 1] and list(bits[-3:]) == [1, 0, 1]


@pytest.mark.parametrize("module_px", [1, 2, 3, 5])
def test_render_decode_round_trip(module_px):
    img = ean13.render(DIGITS, module_px=module_px)
    assert ean13.decode(img) == DIGITS
    # mirrored scan direction also decodes
    assert ean13.decode(img[:, ::-1]) == DIGITS


def test_decode_rejects_garbage():
    rng = np.random.default_rng(0)
    assert ean13.decode(rng.uniform(0, 255, (60, 300))) is None
    assert ean13.decode(np.full((60, 300), 128.0)) is None
    # single bit flip in a digit breaks the checksum -> rejected
    img = ean13.render(DIGITS, module_px=4)
    img2 = img.copy()
    img2[:, 36 * 4: 40 * 4] = 235.0  # blank out part of a digit
    assert ean13.decode(img2) != DIGITS


def test_decode_survives_blur_and_noise():
    import scipy.ndimage as ndi

    img = ean13.render(DIGITS, module_px=3)
    rng = np.random.default_rng(1)
    degraded = ndi.gaussian_filter(img, 1.0) + rng.normal(0, 3, img.shape)
    assert ean13.decode(np.clip(degraded, 0, 255)) == DIGITS


@pytest.mark.slow
def test_sr_recovers_undecodable_barcode():
    """The reference project's thesis, end to end on the simulator:
    sub-pixel-shifted multi-frame SR recovers a barcode that no single
    captured frame can resolve."""
    import jax.numpy as jnp
    from enph459_super_resolution_tpu.hw import (
        SimBeamSteering, SimCamera, SimConfig, SimulatedRig,
    )
    from enph459_super_resolution_tpu.ops.resize import bicubic_upsample
    from enph459_super_resolution_tpu.sr import make_gaussian_psf, solve

    bc = ean13.render(DIGITS, module_px=2, height_px=96)  # 2 px/module HR
    scene = np.full((192, 512), 235.0)
    x0 = (512 - bc.shape[1]) // 2
    scene[48:144, x0:x0 + bc.shape[1]] = bc

    cfg = SimConfig(lr_shape=(96, 256), jitter_sigma_px=0.002,
                    unsettled_jitter_px=0.0, seed=7, read_noise=0.5,
                    shot_noise_scale=0.005)
    rig = SimulatedRig(scene=scene, config=cfg)
    xpr = SimBeamSteering(rig)
    cam = SimCamera(rig, hardware_trigger=True)
    xpr.setup_trigger_output()

    frames = []
    for sx, sy in [(-1, 1), (1, 1), (-1, -1), (1, -1)]:
        xpr.set_angles(sx * 0.15625, sy * 0.15625)  # 0.5 px at gain 3.2
        rig.sleep(0.05)
        xpr.send_trigger_pulse()
        frames.append(cam.capture_raw().astype(np.float32))
    frames = np.stack(frames)

    shifts = ((0.5, -0.5), (0.5, 0.5), (-0.5, -0.5), (-0.5, 0.5))
    out = solve(jnp.asarray(frames), make_gaussian_psf(), shifts, n_iter=60)
    lr_up = np.asarray(bicubic_upsample(
        jnp.asarray(frames.mean(0))[None, :, :, None], 2))[0, :, :, 0]

    def conf(img):
        u8 = np.clip(img, 0, 255).astype(np.uint8)
        text, c = decode_confidence(u8, (0, u8.shape[0], 0, u8.shape[1]),
                                    decoder=ean13.decode)
        return text, c

    assert conf(lr_up) == (None, 0.0)                      # bicubic: dead
    assert conf(np.asarray(out["native"])) == (None, 0.0)  # native-2x: dead
    text, c = conf(np.asarray(out["ibp"]))                 # SAA+IBP: alive
    assert text == DIGITS
    assert c == 1.0
