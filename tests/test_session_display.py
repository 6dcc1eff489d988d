"""Tests for the headless registration session, display utils, preprocess."""

import matplotlib

matplotlib._called_from_test = True
matplotlib.use("Agg")

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter, shift as ndi_shift

from highresnet_tpu.registration.session import OVERLAY_MODES, RegistrationSession
from highresnet_tpu.utils.display import (
    compute_sum_of_layers,
    contrast_stretch_8bit,
    min_max_scale,
    process_image_for_display,
    rescale_intensity,
    save_image,
    save_shift,
    load_shift,
)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    ref = gaussian_filter(np.kron(rng.random((12, 12)), np.ones((4, 4))), 2.0).astype(np.float32)
    template = ndi_shift(ref, (0.6, -0.4), mode="constant", order=3)
    mask = np.zeros_like(ref)
    mask[3:-3, 3:-3] = 1
    return ref, template, mask


def test_rescale_and_stretch():
    img = np.linspace(0, 100, 64).reshape(8, 8)
    out = rescale_intensity(img, (25, 75))
    assert out.min() == 0.0 and out.max() == 1.0
    u8 = contrast_stretch_8bit(img)
    assert u8.dtype == np.uint8 and u8.max() == 255
    # masked stretch windows percentiles on valid pixels only
    mask = np.zeros((8, 8)); mask[:2] = 1
    u8m = contrast_stretch_8bit(img, mask)
    assert u8m[0, 0] == 0 and u8m[-1, -1] == 255
    s = min_max_scale(img)
    assert s.min() == pytest.approx(0) and s.max() == pytest.approx(1)
    rgb = process_image_for_display(np.stack([img] * 3, -1))
    assert rgb.shape == (8, 8, 3) and rgb.max() <= 1.0


def test_save_image_dtype_ladder(tmp_path):
    from highresnet_tpu.utils.imageio import imread_u16

    f = np.random.default_rng(1).random((16, 16)).astype(np.float32) * 65535
    p = tmp_path / "f.png"
    save_image(f, str(p), dtype=np.float32)
    assert imread_u16(p).dtype == np.uint16

    b = np.zeros((16, 16), bool); b[4:8] = True
    save_image(b, str(tmp_path / "b.png"), dtype=np.bool_)
    back = imread_u16(tmp_path / "b.png")
    assert set(np.unique(back)) == {0, 255}

    save_image(f / 256, str(tmp_path / "d.png"), easy_display=True)
    disp = imread_u16(tmp_path / "d.png")
    assert disp.shape == (192, 192)  # 12x upscale
    assert disp.dtype == np.uint8


def test_shift_json_roundtrip(tmp_path):
    p = str(tmp_path / "s" / "shift.json")
    save_shift((1.25, -0.5), p)
    dy, dx = load_shift(p)
    assert (dy, dx) == (1.25, -0.5)


def test_sum_of_layers():
    diffs = {
        "0_diff": np.ones((16, 16)),
        "5_diff": np.ones((8, 8)) * 2,
        "0_loss": 1.0,  # non-diff keys ignored
    }
    total = compute_sum_of_layers(diffs)
    assert total.shape == (16, 16)
    assert total.max() == pytest.approx(1.0)  # normalized
    assert compute_sum_of_layers(None).shape == (10, 10)


def test_session_nudge_and_overlays(pair):
    ref, template, mask = pair
    s = RegistrationSession()
    s.set_arrays(ref, template, mask, mask)
    s.nudge(dy=0.1, dx=-0.2)
    assert s.current_shift == (0.1, -0.2)
    for mode in OVERLAY_MODES:
        img = s.overlay(mode)
        assert img.dtype == np.uint8
        assert img.shape[:2] == ref.shape
    with pytest.raises(ValueError):
        s.overlay("nope")


def test_session_solve_and_vote(pair):
    ref, template, mask = pair
    s = RegistrationSession()
    s.set_arrays(ref, template, mask, mask)
    dy, dx = s.compute_and_apply_shift("NCC", points_per_dim=5, max_recursions=5)
    assert dy == pytest.approx(-0.6, abs=0.08)
    assert dx == pytest.approx(0.4, abs=0.08)
    assert len(s.history["ncc"]) == 1
    assert s.history["ncc"][0] > 0.98

    # worsen the shift, record, and check voting returns to the good one
    s.nudge(dy=1.0)
    s.record_metrics()
    assert len(s.history["ncc"]) == 2
    best = s.vote_best_shift()
    assert best[0] == pytest.approx(dy)
    hm = s.vgg_diff_heatmap()
    assert hm.ndim == 2 and np.isfinite(hm).all()


def test_session_mi_and_ml1e_methods(pair):
    ref, template, mask = pair
    s = RegistrationSession()
    s.set_arrays(ref, template, mask, mask)
    dy, dx = s.compute_and_apply_shift("Mean L1 Error", points_per_dim=5, max_recursions=4)
    assert abs(dy + 0.6) < 0.2 and abs(dx - 0.4) < 0.2


def test_registration_config_load(tmp_path):
    import json
    import warnings

    from highresnet_tpu.config import load_registration_config

    p = tmp_path / "config.json"
    p.write_text(json.dumps({"current_deltax": 1.5, "bogus_key": 1}))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = load_registration_config(str(p))
    assert cfg["current_deltax"] == 1.5
    assert cfg["shift_step_x"] == 0.05  # default survives
    assert any("bogus_key" in str(x.message) for x in w)


def test_preprocess_imgset(tmp_path):
    from highresnet_tpu.data.synth import make_synthetic_dataset
    from highresnet_tpu.data import discover_scenes
    from highresnet_tpu.registration.preprocess import preprocess_imgset
    import os

    make_synthetic_dataset(str(tmp_path), n_scenes_per_channel=1, n_views=3,
                           lr_size=24, seed=4, splits=("train",))
    scene = discover_scenes(f"{tmp_path}/train")[0]
    shifts = preprocess_imgset(scene, points_per_dim=3, max_recursions=3)
    assert len(shifts) == 3
    out = os.path.join(scene, "aligned")
    files = sorted(os.listdir(out))
    assert "REF.png" in files
    assert sum(f.startswith("LR") for f in files) == 3
    assert sum(f.startswith("QM") for f in files) == 3
    assert sum(f.startswith("shift") for f in files) == 3


def test_heatmap_canvas(tmp_path):
    from highresnet_tpu.utils.heatmap_canvas import HeatmapCanvas

    c = HeatmapCanvas()
    data = np.random.default_rng(0).random((10, 10))
    mask = data > 0.5
    c.show_heatmap(data, mask)
    c.show_heatmap(data * 2)  # colorbar reuse path
    c.show_image((data * 255).astype(np.uint8))
    c.save(str(tmp_path / "c.png"))
    assert (tmp_path / "c.png").exists()


def test_imsetshow_renders(tmp_path):
    from highresnet_tpu.data.synth import make_synthetic_dataset
    from highresnet_tpu.data import discover_scenes, read_imageset
    from highresnet_tpu.utils.display import imsetshow

    make_synthetic_dataset(str(tmp_path), n_scenes_per_channel=1, n_views=3,
                           lr_size=16, seed=5, splits=("train",))
    s = read_imageset(discover_scenes(f"{tmp_path}/train")[0])
    fig = imsetshow(s, show=False)
    assert fig is not None


def test_gui_module_structure():
    """The Qt front-end is import-gated: the module imports without PyQt5,
    exposes the full method list, and fails with a clear message when Qt
    is requested but absent."""
    from highresnet_tpu.registration import app
    from highresnet_tpu.registration.session import SEARCH_METHODS

    # every grid-parameterized method must be a real search method
    assert set(app.GRID_METHODS) <= set(SEARCH_METHODS)
    assert "Point Matching" in SEARCH_METHODS and "Fourier" in SEARCH_METHODS

    try:
        import PyQt5  # noqa: F401

        have_qt = True
    except ImportError:
        have_qt = False
    if not have_qt:
        with pytest.raises(RuntimeError, match="PyQt5"):
            app._require_qt()


def test_gui_window_construction_headless():
    """Full widget construction under the offscreen platform (skipped when
    PyQt5 is unavailable, as in this image)."""
    pytest.importorskip("PyQt5")
    import os

    os.environ.setdefault("QT_QPA_PLATFORM", "offscreen")
    from PyQt5 import QtWidgets

    from highresnet_tpu.registration.app import build_main_window
    from highresnet_tpu.registration.session import RegistrationSession

    app_q = QtWidgets.QApplication.instance() or QtWidgets.QApplication([])
    rng = np.random.default_rng(0)
    session = RegistrationSession()
    session.set_arrays(rng.random((32, 32)), rng.random((32, 32)))
    win = build_main_window(session)
    assert win.tabs.count() == 3
    win.on_method_changed("Fourier")  # hides all parameter widgets
    assert not win.points_per_dim.isVisible()
    win.refresh()
    app_q.closeAllWindows()


def test_gui_wiring_with_stubbed_qt(tmp_path):
    """Execute the full app.py widget wiring headlessly against the REAL
    session by injecting a minimal fake PyQt5 (tests/qt_stub.py): window
    construction, per-method widget visibility, delta edits, arrow-key
    nudging, solve/vote/reset callbacks, tab-driven plot + VGG refreshes,
    and the file-dialog load slots. PyQt5 itself is absent in this image,
    so this is the only execution coverage the Qt glue gets."""
    import qt_stub

    qt_stub.install()
    try:
        from highresnet_tpu.registration.app import GRID_METHODS, build_main_window
        from highresnet_tpu.registration.session import RegistrationSession

        rng = np.random.default_rng(0)
        ref = rng.random((32, 32)).astype(np.float32)
        template = np.roll(ref, 1, axis=1)
        session = RegistrationSession()
        session.set_arrays(ref, template)

        win = build_main_window(session)
        assert win.tabs.count() == 3

        # per-method parameter visibility follows the dropdown
        win.method.setCurrentText("Point Matching")
        assert win.n_keypoints.isVisible() and not win.points_per_dim.isVisible()
        win.method.setCurrentText("NCC")
        assert win.points_per_dim.isVisible() and not win.n_keypoints.isVisible()
        assert "NCC" in GRID_METHODS

        # delta line edits round-trip into the session config
        win.delta_x.setText("0.25")
        win.delta_y.setText("-0.5")
        win.on_delta_edited()
        assert session.config["current_deltax"] == 0.25
        assert session.config["current_deltay"] == -0.5

        # arrow-key nudging moves by the configured steps
        from PyQt5 import QtCore  # the stub

        dx0 = session.config["current_deltax"]
        win.keyPressEvent(qt_stub.KeyEvent(QtCore.Qt.Key_Right))
        assert session.config["current_deltax"] == pytest.approx(
            dx0 + session.config["shift_step_x"]
        )

        # solve + vote + reset callbacks run against the real session
        win.points_per_dim.setValue(3)
        win.max_recursions.setValue(3)
        win.on_solve()
        assert "applied shift" in win.statusBar().messages[-1]
        win.on_vote()
        assert "vote winner" in win.statusBar().messages[-1]

        # tab switches drive the plot and VGG-diff refreshes
        win.tabs.setCurrentIndex(2)  # Metric History
        assert isinstance(win.plots_holder._widget, qt_stub._FakeFigureCanvas)
        win.tabs.setCurrentIndex(1)  # VGG Diff (renders into the canvas)

        win.tabs.setCurrentIndex(0)  # Overlay (reset on the VGG tab would
        win.on_reset_history()       # immediately re-record for its refresh)
        assert session.history["pl"] == []

        # file-dialog slots load through the session
        from highresnet_tpu.utils.imageio import imsave_u16

        p = tmp_path / "ref.png"
        imsave_u16(str(p), (ref * 65535).astype(np.uint16))
        qt_stub.QFileDialog.next_path = str(p)
        win.on_load_reference()
        assert session.config["reference_image"] == str(p)
        win.on_load_template()
        assert session.config["template_image"] == str(p)
        qt_stub.QFileDialog.next_path = ""  # user cancels: no-op
        win.on_load_reference()
    finally:
        qt_stub.uninstall()

    import sys

    assert "PyQt5" not in sys.modules or not hasattr(sys.modules["PyQt5"], "__file__")
