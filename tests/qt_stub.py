"""Minimal fake PyQt5 (+ matplotlib Qt backend) for headless GUI-wiring tests.

PyQt5 is absent from this image, so ``registration/app.py``'s 300 lines of
widget wiring would otherwise have zero execution coverage — a method-name
typo against the (real, fully tested) RegistrationSession API would ship.
This stub implements just enough stateful Qt surface (signals, combo boxes,
line edits, spin boxes, tabs, file dialog) for ``build_main_window`` to
construct and for every callback to run against the real session. Install
with ``install()`` and ALWAYS ``uninstall()`` in a finally block — the real
``pytest.importorskip("PyQt5")`` gate elsewhere must keep skipping.
"""

from __future__ import annotations

import inspect
import sys
import types


class Signal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def emit(self, *args):
        for fn in list(self._slots):
            # real Qt truncates emitted args to the slot's arity
            try:
                params = list(inspect.signature(fn).parameters.values())
            except (ValueError, TypeError):
                fn(*args)
                continue
            if any(p.kind == inspect.Parameter.VAR_POSITIONAL for p in params):
                fn(*args)
            else:
                n = sum(
                    p.kind
                    in (inspect.Parameter.POSITIONAL_ONLY, inspect.Parameter.POSITIONAL_OR_KEYWORD)
                    for p in params
                )
                fn(*args[:n])


class _Base:
    """Every unknown Qt method is a no-op (layout/sizing/styling calls)."""

    def __init__(self, *a, **k):
        self.clicked = Signal()
        self._visible = True

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return lambda *a, **k: None

    def setVisible(self, v):
        self._visible = bool(v)

    def isVisible(self):
        return self._visible


class QWidget(_Base):
    pass


class QLabel(_Base):
    def __init__(self, text="", *a, **k):
        super().__init__()
        self._text = text


class QPushButton(_Base):
    def __init__(self, label="", *a, **k):
        super().__init__()
        self.label = label


class QLineEdit(_Base):
    def __init__(self, text=""):
        super().__init__()
        self._text = str(text)
        self.editingFinished = Signal()

    def text(self):
        return self._text

    def setText(self, t):
        self._text = str(t)


class QComboBox(_Base):
    def __init__(self):
        super().__init__()
        self._items = []
        self._index = 0
        self.currentTextChanged = Signal()

    def addItems(self, items):
        self._items.extend(items)

    def currentText(self):
        return self._items[self._index] if self._items else ""

    def setCurrentText(self, text):
        self._index = self._items.index(text)
        self.currentTextChanged.emit(text)


class QSpinBox(_Base):
    def __init__(self):
        super().__init__()
        self._value = 0

    def setRange(self, lo, hi):
        self._range = (lo, hi)

    def setValue(self, v):
        self._value = int(v)

    def value(self):
        return self._value


class QTabWidget(_Base):
    def __init__(self):
        super().__init__()
        self._tabs = []
        self._index = 0
        self.currentChanged = Signal()

    def addTab(self, widget, name):
        self._tabs.append((widget, name))
        return len(self._tabs) - 1

    def tabText(self, i):
        return self._tabs[i][1]

    def count(self):
        return len(self._tabs)

    def currentIndex(self):
        return self._index

    def setCurrentIndex(self, i):
        self._index = i
        self.currentChanged.emit(i)


class QScrollArea(_Base):
    def setWidget(self, w):
        self._widget = w


class _StatusBar(_Base):
    def __init__(self):
        super().__init__()
        self.messages = []

    def showMessage(self, m):
        self.messages.append(m)


class QMainWindow(_Base):
    def __init__(self, *a, **k):
        super().__init__()
        self._status = _StatusBar()

    def statusBar(self):
        return self._status

    def keyPressEvent(self, event):  # base handler for unhandled keys
        pass


class QFileDialog:
    next_path = ""  # tests set this to simulate a user picking a file

    @staticmethod
    def getOpenFileName(parent, title, start, filt):
        return (QFileDialog.next_path, filt)


class QVBoxLayout(_Base):
    pass


class QHBoxLayout(_Base):
    pass


class QApplication(_Base):
    @staticmethod
    def instance():
        return None


class _FakeFigureCanvas:
    def __init__(self, fig):
        self.figure = fig


class KeyEvent:
    """Stand-in for QKeyEvent: KeyEvent(Qt.Key_Left)."""

    def __init__(self, key):
        self._key = key

    def key(self):
        return self._key


_QT_CORE = types.SimpleNamespace(
    Qt=types.SimpleNamespace(Key_Left=0x01, Key_Right=0x02, Key_Up=0x03, Key_Down=0x04)
)

_SAVED = {}


def install():
    """Insert the fake PyQt5 + Qt matplotlib backend into sys.modules."""
    qtwidgets = types.SimpleNamespace(
        QMainWindow=QMainWindow, QWidget=QWidget, QVBoxLayout=QVBoxLayout,
        QHBoxLayout=QHBoxLayout, QPushButton=QPushButton, QLineEdit=QLineEdit,
        QLabel=QLabel, QComboBox=QComboBox, QSpinBox=QSpinBox,
        QTabWidget=QTabWidget, QScrollArea=QScrollArea, QFileDialog=QFileDialog,
        QApplication=QApplication,
    )
    pyqt5 = types.ModuleType("PyQt5")
    pyqt5.QtCore = _QT_CORE
    pyqt5.QtGui = types.SimpleNamespace()
    pyqt5.QtWidgets = qtwidgets
    backend = types.ModuleType("matplotlib.backends.backend_qt5agg")
    backend.FigureCanvasQTAgg = _FakeFigureCanvas

    for name, mod in (
        ("PyQt5", pyqt5),
        ("matplotlib.backends.backend_qt5agg", backend),
    ):
        _SAVED[name] = sys.modules.get(name)
        sys.modules[name] = mod


def uninstall():
    """Restore sys.modules exactly (importorskip gates must keep skipping)."""
    for name, orig in _SAVED.items():
        if orig is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = orig
    _SAVED.clear()
