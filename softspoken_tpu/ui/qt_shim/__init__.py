"""Headless PySide6-compatible shim.

PySide6 is a heavyweight optional dependency that is frequently absent
(CI containers, TPU hosts, this build image). This package implements the
*exact Qt API subset the app uses* — signals/slots, the widget tree,
dialogs, pixmaps, timers, the thread pool — with pure-Python state and
deterministic synchronous semantics:

  * ``QThreadPool.start`` runs the runnable synchronously,
  * ``QTimer.start`` fires ``timeout`` immediately (debounces collapse),
  * static dialogs return inert defaults and are monkeypatchable,

so every screen of ``ui.qt_app`` can be constructed, wired, click-driven,
and torn down in pytest with no display server. It is NOT a rendering
replacement — with real PySide6 installed the app prefers it (see
``qt_app``'s import order) and this shim never loads.

Activate explicitly::

    from softspoken_tpu.ui.qt_shim import install
    install()            # idempotent; no-op if real PySide6 importable
    import softspoken_tpu.ui.qt_app   # now runs headless

or set ``SOFTSPOKEN_QT_SHIM=1`` before importing ``qt_app``.
"""

from __future__ import annotations

import importlib
import os
import sys


def have_real_pyside6() -> bool:
    try:
        import PySide6  # noqa: F401

        return not getattr(PySide6, "__softspoken_shim__", False)
    except Exception:  # noqa: BLE001
        return False


def install(force: bool = False) -> bool:
    """Make ``import PySide6`` resolve to the shim. Returns True if the shim
    is active (False when real PySide6 is present and ``force`` is off)."""
    if not force and have_real_pyside6():
        return False
    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)))
    if pkg_dir not in sys.path:
        sys.path.insert(0, pkg_dir)
    # drop a partially-imported real PySide6, if any
    for mod in [m for m in sys.modules if m == "PySide6" or m.startswith("PySide6.")]:
        del sys.modules[mod]
    importlib.import_module("PySide6")
    return True
