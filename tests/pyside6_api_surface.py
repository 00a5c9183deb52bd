"""Vendored PySide6 / Qt 6 API surface table (VERDICT r2 next #8).

Real PySide6 has never been importable in this image, so the Qt shim
(``softspoken_tpu/ui/qt_shim``) is the GUI's only witness.  This table is
the independent reference the shim is checked against: it is transcribed
from the published Qt 6 / PySide6 documentation (doc.qt.io/qtforpython-6),
NOT generated from the shim, so a shim method or signal signature that
real PySide6 doesn't have fails ``tests/test_shim_fidelity.py`` instead of
silently training the app onto a fake API.

Schema per class::

    "Module.QClass": {
        "bases": ["Module.QBase", ...],      # for method inheritance lookups
        "signals": {"name": n_emit_args},     # exact arg count Qt emits
        "methods": {"name": (min_args, max_args)},  # excluding self; None=any
        "enums": {"EnumName": {"Member", ...}},     # spot-checked members
    }

Arity convention: the (min, max) range covers Qt's overload set — a shim
method is compatible when its own positional-parameter count lies inside
the range.  Only symbols the shim implements need to appear here, but every
entry must be REAL Qt 6 API.
"""

S = {
    # ---------------------------------------------------------- QtCore
    "QtCore.QObject": {
        "bases": [],
        "signals": {},
        "methods": {
            "blockSignals": (1, 1), "deleteLater": (0, 0),
            "parent": (0, 0), "signalsBlocked": (0, 0),
        },
    },
    "QtCore.QSize": {
        "bases": [],
        "signals": {},
        "methods": {"width": (0, 0), "height": (0, 0)},
    },
    "QtCore.QTimer": {
        "bases": ["QtCore.QObject"],
        "signals": {"timeout": 0},
        "methods": {
            "interval": (0, 0), "isActive": (0, 0), "isSingleShot": (0, 0),
            "setInterval": (1, 1), "setSingleShot": (1, 1),
            "singleShot": (2, 4),   # static: (msec, receiver[, member])
            "start": (0, 1), "stop": (0, 0),
        },
    },
    "QtCore.QRunnable": {
        "bases": [],
        "signals": {},
        "methods": {"run": (0, 0), "setAutoDelete": (1, 1)},
    },
    "QtCore.QThreadPool": {
        "bases": ["QtCore.QObject"],
        "signals": {},
        "methods": {
            "globalInstance": (0, 0), "start": (1, 2),
            "waitForDone": (0, 1),
        },
    },
    "QtCore.QUrl": {
        "bases": [],
        "signals": {},
        "methods": {"fromLocalFile": (1, 1), "toString": (0, 1)},
    },
    "QtCore.Qt": {
        "bases": [],
        "signals": {},
        "methods": {},
        "enums": {
            "AlignmentFlag": {
                "AlignLeft", "AlignRight", "AlignHCenter", "AlignTop",
                "AlignBottom", "AlignVCenter", "AlignCenter",
            },
            "AspectRatioMode": {
                "IgnoreAspectRatio", "KeepAspectRatio",
                "KeepAspectRatioByExpanding",
            },
            "ItemFlag": {
                "NoItemFlags", "ItemIsSelectable", "ItemIsEditable",
                "ItemIsEnabled", "ItemIsUserCheckable",
            },
            "ItemDataRole": {
                "DisplayRole", "EditRole", "BackgroundRole",
                "ForegroundRole", "UserRole",
            },
            "Orientation": {"Horizontal", "Vertical"},
        },
    },
    # ----------------------------------------------------------- QtGui
    "QtGui.QColor": {
        "bases": [],
        "signals": {},
        "methods": {"name": (0, 1)},
    },
    "QtGui.QBrush": {
        "bases": [],
        "signals": {},
        "methods": {"color": (0, 0)},
    },
    "QtGui.QPixmap": {
        "bases": [],
        "signals": {},
        "methods": {
            "height": (0, 0), "width": (0, 0), "isNull": (0, 0),
            "loadFromData": (1, 3), "save": (1, 3),
            "scaled": (1, 4),       # scaled(QSize|w,h [,aspect [,transform]])
            "size": (0, 0),
        },
    },
    "QtGui.QImage": {
        "bases": [],
        "signals": {},
        "methods": {},
    },
    "QtGui.QKeySequence": {
        "bases": [],
        "signals": {},
        "methods": {"toString": (0, 1)},
    },
    "QtGui.QAction": {       # QAction moved QtWidgets → QtGui in Qt 6
        "bases": ["QtCore.QObject"],
        "signals": {"triggered": 1},      # triggered(bool checked = false)
        "methods": {
            "setShortcut": (1, 1), "shortcut": (0, 0),
            "text": (0, 0), "trigger": (0, 0),
        },
    },
    # ------------------------------------------------------- QtWidgets
    "QtWidgets.QWidget": {
        "bases": ["QtCore.QObject"],
        "signals": {},
        "methods": {
            "close": (0, 0), "height": (0, 0), "hide": (0, 0),
            "isEnabled": (0, 0), "isVisible": (0, 0), "layout": (0, 0),
            "resize": (1, 2), "setEnabled": (1, 1), "setFocus": (0, 1),
            "setLayout": (1, 1), "setMinimumHeight": (1, 1),
            "setMaximumWidth": (1, 1),
            "setMinimumWidth": (1, 1), "setStyleSheet": (1, 1),
            "setToolTip": (1, 1), "setWindowTitle": (1, 1),
            "show": (0, 0), "size": (0, 0), "update": (0, 1),
            "width": (0, 0), "windowTitle": (0, 0), "actions": (0, 0),
            "addAction": (1, 4),
        },
    },
    "QtWidgets.QLabel": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {},
        "methods": {
            "pixmap": (0, 0), "setAlignment": (1, 1), "setPixmap": (1, 1),
            "setText": (1, 1), "setWordWrap": (1, 1), "text": (0, 0),
        },
    },
    "QtWidgets.QPushButton": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {"clicked": 1},        # clicked(bool checked = false)
        "methods": {
            "click": (0, 0), "setShortcut": (1, 1),
            "setText": (1, 1), "text": (0, 0),
        },
    },
    "QtWidgets.QProgressBar": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {},
        "methods": {"setRange": (2, 2), "setValue": (1, 1), "value": (0, 0)},
    },
    "QtWidgets.QLineEdit": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {"textChanged": 1},
        "methods": {
            "setPlaceholderText": (1, 1), "setText": (1, 1), "text": (0, 0),
        },
    },
    "QtWidgets.QComboBox": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {"currentTextChanged": 1},
        "methods": {
            "addItems": (1, 1), "currentText": (0, 0),
            "setCurrentText": (1, 1),
        },
    },
    "QtWidgets.QCheckBox": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {"toggled": 1},
        "methods": {"isChecked": (0, 0), "setChecked": (1, 1)},
    },
    "QtWidgets.QListWidgetItem": {
        "bases": [],
        "signals": {},
        "methods": {"text": (0, 0)},
    },
    "QtWidgets.QListWidget": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {"itemSelectionChanged": 0},
        "methods": {
            "addItem": (1, 1), "addItems": (1, 1), "clear": (0, 0),
            "count": (0, 0), "item": (1, 1), "selectedItems": (0, 0),
            "setCurrentRow": (1, 2), "setSelectionMode": (1, 1),
        },
    },
    "QtWidgets.QTableWidgetItem": {
        "bases": [],
        "signals": {},
        "methods": {
            "background": (0, 0), "column": (0, 0), "flags": (0, 0),
            "row": (0, 0), "setBackground": (1, 1), "setFlags": (1, 1),
            "setText": (1, 1), "text": (0, 0),
        },
    },
    "QtWidgets.QTableWidget": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {
            "itemSelectionChanged": 0,
            "itemChanged": 1,             # itemChanged(QTableWidgetItem*)
            "cellDoubleClicked": 2,       # cellDoubleClicked(int row, int col)
            "cellChanged": 2,
            "currentCellChanged": 4,
        },
        "methods": {
            "clear": (0, 0), "columnCount": (0, 0), "currentColumn": (0, 0),
            "currentRow": (0, 0), "item": (2, 2),
            "resizeColumnsToContents": (0, 0), "rowCount": (0, 0),
            "selectRow": (1, 1), "setColumnCount": (1, 1),
            "setCurrentCell": (2, 3), "setEditTriggers": (1, 1),
            "setHorizontalHeaderLabels": (1, 1), "setItem": (3, 3),
            "setRowCount": (1, 1), "setSortingEnabled": (1, 1),
        },
    },
    "QtWidgets.QStackedWidget": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {},
        "methods": {
            "addWidget": (1, 1), "currentWidget": (0, 0),
            "setCurrentWidget": (1, 1),
        },
    },
    "QtWidgets.QMenu": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {},
        "methods": {"addAction": (1, 4)},
    },
    "QtWidgets.QMenuBar": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {},
        "methods": {"addMenu": (1, 2)},
    },
    "QtWidgets.QMainWindow": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {},
        "methods": {
            "centralWidget": (0, 0), "menuBar": (0, 0),
            "setCentralWidget": (1, 1),
        },
    },
    "QtWidgets.QSplitter": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {"splitterMoved": 2},  # splitterMoved(int pos, int index)
        "methods": {"addWidget": (1, 1), "setSizes": (1, 1)},
    },
    "QtWidgets.QDialog": {
        "bases": ["QtWidgets.QWidget"],
        "signals": {},
        "methods": {
            "accept": (0, 0), "exec": (0, 0), "reject": (0, 0),
            "result": (0, 0),
        },
        "enums": {"DialogCode": {"Accepted", "Rejected"}},
    },
    "QtWidgets.QFileDialog": {
        "bases": ["QtWidgets.QDialog"],
        "signals": {},
        "methods": {
            "getExistingDirectory": (0, 4),
            "getOpenFileName": (0, 6), "getOpenFileNames": (0, 6),
            "getSaveFileName": (0, 6),
        },
    },
    "QtWidgets.QInputDialog": {
        "bases": ["QtWidgets.QDialog"],
        "signals": {},
        "methods": {
            "getDouble": (3, 9), "getItem": (4, 7), "getText": (3, 7),
        },
    },
    "QtWidgets.QMessageBox": {
        "bases": ["QtWidgets.QDialog"],
        "signals": {},
        "methods": {
            "question": (3, 5), "information": (3, 5),
            "warning": (3, 5), "critical": (3, 5),
        },
        "enums": {"StandardButton": {"Yes", "No", "Ok", "Cancel"}},
    },
    "QtWidgets.QApplication": {
        "bases": ["QtCore.QObject"],
        "signals": {},
        "methods": {
            "exec": (0, 0), "instance": (0, 0), "processEvents": (0, 2),
            "quit": (0, 0), "setStyleSheet": (1, 1),
        },
    },
    # Layouts (QLayout API; the shim only constructs + addWidget/addLayout)
    "QtWidgets.QVBoxLayout": {"bases": ["QtWidgets.QBoxLayout"], "signals": {}, "methods": {}},
    "QtWidgets.QHBoxLayout": {"bases": ["QtWidgets.QBoxLayout"], "signals": {}, "methods": {}},
    "QtWidgets.QFormLayout": {"bases": ["QtWidgets.QLayout"], "signals": {}, "methods": {"addRow": (1, 2)}},
    "QtWidgets.QGridLayout": {"bases": ["QtWidgets.QLayout"], "signals": {}, "methods": {"addWidget": (1, 6)}},
    "QtWidgets.QBoxLayout": {
        "bases": ["QtWidgets.QLayout"],
        "signals": {},
        "methods": {"addWidget": (1, 3), "addLayout": (1, 2),
                    "addStretch": (0, 1), "insertWidget": (2, 4)},
    },
    "QtWidgets.QLayout": {
        "bases": ["QtCore.QObject"],
        "signals": {},
        "methods": {"addWidget": (1, 1), "count": (0, 0), "itemAt": (1, 1)},
    },
}

# Qt6 "StandardButton" numeric values (doc.qt.io QMessageBox::StandardButton)
QT6_STANDARD_BUTTON_VALUES = {
    "Ok": 0x400, "Cancel": 0x400000, "Yes": 0x4000, "No": 0x10000,
}
