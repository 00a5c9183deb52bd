"""Repo-wide undefined-name lint (no flake8/pyflakes in this image).

The WAV-dir trainer shipped broken for a whole session because ``fit()``
referenced ``train_dtype`` without taking the parameter — a NameError that
only fired on a slow-tier code path (r3 session 5).  This test catches that
bug class statically: every name the compiler resolves as an implicit
GLOBAL must exist in the module's top-level namespace, be a builtin, or be
imported somewhere in the module.

Uses :mod:`symtable` (the compiler's own scope analysis), so nested
functions, comprehensions, and closures resolve exactly as at runtime.
"""

import ast
import builtins
import os
import symtable

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "softspoken_tpu")

_BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__",
                                  "__package__", "__spec__", "__loader__",
                                  "__builtins__", "__debug__", "__path__"}


def _module_names(tree: ast.Module) -> set:
    """Names bound anywhere in the module body (any nesting level counts:
    a function-local ``import jax`` can't satisfy OTHER scopes, but
    symtable already scopes those correctly — what we collect here is the
    TOP-LEVEL namespace that implicit globals resolve against, plus
    conditional/late binds (``if``/``try`` at top level)."""
    names = set()

    def bind_target(t):
        if isinstance(t, ast.Name):
            names.add(t.id)
        elif isinstance(t, (ast.Tuple, ast.List)):
            for e in t.elts:
                bind_target(e)
        elif isinstance(t, ast.Starred):
            bind_target(t.value)

    def walk_stmts(body):
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                names.add(node.name)
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    bind_target(t)
            elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
                bind_target(node.target)
            elif isinstance(node, ast.Import):
                for a in node.names:
                    names.add((a.asname or a.name).split(".")[0])
            elif isinstance(node, ast.ImportFrom):
                for a in node.names:
                    if a.name == "*":
                        names.add("*")  # star import: give up on this module
                    else:
                        names.add(a.asname or a.name)
            elif isinstance(node, (ast.If, ast.Try, ast.While, ast.For,
                                   ast.With)):
                for attr in ("body", "orelse", "finalbody", "handlers"):
                    sub = getattr(node, attr, [])
                    for h in sub:
                        if isinstance(h, ast.ExceptHandler):
                            if h.name:
                                names.add(h.name)
                            walk_stmts(h.body)
                    walk_stmts([s for s in sub
                                if not isinstance(s, ast.ExceptHandler)])
                if isinstance(node, ast.For):
                    bind_target(node.target)
                if isinstance(node, ast.With):
                    for item in node.items:
                        if item.optional_vars:
                            bind_target(item.optional_vars)
            elif isinstance(node, ast.Global):
                names.update(node.names)

    walk_stmts(tree.body)
    return names


def _function_scope_globals(table, out):
    """Collect (scope name, symbol) for implicit-global reads per scope."""
    if table.get_type() == "function":
        for sym in table.get_symbols():
            if (sym.is_global() and not sym.is_declared_global()
                    and sym.is_referenced()):
                out.append((table.get_name(), table.get_lineno(),
                            sym.get_name()))
    for child in table.get_children():
        _function_scope_globals(child, out)


def _check_file(path: str):
    with open(path, encoding="utf-8") as f:
        src = f.read()
    tree = ast.parse(src, path)
    top = _module_names(tree)
    if "*" in top:
        return []  # star import: namespace unknowable
    # function-local imports satisfy only their own scope; symtable treats
    # the imported name as local there, so nothing extra needed.
    refs = []
    _function_scope_globals(symtable.symtable(src, path, "exec"), refs)
    missing = []
    for scope, lineno, name in refs:
        if name in top or name in _BUILTINS:
            continue
        missing.append(f"{os.path.relpath(path, REPO)}:{lineno} "
                       f"{scope}() references undefined name {name!r}")
    return missing


def _py_files():
    out = []
    for root, dirs, files in os.walk(PKG):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        out.extend(os.path.join(root, f) for f in files if f.endswith(".py"))
    # bench.py, the graft entry, and the evidence scripts are surface too
    for extra in ("bench.py", "__graft_entry__.py"):
        p = os.path.join(REPO, extra)
        if os.path.exists(p):
            out.append(p)
    sdir = os.path.join(REPO, "scripts")
    if os.path.isdir(sdir):
        out.extend(os.path.join(sdir, f) for f in os.listdir(sdir)
                   if f.endswith(".py"))
    return sorted(out)


@pytest.mark.parametrize("path", _py_files(),
                         ids=lambda p: os.path.relpath(p, REPO))
def test_no_undefined_names(path):
    problems = _check_file(path)
    assert not problems, "\n".join(problems)


def test_checker_catches_the_fit_bug_class(tmp_path):
    """Regression meta-test: the exact shape that shipped broken (a
    function referencing a name that exists only in a SIBLING function's
    signature) must be flagged."""
    p = tmp_path / "mod.py"
    p.write_text(
        "import numpy as np\n"
        "def fit(steps=1):\n"
        "    return np.dtype(train_dtype)\n"   # undefined here
        "def fit_synthetic(train_dtype='float32'):\n"
        "    return train_dtype\n"
    )
    problems = _check_file(str(p))
    assert len(problems) == 1 and "train_dtype" in problems[0]
    # and a clean sibling passes
    q = tmp_path / "ok.py"
    q.write_text(
        "import os\n"
        "X = 1\n"
        "def f():\n"
        "    def g():\n"
        "        return X + len(os.sep)\n"
        "    return [i for i in range(X) if g()]\n"
    )
    assert _check_file(str(q)) == []
