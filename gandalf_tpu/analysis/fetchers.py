"""Data fetchers and user-defined formula quantities.

Analogue of the reference's analysis/data_fetcher.py (:35-302): `get_data`
first consults direct snapshot arrays, then derived quantities, then
user-registered formulas.  Instead of the reference's bundled-pyparsing
grammar, formulas are evaluated with Python's expression parser over a
restricted numpy namespace — same user-facing syntax for arithmetic
formulas like ``"x^2 + y^2"`` (``^`` is translated to ``**``).
"""

from __future__ import annotations

import ast
import dataclasses
from typing import Dict, Optional

import numpy as np

_ALLOWED_FUNCS = {
    "sqrt": np.sqrt, "abs": np.abs, "log": np.log, "log10": np.log10,
    "exp": np.exp, "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "arcsin": np.arcsin, "arccos": np.arccos, "arctan": np.arctan,
    "arctan2": np.arctan2, "min": np.minimum, "max": np.maximum,
    "pi": np.pi,
}

_ALLOWED_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.Num, ast.Constant,
    ast.Name, ast.Load, ast.Call, ast.Add, ast.Sub, ast.Mult, ast.Div,
    ast.Pow, ast.USub, ast.UAdd, ast.Mod,
)


@dataclasses.dataclass
class FormulaQuantity:
    name: str
    formula: str
    unitlabel: str = ""
    unitname: str = ""
    scaling_factor: float = 1.0
    label: str = ""


_USER_QUANTITIES: Dict[str, FormulaQuantity] = {}


def CreateUserQuantity(name: str, formula: str, unitlabel: str = "",
                       unitname: str = "", scaling_factor: float = 1.0,
                       label: str = "") -> FormulaQuantity:
    """Register a derived quantity computable from other quantities
    (reference data_fetcher.py:55: same signature)."""
    q = FormulaQuantity(name=name, formula=formula, unitlabel=unitlabel,
                        unitname=unitname,
                        scaling_factor=scaling_factor, label=label)
    _USER_QUANTITIES[name] = q
    return q


def user_quantities() -> Dict[str, FormulaQuantity]:
    return _USER_QUANTITIES


def clear_user_quantities() -> None:
    _USER_QUANTITIES.clear()


def _validate(tree: ast.AST) -> None:
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"formula uses unsupported syntax: {type(node).__name__}")
        if isinstance(node, ast.Call):
            if not (isinstance(node.func, ast.Name)
                    and node.func.id in _ALLOWED_FUNCS):
                raise ValueError("only basic math functions are allowed "
                                 "in formulas")


def evaluate_formula(formula: str, resolve) -> np.ndarray:
    """Evaluate a formula string; `resolve(name)` returns the named
    quantity array (used recursively for nested user quantities)."""
    expr = formula.replace("^", "**")
    tree = ast.parse(expr, mode="eval")
    _validate(tree)
    names = {n.id for n in ast.walk(tree)
             if isinstance(n, ast.Name) and n.id not in _ALLOWED_FUNCS}
    env = dict(_ALLOWED_FUNCS)
    for n in names:
        env[n] = resolve(n)
    return eval(compile(tree, "<formula>", "eval"),  # noqa: S307
                {"__builtins__": {}}, env)


# -- derived direct quantities (reference direct_fetchers) -------------------

def _derived(snap, name: str) -> Optional[np.ndarray]:
    """Common derived quantities: R (cylindrical), r (spherical), vr,
    vphi, KE, ..."""
    ex = snap.extract_array
    ndim = getattr(snap, "ndim", 3)
    if name == "R":
        x, y = ex("x"), ex("y")
        return np.hypot(x, y)
    if name == "r":
        out = ex("x") ** 2
        if ndim > 1:
            out = out + ex("y") ** 2
        if ndim > 2:
            out = out + ex("z") ** 2
        return np.sqrt(out)
    if name == "vr":
        x, y = ex("x"), ex("y")
        R = np.maximum(np.hypot(x, y), 1e-30)
        return (x * ex("vx") + y * ex("vy")) / R
    if name == "vphi":
        x, y = ex("x"), ex("y")
        R = np.maximum(np.hypot(x, y), 1e-30)
        return (x * ex("vy") - y * ex("vx")) / R
    if name == "ke":
        out = ex("vx") ** 2
        if ndim > 1:
            out = out + ex("vy") ** 2
        if ndim > 2:
            out = out + ex("vz") ** 2
        return 0.5 * ex("m") * out
    if name == "press":
        return ex("pressure")
    return None


def fetch_quantity(snap, name: str, _resolving=None) -> np.ndarray:
    """Resolve a quantity: user formulas > direct arrays > derived
    (UserQuantity, reference data_fetcher.py:40-52)."""
    if name in _USER_QUANTITIES:
        resolving = _resolving or set()
        if name in resolving:
            raise ValueError(
                f"cyclic formula quantity: {name!r} references itself "
                f"(resolution chain: {sorted(resolving)})")
        resolving = resolving | {name}
        q = _USER_QUANTITIES[name]
        return q.scaling_factor * evaluate_formula(
            q.formula, lambda n: fetch_quantity(snap, n, resolving))
    if name in ("r", "R"):
        # radius quantities shadow the raw (N, ndim) position array that
        # snapshots store under the same key
        return _derived(snap, name)
    try:
        return snap.extract_array(name)
    except (KeyError, ValueError):
        pass
    out = _derived(snap, name)
    if out is None:
        raise KeyError(f"unknown quantity {name!r}")
    return out
