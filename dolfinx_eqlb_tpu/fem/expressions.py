"""A minimal expression layer (the role UFL plays for the reference).

The reference JIT-compiles UFL forms through FFCx; here forms are hand-derived
and data enters kernels as *expressions*: objects that evaluate to
``(ncells, nq, vs)`` arrays at reference quadrature points, batched over all
cells.  This is the complete expression surface the equilibration /
estimation pipeline needs (cf. reference ``demo_error_estimation.py:95-125``,
``lsolver/projection.py``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces import Function

__all__ = ["Expr", "as_expr", "expr_from_callable", "grad", "div", "comp"]


class Expr:
    mesh = None
    value_size = 1

    def evaluate(self, qpoints_ref: np.ndarray):
        raise NotImplementedError

    def evaluate_div(self, qpoints_ref: np.ndarray):
        """Divergence (vector expressions), shape (nc, nq, 1)."""
        raise NotImplementedError(f"div of {type(self).__name__}")

    def __add__(self, other):
        return _Sum(self, as_expr(other, self.mesh), 1.0)

    def __sub__(self, other):
        return _Sum(self, as_expr(other, self.mesh), -1.0)

    def __rsub__(self, other):
        return _Sum(as_expr(other, self.mesh), self, -1.0)

    def __radd__(self, other):
        return self.__add__(other)

    def __mul__(self, a):
        if isinstance(a, (int, float)):
            return _Scale(self, float(a))
        return _Prod(self, as_expr(a, self.mesh))

    def __rmul__(self, a):
        return self.__mul__(a)

    def __neg__(self):
        return _Scale(self, -1.0)


class _FuncExpr(Expr):
    def __init__(self, f: Function):
        self.f = f
        self.mesh = f.space.mesh
        self.value_size = f.value_size

    def evaluate(self, q):
        return self.f.evaluate(q)

    def evaluate_div(self, q):
        s = self.f.space
        if s.family in ("RT", "DRT"):
            return self.f.evaluate_div(q)
        if s.family in ("P", "DG") and s.block_size == 2:
            g = self.f.evaluate_grad(q)  # (nc, nq, 2, 2)
            return (g[..., 0, 0] + g[..., 1, 1])[..., None]
        raise NotImplementedError("div of scalar function")


class _CallableExpr(Expr):
    """Wraps ``f(x) -> (..., vs)`` evaluated at physical points."""

    def __init__(self, fn, mesh, value_size=1):
        self.fn = fn
        self.mesh = mesh
        self.value_size = value_size

    def evaluate(self, q):
        xq = self.mesh.map_points(np.asarray(q))  # (nc, nq, 2)
        v = self.fn(xq)
        v = jnp.asarray(v)
        if v.ndim == 2:
            v = v[..., None]
        return v


class _Sum(Expr):
    def __init__(self, a, b, sb):
        assert a.value_size == b.value_size, (a.value_size, b.value_size)
        self.a, self.b, self.sb = a, b, sb
        self.mesh = a.mesh or b.mesh
        self.value_size = a.value_size

    def evaluate(self, q):
        return self.a.evaluate(q) + self.sb * self.b.evaluate(q)

    def evaluate_div(self, q):
        return self.a.evaluate_div(q) + self.sb * self.b.evaluate_div(q)


class _Scale(Expr):
    def __init__(self, a, s):
        self.a, self.s = a, s
        self.mesh = a.mesh
        self.value_size = a.value_size

    def evaluate(self, q):
        return self.s * self.a.evaluate(q)

    def evaluate_div(self, q):
        return self.s * self.a.evaluate_div(q)


class _Prod(Expr):
    """Pointwise product; one factor must be scalar."""

    def __init__(self, a, b):
        self.a, self.b = a, b
        self.mesh = a.mesh or b.mesh
        assert 1 in (a.value_size, b.value_size)
        self.value_size = max(a.value_size, b.value_size)

    def evaluate(self, q):
        va, vb = self.a.evaluate(q), self.b.evaluate(q)
        if self.a.value_size == 1 and self.b.value_size > 1:
            return va * vb
        if self.b.value_size == 1 and self.a.value_size > 1:
            return vb * va
        return va * vb


class _GradExpr(Expr):
    def __init__(self, f: Function):
        assert f.space.family in ("P", "DG") and f.space.block_size == 1
        self.f = f
        self.mesh = f.space.mesh
        self.value_size = 2

    def evaluate(self, q):
        return self.f.evaluate_grad(q)[:, :, 0, :]  # (nc, nq, 2)


class _DivExpr(Expr):
    def __init__(self, f: Function):
        assert f.space.family in ("RT", "DRT")
        self.f = f
        self.mesh = f.space.mesh
        self.value_size = 1

    def evaluate(self, q):
        return self.f.evaluate_div(q)


class _CompExpr(Expr):
    def __init__(self, a: Expr, i: int):
        self.a, self.i = a, i
        self.mesh = a.mesh
        self.value_size = 1

    def evaluate(self, q):
        return self.a.evaluate(q)[..., self.i : self.i + 1]


def as_expr(obj, mesh=None) -> Expr:
    if isinstance(obj, Expr):
        return obj
    if isinstance(obj, Function):
        return _FuncExpr(obj)
    if callable(obj):
        return _CallableExpr(obj, mesh)
    raise TypeError(f"cannot interpret {obj!r} as expression")


def expr_from_callable(fn, mesh, value_size=1) -> Expr:
    return _CallableExpr(fn, mesh, value_size)


def grad(f: Function) -> Expr:
    return _GradExpr(f)


def div(f) -> Expr:
    if isinstance(f, Function):
        return _DivExpr(f)
    raise TypeError("div() of non-Function expressions not supported")


def comp(e, i: int) -> Expr:
    return _CompExpr(as_expr(e), i)


class _CellScale(Expr):
    """Per-cell scaling (e.g. a DG0 diffusion coefficient)."""

    def __init__(self, a: Expr, values):
        self.a = a
        self.values = jnp.asarray(values)
        self.mesh = a.mesh
        self.value_size = a.value_size

    def evaluate(self, q):
        return self.values[:, None, None] * self.a.evaluate(q)

    def evaluate_div(self, q):
        return self.values[:, None, None] * self.a.evaluate_div(q)


def cell_scale(e, values) -> Expr:
    """Scale an expression by a per-cell constant array (ncells,)."""
    return _CellScale(as_expr(e), values)


class _VectorExpr(Expr):
    def __init__(self, comps):
        self.comps = comps
        self.mesh = comps[0].mesh
        self.value_size = len(comps)

    def evaluate(self, q):
        return jnp.concatenate([c.evaluate(q) for c in self.comps], axis=-1)


def as_vector(components, mesh=None) -> Expr:
    """Stack scalar expressions into a vector expression (the role of
    ufl.as_vector in the reference demos)."""
    return _VectorExpr([as_expr(c, mesh) for c in components])
