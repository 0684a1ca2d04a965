"""Numerical sanitizers — the TPU-native analogue of the reference's
sanitizer tooling (reference `tests/asan_suppressions.txt` suppresses known
GL-driver leaks under ASan; a JAX program has no malloc to sanitize, its
failure mode is numerical: NaN/Inf silently propagating through a jitted
pipeline and poisoning a whole dataset).

Three layers, all opt-in (zero cost when off):

1. ``debug_nans()`` — context manager over ``jax_debug_nans``: XLA re-runs
   any op producing a NaN op-by-op and raises at the source. The big hammer
   (de-optimizes everything under it); use to localize, not in production.
2. ``check_finite(tree, name)`` — eager device-side finiteness reduction per
   pytree leaf (one scalar readback per leaf, NOT a buffer readback); raises
   ``NonFiniteError`` naming every offending leaf path with its NaN/Inf
   counts.
3. ``checked(fn)`` — ``jax.experimental.checkify`` wrapper with float
   checks: NaNs are detected INSIDE the compiled program and surfaced as a
   Python error after the step, compatible with jit/vmap/scan (works where
   ``jax_debug_nans`` cannot, e.g. under ``lax.scan``).

Pipeline plumbing: ``SL_SANITIZE=1`` makes ``RenderPass.render`` and the
batched settle path run ``check_finite`` on their float outputs every call
(each check syncs the device, so it costs a dispatch bubble — a debug mode,
like the reference running under ASan).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Any, Callable

import jax
import jax.numpy as jnp


class NonFiniteError(FloatingPointError):
    """Raised by :func:`check_finite`; carries per-leaf NaN/Inf counts."""

    def __init__(self, name: str, bad: list[tuple[str, int, int]]):
        self.name = name
        self.bad = bad  # [(leaf_path, nan_count, inf_count), ...]
        lines = ", ".join(
            f"{path}: {n_nan} NaN / {n_inf} Inf" for path, n_nan, n_inf in bad
        )
        super().__init__(f"non-finite values in {name}: {lines}")


def enabled() -> bool:
    """True when the ``SL_SANITIZE`` env knob asks for pipeline checks."""
    return os.environ.get("SL_SANITIZE", "0") not in ("0", "")


@contextmanager
def debug_nans(enable: bool = True):
    """Scoped ``jax_debug_nans`` toggle (restores the previous value)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def _leaf_counts(a) -> tuple[int, int] | None:
    """(nan_count, inf_count) for one float leaf; None for non-float."""
    a = jnp.asarray(a)
    if not jnp.issubdtype(a.dtype, jnp.floating):
        return None
    # device-side reductions; only two scalars cross the link
    n_nan = int(jnp.isnan(a).sum())
    n_inf = int(jnp.isinf(a).sum())
    return n_nan, n_inf


def check_finite(tree: Any, name: str = "output", raise_: bool = True):
    """Assert every float leaf of ``tree`` is finite.

    Returns the list of offenders ``[(path, nan_count, inf_count), ...]``
    (empty when clean); raises :class:`NonFiniteError` instead when
    ``raise_`` (the default).
    """
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    bad: list[tuple[str, int, int]] = []
    for path, leaf in leaves:
        counts = _leaf_counts(leaf)
        if counts is None:
            continue
        n_nan, n_inf = counts
        if n_nan or n_inf:
            bad.append((jax.tree_util.keystr(path), n_nan, n_inf))
    if bad and raise_:
        raise NonFiniteError(name, bad)
    return bad


def checked(fn: Callable, *, nan: bool = True, div: bool = True,
            oob: bool = False) -> Callable:
    """Wrap ``fn`` so float errors raised INSIDE jit surface as Python
    errors: returns a callable with the same signature whose result is the
    unwrapped output; call ``.throw()`` happens internally every call."""
    from jax.experimental import checkify as ck

    errs = frozenset()
    if nan:
        errs = errs | ck.nan_checks
    if div:
        errs = errs | ck.div_checks
    if oob:
        errs = errs | ck.index_checks
    cfn = ck.checkify(fn, errors=errs)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    wrapper.__name__ = getattr(fn, "__name__", "checked_fn")
    return wrapper
