"""Debug / sanitizer mode.

The reference's debugging story is GPU_CHECK_ERRORS_SYNC — a
cudaDeviceSynchronize after every launch (launch_utils.h:7-44) — plus NaN
sentinels flowing through every image. SURVEY.md §5 maps that to JAX's two
mechanisms, wired here behind one switch:

* ``debug_mode(True)`` / ``with debug_mode():`` — flips
  ``jax_debug_nans``, so any NaN PRODUCED inside a jitted computation
  re-runs un-jitted and raises with the exact primitive that made it (the
  sanitizer analogue). NaN *sentinels* (invalid depth) are data, not bugs:
  code under this mode must route them through masks, which the ops in
  this package already do.
* :func:`checked` — wraps a function with ``jax.experimental.checkify`` so
  NaN/Inf production and out-of-bounds indexing become *returned* errors
  (collectable in compiled code, no host sync) — the production-friendly
  variant.
"""
from __future__ import annotations

import contextlib
import functools

import jax
from jax.experimental import checkify as _checkify


class debug_mode(contextlib.ContextDecorator):
    """Enable jax_debug_nans globally (call style) or scoped (with style).

    >>> debug_mode(True)         # until debug_mode(False)
    >>> with debug_mode(): ...   # scoped
    """

    def __init__(self, enable: bool | None = None):
        self._prev = None
        if enable is not None:
            jax.config.update("jax_debug_nans", bool(enable))

    def __enter__(self):
        self._prev = jax.config.jax_debug_nans
        jax.config.update("jax_debug_nans", True)
        return self

    def __exit__(self, *exc):
        jax.config.update("jax_debug_nans", self._prev)
        return False


def checked(fn, errors=_checkify.float_checks | _checkify.user_checks):
    """Wrap ``fn`` with checkify: returns (err, out); ``err.throw()`` raises
    with the location of the first NaN/Inf (float_checks), a failing
    ``checkify.check``/:func:`assert_all_finite` (user_checks), or OOB
    indexing (add index_checks). Works inside jit, unlike debug_nans."""
    cf = _checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        return cf(*args, **kwargs)

    return wrapper


def assert_all_finite(x, name: str = "value"):
    """checkify.check that every element of ``x`` is finite — drop-in guard
    for pipeline boundaries where NaN must mean 'invalid pixel', never
    'poisoned math'."""
    import jax.numpy as jnp

    _checkify.check(jnp.all(jnp.isfinite(x)), f"{name} contains non-finite values")
