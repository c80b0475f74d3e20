"""Small shared utilities: optional imports, deprecation, doc copying, progress.

Role parity with the reference's misc module (/root/reference/xdem/_misc.py): tqdm-or-noop
progress, `import_optional`, `deprecate`, `copy_doc`.
"""

from __future__ import annotations

import functools
import logging
import warnings
from typing import Any, Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")


def import_optional(name: str, package_name: str | None = None) -> Any:
    """Import an optional dependency, raising an informative error when absent."""
    import importlib

    try:
        return importlib.import_module(name)
    except ImportError as err:
        raise ImportError(
            f"Optional dependency '{package_name or name}' is required for this functionality. "
            f"Install it to proceed."
        ) from err


def get_progress(iterable: Iterable[T], total: int | None = None, desc: str | None = None) -> Iterator[T]:
    """Return a tqdm progress iterator at INFO logging level and below, else the bare iterable."""
    if logging.getLogger().getEffectiveLevel() <= logging.INFO:
        try:
            from tqdm import tqdm

            return iter(tqdm(iterable, total=total, desc=desc))
        except ImportError:
            pass
    return iter(iterable)


class DeprecationError(ValueError):
    """Raised when calling functionality past its removal version (a ValueError so callers
    matching the reference's ValueError still catch it; reference _misc.py:144 raises
    ValueError directly)."""


def deprecate(removal_version: str | None = None, details: str | None = None) -> Callable[[Callable[..., T]], Callable[..., T]]:
    """Mark a function as deprecated: warns on call, mentioning the removal version; once
    the package version reaches ``removal_version``, calling raises instead (reference
    _misc.py:92-151)."""

    def _ver(v: str) -> tuple[int, ...]:
        # Base-version parse: leading digits of each dot component ('0.2.0rc1+local' ->
        # (0, 2, 0)), the stdlib-free analog of packaging's Version().base_version
        import re

        parts = []
        for p in v.split(".")[:3]:
            m = re.match(r"\d+", p)
            if m is None:
                break
            parts.append(int(m.group()))
        return tuple(parts)

    def decorator(func: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(func)
        def wrapper(*args: Any, **kwargs: Any) -> T:
            import xdem_tpu

            current = _ver(xdem_tpu.__version__)
            should_warn = removal_version is None or _ver(removal_version) > current
            if should_warn:
                msg = f"Call to deprecated function '{func.__name__}'."
            else:
                msg = f"Deprecated function '{func.__name__}' was removed in {removal_version}."
            if details is not None:
                msg += f" {details}"
            if should_warn and removal_version is not None:
                msg += f" This functionality will be removed in version {removal_version}."
            elif not should_warn:
                msg += f" Current version: {xdem_tpu.__version__}."
            if should_warn:
                warnings.warn(msg, DeprecationWarning, stacklevel=2)
            else:
                raise DeprecationError(msg)
            return func(*args, **kwargs)

        return wrapper

    return decorator


def copy_doc(module: Any, name: str | None = None) -> Callable[[Callable[..., T]], Callable[..., T]]:
    """Copy the docstring of `module.<name>` onto the decorated function/method."""

    def decorator(func: Callable[..., T]) -> Callable[..., T]:
        source = getattr(module, name or func.__name__, None)
        if source is not None and source.__doc__:
            func.__doc__ = source.__doc__
        return func

    return decorator
