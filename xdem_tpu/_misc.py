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


def diff_environment_yml(
    fn_env: Any, fn_devenv: Any, print_dep: str = "both", input_dict: bool = False
) -> None:
    """Print the dependencies present in a dev environment file but not the base one, for CI
    setup scripts to capture (role parity with reference _misc.py:214-298).

    Checks that every base-env dependency also appears in the dev env (raises otherwise).
    Conda dependencies are plain list entries; a trailing ``{"pip": [...]}`` dict holds pip
    ones (an editable self-install ``-e ./`` is ignored). Output is one space-joined line per
    requested channel — conda first, then pip; an empty pip diff prints ``None`` so shell
    scripts read a stable token.

    :param fn_env: Path to the base environment.yml (or its dict when ``input_dict``).
    :param fn_devenv: Path to the dev environment.yml (or its dict when ``input_dict``).
    :param print_dep: Which channel(s) to print: "conda", "pip" or "both".
    :param input_dict: Interpret the first two arguments as already-loaded dicts.
    """
    import copy as _copy

    if print_dep not in ("both", "conda", "pip"):
        raise ValueError('The argument "print_dep" can only be "conda", "pip" or "both".')

    if input_dict:
        env, devenv = _copy.deepcopy(fn_env), _copy.deepcopy(fn_devenv)
    else:
        yaml = import_optional("yaml", package_name="pyyaml")
        with open(fn_env) as f:
            env = yaml.safe_load(f)
        with open(fn_devenv) as f:
            devenv = yaml.safe_load(f)

    conda_env = list(env["dependencies"])
    conda_devenv = list(devenv["dependencies"])

    def _pop_pip(deps: list[Any]) -> list[str]:
        if deps and isinstance(deps[-1], dict):
            pip = list(deps.pop()["pip"])
            if "-e ./" in pip:
                pip.remove("-e ./")
            return pip
        return []

    pip_devenv = _pop_pip(conda_devenv)
    pip_env = _pop_pip(conda_env)

    if pip_devenv or pip_env:
        pip_only_in_env = sorted(set(pip_env) - set(pip_devenv))
        if pip_only_in_env:
            raise ValueError(
                "The following pip dependencies are listed in env but not dev-env: "
                + ",".join(pip_only_in_env)
            )
        pip_diff = sorted(set(pip_devenv) - set(pip_env))
    else:
        pip_diff = []

    conda_only_in_env = sorted(set(conda_env) - set(conda_devenv))
    if conda_only_in_env:
        raise ValueError(
            "The following dependencies are listed in env but not dev-env: "
            + ",".join(conda_only_in_env)
        )
    conda_diff = sorted(set(conda_devenv) - set(conda_env))

    if print_dep in ("both", "conda"):
        print(" ".join(conda_diff))
    if print_dep in ("both", "pip"):
        print(" ".join(pip_diff) if pip_diff else "None")


def copy_doc(module: Any, name: str | None = None) -> Callable[[Callable[..., T]], Callable[..., T]]:
    """Copy the docstring of `module.<name>` onto the decorated function/method."""

    def decorator(func: Callable[..., T]) -> Callable[..., T]:
        source = getattr(module, name or func.__name__, None)
        if source is not None and source.__doc__:
            func.__doc__ = source.__doc__
        return func

    return decorator
