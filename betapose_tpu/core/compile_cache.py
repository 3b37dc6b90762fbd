"""Persistent XLA compilation cache for the CLI entry points.

The reference stack (torch/CUDA, `3_6Dpose_estimator/betapose_evaluate.py`)
pays no ahead-of-time compile cost; the TPU build does — the fused pose
pipeline's first XLA compile through the remote tunnel takes 1-3 minutes.
JAX can persist serialized executables on disk and reload them across
processes, which turns every CLI start after the first into a sub-second
cache hit (verified against the axon remote-compile backend).

Every `main()` in the package calls :func:`enable_compile_cache` before
building graphs.  Users opt out (or relocate the cache) with the
``BETAPOSE_COMPILE_CACHE`` environment variable.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/betapose_tpu/xla")

_OFF_VALUES = {"0", "off", "none", "false", "disable", "disabled"}


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Resolution order: explicit ``cache_dir`` argument, then the
    ``BETAPOSE_COMPILE_CACHE`` env var (a directory path, or one of
    ``0/off/none/false/disable(d)`` to turn the cache off), then
    ``~/.cache/betapose_tpu/xla``.

    Returns the directory in use, or ``None`` when disabled (including
    when the directory cannot be created).  Safe to call repeatedly and
    either before or after JAX backend initialization; only executables
    whose compile time exceeds JAX's persistence threshold (default 1 s)
    are written, so unit-test-sized graphs don't bloat the cache.
    """
    env = os.environ.get("BETAPOSE_COMPILE_CACHE")
    if cache_dir is None and env is not None and env.strip().lower() in _OFF_VALUES:
        return None
    path = cache_dir or env or DEFAULT_CACHE_DIR
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    return path
