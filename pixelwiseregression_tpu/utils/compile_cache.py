"""Persistent XLA compilation cache for the CLIs and serving.

The first TPU compile of the fused train step costs ~3-4 minutes through
the remote compile service, and every CLI invocation repays it from
scratch (the reference has no equivalent problem — torch eager has no
compile step). jax's persistent compilation cache stores serialized
executables keyed on (HLO, compile options, backend version), so repeat
invocations of the same config load in seconds instead of recompiling.

Enabled by default from every entry point (train/test CLIs, bench,
Predictor). Opt-out: ``PWR_COMPILE_CACHE=0`` or ``--no_compile_cache``.
Cache dir: ``PWR_COMPILE_CACHE_DIR`` or ``~/.cache/pixelwiseregression_tpu/xla``.

Fail-soft by design: backends that cannot serialize executables simply
miss the cache (jax logs at debug level), and any config/IO error leaves
the process running uncached rather than dead.
"""

from __future__ import annotations

import os
import warnings

_DEFAULT_DIR = "~/.cache/pixelwiseregression_tpu/xla"
_enabled_path: str | None = None


def _host_tag() -> str:
    """Stable fingerprint of this host's CPU feature set (first 'flags'
    line of /proc/cpuinfo; falls back to the uname machine string)."""
    import hashlib
    import platform

    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    ident = line
                    break
    except OSError:
        pass
    return hashlib.sha1(ident.encode()).hexdigest()[:10]


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at ``path`` (idempotent).

    Returns the cache directory, or None when disabled/unavailable. Only
    compiles slower than 1s are persisted — tiny host-side jits would
    otherwise bloat the cache for no win.
    """
    global _enabled_path
    if os.environ.get("PWR_COMPILE_CACHE", "1") in ("0", "false", "no"):
        return None
    if _enabled_path is not None:
        return _enabled_path
    path = os.path.expanduser(
        path or os.environ.get("PWR_COMPILE_CACHE_DIR") or _DEFAULT_DIR
    )
    # Segregate by host CPU fingerprint: jax's cache key does NOT include
    # host machine features, and this environment can migrate across hosts
    # — a CPU AOT executable cached on one machine loads on another with
    # "could lead to SIGILL" errors (observed). A per-host subdir keeps
    # every hit safe; TPU executables lose nothing (the slow remote
    # compile is repaid within the same host anyway).
    # (XLA:CPU's AOT loader still prints "+prefer-no-scatter ... not
    # supported on the host machine" on SAME-host reloads — those two are
    # its own tuning preferences, not CPU features, and the executables
    # run fine; the per-host subdir is what guards the real SIGILL class.)
    path = os.path.join(path, _host_tag())
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # fail-soft: run uncached
        warnings.warn(
            f"persistent compilation cache unavailable "
            f"({type(e).__name__}: {e}); compiles will not be reused "
            f"across processes"
        )
        return None
    _enabled_path = path
    return path


def maybe_enable_from_args(args) -> str | None:
    """CLI hook: honor ``--no_compile_cache`` when the parser has it."""
    if getattr(args, "no_compile_cache", False):
        return None
    return enable_compile_cache()
