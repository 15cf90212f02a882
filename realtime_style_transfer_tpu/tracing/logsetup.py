"""Logging configuration: colored console, per-run logfile, stderr rate limiting.

Functional parity with the reference's ``tracing/logsetup.py`` (ANSI color console
formatter with per-level formats, ``enable_logfile(log_dir)``, a rate-limited stderr
tee, third-party logger squelching) — wired explicitly via ``setup()`` instead of
import side effects (the reference configures the root logger on package import,
``realtime_style_transfer/__init__.py:1``; we keep imports pure).
"""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path

RESET = "\x1b[0m"
COLORS = {
    logging.DEBUG: "\x1b[38;5;245m",   # grey
    logging.INFO: "\x1b[38;5;39m",     # blue
    logging.WARNING: "\x1b[38;5;214m", # orange
    logging.ERROR: "\x1b[31m",         # red
    logging.CRITICAL: "\x1b[41m",      # red background
}

_configured = False


class ColorFormatter(logging.Formatter):
    """Per-level colored formats: terse for INFO, detailed for WARNING+."""

    def format(self, record: logging.LogRecord) -> str:
        if record.levelno >= logging.WARNING:
            fmt = "%(asctime)s %(levelname)s %(name)s:%(lineno)d | %(message)s"
        else:
            fmt = "%(asctime)s %(levelname)s | %(message)s"
        color = COLORS.get(record.levelno, "")
        return color + logging.Formatter(fmt).format(record) + RESET


class RateLimitedStream:
    """stderr tee that drops duplicate bursts (reference logsetup.py:8-35 role)."""

    def __init__(self, wrapped, min_interval_s: float = 0.25):
        self._wrapped = wrapped
        self._min_interval = min_interval_s
        self._last_write = 0.0
        self._last_msg = None
        self._suppressed = 0

    def write(self, msg):
        now = time.monotonic()
        if msg == self._last_msg and (now - self._last_write) < self._min_interval:
            self._suppressed += 1
            return
        if self._suppressed:
            self._wrapped.write(f"[{self._suppressed} duplicate lines suppressed]\n")
            self._suppressed = 0
        self._last_msg = msg
        self._last_write = now
        self._wrapped.write(msg)

    def flush(self):
        self._wrapped.flush()

    def __getattr__(self, name):
        return getattr(self._wrapped, name)


NOISY_LOGGERS = ("jax._src", "orbax", "absl", "PIL")


def _apply_platform_env() -> None:
    """Honor RST_PLATFORM=cpu|tpu|axon for CLI runs.

    The machine-level axon sitecustomize pins JAX_PLATFORMS before user code runs,
    so a plain env var cannot redirect scripts to CPU (tests, headless boxes); this
    hook re-applies the choice through jax.config before any backend initializes.
    """
    import os

    platform = os.environ.get("RST_PLATFORM")
    if not platform:
        return
    os.environ["JAX_PLATFORMS"] = platform
    try:
        import jax

        jax.config.update("jax_platforms", platform)
    except Exception:  # pragma: no cover — backend already initialized
        pass


def setup(level: int = logging.INFO, rate_limit_stderr: bool = False) -> None:
    """Configure the root logger once (idempotent); honors RST_PLATFORM."""
    global _configured
    _apply_platform_env()
    if _configured:
        return
    handler = logging.StreamHandler(
        RateLimitedStream(sys.stderr) if rate_limit_stderr else sys.stderr
    )
    handler.setFormatter(ColorFormatter())
    root = logging.getLogger()
    root.setLevel(level)
    root.addHandler(handler)
    for name in NOISY_LOGGERS:
        logging.getLogger(name).setLevel(logging.WARNING)
    _configured = True


def enable_logfile(log_dir) -> Path:
    """Attach a plain-text file handler under ``log_dir`` (logsetup.py:38-42)."""
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    logfile = log_dir / "log.txt"
    fh = logging.FileHandler(logfile)
    fh.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s | %(message)s")
    )
    logging.getLogger().addHandler(fh)
    return logfile
