"""Leveled, colored logging (dwt_util_log analogue).

The reference ships an ANSI-colored, flockfile-serialized stderr logger
with levels NONE/FATAL/ERROR/WARN/INFO/DBG and an aborting error helper
(/root/reference/src/libdwt.c:20232-20421).  Here that maps onto the
stdlib ``logging`` with an ANSI formatter; ``fatal`` mirrors
dwt_util_error's log-and-abort contract.
"""
from __future__ import annotations

import logging
import sys
from typing import NoReturn

__all__ = ["get_logger", "fatal", "set_level"]

_COLORS = {
    logging.DEBUG: "\033[37m",      # white
    logging.INFO: "\033[32m",       # green
    logging.WARNING: "\033[33m",    # yellow
    logging.ERROR: "\033[31m",      # red
    logging.CRITICAL: "\033[1;31m", # bold red
}
_RESET = "\033[0m"


class _AnsiFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        if sys.stderr.isatty():
            color = _COLORS.get(record.levelno, "")
            return f"{color}{msg}{_RESET}"
        return msg


_logger: logging.Logger | None = None


def get_logger() -> logging.Logger:
    global _logger
    if _logger is None:
        lg = logging.getLogger("libdwt_tpu")
        if not lg.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(_AnsiFormatter("%(levelname)s %(name)s: %(message)s"))
            lg.addHandler(h)
            lg.setLevel(logging.INFO)
            # dedicated handler attached: don't also bubble to root
            # (an app's basicConfig would print every line twice)
            lg.propagate = False
        _logger = lg
    return _logger


def set_level(level) -> None:
    get_logger().setLevel(level)


def fatal(msg: str, *args) -> NoReturn:
    """Log and abort (dwt_util_error, /root/reference/src/libdwt.c:20410)."""
    get_logger().critical(msg, *args)
    raise SystemExit(1)
