"""Colored console logger.

Capability parity with reference ppasr/utils/logger.py:20-89 (singleton per
name, colored level formatting), implemented with plain ANSI escapes so there
is no termcolor dependency.
"""
import logging
import os
import sys

_LOGGERS = {}

_COLORS = {
    logging.DEBUG: "\033[37m",     # white
    logging.INFO: "\033[32m",      # green
    logging.WARNING: "\033[33m",   # yellow
    logging.ERROR: "\033[31m",     # red
    logging.CRITICAL: "\033[35m",  # magenta
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def __init__(self, use_color: bool):
        super().__init__(fmt="[%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s",
                         datefmt="%Y-%m-%d %H:%M:%S")
        self.use_color = use_color

    def format(self, record):
        msg = super().format(record)
        if self.use_color:
            color = _COLORS.get(record.levelno, "")
            return f"{color}{msg}{_RESET}"
        return msg


def setup_logger(name: str = "ppasr_tpu", level=logging.INFO) -> logging.Logger:
    """Return a configured singleton logger for ``name``."""
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        use_color = sys.stdout.isatty() and os.environ.get("NO_COLOR") is None
        handler.setFormatter(_ColorFormatter(use_color))
        logger.addHandler(handler)
    _LOGGERS[name] = logger
    return logger
