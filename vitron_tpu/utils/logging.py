"""Logging: rotating file handler + stream redirection + rank-0 gating.

Rebuilds the reference logger (reference: vitron/utils.py:32-105
build_logger/StreamToLogger and train.py:48-50 rank0_print) with
multi-host awareness via jax.process_index().
"""
from __future__ import annotations

import logging
import logging.handlers
import os
import sys
from typing import Optional

_handler: Optional[logging.Handler] = None

LOGDIR = os.environ.get("VITRON_LOGDIR", ".")


def build_logger(logger_name: str, logger_filename: str,
                 redirect_streams: bool = False) -> logging.Logger:
    """Console + daily-rotating file logger (utils.py:32-73). Optionally
    redirect stdout/stderr into it (the reference always does; here opt-in
    so interactive sessions stay usable)."""
    global _handler

    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")

    root = logging.getLogger()
    if not root.handlers:
        logging.basicConfig(level=logging.INFO)
    for h in root.handlers:
        h.setFormatter(formatter)

    if _handler is None:
        os.makedirs(LOGDIR, exist_ok=True)
        filename = os.path.join(LOGDIR, logger_filename)
        _handler = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", utc=True)
        _handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(_handler)
        root.addHandler(_handler)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    if _handler not in logger.handlers:
        logger.addHandler(_handler)

    if redirect_streams:
        sys.stdout = StreamToLogger(logger, logging.INFO)
        sys.stderr = StreamToLogger(logger, logging.ERROR)
    return logger


class StreamToLogger:
    """File-like object routing writes into a logger (utils.py:75-105)."""

    def __init__(self, logger: logging.Logger, log_level=logging.INFO):
        self.terminal = sys.stdout
        self.logger = logger
        self.log_level = log_level
        self.linebuf = ""

    def __getattr__(self, attr):
        return getattr(self.terminal, attr)

    def write(self, buf):
        temp = self.linebuf + buf
        self.linebuf = ""
        for line in temp.splitlines(True):
            if line.endswith("\n"):
                self.logger.log(self.log_level, line.rstrip())
            else:
                self.linebuf += line

    def flush(self):
        if self.linebuf:
            self.logger.log(self.log_level, self.linebuf.rstrip())
        self.linebuf = ""


def rank0_print(*args, **kwargs) -> None:
    """Print only on host 0 (train.py:48-50's local_rank gate, expressed as
    jax.process_index)."""
    try:
        import jax

        if jax.process_index() != 0:
            return
    except Exception:
        pass
    print(*args, **kwargs)
