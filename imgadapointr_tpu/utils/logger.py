"""Process-aware logging (reference utils/logger.py:6-127).

Process 0 gets console + optional file handlers; other processes are
silenced to ERROR (multi-host analog of the reference's rank-aware logger).
"""

from __future__ import annotations

import logging

logger_initialized: dict[str, bool] = {}


def get_root_logger(log_file=None, log_level=logging.INFO, name="ImgAdaPoinTr"):
    return get_logger(name=name, log_file=log_file, log_level=log_level)


def get_logger(name, log_file=None, log_level=logging.INFO, process_index=None):
    logger = logging.getLogger(name)
    if name in logger_initialized:
        return logger
    for logger_name in logger_initialized:
        if name.startswith(logger_name):
            return logger

    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0

    stream_handler = logging.StreamHandler()
    handlers = [stream_handler]
    if process_index == 0 and log_file is not None:
        handlers.append(logging.FileHandler(log_file, "w"))

    formatter = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    for handler in handlers:
        handler.setFormatter(formatter)
        handler.setLevel(log_level)
        logger.addHandler(handler)

    logger.setLevel(log_level if process_index == 0 else logging.ERROR)
    logger.propagate = False
    logger_initialized[name] = True
    return logger


def print_log(msg, logger=None, level=logging.INFO):
    if logger is None:
        print(msg)
    elif isinstance(logger, logging.Logger):
        logger.log(level, msg)
    elif logger == "silent":
        pass
    elif isinstance(logger, str):
        get_logger(logger).log(level, msg)
    else:
        raise TypeError(f"invalid logger {logger}")
