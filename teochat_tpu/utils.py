"""Misc host utilities (reference videollava/utils.py).

Only the pieces the active TEOChat paths exercise are rebuilt: `order_pick_k`
(random order-preserving subsample, utils.py:18-29) and a rotating-file logger
(utils.py:32-105). The moderation/heartbeat leftovers are dead code in the
reference and intentionally omitted.
"""

from __future__ import annotations

import logging
import logging.handlers
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def order_pick_k(lst: Sequence, k: int) -> Tuple[List, Optional[List[int]]]:
    """Randomly subsample ``k`` items from ``lst`` preserving original order.

    Returns ``(items, sorted_indices)``; indices are ``None`` when no subsampling
    happened (reference utils.py:18-29).
    """
    if len(lst) <= k:
        return list(lst), None
    scores = np.random.random(len(lst))
    index_sort = sorted(np.argsort(scores)[:k].tolist())
    return [lst[i] for i in index_sort], index_sort


_handler = None


def build_logger(logger_name: str, logger_filename: str, log_dir: str = ".") -> logging.Logger:
    """Rotating-file logger shared across the process (reference utils.py:32-105)."""
    global _handler

    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    root = logging.getLogger()
    if not root.handlers:
        logging.basicConfig(level=logging.INFO)
    for h in root.handlers:
        h.setFormatter(formatter)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)

    if _handler is None:
        os.makedirs(log_dir, exist_ok=True)
        filename = os.path.join(log_dir, logger_filename)
        _handler = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", utc=True, encoding="utf-8"
        )
        _handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(_handler)
    return logger


def rank0_print(*args, **kwargs) -> None:
    """Print only on process index 0 (reference train.py:43-45 equivalent)."""
    import jax

    if jax.process_index() == 0:
        print(*args, **kwargs)


class profile_trace:
    """jax.profiler trace context (SURVEY §5 tracing plan: Perfetto-viewable
    traces via a --profile_dir flag on the train/eval drivers). No-op when
    `profile_dir` is None."""

    def __init__(self, profile_dir):
        self.profile_dir = profile_dir

    def __enter__(self):
        if self.profile_dir:
            import jax

            jax.profiler.start_trace(self.profile_dir)
        return self

    def __exit__(self, *exc):
        if self.profile_dir:
            import jax

            jax.profiler.stop_trace()
        return False
