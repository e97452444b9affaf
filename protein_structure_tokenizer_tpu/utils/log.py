"""Logger factory + tensor debug hook.

Parity with the reference's observability surface
(structure_tokenizer/utils/log.py:23-51 and scripts/lm/utils.py:50-64):
env-var-controlled level (``LOG_LEVEL``), a process-identifying format, and
``debug_log_tensor`` for tracing tensor shapes/dtypes at DEBUG level.  Ours
additionally tags multi-host runs with the jax process index so interleaved
pod logs remain attributable.
"""
from __future__ import annotations

import logging
import os
import sys
from typing import Set

_configured_roots: Set[str] = set()


def _jax_process_index() -> int:
    """Process index without forcing backend init (0 if jax is not up)."""
    try:
        import jax

        # jax.process_index() initializes the backend; only call it when the
        # distributed system was explicitly initialized, else assume host 0.
        if getattr(jax._src.distributed.global_state, "client", None) is not None:
            return jax.process_index()
    except Exception:
        pass
    return int(os.environ.get("JAX_PROCESS_INDEX", "0"))


def get_logger(name: str) -> logging.Logger:
    """A logger whose root is configured once: stdout handler, timestamped
    format with OS pid + jax process index, level from ``LOG_LEVEL``."""
    root = name.split(".")[0]
    if root not in _configured_roots:
        logger = logging.getLogger(root)
        logger.propagate = False
        fmt = (
            "%(asctime)s | pid=%(process)d host={host} | %(levelname)s | "
            "%(module)s:%(funcName)s:%(lineno)d | %(message)s"
        ).format(host=_jax_process_index())
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(fmt=fmt, datefmt="%Y-%m-%d %H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("LOG_LEVEL", "INFO").upper() or "INFO")
        _configured_roots.add(root)
    return logging.getLogger(name)


def debug_log_tensor(name: str, tensor, logger: logging.Logger) -> None:
    """Log a tensor's name/shape/dtype at DEBUG level (shape metadata only —
    never the values, so it is safe inside jit tracing)."""
    logger.debug(
        "Tensor, Name = %s, Shape = %s, Dtype = %s",
        name,
        getattr(tensor, "shape", None),
        getattr(tensor, "dtype", None),
        stacklevel=2,
    )
