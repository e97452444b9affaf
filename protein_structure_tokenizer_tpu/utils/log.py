"""Logging setup + tensor debug hook.

Parity with the reference's observability surface
(structure_tokenizer/utils/log.py:23-51 and scripts/lm/utils.py:50-64):
env-var-controlled level (``LOG_LEVEL``), a process-identifying format, and
``debug_log_tensor`` for tracing tensor shapes/dtypes at DEBUG level.  Ours
additionally tags multi-host runs with the jax process index so interleaved
pod logs remain attributable.

One configuration path: every CLI calls :func:`setup_logging` (re-exported by
``cli.common``), which installs a root ``basicConfig`` whose format includes a
``%(host)s`` field resolved LAZILY per record by :class:`HostIndexFilter` —
import-time configuration therefore still reports the right index after a
later ``jax.distributed.initialize()``.
"""
from __future__ import annotations

import logging
import os


def _jax_process_index() -> int:
    """Current process index, resolved at record-emit time.

    Uses the public ``jax.process_index()`` only once the distributed system
    is live (calling it earlier would force backend init); falls back to
    ``CLOUD_TPU_TASK_ID`` (set by the TPU runtime on pod workers), else 0.
    """
    try:
        import jax

        if getattr(jax._src.distributed.global_state, "client", None) is not None:
            return jax.process_index()
    except Exception:
        pass
    return int(os.environ.get("CLOUD_TPU_TASK_ID", "0") or "0")


class HostIndexFilter(logging.Filter):
    """Stamps ``record.host`` lazily so multi-host runs log the index that is
    current WHEN the record is emitted, not when logging was configured."""

    def filter(self, record: logging.LogRecord) -> bool:
        record.host = _jax_process_index()
        return True


_host_filter = HostIndexFilter()


def setup_logging(level: str | None = None) -> None:
    """Root logging config shared by every entry point (idempotent)."""
    logging.basicConfig(
        level=level or os.environ.get("LOG_LEVEL", "INFO"),
        format="%(asctime)s pid=%(process)d host=%(host)s %(name)s %(levelname)s: %(message)s",
    )
    for handler in logging.getLogger().handlers:
        if _host_filter not in handler.filters:
            handler.addFilter(_host_filter)


_warned_once: set = set()


def warn_once(logger: logging.Logger, key: str, msg: str, *args) -> None:
    """Emit a WARNING only the first time ``key`` is seen in this process —
    for per-call-site conditions (e.g. a requested fast path being disabled)
    that would otherwise spam once per jit trace."""
    if key in _warned_once:
        return
    _warned_once.add(key)
    logger.warning(msg, *args, stacklevel=2)


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
