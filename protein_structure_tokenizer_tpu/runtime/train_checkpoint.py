"""Orbax-backed training checkpoints with resume.

The reference has load-only inference checkpointing and no resume
(SURVEY.md §5.3-5.4); training in this framework checkpoints the full train
state — params, optimizer state, step, RNG key — atomically via orbax, with
retention and a latest-step query for restart-after-preemption.  Multi-host
safe: orbax coordinates the distributed commit across processes.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

logger = logging.getLogger(__name__)


class TrainCheckpointManager:
    """Save/restore (params, opt_state, rng) keyed by step."""

    def __init__(self, directory: str, *, max_to_keep: int = 3, save_every: int = 1000):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.save_every = save_every
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def save(self, step: int, params, opt_state, rng, *, force: bool = False) -> bool:
        if not force and self.save_every > 0 and step % self.save_every != 0:
            return False
        if step in self.manager.all_steps():
            # Idempotent: a final/preemption force-save of a step the periodic
            # gate already wrote must not raise StepAlreadyExistsError.
            return False
        state = {"params": params, "opt_state": opt_state, "rng": rng}
        saved = self.manager.save(
            step, args=self._ocp.args.Composite(state=self._ocp.args.StandardSave(state))
        )
        if saved:
            logger.info("checkpointed step %d -> %s", step, self.directory)
        return bool(saved)

    def restore(
        self, params_template, opt_state_template, rng_template, step: Optional[int] = None
    ) -> Optional[Tuple[int, Any, Any, Any]]:
        """Restore (step, params, opt_state, rng); None when no checkpoint.

        Templates (e.g. freshly initialized state) pin the tree structure,
        dtypes, and shardings of the restored arrays.
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        template: Dict[str, Any] = {
            "params": params_template,
            "opt_state": opt_state_template,
            "rng": rng_template,
        }
        restored = self.manager.restore(
            step,
            args=self._ocp.args.Composite(state=self._ocp.args.StandardRestore(template)),
        )["state"]
        logger.info("restored checkpoint at step %d from %s", step, self.directory)
        return step, restored["params"], restored["opt_state"], restored["rng"]

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()
