"""Supervised subprocess execution.

Counterpart of the reference's SubprocessManager
(/root/reference/structure_tokenizer/data/tools/utils.py:31-85): run an
external tool with a timeout, kill it on SIGTERM/SIGINT, and return
(success, error_message, stdout).
"""
from __future__ import annotations

import os
import signal
import subprocess
import sys
from typing import List, Optional, Tuple


class SubprocessManager:
    """Runs one external command at a time under signal supervision."""

    def __init__(self, exit_on_sigint: bool = True) -> None:
        self.exit_on_sigint = exit_on_sigint
        self._process: Optional[subprocess.Popen] = None
        signal.signal(signal.SIGTERM, self._kill_subprocess)
        signal.signal(signal.SIGINT, self._kill_subprocess)

    def _kill_subprocess(self, signal_nb, frame) -> None:
        if self._process is not None:
            self._process.kill()
            self._process.wait()
        if self.exit_on_sigint and signal_nb == int(signal.SIGINT):
            sys.exit(0)

    def run(
        self, command: List[str], timeout: float = 60.0
    ) -> Tuple[bool, str, Optional[bytes]]:
        self._process = subprocess.Popen(
            command,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=os.environ.copy(),
        )
        try:
            stdout, stderr = self._process.communicate(timeout=timeout)
            retcode = self._process.returncode
            self._process = None
        except subprocess.TimeoutExpired:
            self._kill_subprocess(None, None)
            return False, f"Timeout of {round(timeout, 1)} expired", None

        if retcode != 0:
            return (
                False,
                f"Process exited with exit code {retcode}, stderr: {stderr!r}, "
                f"stdout: {stdout!r}",
                None,
            )
        return True, "", stdout
