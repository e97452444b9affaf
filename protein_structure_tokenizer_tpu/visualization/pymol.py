"""PyMOL rendering wrappers.

Counterpart of /root/reference/structure_tokenizer/visualisation/
(invoke_pymol.py:20-44 plus the reconstruction/generation pymol scripts).
Instead of shipping separate script files, each renderer synthesizes a
self-contained PyMOL script and runs ``pymol -cq`` through the supervised
subprocess manager.  PyMOL is optional: callers get (success, message).
"""
from __future__ import annotations

import os
import shutil
import tempfile
from typing import List, Sequence, Tuple

from protein_structure_tokenizer_tpu.visualization.subprocess_utils import (
    SubprocessManager,
)

RENDER_SIZE = (1000, 1000)
RECONSTRUCTION_ROTATIONS = (0, 30, 60, 90, 120)


def pymol_available() -> bool:
    return shutil.which("pymol") is not None


def call_pymol(
    pymol_script_path: str, arguments: Sequence[str], timeout: float = 120.0
) -> Tuple[bool, str]:
    """Run ``pymol -cq <script> -- <arguments>`` (invoke_pymol.py:20-44)."""
    if not pymol_available():
        return False, "pymol not found on PATH"
    manager = SubprocessManager(exit_on_sigint=False)
    success, error_msg, stdout = manager.run(
        ["pymol", "-cq", pymol_script_path, "--", *arguments], timeout=timeout
    )
    if not success:
        return False, f"Failed to run PyMol script: {error_msg}"
    return True, (stdout or b"").decode("ascii", errors="replace")


def _run_script(script: str, timeout: float = 120.0) -> Tuple[bool, str]:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(script)
        path = f.name
    try:
        return call_pymol(path, [], timeout=timeout)
    finally:
        os.unlink(path)


def render_reconstruction(
    prediction_pdb: str,
    target_pdb: str,
    rotations: Sequence[int] = RECONSTRUCTION_ROTATIONS,
) -> Tuple[bool, List[str]]:
    """Superpose prediction (blue) on target (green); render y-rotations.

    Writes ``pymol_plot/superposition_angle<A>.png`` next to the prediction,
    like the reference's reconstruction/pymol_script.py.
    """
    out_dir = os.path.join(os.path.dirname(os.path.abspath(prediction_pdb)), "pymol_plot")
    os.makedirs(out_dir, exist_ok=True)
    w, h = RENDER_SIZE
    outs = [os.path.join(out_dir, f"superposition_angle{int(a)}.png") for a in rotations]
    lines = [
        "from pymol import cmd",
        f"cmd.load({prediction_pdb!r}); cmd.set_name(cmd.get_object_list()[-1], 'prediction')",
        "cmd.color('blue', 'prediction')",
        f"cmd.load({target_pdb!r}); cmd.set_name(cmd.get_object_list()[-1], 'target')",
        "cmd.color('green', 'target')",
        "cmd.align('prediction', 'target')",
    ]
    for angle, out in zip(rotations, outs):
        lines += [
            f"cmd.rotate('y', angle={int(angle)})",
            f"cmd.ray({w}, {h})",
            f"cmd.png({out!r}, {w}, {h})",
        ]
    lines.append("cmd.delete('all')")
    ok, msg = _run_script("\n".join(lines))
    return ok, outs if ok else [msg]


def render_generation(pdb_path: str, rotations: Sequence[int] = (0,)) -> Tuple[bool, List[str]]:
    """Render a generated structure (blue, centered), one PNG per rotation.

    Writes ``pymol_plot/angle<A>.png`` next to the input, like the reference's
    generation/pymol_script.py.
    """
    out_dir = os.path.join(os.path.dirname(os.path.abspath(pdb_path)), "pymol_plot")
    os.makedirs(out_dir, exist_ok=True)
    w, h = RENDER_SIZE
    outs = [os.path.join(out_dir, f"angle{int(a)}.png") for a in rotations]
    lines = [
        "from pymol import cmd",
        f"cmd.load({pdb_path!r}); cmd.set_name(cmd.get_object_list()[-1], 'sample')",
        "cmd.color('blue', 'sample')",
        "cmd.center('sample')",
        "cmd.zoom('sample', complete=0)",
    ]
    for angle, out in zip(rotations, outs):
        lines += [
            f"cmd.rotate('y', angle={int(angle)})",
            f"cmd.ray({w}, {h})",
            f"cmd.png({out!r}, {w}, {h})",
        ]
    lines.append("cmd.delete('all')")
    ok, msg = _run_script("\n".join(lines))
    return ok, outs if ok else [msg]
