"""Preemption-safe training (runtime/preemption.py): SIGTERM -> flag ->
checkpoint-at-step-boundary -> clean exit -> resume."""
import os
import signal
import subprocess
import sys
import threading
import time

import pytest

from protein_structure_tokenizer_tpu.runtime.preemption import GracefulPreemption


def test_flag_set_on_signal():
    with GracefulPreemption(signals=(signal.SIGUSR1,)) as pre:
        assert not pre.should_stop
        signal.raise_signal(signal.SIGUSR1)
        assert pre.should_stop
    # Handler restored on exit: a stray SIGUSR1 must not set a stale flag.
    pre2 = GracefulPreemption(signals=(signal.SIGUSR1,))
    assert not pre2.should_stop


def test_noop_off_main_thread():
    """Entering from a worker thread degrades to a never-set flag instead of
    raising (signal.signal is main-thread-only)."""
    result = {}

    def run():
        with GracefulPreemption(signals=(signal.SIGUSR1,)) as pre:
            result["stop"] = pre.should_stop

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert result == {"stop": False}


@pytest.mark.slow
def test_train_cli_sigterm_checkpoints_and_resumes(tmp_path):
    """Drive the real trainer: SIGTERM mid-run -> it saves a checkpoint and
    exits 0; a rerun resumes from the preemption checkpoint."""
    ckpt_dir = tmp_path / "ckpt"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    args = [
        sys.executable, "-m", "protein_structure_tokenizer_tpu.cli.train_lm",
        "--backend", "cpu",
        "--tokens_dir", str(tmp_path / "toks"),
        "--checkpoint_dir", str(ckpt_dir),
        "--codebook_size", "432",
        "--num_steps", "2000",  # far more than we let it run
        "--batch_size_per_device", "1",
        "--num_layers", "1", "--embed_dim", "32", "--num_heads", "4",
        "--block_size", "12",
        "--log_every", "1", "--save_every", "1000",
    ]
    os.makedirs(tmp_path / "toks")
    import numpy as np

    rng = np.random.RandomState(0)
    for i in range(4):
        np.save(tmp_path / "toks" / f"s{i}_tokens.npy",
                rng.randint(0, 400, size=(1, 6)).astype(np.uint32))

    proc = subprocess.Popen(
        args, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # Wait until it has logged at least one step, then preempt it.
    deadline = time.time() + 300
    lines = []
    stepped = False
    for line in proc.stdout:
        lines.append(line)
        if "step 1 " in line or "| loss" in line:
            stepped = True
            break
        if time.time() > deadline:
            proc.kill()
            pytest.fail("trainer never reached a step:\n" + "".join(lines))
    assert stepped
    proc.send_signal(signal.SIGTERM)
    out = proc.stdout.read()
    rc = proc.wait(timeout=300)
    assert rc == 0, out
    assert "preemption checkpoint complete" in out, out

    # Resume: the rerun must start at a step > 0 (restored), not from scratch.
    args[args.index("--num_steps") + 1] = "3"
    out2 = subprocess.run(
        args, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        capture_output=True, text=True, timeout=600,
    )
    assert out2.returncode == 0, out2.stderr
    assert "starting at step" in out2.stderr + out2.stdout
    joined = out2.stderr + out2.stdout
    assert "starting at step 0" not in joined, joined


def test_force_save_existing_step_is_idempotent(tmp_path):
    """A preemption/final force-save of a step the periodic gate already
    wrote returns False instead of raising StepAlreadyExistsError."""
    import jax

    from protein_structure_tokenizer_tpu.runtime.train_checkpoint import (
        TrainCheckpointManager,
    )

    mgr = TrainCheckpointManager(str(tmp_path / "ckpt"), save_every=1)
    x = {"w": jax.numpy.ones((2,))}
    assert mgr.save(5, x, x, jax.random.PRNGKey(0))
    mgr.wait()
    assert not mgr.save(5, x, x, jax.random.PRNGKey(0), force=True)
    assert mgr.latest_step() == 5
    mgr.close()
