"""REAL multi-process (multi-"host") execution: 2 OS processes x 2 CPU
devices, jax.distributed + Gloo collectives, per-host input/output slices.

The rest of the suite simulates topology with 8 virtual devices in ONE
process; this test is the genuine article — it validates that
``initialize_distributed``, ``process_local_slice``,
``shard_batch_from_local`` and the runner's per-host featurize/save path
produce results identical to a single-process run.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import tiny_preset
from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner

from test_server import sample_pdb_text

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    # 4 structures of distinct lengths -> one global batch of 4 rows
    # (2 per process at batch_size_per_device=1 x 2 local devices).
    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    for i in range(4):
        (pdb_dir / f"s{i}.pdb").write_text(
            sample_pdb_text(seed=i, n_res=10 + 2 * (i % 3))
        )

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outputs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))
    for r in results:
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        assert r["local_devices"] == 2

    # Per-host IO sharding: each process tokenized a DISJOINT half...
    assert len(results[0]["tokenized"]) == 2
    assert len(results[1]["tokenized"]) == 2
    assert not set(results[0]["tokenized"]) & set(results[1]["tokenized"])
    # ...and together they covered everything.
    all_names = sorted(results[0]["tokenized"] + results[1]["tokenized"])
    assert all_names == ["s0", "s1", "s2", "s3"]

    # Tokens are topology-independent: the 2-process run wrote exactly what a
    # single-process run computes.
    cfg = tiny_preset(seq_max=16, k=4, downsampling=2, dim=16)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    runner = InferenceRunner(cfg, params)
    ref = runner.tokenize(
        sorted(str(p) for p in pdb_dir.glob("*.pdb")), batch_size_per_device=1
    )
    for name, ref_tokens in ref.items():
        written = np.load(tmp_path / "tokens" / f"{name}_tokens.npy")
        np.testing.assert_array_equal(written, ref_tokens)

    # The data-parallel LM loss agrees across processes and with the
    # single-process value on the identical global batch.
    assert results[0]["lm_loss"] == pytest.approx(results[1]["lm_loss"], rel=1e-6)

    from protein_structure_tokenizer_tpu.lm import gpt
    from protein_structure_tokenizer_tpu.runtime.train_lm import (
        LmTrainConfig,
        lm_loss,
    )

    gcfg = gpt.GptConfig(
        vocab_size=40, embed_dim=32, ffn_embed_dim=64, num_heads=4,
        num_layers=2, rope_dimensions=8, max_position_embeddings=12,
    )
    lm_params = gpt.init(jax.random.PRNGKey(1), gcfg)
    rng = np.random.RandomState(0)
    tokens_global = rng.randint(0, 40, size=(4, 9)).astype(np.int32)
    ref_loss, _ = lm_loss(lm_params, gcfg, LmTrainConfig(), tokens_global)
    assert results[0]["lm_loss"] == pytest.approx(float(ref_loss), rel=1e-5)


@pytest.mark.slow
def test_two_process_stale_output_dir_aborts_cleanly(tmp_path):
    """A pre-existing output dir with user data must be refused by BOTH
    processes with the user's files untouched — the round-2 race let peers
    drop their sentinel into the dir before process 0's verdict."""
    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    for i in range(4):
        (pdb_dir / f"s{i}.pdb").write_text(
            sample_pdb_text(seed=i, n_res=10 + 2 * (i % 3))
        )
    stale = tmp_path / "tokens"
    stale.mkdir()
    (stale / "user_data.txt").write_text("precious")

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path), "stale"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outputs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            r = json.load(f)
        assert r["refused"], f"process {pid} did not refuse the stale dir"
        assert r["dir_contents"] == ["user_data.txt"], r["dir_contents"]
    assert (stale / "user_data.txt").read_text() == "precious"
