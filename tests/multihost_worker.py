"""Worker for tests/test_multihost.py: one JAX process of a 2-process run.

Usage: python multihost_worker.py <pid> <nprocs> <port> <workdir>
(XLA_FLAGS with the per-process device count is set by the parent.)

Exercises the REAL multi-host path — jax.distributed + Gloo collectives
across OS processes, per-host featurize/save slices — not the single-process
8-virtual-device simulation the rest of the suite uses.
"""
import glob
import json
import os
import sys

# python <script> puts tests/ (not the repo root) on sys.path; PYTHONPATH is
# off-limits in this environment (it would drop the site dir that registers
# the TPU plugin), so splice the root in here.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nprocs, port, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib

    mesh_lib.initialize_distributed(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs

    import numpy as np

    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import tiny_preset
    from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner

    # Same seed on every process -> replicated params agree bit-for-bit.
    cfg = tiny_preset(seq_max=16, k=4, downsampling=2, dim=16)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    runner = InferenceRunner(cfg, params)

    pdbs = sorted(glob.glob(os.path.join(workdir, "pdbs", "*.pdb")))
    token_dir = os.path.join(workdir, "tokens")

    if len(sys.argv) > 5 and sys.argv[5] == "stale":
        # Stale-output-dir adjudication: the parent pre-created token_dir
        # with user data.  EVERY process must refuse it (FileExistsError)
        # without writing anything into it.
        try:
            runner.tokenize(pdbs, token_dir, batch_size_per_device=1)
            refused = False
        except FileExistsError:
            refused = True
        with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
            json.dump(
                {"refused": refused, "dir_contents": sorted(os.listdir(token_dir))},
                f,
            )
        return

    # All processes enter tokenize together (the runner creates the output
    # dir multi-host-safely); each featurizes and saves only its own
    # contiguous slice of every global batch.
    results = runner.tokenize(
        pdbs, token_dir, batch_size_per_device=1
    )

    # One data-parallel LM train step across both processes.
    from protein_structure_tokenizer_tpu.lm import gpt
    from protein_structure_tokenizer_tpu.runtime.train_lm import (
        LmTrainConfig,
        init_train_state,
        make_train_step,
    )

    gcfg = gpt.GptConfig(
        vocab_size=40, embed_dim=32, ffn_embed_dim=64, num_heads=4,
        num_layers=2, rope_dimensions=8, max_position_embeddings=12,
    )
    tcfg = LmTrainConfig(warmup_steps=1, total_steps=10)
    mesh = mesh_lib.make_mesh()
    lm_params, opt_state = init_train_state(jax.random.PRNGKey(1), gcfg, tcfg, mesh)
    step_fn, _ = make_train_step(gcfg, tcfg, mesh)

    global_batch = len(jax.devices())
    rng = np.random.RandomState(0)
    tokens_global = rng.randint(0, 40, size=(global_batch, 9)).astype(np.int32)
    local = mesh_lib.process_local_slice(mesh, global_batch)
    tokens = mesh_lib.shard_batch_from_local(
        mesh, tokens_global[local], global_batch
    )
    _, _, metrics = step_fn(lm_params, opt_state, tokens)
    loss = float(jax.device_get(metrics["loss"]))

    with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
        json.dump(
            {
                "process_count": jax.process_count(),
                "global_devices": len(jax.devices()),
                "local_devices": len(jax.local_devices()),
                "tokenized": sorted(results.keys()),
                "lm_loss": loss,
            },
            f,
        )


if __name__ == "__main__":
    main()
