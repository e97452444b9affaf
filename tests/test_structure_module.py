"""Structure-module parity: the full 8-iteration loop vs the reference.

The reference's FoldIteration (IPA + transitions + backbone update +
sidechain) is run inside one haiku transform as an unrolled loop and compared
per iteration against ours given the same parameters.  In ``exact=True``
mode the loop is asserted BIT-IDENTICAL (``assert_array_equal``) through all
8 iterations — every formula follows the reference's operation order,
including the matmul-form scalar logits (vs an einsum whose dot layout
groups f32 accumulation differently) and the explicit x/y/z add order of the
point norms.
"""
import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from protein_structure_tokenizer_tpu.models.structure_module import (
    StructureModuleConfig,
    fold_iteration,
    invariant_point_attention,
)
from protein_structure_tokenizer_tpu.geometry.rigid import QuatRigid
from protein_structure_tokenizer_tpu.models.layers import af2_linear, layer_norm
from protein_structure_tokenizer_tpu.utils.params import subtree


def test_ipa_fast_matches_exact():
    """Matmul-form IPA (default) vs the reference-order exact mode: the
    algebra is identical, drift is cancellation-level only."""
    import jax

    from protein_structure_tokenizer_tpu.models.structure_module import (
        structure_module_init,
    )

    cfg = StructureModuleConfig(
        num_layer=2,
        num_channel=64,
        num_head=4,
        num_point_qk=4,
        num_point_v=8,
        num_scalar_qk=16,
        num_scalar_v=16,
        pair_channel=32,
        single_channel=64,
    )
    rng = np.random.RandomState(0)
    b, n = 2, 24
    params = subtree(
        structure_module_init(jax.random.PRNGKey(0), cfg),
        "fold_iteration/invariant_point_attention",
    )
    act = jnp.asarray(rng.randn(b, n, cfg.num_channel).astype(np.float32))
    act2d = jnp.asarray(rng.randn(b, n, n, cfg.pair_channel).astype(np.float32))
    mask = jnp.asarray((np.arange(n) < 20).astype(np.float32))[None, :, None]
    mask = jnp.broadcast_to(mask, (b, n, 1))
    affine = QuatRigid.from_tensor(
        jnp.concatenate(
            [
                jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (b, n, 4)),
                jnp.asarray(rng.randn(b, n, 3).astype(np.float32)),
            ],
            axis=-1,
        )
    )
    out_exact = invariant_point_attention(params, cfg, act, act2d, mask, affine, exact=True)
    out_fast = invariant_point_attention(params, cfg, act, act2d, mask, affine, exact=False)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_exact), rtol=1e-4, atol=1e-4
    )


@requires_reference
@pytest.mark.slow
def test_fold_loop_bitwise():
    from refmodel import import_reference, load_reference_config

    import_reference()
    import haiku as hk
    import jax

    jax.lax.pmean = lambda x, axis_name=None: x
    cfg = load_reference_config(4096, 1)
    from structure_tokenizer.model import common_modules, prng
    from structure_tokenizer.model.folding import FoldIteration, generate_new_affine

    rng = np.random.RandomState(0)
    n = 48
    si = rng.randn(n, 128).astype(np.float32)
    zij = rng.randn(n, n, 128).astype(np.float32)
    mask = (np.arange(n) < 40).astype(np.float32)[:, None]
    smc = cfg.model.model.structure_module

    def loop_fn(si, zij, mask):
        act = hk.LayerNorm(
            axis=[-1], create_scale=True, create_offset=True, name="single_layer_norm"
        )(si)
        initial_act = act
        act = common_modules.Linear(smc.num_channel, name="initial_projection")(act)
        act2d = hk.LayerNorm(
            axis=[-1], create_scale=True, create_offset=True, name="pair_layer_norm"
        )(zij)
        affine = generate_new_affine(mask)
        mod = FoldIteration(smc, cfg.data, name="fold_iteration")
        activations = {"act": act, "affine": affine.to_tensor()}
        acts, outs = [], []
        key = prng.SafeKey(hk.next_rng_key())
        for _ in range(8):
            key, sub = key.split()
            activations, out = mod(activations, mask, True, initial_act, sub, act2d)
            acts.append(activations["act"])
            outs.append(out["affine"])
        return jnp.stack(acts), jnp.stack(outs)

    f = hk.transform(loop_fn)
    params = f.init(jax.random.PRNGKey(0), si, zij, mask)
    ref_acts, ref_outs = f.apply(params, jax.random.PRNGKey(0), si, zij, mask)

    smcfg = StructureModuleConfig()
    act = layer_norm(params["single_layer_norm"], jnp.asarray(si)[None])
    initial_act = act
    act = af2_linear(params["initial_projection"], act)
    act2d = layer_norm(params["pair_layer_norm"], jnp.asarray(zij)[None])
    affine = QuatRigid.identity((1, n))
    activations = {"act": act, "affine": affine.to_tensor()}
    fold_params = subtree(params, "fold_iteration")
    for layer in range(8):
        activations, out = fold_iteration(
            fold_params,
            smcfg,
            activations,
            jnp.asarray(mask)[None],
            initial_act,
            act2d,
            exact=True,  # reference-order IPA formulas: genuinely bitwise
        )
        # BIT-EXACT through every iteration: round 4 closed the last two
        # op-order gaps (matmul-form scalar logits, folding.py:219; explicit
        # add-order point norms, folding.py:264-269).
        np.testing.assert_array_equal(
            np.asarray(activations["act"])[0],
            np.asarray(ref_acts[layer]),
            err_msg=f"act mismatch at iteration {layer}",
        )
        np.testing.assert_array_equal(
            np.asarray(out["affine"])[0],
            np.asarray(ref_outs[layer]),
            err_msg=f"affine mismatch at iteration {layer}",
        )


def test_fused_softmax_kernel_padded_batch_matches_jnp():
    """Advisor r4: the fused IPA-softmax kernel gives masked-query rows a
    REAL softmax where the jnp path gives uniform rows — correctness relies
    on downstream masking of padded residues.  Model-level guarantees with
    the kernel active (interpret mode on CPU; gate forced via
    structure_module._FORCE_KERNEL_INTERPRET):

      1. MASKING (the advisor's property, asserted bitwise): changing the
         CONTENT of padded positions must not change valid-residue outputs.
      2. Sanity vs the kernel-off bf16 path on valid residues (loose: the
         kernel arm also rounds the raw logits to bf16, which the 2 chaotic
         fold iterations amplify — pinned properly on TPU in
         tests/test_precision.py / docs/TRAINED_QUALITY.md)."""
    import jax

    from protein_structure_tokenizer_tpu.models import structure_module as sm
    from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

    cfg = StructureModuleConfig(
        num_layer=2,
        num_channel=64,
        num_head=4,
        num_point_qk=4,
        num_point_v=8,
        num_scalar_qk=16,
        num_scalar_v=16,
        pair_channel=32,
        single_channel=64,
    )
    rng = np.random.RandomState(7)
    b, n = 2, 16  # n % 8 == 0 so the kernel's shape gate engages
    params = cast_floats(
        sm.structure_module_init(jax.random.PRNGKey(3), cfg), jnp.bfloat16
    )
    single = rng.randn(b, n, cfg.single_channel).astype(np.float32)
    pair = rng.randn(b, n, n, cfg.pair_channel).astype(np.float32)
    lengths = np.asarray([12, 9])
    mask_np = (np.arange(n)[None, :] < lengths[:, None]).astype(np.float32)
    aatype = np.zeros((b, n, 21), np.float32)
    aatype[..., 0] = 1.0  # all-ALA
    atom37 = np.zeros((b, n, 37), np.float32)
    atom37[..., :5] = mask_np[..., None]  # backbone atoms on valid residues
    features = {
        "aatype": jnp.asarray(aatype),
        "atom37_gt_exists": jnp.asarray(atom37),
    }
    seq_mask = jnp.asarray(mask_np[..., None])

    def run(use_pallas, scramble_padding=False):
        s, p2 = single.copy(), pair.copy()
        if scramble_padding:
            srng = np.random.RandomState(99)
            for i, L in enumerate(lengths):
                s[i, L:] = 100.0 * srng.randn(n - L, cfg.single_channel)
                p2[i, L:, :] = 100.0 * srng.randn(n - L, n, cfg.pair_channel)
                p2[i, :, L:] = 100.0 * srng.randn(n, n - L, cfg.pair_channel)
        reps = {
            "single": jnp.asarray(s, jnp.bfloat16),
            "pair": jnp.asarray(p2, jnp.bfloat16),
        }
        sm._FORCE_KERNEL_INTERPRET = True
        try:
            out = sm.structure_module(
                params, cfg, reps, features, seq_mask,
                exact=False, use_pallas=use_pallas,
            )
        finally:
            sm._FORCE_KERNEL_INTERPRET = False
        return np.asarray(out["final_atom_positions"], np.float32)

    pos_kernel = run(True)
    assert np.isfinite(pos_kernel).all()

    # 1. Masking, bitwise: padded-region CONTENT cannot leak into valid rows.
    # NOTE: the pair-track LayerNorm normalizes over the feature axis only,
    # so a padded-KEY column with different content changes the bf16 pair
    # activations... it must still not reach valid rows through attention
    # (the column mask) nor through the output (the sequence mask).
    pos_scrambled = run(True, scramble_padding=True)
    for i, L in enumerate(lengths):
        np.testing.assert_array_equal(
            pos_kernel[i, :L],
            pos_scrambled[i, :L],
            err_msg="padded-position content leaked into valid residues",
        )

    # 2. Loose sanity vs the kernel-off bf16 path.
    pos_jnp = run(False)
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(
            pos_kernel[i, :L],
            pos_jnp[i, :L],
            atol=0.75,
            err_msg="kernel path diverges grossly from the jnp bf16 path",
        )
