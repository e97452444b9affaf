"""AF2-style structure module: IPA + iterative backbone refinement.

Behavioral parity with /root/reference/structure_tokenizer/model/folding.py
(InvariantPointAttention 36-288, FoldIteration 291-385, generate_affines
388-454, StructureModule 457-525, MultiRigidSidechain 666-746), TPU-first:

  * Natively batched (B, N, ...) — no per-sample vmap.
  * The 8 fold iterations share parameters (as in the reference) and run as a
    ``jax.lax.scan`` so the compiled program contains the iteration body once.
  * Point-attention reductions are expressed as broadcast-multiply + reduce
    (never `matmul`) so they stay float32 on the VPU — the same trick the
    reference applies for TPU correctness (folding.py:233-241).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from protein_structure_tokenizer_tpu.geometry import backbone
from protein_structure_tokenizer_tpu.geometry.rigid import QuatRigid, Rigid
from protein_structure_tokenizer_tpu.models.layers import (
    af2_linear,
    af2_linear_init_leaves,
    layer_norm,
    layer_norm_1pass,
    layer_norm_fast,
    norm_init,
)
from protein_structure_tokenizer_tpu.parallel import cp
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.utils.params import Params, subtree, with_prefix

# Tests only: engage the bf16 fused-softmax kernel in Pallas interpret mode
# on CPU so the masked-batch kernel-on/off equivalence is coverable without
# a TPU (tests/test_structure_module.py).  Never set in production paths.
_FORCE_KERNEL_INTERPRET = False


@dataclasses.dataclass(frozen=True)
class SidechainConfig:
    num_channel: int = 128
    num_residual_block: int = 2


@dataclasses.dataclass(frozen=True)
class StructureModuleConfig:
    num_layer: int = 8
    num_channel: int = 384
    num_head: int = 12
    num_layer_in_transition: int = 3
    num_point_qk: int = 4
    num_point_v: int = 8
    num_scalar_qk: int = 16
    num_scalar_v: int = 16
    position_scale: float = 10.0
    pair_channel: int = 128
    single_channel: int = 128
    dist_epsilon: float = 1e-8
    sidechain: SidechainConfig = SidechainConfig()


def invariant_point_attention(
    p: Params,
    cfg: StructureModuleConfig,
    inputs_1d: jax.Array,  # (B, N, C)
    inputs_2d: jax.Array,  # (B, N, N, C2)
    mask: jax.Array,  # (B, N, 1)
    affine: QuatRigid,  # batch shape (B, N)
    *,
    exact: bool = False,
    attention_2d: Optional[jax.Array] = None,  # pre-scaled logits-layout (B, h, N, N)
    use_pallas: bool | None = None,
    mesh=None,
) -> jax.Array:
    """IPA.  ``exact=True`` reproduces the reference's broadcast-subtract
    formulas bit-for-bit (folding.py:225-241); the default fast mode uses the
    algebraically-equal matmul forms (|q-k|^2 = |q|^2+|k|^2-2qk on the MXU,
    einsum for point values) — f32 throughout, drift at cancellation level.

    ``attention_2d``, when supplied (structure_module hoists it out of the
    fold scan), must already have ``attention_2d_weights`` folded in and be
    transposed to the (B, h, N, N) logits layout."""
    batch, num_res, _ = inputs_1d.shape
    h = cfg.num_head
    sqk, sv = cfg.num_scalar_qk, cfg.num_scalar_v
    pqk, pv = cfg.num_point_qk, cfg.num_point_v
    # Under a bf16 compute policy, geometry-critical reductions stay f32
    # (points, logits, softmax, point aggregation) while the heavy O(N^2 * C)
    # matmuls keep the compute dtype on the MXU.  With f32 inputs this is a
    # no-op.
    in_dtype = inputs_1d.dtype
    f32 = jnp.float32

    q_scalar = af2_linear(p["q_scalar"], inputs_1d).reshape(batch, num_res, h, sqk)
    kv_scalar = af2_linear(p["kv_scalar"], inputs_1d).reshape(batch, num_res, h, sv + sqk)
    k_scalar, v_scalar = jnp.split(kv_scalar, [sqk], axis=-1)

    def to_global_points(leaves, num_points):
        # Linear output layout is [all-x, all-y, all-z] blocks of h*num_points
        # (the reference splits axis -1 in 3; folding.py:134,151).
        local = af2_linear(leaves, inputs_1d).astype(f32)
        local = local.reshape(batch, num_res, 3, h * num_points)
        rot = affine.rot.astype(f32)[..., :, :, None]  # (B, N, 3, 3, 1)
        pts = jnp.sum(rot * local[..., None, :, :], axis=-2)  # (B, N, 3, h*P)
        pts = pts + affine.trans.astype(f32)[..., :, None]
        return pts.reshape(batch, num_res, 3, h, num_points)

    q_point = to_global_points(p["q_point_local"], pqk)
    kv_point = to_global_points(p["kv_point_local"], pqk + pv)
    k_point, v_point = jnp.split(kv_point, [pqk], axis=-1)

    scalar_variance = max(sqk, 1) * 1.0
    point_variance = max(pqk, 1) * 9.0 / 2
    num_logit_terms = 3
    scalar_weights = np.sqrt(1.0 / (num_logit_terms * scalar_variance))
    point_weights = np.sqrt(1.0 / (num_logit_terms * point_variance))
    attention_2d_weights = np.sqrt(1.0 / num_logit_terms)

    trainable_pw = jax.nn.softplus(p[""]["trainable_point_weights"])  # (h,)
    head_point_weights = point_weights * trainable_pw  # (h,)

    qp = jnp.transpose(q_point, (0, 3, 1, 4, 2))  # (B, h, N, P, 3)
    kp = jnp.transpose(k_point, (0, 3, 1, 4, 2))
    q = jnp.swapaxes((scalar_weights * q_scalar).astype(in_dtype), -2, -3)  # (B,h,N,sqk)
    k = jnp.swapaxes(k_scalar, -2, -3)
    v = jnp.swapaxes(v_scalar, -2, -3)

    if exact:
        # Reference form: broadcast-subtract then reduce — materializes a
        # (B, h, Nq, Nk, P) intermediate but is bit-identical to folding.py.
        dist2 = jnp.sum(
            jnp.square(qp[:, :, :, None, :, :] - kp[:, :, None, :, :, :]), axis=-1
        )  # (B, h, Nq, Nk, P)
        attn_qk_point = -0.5 * jnp.sum(
            head_point_weights[None, :, None, None, None] * dist2, axis=-1
        )
        # matmul(q, k^T), NOT einsum("bhqc,bhkc->bhqk"): the two lower to
        # dots with different contracting layouts whose f32 accumulation
        # groups differently (~4e-6) — the matmul form is bit-identical to
        # folding.py:219 (verified batched == unbatched on one device).
        attn_qk_scalar = jnp.matmul(q, jnp.swapaxes(k, -2, -1))
        attn_logits = attn_qk_scalar + attn_qk_point
    else:
        # |q-k|^2 summed over points = |q|^2 + |k|^2 - 2 q.k.  Folding the
        # cross term into the scalar contraction (scale q,k points by
        # sqrt(head_weight)) makes the whole N^2 logit tensor ONE MXU matmul
        # over sqk + 3*pqk dims; the remaining |q|^2/|k|^2 terms are rank-1
        # row/column biases that fuse into the softmax elementwise pass —
        # halves the (B, h, N, N) HBM intermediates vs two separate einsums.
        kn = jnp.sum(kp * kp, axis=(-1, -2))  # (B, h, N)
        sqrt_hw = jnp.sqrt(head_point_weights)[None, :, None, None]  # (1,h,1,1)
        q_cat = jnp.concatenate(
            [q.astype(f32), (sqrt_hw * qp.reshape(qp.shape[:3] + (-1,)))], axis=-1
        )
        k_cat = jnp.concatenate(
            [k.astype(f32), (sqrt_hw * kp.reshape(kp.shape[:3] + (-1,)))], axis=-1
        )
        attn_logits = jnp.einsum(
            "bhqc,bhkc->bhqk", q_cat, k_cat, preferred_element_type=f32
        )
        hw = head_point_weights[None, :, None]  # (1, h, 1)

    if attention_2d is None:
        a2 = af2_linear(p["attention_2d"], inputs_2d)  # (B, N, N, h)
        attention_2d = attention_2d_weights * jnp.transpose(a2, (0, 3, 1, 2))

    bf16_attn = (not exact) and (
        jax.default_backend() == "tpu" or _FORCE_KERNEL_INTERPRET
    )
    # The kernel engages on the bf16 compute-policy path ONLY: the default
    # f32 fast path keeps the jnp chain so its documented ~1e-4 proximity to
    # exact mode is untouched (the kernel's dropped row bias is softmax-
    # invariant but perturbs f32 rounding at ~1e-7/entry, which the 8
    # chaotic fold iterations amplify — acceptable inside the bf16 path's
    # pinned tolerance band, not on the conformance-adjacent f32 path).
    fused_softmax = (
        bf16_attn
        and in_dtype != f32
        and bool(use_pallas)
        and mesh_lib.single_device(mesh)
        and num_res % 8 == 0
    )
    if fused_softmax:
        # Single-pass Pallas softmax (ops/softmax_kernels.py).  Softmax is
        # invariant to per-ROW additive constants, so the |q|^2 row bias and
        # the mask's row component drop out entirely (masked query rows
        # change value but stay row-local and are masked at the output); the
        # remaining column terms fold into one (B, h, Nk) bias.
        from protein_structure_tokenizer_tpu.ops import softmax_kernels

        col_bias = -(0.5 * hw) * kn - 1e5 * (1.0 - mask[..., 0][:, None, :])
        # emit_f32=False: every consumer on this path reads the bf16 copy
        # (scalar + pair contractions always did; the point contraction
        # below reads it too — bit-identical on TPU, where XLA DEFAULT
        # precision truncates f32 matmul operands to bf16 anyway), so the
        # 2x-larger f32 probability write would be dead weight.
        # The raw fused-logit einsum emits bf16 (the convert fuses into the
        # matmul epilogue): halves the largest remaining f32 tensor's write
        # + kernel read (~800 MB/iteration at B=64/N=512).  The kernel
        # promotes back to f32 before max/exp; the ~0.4% relative logit
        # rounding lands WITHIN the bf16 path's pinned coordinate
        # tolerances (measured: random-weight drift unchanged at ~0.9 A,
        # trained-weights bf16-vs-f32 delta unchanged at ~0.1 A).
        attn, attn_rd = softmax_kernels.fused_ipa_softmax(
            attn_logits.astype(jnp.bfloat16), col_bias, attention_2d,
            emit_f32=False, interpret=_FORCE_KERNEL_INTERPRET,
        )
    else:
        if not exact:
            # rank-1 |q|^2 / |k|^2 biases of the fused-logit form (the exact
            # branch's broadcast-subtract formula already carries them)
            attn_logits = (
                attn_logits
                - (0.5 * hw * jnp.sum(qp * qp, axis=(-1, -2)))[..., :, None]
                - (0.5 * hw * kn)[..., None, :]
            )
        attn_logits = attn_logits + attention_2d.astype(f32)

        mask_2d = (mask * jnp.swapaxes(mask, -1, -2)).astype(f32)  # (B, N, N)
        attn_logits = attn_logits - 1e5 * (1.0 - mask_2d[:, None])

        # Context parallelism (parallel/cp.py): query rows sharded over
        # "ctx", keys axis whole — each row's softmax is complete on its
        # chip.
        attn_logits = cp.constrain(attn_logits, mesh, cp.LOGITS_SPEC)
        attn = jax.nn.softmax(attn_logits)  # (B, h, Nq, Nk) f32

        # On TPU the consumer matmuls truncate their operands to bf16 anyway
        # (XLA DEFAULT precision) — storing the softmax output bf16 is
        # bit-identical math with HALF the HBM traffic for the two value
        # contractions (the probabilities tensor is written once as bf16 and
        # read twice).  CPU keeps f32 (its einsums are true f32, so a cast
        # would CHANGE results and the pinned tolerances of the parity
        # suites).
        attn_rd = attn.astype(jnp.bfloat16) if bf16_attn else attn

    vp = jnp.transpose(v_point, (0, 3, 1, 4, 2))  # (B, h, N, P, 3) f32
    if exact:
        result_scalar = jnp.einsum(
            "bhqk,bhkc->bhqc", attn.astype(in_dtype), v, preferred_element_type=f32
        ).astype(in_dtype)
        # Float32 multiply+reduce (the reference's TPU trick, folding.py:233-241).
        result_point_global = jnp.sum(
            attn[..., None, None] * vp[:, :, None, :, :, :], axis=-3
        )  # (B, h, Nq, P, 3)
    elif in_dtype == f32:
        # One contraction for scalar + point values: a single read of the
        # (B, h, N, N) attention tensor instead of two.
        v_cat = jnp.concatenate([v, vp.reshape(vp.shape[:3] + (-1,))], axis=-1)
        result_cat = jnp.einsum(
            "bhqk,bhkc->bhqc", attn_rd, v_cat.astype(attn_rd.dtype),
            preferred_element_type=f32,
        )
        result_scalar, result_point_flat = jnp.split(result_cat, [sv], axis=-1)
        result_point_global = result_point_flat.reshape(
            result_point_flat.shape[:3] + (pv, 3)
        )
    else:
        # Both value contractions read the already-materialized bf16
        # probability copy when one exists (attn.astype(bf16) == attn_rd
        # exactly, but spelling it as a cast makes XLA re-read the 2x-larger
        # f32 tensor and convert in-fusion).  This includes the POINT
        # aggregation: the geometry policy is about f32 ACCUMULATION
        # (preferred_element_type), not operand storage — under XLA DEFAULT
        # precision the MXU truncates f32 operands to bf16 regardless, so
        # reading the bf16 copy is bit-identical on TPU while halving the
        # largest remaining per-iteration HBM read.
        scalar_attn = (
            attn_rd if (bf16_attn and in_dtype == jnp.bfloat16)
            else attn.astype(in_dtype)
        )
        result_scalar = jnp.einsum(
            "bhqk,bhkc->bhqc", scalar_attn, v, preferred_element_type=f32
        ).astype(in_dtype)
        result_point_global = jnp.einsum(
            "bhqk,bhkpc->bhqpc",
            attn_rd if bf16_attn else attn,
            vp, preferred_element_type=jnp.float32,
        )
    result_scalar = result_scalar.astype(in_dtype)

    if exact:
        feat_2d = inputs_2d
        attn_2d_rd = attn.astype(in_dtype)
    else:
        # Same bf16-operand trick for the pair-track read — the largest
        # per-iteration HBM term ((B, N, N, C2): 4.3 GB f32 at B=32/N=512,
        # halved as bf16; the matmul truncated it to bf16 regardless.
        feat_2d = (
            inputs_2d.astype(jnp.bfloat16) if bf16_attn else inputs_2d
        )
        attn_2d_rd = attn_rd if bf16_attn else attn.astype(in_dtype)
    result_attention_over_2d = jnp.einsum(
        "bhij,bijc->bihc", attn_2d_rd, feat_2d, preferred_element_type=f32
    ).astype(in_dtype)
    result_attention_over_2d = result_attention_over_2d.reshape(batch, num_res, -1)

    return _ipa_output(
        p, cfg, result_scalar, result_point_global, result_attention_over_2d,
        affine, batch, num_res, h, sv, pv, in_dtype, exact=exact,
    )


def _ipa_output(
    p, cfg, result_scalar, result_point_global, result_attention_over_2d,
    affine, batch, num_res, h, sv, pv, in_dtype, exact=False,
):
    """Shared IPA tail: local-frame transform, point norms, concat, output
    projection.  ``result_scalar`` (B, h, N, sv); ``result_point_global``
    (B, h, N, pv, 3) f32; ``result_attention_over_2d`` (B, N, h*C2)."""
    f32 = jnp.float32
    result_scalar = jnp.swapaxes(result_scalar, -2, -3).reshape(batch, num_res, h * sv)
    result_point_global = jnp.transpose(result_point_global, (0, 2, 4, 1, 3)).reshape(
        batch, num_res, 3, h * pv
    )

    # Back to local frames (f32 geometry).
    centered = result_point_global - affine.trans.astype(f32)[..., :, None]
    rot = affine.rot.astype(f32)[..., :, :, None]
    result_point_local = jnp.sum(rot * centered[..., :, None, :], axis=-3)  # (B,N,3,h*pv)

    if exact:
        # Reference add order (folding.py:264-269): ((eps + x^2) + y^2) + z^2
        # — an axis-sum groups as eps + ((x^2 + y^2) + z^2), ~1 ulp apart.
        point_norm = jnp.sqrt(
            cfg.dist_epsilon
            + jnp.square(result_point_local[..., 0, :])
            + jnp.square(result_point_local[..., 1, :])
            + jnp.square(result_point_local[..., 2, :])
        )
    else:
        point_norm = jnp.sqrt(
            cfg.dist_epsilon + jnp.sum(jnp.square(result_point_local), axis=-2)
        )  # (B, N, h*pv)

    final_act = jnp.concatenate(
        [
            result_scalar,
            result_point_local[..., 0, :].astype(in_dtype),
            result_point_local[..., 1, :].astype(in_dtype),
            result_point_local[..., 2, :].astype(in_dtype),
            point_norm.astype(in_dtype),
            result_attention_over_2d,
        ],
        axis=-1,
    )
    return af2_linear(p["output_projection"], final_act)


def multi_rigid_sidechain(
    p: Params,
    cfg: SidechainConfig,
    affine: QuatRigid,  # (B, N), translations already in angstroms
    act: jax.Array,
    initial_act: jax.Array,
) -> dict:
    s = af2_linear(p["input_projection"], jax.nn.relu(act)) + af2_linear(
        p["input_projection_1"], jax.nn.relu(initial_act)
    )
    for i in range(cfg.num_residual_block):
        suffix = "" if i == 0 else f"_{i}"
        old = s
        s = af2_linear(p[f"resblock1{suffix}"], jax.nn.relu(s))
        s = af2_linear(p[f"resblock2{suffix}"], jax.nn.relu(s))
        s = s + old

    batch, num_res, _ = s.shape
    # Torsion geometry stays f32 under a bf16 compute policy.
    unnormalized = af2_linear(p["unnormalized_angles"], jax.nn.relu(s)).astype(jnp.float32)
    unnormalized = unnormalized.reshape(batch, num_res, 3, 2)
    angles = unnormalized / jnp.sqrt(
        jnp.maximum(jnp.sum(jnp.square(unnormalized), axis=-1, keepdims=True), 1e-12)
    )

    frames = backbone.torsion_angles_to_frames(affine.as_rigid(), angles)  # (B,N,4)
    atom_pos = backbone.frames_and_literature_positions_to_atom14_pos(frames)

    return {
        "angles_sin_cos": angles,
        "unnormalized_angles_sin_cos": unnormalized,
        "atom_pos": atom_pos,  # (B, N, 14, 3)
        "frames": frames,  # Rigid (B, N, 4)
    }


def fold_iteration(
    p: Params,
    cfg: StructureModuleConfig,
    activations: dict,
    sequence_mask: jax.Array,
    initial_act: jax.Array,
    static_feat_2d: jax.Array,
    *,
    exact: bool = False,
    attention_2d: Optional[jax.Array] = None,
    use_pallas: bool | None = None,
    mesh=None,
) -> tuple[dict, dict]:
    affine = QuatRigid.from_tensor(activations["affine"])
    act = activations["act"]

    attn = invariant_point_attention(
        subtree(p, "invariant_point_attention"),
        cfg,
        act,
        static_feat_2d,
        sequence_mask,
        affine,
        exact=exact,
        attention_2d=attention_2d,
        use_pallas=use_pallas,
        mesh=mesh,
    )
    act = act + attn
    act = layer_norm(p["attention_layer_norm"], act)

    input_act = act
    for i in range(cfg.num_layer_in_transition):
        suffix = "" if i == 0 else f"_{i}"
        act = af2_linear(p[f"transition{suffix}"], act)
        if i < cfg.num_layer_in_transition - 1:
            act = jax.nn.relu(act)
    act = act + input_act
    act = layer_norm(p["transition_layer_norm"], act)

    # Rigid-body composition stays f32 under a bf16 compute policy.
    affine = affine.pre_compose(af2_linear(p["affine_update"], act).astype(jnp.float32))

    sc = multi_rigid_sidechain(
        subtree(p, "rigid_sidechain"),
        cfg.sidechain,
        affine.scale_translation(cfg.position_scale),
        act,
        initial_act,
    )

    outputs = {"affine": affine.to_tensor(), "sc": sc}
    affine = affine.stop_rotation_gradient()
    new_activations = {"act": act, "affine": affine.to_tensor()}
    return new_activations, outputs


def structure_module(
    params: Params,
    cfg: StructureModuleConfig,
    representations: dict,  # {"single": (B,N,Cs), "pair": (B,N,N,Cz)}
    features: dict,  # {"aatype": (B,N,21) one-hot, "atom37_gt_exists": (B,N,37)}
    sequence_mask: jax.Array,  # (B, N, 1)
    *,
    exact: bool = False,
    use_pallas: bool | None = None,
    mesh=None,
) -> dict:
    # Same defaulting as models/gnn.py: the fused-softmax kernel engages on
    # TPU unless the caller opted out (training paths pass False — no VJP).
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    act = layer_norm(params["single_layer_norm"], representations["single"])
    initial_act = act
    act = af2_linear(params["initial_projection"], act)

    batch, num_res = act.shape[:2]
    affine = QuatRigid.identity((batch, num_res))

    # The (B, N, N, C) pair LN uses one-pass statistics on the fast path
    # (single HBM read; see layers.layer_norm_1pass) — and the single-pass
    # Pallas LN kernel on the bf16 single-device path (ops/ln_kernels.py).
    if exact:
        act_2d = layer_norm(params["pair_layer_norm"], representations["pair"])
    else:
        act_2d = layer_norm_fast(
            params["pair_layer_norm"], representations["pair"],
            use_pallas=bool(use_pallas) and mesh_lib.single_device(mesh),
        )
    act_2d = cp.constrain(act_2d, mesh, cp.PAIR_SPEC)

    fold_params = subtree(params, "fold_iteration")

    # The pair-bias projection of the iteration-invariant 2d track is hoisted
    # out of the scan: identical values every iteration, so computing it once
    # saves 7 redundant (B, N, N, C) matmuls and their HBM re-reads.  The
    # scale + (0,3,1,2) transpose into logits layout also happen once here —
    # the 8 in-scan reads are then contiguous (elementwise-identical values,
    # so the exact path keeps its bit-parity).
    attention_2d_weights = float(np.sqrt(1.0 / 3))
    attention_2d = attention_2d_weights * jnp.transpose(
        af2_linear(
            subtree(fold_params, "invariant_point_attention")["attention_2d"],
            act_2d,
        ),
        (0, 3, 1, 2),
    )  # (B, h, N, N)
    attention_2d = cp.constrain(attention_2d, mesh, cp.LOGITS_SPEC)

    # Iteration-invariant pair operand for the in-scan attention-over-2d
    # einsum: materialized bf16 ONCE on TPU (the matmul truncates operands to
    # bf16 regardless — identical values, half the per-iteration HBM read).
    feat_2d_scan = act_2d
    if not exact and jax.default_backend() == "tpu":
        feat_2d_scan = act_2d.astype(jnp.bfloat16)

    # NOTE on a fused "flash-IPA" Pallas kernel: tried and measured in an
    # earlier round, then removed.  The attention-over-2d contraction
    # (bhij,bijc->bihc) is intrinsically a batch=B*N, M=num_head(12) batched
    # matmul — no grid layout gives Mosaic MXU-shaped work for it, and v5e
    # measurements showed ~140x regression (serialized small matmuls) vs this
    # XLA schedule, which already sits near the (B, h, N, N) HBM roofline
    # thanks to the hoisted pair bias, one-pass pair LN, bf16 pair operand,
    # and bf16 softmax store below.

    def step(carry, _):
        new_carry, out = fold_iteration(
            fold_params, cfg, carry, sequence_mask, initial_act, feat_2d_scan,
            exact=exact, attention_2d=attention_2d, use_pallas=use_pallas,
            mesh=mesh,
        )
        return new_carry, out

    activations = {"act": act, "affine": affine.to_tensor()}
    activations, outputs = jax.lax.scan(
        step, activations, None, length=cfg.num_layer
    )  # outputs stacked on a leading (num_layer,) axis

    ret = {}
    ret["representations"] = {"structure_module": activations["act"]}
    traj_scale = jnp.array([1.0] * 4 + [cfg.position_scale] * 3)
    ret["traj"] = outputs["affine"] * traj_scale  # (L, B, N, 7)
    ret["int_affines"] = ret["traj"][:-1]
    ret["final_affines"] = ret["traj"][-1]
    ret["sidechains"] = outputs["sc"]

    atom14_pred = outputs["sc"]["atom_pos"][-1]  # (B, N, 14, 3)
    aatype = jnp.argmax(features["aatype"], axis=-1)
    atom37_pred = backbone.atom14_to_atom37(atom14_pred, aatype)
    atom37_mask = features["atom37_gt_exists"]
    atom37_pred = atom37_pred * atom37_mask[..., None]
    ret["final_atom_positions"] = atom37_pred
    ret["final_atom_mask"] = atom37_mask
    return ret


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _ipa_init(key, cfg: StructureModuleConfig) -> Params:
    h, c = cfg.num_head, cfg.num_channel
    sqk, sv, pqk, pv = cfg.num_scalar_qk, cfg.num_scalar_v, cfg.num_point_qk, cfg.num_point_v
    ks = jax.random.split(key, 7)
    out_dim = h * sv + 3 * h * pv + h * pv + h * cfg.pair_channel
    return {
        "": {
            "trainable_point_weights": jnp.full(
                (h,), float(np.log(np.exp(1.0) - 1.0)), jnp.float32
            )
        },
        "q_scalar": af2_linear_init_leaves(ks[0], (c,), (h * sqk,)),
        "kv_scalar": af2_linear_init_leaves(ks[1], (c,), (h * (sv + sqk),)),
        "q_point_local": af2_linear_init_leaves(ks[2], (c,), (h * 3 * pqk,)),
        "kv_point_local": af2_linear_init_leaves(ks[3], (c,), (h * 3 * (pqk + pv),)),
        "attention_2d": af2_linear_init_leaves(ks[4], (cfg.pair_channel,), (h,)),
        "output_projection": af2_linear_init_leaves(ks[5], (out_dim,), (c,)),
    }


def _sidechain_init(key, cfg: StructureModuleConfig) -> Params:
    sc = cfg.sidechain
    ks = jax.random.split(key, 8)
    p = {
        "input_projection": af2_linear_init_leaves(ks[0], (cfg.num_channel,), (sc.num_channel,)),
        "input_projection_1": af2_linear_init_leaves(ks[1], (cfg.single_channel,), (sc.num_channel,)),
        "unnormalized_angles": af2_linear_init_leaves(ks[2], (sc.num_channel,), (6,)),
    }
    for i in range(sc.num_residual_block):
        suffix = "" if i == 0 else f"_{i}"
        p[f"resblock1{suffix}"] = af2_linear_init_leaves(
            ks[3 + 2 * i], (sc.num_channel,), (sc.num_channel,), initializer="relu"
        )
        p[f"resblock2{suffix}"] = af2_linear_init_leaves(
            ks[4 + 2 * i], (sc.num_channel,), (sc.num_channel,)
        )
    return p


def structure_module_init(key, cfg: StructureModuleConfig) -> Params:
    ks = jax.random.split(key, 10)
    c = cfg.num_channel
    fold: Params = {}
    fold.update(with_prefix(_ipa_init(ks[0], cfg), "invariant_point_attention"))
    fold["attention_layer_norm"] = norm_init(c)
    fold["transition_layer_norm"] = norm_init(c)
    for i in range(cfg.num_layer_in_transition):
        suffix = "" if i == 0 else f"_{i}"
        init = "relu" if i < cfg.num_layer_in_transition - 1 else "linear"
        fold[f"transition{suffix}"] = af2_linear_init_leaves(
            ks[1 + i], (c,), (c,), initializer=init
        )
    fold["affine_update"] = af2_linear_init_leaves(ks[4], (c,), (6,))
    fold.update(with_prefix(_sidechain_init(ks[5], cfg), "rigid_sidechain"))

    params: Params = {
        "single_layer_norm": norm_init(cfg.single_channel),
        "pair_layer_norm": norm_init(cfg.pair_channel),
        "initial_projection": af2_linear_init_leaves(ks[6], (cfg.single_channel,), (c,)),
    }
    params.update(with_prefix(fold, "fold_iteration"))
    return params
