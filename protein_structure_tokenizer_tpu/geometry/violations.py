"""Torsion extraction and structural-violation metrics.

Capability parity with the reference's unused-but-shipped all_atom surface
(reference all_atom.py:268-455 atom37_to_torsion_angles, 595-983 violation /
clash losses, 984-1084 find_optimal_renaming), re-designed batched-first:
every function takes arbitrary leading batch dimensions instead of the
reference's fixed per-sample ranks, and the O(N^2) atom-pair distances are
computed in matmul form on the MXU (|a-b|^2 = |a|^2 + |b|^2 - 2ab) instead of
materializing a (N, N, 14, 14, 3) broadcast-difference tensor.  ``exact=True``
restores the reference's broadcast-subtract float semantics for conformance.

The reference's ``within_residue_violations`` reads distance bounds from a
``stereo_chemical_props.txt`` resource that is *not shipped* in the release
(its loader cannot run); here the bounds are explicit arguments, with a
Van-der-Waals fallback builder ``clash_bounds_from_radii``.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from protein_structure_tokenizer_tpu.data import constants
from protein_structure_tokenizer_tpu.geometry import rigid


def _mask_mean(mask: jax.Array, value: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Mean of ``value`` over the last axis under ``mask``."""
    return jnp.sum(mask * value, axis=-1) / (eps + jnp.sum(mask, axis=-1))


def _bond_length(a: jax.Array, b: jax.Array, eps: float = 1e-6) -> jax.Array:
    return jnp.sqrt(eps + jnp.sum(jnp.square(a - b), axis=-1))


def atom37_to_torsion_angles(
    aatype: jax.Array,  # (..., N) int
    all_atom_pos: jax.Array,  # (..., N, 37, 3)
    all_atom_mask: jax.Array,  # (..., N, 37)
    placeholder_for_undefined: bool = False,
) -> Dict[str, jax.Array]:
    """The 7 torsions [pre_omega, phi, psi, chi1..chi4] as sin/cos.

    Returns ``torsion_angles_sin_cos`` (..., N, 7, 2), the pi-shifted
    ``alt_torsion_angles_sin_cos`` for ambiguous chis, and
    ``torsion_angles_mask`` (..., N, 7).
    """
    aatype = jnp.minimum(aatype, 20)
    batch_shape = aatype.shape[:-1]
    n = aatype.shape[-1]

    prev_pos = jnp.concatenate(
        [jnp.zeros_like(all_atom_pos[..., :1, :, :]), all_atom_pos[..., :-1, :, :]],
        axis=-3,
    )
    prev_mask = jnp.concatenate(
        [jnp.zeros_like(all_atom_mask[..., :1, :]), all_atom_mask[..., :-1, :]],
        axis=-2,
    )

    # Backbone torsion atom quadruples (..., N, 4, 3).  Atom37 slots:
    # 0 = N, 1 = CA, 2 = C, 4 = O.
    pre_omega_atoms = jnp.concatenate(
        [prev_pos[..., 1:3, :], all_atom_pos[..., 0:2, :]], axis=-2
    )
    phi_atoms = jnp.concatenate(
        [prev_pos[..., 2:3, :], all_atom_pos[..., 0:3, :]], axis=-2
    )
    psi_atoms = jnp.concatenate(
        [all_atom_pos[..., 0:3, :], all_atom_pos[..., 4:5, :]], axis=-2
    )

    pre_omega_mask = jnp.prod(prev_mask[..., 1:3], axis=-1) * jnp.prod(
        all_atom_mask[..., 0:2], axis=-1
    )
    phi_mask = prev_mask[..., 2] * jnp.prod(all_atom_mask[..., 0:3], axis=-1)
    psi_mask = jnp.prod(all_atom_mask[..., 0:3], axis=-1) * all_atom_mask[..., 4]

    # Chi quadruples gathered from the per-restype atom37 index table.
    chi_idx = jnp.asarray(constants.chi_atom37_indices())[aatype]  # (..., N, 4, 4)
    flat_idx = chi_idx.reshape(batch_shape + (n, 16))
    chi_atoms = jnp.take_along_axis(
        all_atom_pos, flat_idx[..., None], axis=-2
    ).reshape(batch_shape + (n, 4, 4, 3))
    chi_atoms_mask = jnp.prod(
        jnp.take_along_axis(all_atom_mask, flat_idx, axis=-1).reshape(
            batch_shape + (n, 4, 4)
        ),
        axis=-1,
    )
    chis_mask = jnp.asarray(constants.chi_angles_mask())[aatype] * chi_atoms_mask

    torsion_atoms = jnp.concatenate(
        [
            pre_omega_atoms[..., None, :, :],
            phi_atoms[..., None, :, :],
            psi_atoms[..., None, :, :],
            chi_atoms,
        ],
        axis=-3,
    )  # (..., N, 7, 4, 3)
    torsion_angles_mask = jnp.concatenate(
        [
            pre_omega_mask[..., None],
            phi_mask[..., None],
            psi_mask[..., None],
            chis_mask,
        ],
        axis=-1,
    )  # (..., N, 7)

    # Dihedral frame: atom1 on the negative x-axis, atom2 the origin, atom0 in
    # the xy-plane; atom3's (z, y) in that frame give (sin, cos).
    frames = rigid.rigids_from_3_points(
        point_on_neg_x_axis=torsion_atoms[..., 1, :],
        origin=torsion_atoms[..., 2, :],
        point_on_xy_plane=torsion_atoms[..., 0, :],
    )
    forth = frames.invert_apply(torsion_atoms[..., 3, :])
    sin_cos = jnp.stack([forth[..., 2], forth[..., 1]], axis=-1)
    sin_cos /= jnp.sqrt(jnp.sum(jnp.square(sin_cos), axis=-1, keepdims=True) + 1e-8)
    # psi is computed from O, which sits mirrored across the rotation axis.
    sin_cos *= jnp.asarray([1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0])[:, None]

    chi_is_ambiguous = jnp.asarray(constants.chi_pi_periodic())[aatype]
    mirror = jnp.concatenate(
        [jnp.ones(batch_shape + (n, 3)), 1.0 - 2.0 * chi_is_ambiguous], axis=-1
    )
    alt_sin_cos = sin_cos * mirror[..., None]

    if placeholder_for_undefined:
        placeholder = jnp.stack(
            [jnp.ones(sin_cos.shape[:-1]), jnp.zeros(sin_cos.shape[:-1])], axis=-1
        )
        m = torsion_angles_mask[..., None]
        sin_cos = sin_cos * m + placeholder * (1 - m)
        alt_sin_cos = alt_sin_cos * m + placeholder * (1 - m)

    return {
        "torsion_angles_sin_cos": sin_cos,
        "alt_torsion_angles_sin_cos": alt_sin_cos,
        "torsion_angles_mask": torsion_angles_mask,
    }


def extreme_ca_ca_distance_violations(
    pred_atom_positions: jax.Array,  # (..., N, 37|14, 3)
    pred_atom_mask: jax.Array,  # (..., N, 37|14)
    residue_index: jax.Array,  # (..., N)
    max_angstrom_tolerance: float = 1.5,
) -> jax.Array:
    """Fraction of consecutive CA-CA pairs further than tolerance from ideal."""
    this_ca = pred_atom_positions[..., :-1, 1, :]
    next_ca = pred_atom_positions[..., 1:, 1, :]
    mask = (
        pred_atom_mask[..., :-1, 1]
        * pred_atom_mask[..., 1:, 1]
        * (residue_index[..., 1:] - residue_index[..., :-1] == 1.0)
    )
    dist = _bond_length(this_ca, next_ca)
    violations = dist - constants.CA_CA_DISTANCE > max_angstrom_tolerance
    return _mask_mean(mask.astype(dist.dtype), violations)


def between_residue_bond_loss(
    pred_atom_positions: jax.Array,  # (..., N, 37|14, 3)
    pred_atom_mask: jax.Array,  # (..., N, 37|14)
    residue_index: jax.Array,  # (..., N)
    aatype: jax.Array,  # (..., N)
    tolerance_factor_soft: float = 12.0,
    tolerance_factor_hard: float = 12.0,
) -> Dict[str, jax.Array]:
    """Flat-bottom peptide-bond geometry loss (AF2 suppl. eq 44-45).

    Penalizes C-N bond-length and CA-C-N / C-N-CA bond-angle deviations
    between consecutive residues.  Works on atom37 or atom14 input since both
    index N, CA, C as slots 0, 1, 2.
    """
    this_ca = pred_atom_positions[..., :-1, 1, :]
    this_c = pred_atom_positions[..., :-1, 2, :]
    next_n = pred_atom_positions[..., 1:, 0, :]
    next_ca = pred_atom_positions[..., 1:, 1, :]
    this_ca_mask = pred_atom_mask[..., :-1, 1]
    this_c_mask = pred_atom_mask[..., :-1, 2]
    next_n_mask = pred_atom_mask[..., 1:, 0]
    next_ca_mask = pred_atom_mask[..., 1:, 1]
    no_gap = (residue_index[..., 1:] - residue_index[..., :-1] == 1.0).astype(
        this_ca.dtype
    )

    # C-N bond length (proline's ring shifts the expected length).
    c_n_len = _bond_length(this_c, next_n)
    next_is_pro = (aatype[..., 1:] == constants.RESTYPE_ORDER["P"]).astype(
        c_n_len.dtype
    )
    gt_len = (1.0 - next_is_pro) * constants.BETWEEN_RES_BOND_LENGTH_C_N[
        0
    ] + next_is_pro * constants.BETWEEN_RES_BOND_LENGTH_C_N[1]
    gt_std = (1.0 - next_is_pro) * constants.BETWEEN_RES_BOND_LENGTH_STDDEV_C_N[
        0
    ] + next_is_pro * constants.BETWEEN_RES_BOND_LENGTH_STDDEV_C_N[1]
    c_n_error = jnp.sqrt(1e-6 + jnp.square(c_n_len - gt_len))
    c_n_loss_per_res = jax.nn.relu(c_n_error - tolerance_factor_soft * gt_std)
    mask = this_c_mask * next_n_mask * no_gap
    c_n_loss = _mask_mean(mask, c_n_loss_per_res, eps=1e-6)
    c_n_violation = mask * (c_n_error > tolerance_factor_hard * gt_std)

    # Bond angles via unit-vector cosines.
    ca_c_len = _bond_length(this_ca, this_c)
    n_ca_len = _bond_length(next_n, next_ca)
    c_ca_unit = (this_ca - this_c) / ca_c_len[..., None]
    c_n_unit = (next_n - this_c) / c_n_len[..., None]
    n_ca_unit = (next_ca - next_n) / n_ca_len[..., None]

    ca_c_n_cos = jnp.sum(c_ca_unit * c_n_unit, axis=-1)
    gt_angle = constants.BETWEEN_RES_COS_ANGLES_CA_C_N[0]
    # NOTE: the reference (and AF2 upstream) uses the *bond-length* stddev
    # for this angle's tolerance — reproduced for parity.
    gt_std = constants.BETWEEN_RES_BOND_LENGTH_STDDEV_C_N[0]
    ca_c_n_error = jnp.sqrt(1e-6 + jnp.square(ca_c_n_cos - gt_angle))
    ca_c_n_loss_per_res = jax.nn.relu(ca_c_n_error - tolerance_factor_soft * gt_std)
    mask = this_ca_mask * this_c_mask * next_n_mask * no_gap
    ca_c_n_loss = _mask_mean(mask, ca_c_n_loss_per_res, eps=1e-6)
    ca_c_n_violation = mask * (ca_c_n_error > tolerance_factor_hard * gt_std)

    c_n_ca_cos = jnp.sum(-c_n_unit * n_ca_unit, axis=-1)
    gt_angle, gt_std = constants.BETWEEN_RES_COS_ANGLES_C_N_CA
    c_n_ca_error = jnp.sqrt(1e-6 + jnp.square(c_n_ca_cos - gt_angle))
    c_n_ca_loss_per_res = jax.nn.relu(c_n_ca_error - tolerance_factor_soft * gt_std)
    mask = this_c_mask * next_n_mask * next_ca_mask * no_gap
    c_n_ca_loss = _mask_mean(mask, c_n_ca_loss_per_res, eps=1e-6)
    c_n_ca_violation = mask * (c_n_ca_error > tolerance_factor_hard * gt_std)

    # Distribute each bond's loss onto both flanking residues.
    per_bond = c_n_loss_per_res + ca_c_n_loss_per_res + c_n_ca_loss_per_res
    pad_lo = [(0, 0)] * (per_bond.ndim - 1) + [(0, 1)]
    pad_hi = [(0, 0)] * (per_bond.ndim - 1) + [(1, 0)]
    per_residue_loss_sum = 0.5 * (jnp.pad(per_bond, pad_lo) + jnp.pad(per_bond, pad_hi))

    violation_mask = jnp.max(
        jnp.stack([c_n_violation, ca_c_n_violation, c_n_ca_violation]), axis=0
    )
    violation_mask = jnp.maximum(
        jnp.pad(violation_mask, pad_lo), jnp.pad(violation_mask, pad_hi)
    )

    return {
        "c_n_loss_mean": c_n_loss,
        "ca_c_n_loss_mean": ca_c_n_loss,
        "c_n_ca_loss_mean": c_n_ca_loss,
        "per_residue_loss_sum": per_residue_loss_sum,
        "per_residue_violation_mask": violation_mask,
    }


def _atom_pair_dists(positions: jax.Array, exact: bool, eps: float = 1e-10) -> jax.Array:
    """All-pairs atom distances (..., N, N, A, A) from (..., N, A, 3).

    Default: MXU matmul form |a-b|^2 = |a|^2 + |b|^2 - 2ab over the flattened
    (N*A) atom list — no (N, N, A, A, 3) intermediate.  ``exact=True`` uses the
    reference's broadcast-subtract float semantics.
    """
    n, a = positions.shape[-3], positions.shape[-2]
    if exact:
        diff = (
            positions[..., :, None, :, None, :] - positions[..., None, :, None, :, :]
        )
        return jnp.sqrt(eps + jnp.sum(jnp.square(diff), axis=-1))
    flat = positions.reshape(positions.shape[:-3] + (n * a, 3))
    sq = jnp.sum(jnp.square(flat), axis=-1)
    cross = jnp.einsum("...id,...jd->...ij", flat, flat)
    d2 = jax.nn.relu(sq[..., :, None] + sq[..., None, :] - 2.0 * cross)
    d2 = d2.reshape(positions.shape[:-3] + (n, a, n, a))
    # (..., N, A, N, A) -> (..., N, N, A, A)
    perm = tuple(range(d2.ndim - 4)) + tuple(
        d2.ndim - 4 + i for i in (0, 2, 1, 3)
    )
    return jnp.sqrt(eps + jnp.transpose(d2, perm))


def between_residue_clash_loss(
    atom14_pred_positions: jax.Array,  # (..., N, 14, 3)
    atom14_atom_exists: jax.Array,  # (..., N, 14)
    atom14_atom_radius: jax.Array,  # (..., N, 14)
    residue_index: jax.Array,  # (..., N)
    overlap_tolerance_soft: float = 1.5,
    overlap_tolerance_hard: float = 1.5,
    exact: bool = False,
) -> Dict[str, jax.Array]:
    """Steric-clash loss between non-bonded atoms of different residues."""
    dtype = atom14_pred_positions.dtype
    dists = _atom_pair_dists(atom14_pred_positions, exact=exact)

    dists_mask = (
        atom14_atom_exists[..., :, None, :, None]
        * atom14_atom_exists[..., None, :, None, :]
    )
    # Upper triangle only; same-residue pairs handled by within_residue_*.
    dists_mask *= (
        residue_index[..., :, None, None, None]
        < residue_index[..., None, :, None, None]
    )

    # Peptide C(i)-N(i+1) bonds and CYS-CYS disulfides are not clashes.
    c_one_hot = jax.nn.one_hot(2, num_classes=14, dtype=dtype)
    n_one_hot = jax.nn.one_hot(0, num_classes=14, dtype=dtype)
    neighbour = (
        residue_index[..., :, None, None, None] + 1
        == residue_index[..., None, :, None, None]
    )
    dists_mask *= 1.0 - neighbour * c_one_hot[:, None] * n_one_hot[None, :]
    sg = constants.RESTYPE_NAME_TO_ATOM14_NAMES["CYS"].index("SG")
    sg_one_hot = jax.nn.one_hot(sg, num_classes=14, dtype=dtype)
    dists_mask *= 1.0 - sg_one_hot[:, None] * sg_one_hot[None, :]

    lower_bound = dists_mask * (
        atom14_atom_radius[..., :, None, :, None]
        + atom14_atom_radius[..., None, :, None, :]
    )
    error = dists_mask * jax.nn.relu(lower_bound - overlap_tolerance_soft - dists)

    reduce_axes = tuple(range(-4, 0))
    mean_loss = jnp.sum(error, axis=reduce_axes) / (
        1e-6 + jnp.sum(dists_mask, axis=reduce_axes)
    )
    per_atom_loss_sum = jnp.sum(error, axis=(-4, -2)) + jnp.sum(error, axis=(-3, -1))
    clash = dists_mask * (dists < lower_bound - overlap_tolerance_hard)
    per_atom_clash_mask = jnp.maximum(
        jnp.max(clash, axis=(-4, -2)), jnp.max(clash, axis=(-3, -1))
    )
    return {
        "mean_loss": mean_loss,
        "per_atom_loss_sum": per_atom_loss_sum,
        "per_atom_clash_mask": per_atom_clash_mask,
    }


def clash_bounds_from_radii(
    aatype: jax.Array, overlap_tolerance: float = 1.5
) -> jax.Array:
    """Van-der-Waals lower distance bounds (..., N, 14, 14).

    Fallback for the reference's make_atom14_dists_bounds, whose
    stereo_chemical_props.txt resource is not shipped in the release: every
    intra-residue pair gets bound r_i + r_j - tolerance (bonded pairs are
    over-penalized relative to true stereochemical bounds).
    """
    radius = jnp.asarray(constants.atom14_van_der_waals_radius())[
        jnp.minimum(aatype, 20)
    ]
    return jax.nn.relu(
        radius[..., :, None] + radius[..., None, :] - overlap_tolerance
    )


def within_residue_violations(
    atom14_pred_positions: jax.Array,  # (..., N, 14, 3)
    atom14_atom_exists: jax.Array,  # (..., N, 14)
    atom14_dists_lower_bound: jax.Array,  # (..., N, 14, 14)
    atom14_dists_upper_bound: jax.Array,  # (..., N, 14, 14)
    tighten_bounds_for_loss: float = 0.0,
) -> Dict[str, jax.Array]:
    """Distance-bound violations between atoms of the same residue."""
    masks = 1.0 - jnp.eye(14, dtype=atom14_atom_exists.dtype)
    masks = masks * (
        atom14_atom_exists[..., :, None] * atom14_atom_exists[..., None, :]
    )
    diff = atom14_pred_positions[..., :, None, :] - atom14_pred_positions[..., None, :, :]
    dists = jnp.sqrt(1e-10 + jnp.sum(jnp.square(diff), axis=-1))

    low_err = jax.nn.relu(atom14_dists_lower_bound + tighten_bounds_for_loss - dists)
    high_err = jax.nn.relu(dists - (atom14_dists_upper_bound - tighten_bounds_for_loss))
    loss = masks * (low_err + high_err)
    per_atom_loss_sum = jnp.sum(loss, axis=-2) + jnp.sum(loss, axis=-1)

    violations = masks * (
        (dists < atom14_dists_lower_bound) | (dists > atom14_dists_upper_bound)
    )
    per_atom_violations = jnp.maximum(
        jnp.max(violations, axis=-2), jnp.max(violations, axis=-1)
    )
    return {
        "per_atom_loss_sum": per_atom_loss_sum,
        "per_atom_violations": per_atom_violations,
    }


def alt_gt_positions(
    aatype: jax.Array,  # (..., N)
    atom14_gt_positions: jax.Array,  # (..., N, 14, 3)
    atom14_gt_exists: jax.Array,  # (..., N, 14)
):
    """Name-swapped ground truth for ambiguous sidechain atoms.

    Returns (alt_positions, alt_exists, atom_is_ambiguous) built from the
    per-restype swap permutation (ASP/GLU/PHE/TYR symmetric atoms).
    """
    perm_table, ambiguous_table = constants.atom14_renaming_tables()
    aatype = jnp.minimum(aatype, 20)
    perm = jnp.asarray(perm_table)[aatype]  # (..., N, 14)
    alt_pos = jnp.take_along_axis(atom14_gt_positions, perm[..., None], axis=-2)
    alt_exists = jnp.take_along_axis(atom14_gt_exists, perm, axis=-1)
    ambiguous = jnp.asarray(ambiguous_table)[aatype] * atom14_gt_exists
    return alt_pos, alt_exists, ambiguous


def find_optimal_renaming(
    atom14_gt_positions: jax.Array,  # (..., N, 14, 3)
    atom14_alt_gt_positions: jax.Array,  # (..., N, 14, 3)
    atom14_atom_is_ambiguous: jax.Array,  # (..., N, 14)
    atom14_gt_exists: jax.Array,  # (..., N, 14)
    atom14_pred_positions: jax.Array,  # (..., N, 14, 3)
    exact: bool = False,
) -> jax.Array:
    """1.0 where the name-swapped ground truth matches the prediction better.

    AF2 suppl. alg. 26 renameSymmetricGroundTruthAtoms: per residue, compare
    pred-vs-gt distance consistency to all non-ambiguous atoms under both
    namings.
    """
    pred_dists = _atom_pair_dists(atom14_pred_positions, exact=exact)
    gt_dists = _atom_pair_dists(atom14_gt_positions, exact=exact)
    alt_gt_dists = _atom_pair_dists(atom14_alt_gt_positions, exact=exact)

    lddt = jnp.sqrt(1e-10 + jnp.square(pred_dists - gt_dists))
    alt_lddt = jnp.sqrt(1e-10 + jnp.square(pred_dists - alt_gt_dists))

    mask = (
        atom14_gt_exists[..., :, None, :, None]
        * atom14_atom_is_ambiguous[..., :, None, :, None]
        * atom14_gt_exists[..., None, :, None, :]
        * (1.0 - atom14_atom_is_ambiguous[..., None, :, None, :])
    )
    per_res = jnp.sum(mask * lddt, axis=(-3, -2, -1))
    alt_per_res = jnp.sum(mask * alt_lddt, axis=(-3, -2, -1))
    return (alt_per_res < per_res).astype(atom14_gt_positions.dtype)


def compute_structural_violations(
    atom14_pred_positions: jax.Array,  # (..., N, 14, 3)
    atom14_atom_exists: jax.Array,  # (..., N, 14)
    aatype: jax.Array,  # (..., N)
    residue_index: Optional[jax.Array] = None,  # (..., N)
    clash_overlap_tolerance: float = 1.5,
    bond_tolerance_factor: float = 12.0,
) -> Dict[str, jax.Array]:
    """Convenience aggregate: bond + clash + extreme-CA metrics in one call."""
    if residue_index is None:
        residue_index = jnp.broadcast_to(
            jnp.arange(aatype.shape[-1], dtype=jnp.float32), aatype.shape
        )
    radius = (
        jnp.asarray(constants.atom14_van_der_waals_radius())[jnp.minimum(aatype, 20)]
        * atom14_atom_exists
    )
    bond = between_residue_bond_loss(
        atom14_pred_positions,
        atom14_atom_exists,
        residue_index,
        aatype,
        tolerance_factor_soft=bond_tolerance_factor,
        tolerance_factor_hard=bond_tolerance_factor,
    )
    clash = between_residue_clash_loss(
        atom14_pred_positions,
        atom14_atom_exists,
        radius,
        residue_index,
        overlap_tolerance_soft=clash_overlap_tolerance,
        overlap_tolerance_hard=clash_overlap_tolerance,
    )
    extreme = extreme_ca_ca_distance_violations(
        atom14_pred_positions, atom14_atom_exists, residue_index
    )
    return {
        "bond": bond,
        "clash": clash,
        "extreme_ca_ca_violations": extreme,
        "total_per_residue_violations": jnp.maximum(
            bond["per_residue_violation_mask"],
            jnp.max(clash["per_atom_clash_mask"], axis=-1),
        ),
    }
