"""Parity tests for geometry/violations.py vs the reference all_atom module.

Covers the reference's shipped-but-uncalled surface: atom37_to_torsion_angles
(all_atom.py:268-455), extreme_ca_ca/bond/clash/within violations (595-983)
and find_optimal_renaming (984-1084).
"""
import numpy as np
import pytest

from conftest import requires_reference

from protein_structure_tokenizer_tpu.data import constants
from protein_structure_tokenizer_tpu.geometry import violations


def _random_protein(seed: int, n: int = 24):
    """Random but protein-scaled coordinates + masks."""
    rng = np.random.RandomState(seed)
    aatype = rng.randint(0, 21, size=(n,)).astype(np.int32)
    # A meandering backbone: cumulative steps keep consecutive residues ~3.8A.
    ca = np.cumsum(rng.randn(n, 3) * 2.0 + np.array([3.0, 0.5, 0.0]), axis=0)
    pos37 = ca[:, None, :] + rng.randn(n, 37, 3) * 1.5
    mask37 = constants.restype_atom37_mask()[aatype] * (
        rng.rand(n, 37) > 0.05
    ).astype(np.float32)
    return aatype, pos37.astype(np.float32), mask37.astype(np.float32)


def _to_atom14(aatype, pos37, mask37):
    """Gather the residue's atom14 layout out of atom37 arrays."""
    idx37_of_14 = np.zeros((21, 14), dtype=np.int32)
    exists = np.zeros((21, 14), dtype=np.float32)
    for restype, letter in enumerate(constants.RESTYPES):
        names = constants.RESTYPE_NAME_TO_ATOM14_NAMES[constants.RESTYPE_1TO3[letter]]
        for slot, name in enumerate(names):
            if name:
                idx37_of_14[restype, slot] = constants.ATOM_ORDER[name]
                exists[restype, slot] = 1.0
    gather = idx37_of_14[np.minimum(aatype, 20)]
    pos14 = np.take_along_axis(pos37, gather[..., None], axis=-2)
    mask14 = np.take_along_axis(mask37, gather, axis=-1) * exists[np.minimum(aatype, 20)]
    return pos14, mask14


@requires_reference
def test_torsion_angles_match_reference():
    import jax.numpy as jnp
    from refmodel import import_reference

    import_reference()
    from structure_tokenizer.model import all_atom

    aatype, pos37, mask37 = _random_protein(0, n=16)
    ours = violations.atom37_to_torsion_angles(
        jnp.asarray(aatype), jnp.asarray(pos37), jnp.asarray(mask37)
    )
    theirs = all_atom.atom37_to_torsion_angles(
        jnp.asarray(aatype[None]), jnp.asarray(pos37[None]), jnp.asarray(mask37[None])
    )
    np.testing.assert_allclose(
        np.asarray(ours["torsion_angles_mask"]),
        np.asarray(theirs["torsion_angles_mask"])[0],
        atol=0,
    )
    mask = np.asarray(ours["torsion_angles_mask"])[..., None]
    np.testing.assert_allclose(
        np.asarray(ours["torsion_angles_sin_cos"]) * mask,
        np.asarray(theirs["torsion_angles_sin_cos"])[0] * mask,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["alt_torsion_angles_sin_cos"]) * mask,
        np.asarray(theirs["alt_torsion_angles_sin_cos"])[0] * mask,
        atol=2e-4,
    )


@requires_reference
def test_torsion_placeholder_and_batching():
    import jax.numpy as jnp

    aatype, pos37, mask37 = _random_protein(1, n=8)
    single = violations.atom37_to_torsion_angles(
        jnp.asarray(aatype), jnp.asarray(pos37), jnp.asarray(mask37),
        placeholder_for_undefined=True,
    )
    batched = violations.atom37_to_torsion_angles(
        jnp.asarray(np.stack([aatype] * 3)),
        jnp.asarray(np.stack([pos37] * 3)),
        jnp.asarray(np.stack([mask37] * 3)),
        placeholder_for_undefined=True,
    )
    np.testing.assert_allclose(
        np.asarray(batched["torsion_angles_sin_cos"])[1],
        np.asarray(single["torsion_angles_sin_cos"]),
        rtol=1e-6,
    )
    # Undefined torsions get the (sin, cos) = (1, 0) placeholder.
    m = np.asarray(single["torsion_angles_mask"]) == 0
    sc = np.asarray(single["torsion_angles_sin_cos"])
    assert np.all(sc[m] == np.array([1.0, 0.0]))


@requires_reference
def test_extreme_ca_ca_and_bond_loss_match_reference():
    import jax.numpy as jnp
    from refmodel import import_reference

    import_reference()
    from structure_tokenizer.model import all_atom

    aatype, pos37, mask37 = _random_protein(2, n=20)
    residue_index = np.arange(20, dtype=np.float32)
    residue_index[10:] += 1  # a chain break

    ours = violations.extreme_ca_ca_distance_violations(
        jnp.asarray(pos37), jnp.asarray(mask37), jnp.asarray(residue_index)
    )
    theirs = all_atom.extreme_ca_ca_distance_violations(
        jnp.asarray(pos37), jnp.asarray(mask37), jnp.asarray(residue_index)
    )
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-6)

    ours = violations.between_residue_bond_loss(
        jnp.asarray(pos37), jnp.asarray(mask37),
        jnp.asarray(residue_index), jnp.asarray(aatype),
    )
    theirs = all_atom.between_residue_bond_loss(
        jnp.asarray(pos37), jnp.asarray(mask37),
        jnp.asarray(residue_index), jnp.asarray(aatype),
    )
    for key in theirs:
        np.testing.assert_allclose(
            np.asarray(ours[key]), np.asarray(theirs[key]), rtol=1e-5, atol=1e-6,
            err_msg=key,
        )


@requires_reference
@pytest.mark.parametrize("exact", [True, False])
def test_clash_loss_matches_reference(exact):
    import jax.numpy as jnp
    from refmodel import import_reference

    import_reference()
    from structure_tokenizer.model import all_atom

    aatype, pos37, mask37 = _random_protein(3, n=18)
    pos14, mask14 = _to_atom14(aatype, pos37, mask37)
    radius = constants.atom14_van_der_waals_radius()[aatype] * mask14
    residue_index = np.arange(18, dtype=np.float32)

    ours = violations.between_residue_clash_loss(
        jnp.asarray(pos14), jnp.asarray(mask14), jnp.asarray(radius),
        jnp.asarray(residue_index), exact=exact,
    )
    theirs = all_atom.between_residue_clash_loss(
        jnp.asarray(pos14), jnp.asarray(mask14), jnp.asarray(radius),
        jnp.asarray(residue_index),
    )
    tol = dict(rtol=1e-6, atol=1e-6) if exact else dict(rtol=1e-3, atol=2e-3)
    for key in theirs:
        np.testing.assert_allclose(
            np.asarray(ours[key]), np.asarray(theirs[key]), err_msg=key, **tol
        )


@requires_reference
def test_within_residue_violations_match_reference():
    import jax.numpy as jnp
    from refmodel import import_reference

    import_reference()
    from structure_tokenizer.model import all_atom

    aatype, pos37, mask37 = _random_protein(4, n=12)
    pos14, mask14 = _to_atom14(aatype, pos37, mask37)
    lower = np.asarray(violations.clash_bounds_from_radii(jnp.asarray(aatype)))
    upper = np.full((12, 14, 14), 1e9, dtype=np.float32)

    ours = violations.within_residue_violations(
        jnp.asarray(pos14), jnp.asarray(mask14), jnp.asarray(lower), jnp.asarray(upper)
    )
    theirs = all_atom.within_residue_violations(
        jnp.asarray(pos14), jnp.asarray(mask14), jnp.asarray(lower), jnp.asarray(upper)
    )
    for key in theirs:
        np.testing.assert_allclose(
            np.asarray(ours[key]), np.asarray(theirs[key]), rtol=1e-5, atol=1e-6,
            err_msg=key,
        )


@requires_reference
@pytest.mark.parametrize("exact", [True, False])
def test_find_optimal_renaming_matches_reference(exact):
    import jax.numpy as jnp
    from refmodel import import_reference

    import_reference()
    from structure_tokenizer.model import all_atom

    aatype, pos37, mask37 = _random_protein(5, n=14)
    gt14, exists14 = _to_atom14(aatype, pos37, mask37)
    pred14 = gt14 + np.random.RandomState(6).randn(*gt14.shape).astype(np.float32)

    alt_pos, _, ambiguous = violations.alt_gt_positions(
        jnp.asarray(aatype), jnp.asarray(gt14), jnp.asarray(exists14)
    )
    ours = violations.find_optimal_renaming(
        jnp.asarray(gt14), alt_pos, ambiguous, jnp.asarray(exists14),
        jnp.asarray(pred14), exact=exact,
    )
    theirs = all_atom.find_optimal_renaming(
        jnp.asarray(gt14), alt_pos, ambiguous, jnp.asarray(exists14),
        jnp.asarray(pred14), jnp.asarray(exists14),
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs))


def test_alt_gt_positions_swaps_asp():
    import jax.numpy as jnp

    aatype = np.array([constants.RESTYPE_ORDER["D"]], dtype=np.int32)  # ASP
    gt = np.zeros((1, 14, 3), dtype=np.float32)
    names = constants.RESTYPE_NAME_TO_ATOM14_NAMES["ASP"]
    od1, od2 = names.index("OD1"), names.index("OD2")
    gt[0, od1] = [1.0, 0, 0]
    gt[0, od2] = [2.0, 0, 0]
    exists = constants.atom14_mask()[aatype]
    alt, alt_exists, ambiguous = violations.alt_gt_positions(
        jnp.asarray(aatype), jnp.asarray(gt), jnp.asarray(exists)
    )
    alt = np.asarray(alt)
    assert np.allclose(alt[0, od1], [2.0, 0, 0]) and np.allclose(alt[0, od2], [1.0, 0, 0])
    amb = np.asarray(ambiguous)[0]
    assert amb[od1] == 1.0 and amb[od2] == 1.0 and amb.sum() == 2.0


def test_compute_structural_violations_smoke():
    import jax
    import jax.numpy as jnp

    aatype, pos37, mask37 = _random_protein(7, n=10)
    pos14, mask14 = _to_atom14(aatype, pos37, mask37)
    out = jax.jit(violations.compute_structural_violations)(
        jnp.asarray(np.stack([pos14] * 2)),
        jnp.asarray(np.stack([mask14] * 2)),
        jnp.asarray(np.stack([aatype] * 2)),
    )
    assert out["extreme_ca_ca_violations"].shape == (2,)
    assert out["total_per_residue_violations"].shape == (2, 10)
    assert np.isfinite(np.asarray(out["clash"]["mean_loss"])).all()
