"""lDDT scorer properties and a hand-computed case."""
import numpy as np

from protein_structure_tokenizer_tpu.eval.lddt import lddt, lddt_from_atom37


def _chain(n, spacing=3.8):
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * spacing
    return pos


def test_identity_is_one():
    pos = _chain(10)
    res = np.arange(10)
    g, per = lddt(pos, pos, res)
    assert g == 1.0
    np.testing.assert_array_equal(per, np.ones(10))


def test_rigid_motion_is_one():
    """lDDT is superposition-free: rigid transforms preserve all distances."""
    rng = np.random.RandomState(0)
    pos = rng.randn(12, 3) * 5
    res = np.arange(12)
    theta = 0.7
    rot = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    )
    moved = pos @ rot.T + np.array([10.0, -3.0, 2.0])
    g, _ = lddt(moved, pos, res)
    assert abs(g - 1.0) < 1e-9


def test_hand_computed_three_atoms():
    """3 atoms on a line, one displaced: check the threshold-average formula."""
    target = np.array([[0.0, 0, 0], [4.0, 0, 0], [8.0, 0, 0]])
    pred = target.copy()
    pred[2, 0] += 1.5  # distances to atom 2 off by 1.5 A
    res = np.arange(3)
    g, per = lddt(pred, target, res)
    # Pairs (0,1): delta 0 -> preserved 1.0.  Pairs (0,2) and (1,2): delta
    # 1.5 -> within {2, 4} only -> 0.5.  Global over 6 ordered pairs:
    # (2*1.0 + 4*0.5) / 6 = 2/3.
    assert abs(g - 2.0 / 3.0) < 1e-12
    np.testing.assert_allclose(per, [0.75, 0.75, 0.5])


def test_inclusion_radius():
    """Distances >= 15 A in the target are not scored."""
    target = np.array([[0.0, 0, 0], [20.0, 0, 0]])
    pred = np.array([[0.0, 0, 0], [30.0, 0, 0]])  # massively wrong but excluded
    g, _ = lddt(pred, target, np.arange(2))
    assert g == 0.0  # no scored pairs at all


def test_atom37_wrapper_ca_only():
    n = 8
    atom37 = np.zeros((n, 37, 3))
    atom37[:, 1] = _chain(n)  # CA
    mask = np.zeros((n, 37))
    mask[:, 1] = 1
    out = lddt_from_atom37(atom37, atom37, mask, ca_only=True)
    assert out["global_lddt"] == 1.0
    assert out["per_residue_lddt"].shape == (n,)
