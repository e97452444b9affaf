"""Native C++ module tests: TM-score metrics + featurizer parity."""
import glob

import numpy as np
import pytest

from protein_structure_tokenizer_tpu import native
from protein_structure_tokenizer_tpu.eval import metrics

CASP14 = sorted(glob.glob("/root/reference/casp14_pdbs/*.pdb"))

requires_native = pytest.mark.skipif(
    not native.available(), reason="native library not built (run `make native`)"
)


def _rigid_copy(xyz, theta=0.5, t=(1.0, -2.0, 3.0)):
    rot = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    return xyz @ rot.T + np.asarray(t)


@requires_native
def test_tm_identity_and_rigid_invariance():
    xyz = np.random.RandomState(0).randn(120, 3) * 8
    self_metrics = native.tm_score(xyz, xyz)
    assert self_metrics["tm"] == pytest.approx(1.0)
    assert self_metrics["rmsd"] == pytest.approx(0.0, abs=1e-9)

    moved = _rigid_copy(xyz)
    rigid = native.tm_score(moved, xyz)
    assert rigid["tm"] == pytest.approx(1.0, abs=1e-6)
    assert rigid["rmsd"] == pytest.approx(0.0, abs=1e-6)
    assert rigid["gdt_ts"] == 1.0


@requires_native
def test_tm_python_fallback_agrees():
    rng = np.random.RandomState(1)
    xyz = rng.randn(90, 3) * 8
    noisy = _rigid_copy(xyz) + rng.randn(90, 3) * 1.5
    fast = native.tm_score(noisy, xyz)
    slow = metrics._tm_python(noisy, xyz)
    assert slow.rmsd == pytest.approx(fast["rmsd"], rel=1e-6)
    assert slow.tm == pytest.approx(fast["tm"], rel=0.02)
    assert slow.gdt_ts == pytest.approx(fast["gdt_ts"], abs=0.05)


@requires_native
@pytest.mark.skipif(not CASP14, reason="corpus not mounted")
def test_native_featurizer_matches_numpy():
    from protein_structure_tokenizer_tpu.data.featurize import (
        FeaturizeConfig,
        preprocess_sample,
    )
    from protein_structure_tokenizer_tpu.data.sample import parse_pdb_file

    sample = parse_pdb_file(CASP14[0])
    cfg = FeaturizeConfig()
    ref_graph, _ = preprocess_sample(sample, cfg)
    fast_graph, _ = preprocess_sample(sample, cfg, use_native=True)

    np.testing.assert_array_equal(fast_graph.senders, ref_graph.senders)
    np.testing.assert_array_equal(fast_graph.receivers, ref_graph.receivers)
    np.testing.assert_allclose(
        fast_graph.edge_features, ref_graph.edge_features, atol=1e-9
    )


def test_rmsd_known_value():
    xyz = np.random.RandomState(2).randn(64, 3) * 5
    shifted = xyz + 0.5  # pure translation: superposed RMSD 0
    m = metrics.structural_metrics(shifted, xyz)
    assert m.rmsd == pytest.approx(0.0, abs=1e-9)


@pytest.mark.skipif(not CASP14, reason="corpus not mounted")
def test_compare_structure_dirs(tmp_path):
    import shutil

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir(), b.mkdir()
    for p in CASP14[:2]:
        shutil.copy(p, a)
        shutil.copy(p, b)
    report = metrics.compare_structure_dirs(str(a), str(b), with_lddt=True)
    agg = report.pop("__aggregate__")
    assert len(report) == 2
    for v in report.values():
        assert v["tm"] == pytest.approx(1.0)
        assert v["lddt"] == pytest.approx(1.0)
    assert agg["tm_mean"] == pytest.approx(1.0)
    assert agg["lddt_mean"] == pytest.approx(1.0)

    with pytest.raises(ValueError):
        metrics.compare_structure_dirs(str(a), str(b), align=True, with_lddt=True)
