"""Sequence-independent structural alignment (TMalign equivalent).

Covers the native C++ module (native/tmalign.cc) and the numpy fallback
(eval/metrics._tmalign_python) against constructed cases with known optimal
alignments, plus native-vs-python agreement.
"""
import numpy as np
import pytest

from protein_structure_tokenizer_tpu import native
from protein_structure_tokenizer_tpu.eval.metrics import (
    AlignMetrics,
    _tmalign_python,
    align_metrics,
)

requires_native = pytest.mark.skipif(
    not native.available(), reason="native library not built (run `make native`)"
)


def chain(n: int, seed: int = 0) -> np.ndarray:
    """A self-avoiding-ish random walk with ~3.8 Å steps (CA-trace-like)."""
    rng = np.random.RandomState(seed)
    steps = rng.randn(n, 3)
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    return np.cumsum(steps * 3.8, axis=0)


def rigid(xyz: np.ndarray, theta: float = 0.7, t=(5.0, -3.0, 2.0)) -> np.ndarray:
    rot = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    return xyz @ rot.T + np.asarray(t)


def impls():
    out = [("python", _tmalign_python)]
    if native.available():
        out.append(("native", lambda a, b: AlignMetrics(**{
            k: v for k, v in native.tm_align(a, b).items() if k != "alignment"
        })))
    return out


@pytest.mark.parametrize("name,fn", impls())
def test_identity_alignment(name, fn):
    b = chain(80)
    m = fn(b.copy(), b)
    assert m.n_aligned == 80
    assert m.tm_norm_a == pytest.approx(1.0, abs=1e-6)
    assert m.tm_norm_b == pytest.approx(1.0, abs=1e-6)
    assert m.rmsd_aligned < 1e-6


@pytest.mark.parametrize("name,fn", impls())
def test_rigid_fragment_found_at_offset(name, fn):
    b = chain(100, seed=1)
    frag = rigid(b[25:85])
    m = fn(frag, b)
    assert m.n_aligned == 60
    assert m.tm_norm_a == pytest.approx(1.0, abs=1e-5)
    # All 60 pairs superpose exactly: TM normalized by the full chain = 60/100.
    assert m.tm_norm_b == pytest.approx(0.6, abs=1e-5)
    assert m.rmsd_aligned < 1e-5


@requires_native
def test_native_alignment_indices():
    b = chain(100, seed=1)
    frag = rigid(b[25:85])
    r = native.tm_align(frag, b)
    np.testing.assert_array_equal(r["alignment"], np.arange(25, 85))


@pytest.mark.parametrize("name,fn", impls())
def test_gapped_alignment(name, fn):
    """A = B with a 10-residue internal deletion: DP must open a gap."""
    b = chain(90, seed=2)
    a = rigid(np.concatenate([b[:40], b[50:]], axis=0), theta=0.3)
    m = fn(a, b)
    assert m.n_aligned >= 75  # 80 alignable; allow a few edge losses
    assert m.rmsd_aligned < 0.5
    assert m.tm_norm_b > 0.8


@pytest.mark.parametrize("name,fn", impls())
def test_unrelated_chains_score_low(name, fn):
    a, b = chain(70, seed=3), chain(70, seed=4)
    m = fn(a, b)
    assert m.tm_norm_a < 0.5
    assert m.tm_norm_b < 0.5


@requires_native
def test_native_matches_python():
    b = chain(60, seed=5)
    a = rigid(b[10:55], theta=1.1)
    mp = _tmalign_python(a, b)
    mn = align_metrics(a, b)  # routes to native when available
    assert mn.n_aligned == mp.n_aligned
    assert mn.tm_norm_a == pytest.approx(mp.tm_norm_a, abs=5e-3)
    assert mn.tm_norm_b == pytest.approx(mp.tm_norm_b, abs=5e-3)
    assert mn.rmsd_aligned == pytest.approx(mp.rmsd_aligned, abs=5e-3)


@pytest.mark.parametrize("name,fn", impls())
def test_both_normalizations_ordering(name, fn):
    """Shorter chain vs longer: norm by the longer length is <= by shorter."""
    b = chain(120, seed=6)
    a = rigid(b[:70], theta=0.2)
    m = fn(a, b)
    assert m.tm_norm_b <= m.tm_norm_a + 1e-9
    assert m.d0_b > m.d0_a
