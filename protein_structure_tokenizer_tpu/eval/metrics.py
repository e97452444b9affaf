"""Structural similarity metrics + reconstruction evaluation harness.

Replaces the reference's subprocess calls into external TMscore/TMalign
binaries (/root/reference/structure_tokenizer/data/tools/tm_score.py:29-128,
utils/utils.py:71-156) with the in-repo native module (C++, ctypes) and a
pure-numpy fallback with identical semantics.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from protein_structure_tokenizer_tpu import native
from protein_structure_tokenizer_tpu.data import constants


@dataclasses.dataclass(frozen=True)
class StructuralMetrics:
    rmsd: float
    tm: float
    maxsub: float
    gdt_ts: float
    gdt_ha: float
    d0: float

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


def kabsch_superpose(model: np.ndarray, target: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Optimal (R, t) mapping model onto target (both (N, 3))."""
    cm, ct = model.mean(0), target.mean(0)
    h = (model - cm).T @ (target - ct)
    u, s, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    correction = np.diag([1.0, 1.0, d])
    rot = vt.T @ correction @ u.T
    return rot, ct - rot @ cm


def _tm_python(model: np.ndarray, target: np.ndarray) -> StructuralMetrics:
    """Pure-numpy fallback mirroring the native search."""
    n = len(model)
    d0 = max(1.24 * (n - 15) ** (1.0 / 3.0) - 1.8, 0.5) if n > 21 else 0.5
    d0_sq = d0 * d0

    rot, trans = kabsch_superpose(model, target)
    moved = model @ rot.T + trans
    rmsd = float(np.sqrt(np.mean(np.sum((moved - target) ** 2, axis=-1))))

    best_tm, best_ms, best_sq = 0.0, 0.0, np.sum((moved - target) ** 2, axis=-1)

    def score(m):
        dd = np.sum((m - target) ** 2, axis=-1)
        tm = float(np.mean(1.0 / (1.0 + dd / d0_sq)))
        ms_mask = dd < 3.5**2
        ms = float(np.sum(1.0 / (1.0 + dd[ms_mask] / 3.5**2)) / n)
        return tm, ms, dd

    tm, ms, _ = score(moved)
    best_tm, best_ms = tm, ms

    seed_lens = []
    length = n
    while length >= 4:
        seed_lens.append(length)
        length //= 2
    for seed in seed_lens:
        for start in range(0, n - seed + 1, max(1, seed // 2)):
            idx = np.arange(start, start + seed)
            for it in range(20):
                if len(idx) < 4:
                    break
                rot, trans = kabsch_superpose(model[idx], target[idx])
                m = model @ rot.T + trans
                tm, ms, dd = score(m)
                if tm > best_tm:
                    best_tm, best_sq = tm, dd
                best_ms = max(best_ms, ms)
                d_cut = max(d0 + 1.0 - 0.5 * it, 3.0)
                nxt = np.where(dd < d_cut * d_cut)[0]
                if len(nxt) < 4 or (len(nxt) == len(idx) and np.array_equal(nxt, idx)):
                    break
                idx = nxt

    def frac(cut):
        return float(np.mean(best_sq < cut * cut))

    gdt_ts = (frac(1) + frac(2) + frac(4) + frac(8)) / 4
    gdt_ha = (frac(0.5) + frac(1) + frac(2) + frac(4)) / 4
    return StructuralMetrics(rmsd=rmsd, tm=best_tm, maxsub=best_ms, gdt_ts=gdt_ts, gdt_ha=gdt_ha, d0=d0)


def structural_metrics(model_xyz: np.ndarray, target_xyz: np.ndarray) -> StructuralMetrics:
    """TM-score family for 1:1 corresponding coordinates (native when built)."""
    result = native.tm_score(model_xyz, target_xyz)
    if result is not None:
        return StructuralMetrics(**{k: result[k] for k in (
            "rmsd", "tm", "maxsub", "gdt_ts", "gdt_ha", "d0")})
    return _tm_python(model_xyz, target_xyz)


@dataclasses.dataclass(frozen=True)
class AlignMetrics:
    tm_norm_a: float
    tm_norm_b: float
    rmsd_aligned: float
    n_aligned: int
    d0_a: float
    d0_b: float

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


def _tm_d0(n: int) -> float:
    return max(1.24 * (n - 15) ** (1.0 / 3.0) - 1.8, 0.5) if n > 21 else 0.5


def _needleman_wunsch(s: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Glocal NW (free end gaps) with TM-align's flat gap penalty -0.6."""
    na, nb = s.shape
    gap = -0.6
    val = np.zeros((na + 1, nb + 1))
    path = np.zeros((na + 1, nb + 1), np.uint8)  # 0 diag, 1 up, 2 left
    for i in range(1, na + 1):
        diag = val[i - 1, :-1] + s[i - 1]
        up = val[i - 1, 1:] + np.where(np.arange(1, nb + 1) == nb, 0.0, gap)
        row = val[i]
        for j in range(1, nb + 1):
            left = row[j - 1] + (0.0 if i == na else gap)
            best, d = diag[j - 1], 0
            if up[j - 1] > best:
                best, d = up[j - 1], 1
            if left > best:
                best, d = left, 2
            row[j] = best
            path[i, j] = d
    ia, ib = [], []
    i, j = na, nb
    while i > 0 and j > 0:
        d = path[i, j]
        if d == 0:
            ia.append(i - 1)
            ib.append(j - 1)
            i -= 1
            j -= 1
        elif d == 1:
            i -= 1
        else:
            j -= 1
    return np.array(ia[::-1], np.int64), np.array(ib[::-1], np.int64)


def _tm_rotation_search_pairs(a, b, ia, ib, d0, norm_len):
    """Best-TM superposition restricted to aligned pairs; returns (tm, moved_a)."""
    d0_sq = d0 * d0
    n_ali = len(ia)
    best_tm, best_moved = 0.0, None
    length = n_ali
    seed_lens = []
    while length >= 4:
        seed_lens.append(length)
        length //= 2
    for seed in seed_lens:
        for start in range(0, n_ali - seed + 1, max(1, seed // 2)):
            sel = np.arange(start, start + seed)
            for it in range(20):
                if len(sel) < 4:
                    break
                rot, trans = kabsch_superpose(a[ia[sel]], b[ib[sel]])
                moved = a @ rot.T + trans
                dd = np.sum((moved[ia] - b[ib]) ** 2, axis=-1)
                tm = float(np.sum(1.0 / (1.0 + dd / d0_sq))) / norm_len
                if tm > best_tm:
                    best_tm, best_moved = tm, moved
                d_cut = max(d0 + 1.0 - 0.5 * it, 3.0)
                nxt = np.where(dd < d_cut * d_cut)[0]
                if len(nxt) < 4 or (len(nxt) == len(sel) and np.array_equal(nxt, sel)):
                    break
                sel = nxt
    return best_tm, best_moved


def _tmalign_python(a: np.ndarray, b: np.ndarray) -> AlignMetrics:
    """Pure-numpy fallback mirroring the native TM-align search
    (native/tmalign.cc): gapless-threading seeds -> iterate rotation search
    with NW dynamic programming until the alignment converges."""
    na, nb = len(a), len(b)
    d0a, d0b = _tm_d0(na), _tm_d0(nb)
    nmin = min(na, nb)
    d0 = _tm_d0(nmin)
    d0_sq = d0 * d0

    seeds = []
    for off in range(-(na - 4), nb - 4 + 1):
        i0 = max(0, -off)
        i1 = min(na, nb - off)
        if i1 - i0 >= 4:
            ia = np.arange(i0, i1)
            seeds.append((ia, ia + off))
    ranked = []
    for ia, ib in seeds:
        rot, trans = kabsch_superpose(a[ia], b[ib])
        moved = a @ rot.T + trans
        dd = np.sum((moved[ia] - b[ib]) ** 2, axis=-1)
        ranked.append((float(np.sum(1.0 / (1.0 + dd / d0_sq))) / nmin, ia, ib))
    ranked.sort(key=lambda x: -x[0])

    best = (-1.0, None, None, None)  # tm, ia, ib, moved
    for _, ia, ib in ranked[:5]:
        for _ in range(8):
            tm, moved = _tm_rotation_search_pairs(a, b, ia, ib, d0, nmin)
            if moved is None:
                break
            if tm > best[0]:
                best = (tm, ia, ib, moved)
            dd = np.sum((moved[:, None] - b[None]) ** 2, axis=-1)
            s = 1.0 / (1.0 + dd / d0_sq)
            nia, nib = _needleman_wunsch(s)
            if np.array_equal(nia, ia) and np.array_equal(nib, ib):
                break
            ia, ib = nia, nib

    _, ia, ib, moved = best
    if ia is None:
        raise ValueError("alignment failed (chains too short?)")
    dd = np.sum((moved[ia] - b[ib]) ** 2, axis=-1)
    tm_a = float(np.sum(1.0 / (1.0 + dd / d0a**2))) / na
    tm_b = float(np.sum(1.0 / (1.0 + dd / d0b**2))) / nb
    ta, _ = _tm_rotation_search_pairs(a, b, ia, ib, d0a, na)
    tb, _ = _tm_rotation_search_pairs(a, b, ia, ib, d0b, nb)
    return AlignMetrics(
        tm_norm_a=max(tm_a, ta),
        tm_norm_b=max(tm_b, tb),
        rmsd_aligned=float(np.sqrt(np.mean(dd))),
        n_aligned=int(len(ia)),
        d0_a=d0a,
        d0_b=d0b,
    )


def align_metrics(a_xyz: np.ndarray, b_xyz: np.ndarray) -> AlignMetrics:
    """Sequence-independent alignment metrics (TMalign equivalent).

    Unlike :func:`structural_metrics`, chains may differ in length; the
    residue correspondence is searched (native/tmalign.cc when built).
    """
    result = native.tm_align(a_xyz, b_xyz)
    if result is not None:
        return AlignMetrics(**{k: result[k] for k in (
            "tm_norm_a", "tm_norm_b", "rmsd_aligned", "n_aligned", "d0_a", "d0_b")})
    return _tmalign_python(np.asarray(a_xyz, np.float64), np.asarray(b_xyz, np.float64))


def backbone_rmsd(
    pred_atom37: np.ndarray,
    target_atom37: np.ndarray,
    mask: Optional[np.ndarray] = None,
) -> float:
    """Superposed RMSD over backbone atoms (N, CA, C, O)."""
    idx = [constants.ATOM_ORDER[a] for a in constants.BACKBONE_ATOM_TYPES]
    pred = pred_atom37[:, idx].reshape(-1, 3)
    target = target_atom37[:, idx].reshape(-1, 3)
    if mask is not None:
        m = np.repeat(mask.astype(bool), len(idx))
        pred, target = pred[m], target[m]
    r = native.rmsd(pred, target)
    if r is not None:
        return r
    rot, trans = kabsch_superpose(pred, target)
    moved = pred @ rot.T + trans
    return float(np.sqrt(np.mean(np.sum((moved - target) ** 2, axis=-1))))


def ca_metrics(
    pred_atom37: np.ndarray, target_atom37: np.ndarray, mask: Optional[np.ndarray] = None
) -> StructuralMetrics:
    """TM-score metrics over CA traces (the TMscore binary's convention)."""
    pred = pred_atom37[:, constants.CA_INDEX]
    target = target_atom37[:, constants.CA_INDEX]
    if mask is not None:
        pred, target = pred[mask.astype(bool)], target[mask.astype(bool)]
    return structural_metrics(pred, target)


def compare_structure_dirs(
    predicted_dir: str, target_dir: str, *, align: bool = False,
    with_lddt: bool = False,
) -> Dict[str, Dict[str, float]]:
    """Directory-vs-directory comparison report (make_tm_compare equivalent).

    Pairs files by basename stem; returns per-structure metrics plus
    ``__aggregate__`` mean/std entries.  ``align=True`` uses the
    sequence-independent TM-align search (chains may differ in length — the
    reference's TMalign mode); default assumes 1:1 residue correspondence
    (its TMscore mode), truncating to the shorter chain.  ``with_lddt=True``
    adds a superposition-free global lDDT over mutually-resolved atoms
    (the reference's disabled OpenStructure lddt tool,
    /root/reference/structure_tokenizer/data/tools/lddt.py:26-99); requires
    the 1:1 mode.
    """
    from protein_structure_tokenizer_tpu.data.sample import parse_pdb_file

    if with_lddt and align:
        raise ValueError("--lddt requires 1:1 correspondence (no --align)")

    def stems(d):
        out = {}
        for f in os.listdir(d):
            if f.endswith(".pdb"):
                stem = f[:-4].replace("structure_", "")
                out[stem] = os.path.join(d, f)
        return out

    preds, targets = stems(predicted_dir), stems(target_dir)
    report: Dict[str, Dict[str, float]] = {}
    values: Dict[str, List[float]] = {}
    for stem in sorted(set(preds) & set(targets)):
        p = parse_pdb_file(preds[stem])
        t = parse_pdb_file(targets[stem])
        if align:
            metrics = align_metrics(
                p.atom37_positions[:, constants.CA_INDEX].astype(np.float64),
                t.atom37_positions[:, constants.CA_INDEX].astype(np.float64),
            )
        else:
            n = min(p.nb_residues, t.nb_residues)
            metrics = ca_metrics(
                p.atom37_positions[:n].astype(np.float64),
                t.atom37_positions[:n].astype(np.float64),
            )
        report[stem] = metrics.as_dict()
        if with_lddt:
            from protein_structure_tokenizer_tpu.eval.lddt import lddt_from_atom37

            n = min(p.nb_residues, t.nb_residues)
            both = (p.atom37_gt_exists[:n] & t.atom37_gt_exists[:n])
            scores = lddt_from_atom37(
                p.atom37_positions[:n], t.atom37_positions[:n], both
            )
            report[stem]["lddt"] = scores["global_lddt"]
        for k, v in report[stem].items():
            values.setdefault(k, []).append(v)
    if values:
        report["__aggregate__"] = {
            **{f"{k}_mean": float(np.mean(v)) for k, v in values.items()},
            **{f"{k}_std": float(np.std(v)) for k, v in values.items()},
        }
    return report
