"""Host-side (numpy, float64) backbone frame math for featurization.

Replicates the reference's preprocessing numerics exactly — the graph edge
features are computed on the host in float64 and only cast to float32 at
device transfer, so these routines deliberately mirror
/root/reference/structure_tokenizer/model/quat_affine.py:406-523 (canonical
transforms) and rot_to_quat (71-123, eigh-based) step for step.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def make_canonical_transform(
    n_xyz: np.ndarray, ca_xyz: np.ndarray, c_xyz: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(translation, rotation) canonicalizing each residue: CA at origin, C on
    +x, N in the xy plane."""
    assert n_xyz.ndim == 2 and n_xyz.shape[-1] == 3

    translation = -ca_xyz
    n_xyz = n_xyz + translation
    c_xyz = c_xyz + translation

    c_x, c_y, c_z = c_xyz[:, 0], c_xyz[:, 1], c_xyz[:, 2]
    norm_xy = np.sqrt(1e-20 + c_x**2 + c_y**2)
    sin_c1, cos_c1 = -c_y / norm_xy, c_x / norm_xy
    zeros, ones = np.zeros_like(sin_c1), np.ones_like(sin_c1)
    c1 = np.stack(
        [
            np.stack([cos_c1, -sin_c1, zeros]),
            np.stack([sin_c1, cos_c1, zeros]),
            np.stack([zeros, zeros, ones]),
        ]
    )  # (3, 3, B)

    norm_xyz = np.sqrt(1e-20 + c_x**2 + c_y**2 + c_z**2)
    sin_c2, cos_c2 = c_z / norm_xyz, np.sqrt(c_x**2 + c_y**2) / norm_xyz
    c2 = np.stack(
        [
            np.stack([cos_c2, zeros, sin_c2]),
            np.stack([zeros, ones, zeros]),
            np.stack([-sin_c2, zeros, cos_c2]),
        ]
    )

    c_rot = np.einsum("ikb,kjb->ijb", c2, c1)
    n_rot_applied = np.einsum("ijb,bj->bi", c_rot, n_xyz)

    n_y, n_z = n_rot_applied[:, 1], n_rot_applied[:, 2]
    norm_yz = np.sqrt(1e-20 + n_y**2 + n_z**2)
    sin_n, cos_n = -n_z / norm_yz, n_y / norm_yz
    n_rot = np.stack(
        [
            np.stack([ones, zeros, zeros]),
            np.stack([zeros, cos_n, -sin_n]),
            np.stack([zeros, sin_n, cos_n]),
        ]
    )
    rotation = np.einsum("ikb,kjb->ijb", n_rot, c_rot)
    return translation, np.transpose(rotation, (2, 0, 1))


def make_transform_from_reference(
    n_xyz: np.ndarray, ca_xyz: np.ndarray, c_xyz: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(rotation (B,3,3), translation (B,3)) mapping the canonical backbone
    onto the observed one (rotation applied before translation)."""
    translation, rotation = make_canonical_transform(n_xyz, ca_xyz, c_xyz)
    return np.transpose(rotation, (0, 2, 1)), -translation


def rot_to_quat(rot: np.ndarray) -> np.ndarray:
    """Rotation matrices (..., 3, 3) -> quaternions (..., 4) via the
    eigenvector of the symmetric K matrix (numerically robust)."""
    xx, xy, xz = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    yx, yy, yz = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    zx, zy, zz = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    k = np.stack(
        [
            np.stack([xx + yy + zz, zy - yz, xz - zx, yx - xy], axis=-1),
            np.stack([zy - yz, xx - yy - zz, xy + yx, xz + zx], axis=-1),
            np.stack([xz - zx, xy + yx, yy - xx - zz, yz + zy], axis=-1),
            np.stack([yx - xy, xz + zx, yz + zy, zz - xx - yy], axis=-1),
        ],
        axis=-2,
    ) * (1.0 / 3.0)
    _, eigvecs = np.linalg.eigh(k)
    return eigvecs[..., -1]


def rigids_from_3_points_np(
    point_on_neg_x_axis: np.ndarray, origin: np.ndarray, point_on_xy_plane: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Gram-Schmidt frame (rot (..., 3, 3) with axes as columns, trans)."""
    e0 = origin - point_on_neg_x_axis
    e1 = point_on_xy_plane - origin

    def normalize(v):
        return v / np.sqrt(np.sum(np.square(v), axis=-1, keepdims=True) + 1e-8)

    e0 = normalize(e0)
    c = np.sum(e1 * e0, axis=-1, keepdims=True)
    e1 = normalize(e1 - c * e0)
    e2 = np.cross(e0, e1)
    rot = np.stack([e0, e1, e2], axis=-1)
    return rot, origin
