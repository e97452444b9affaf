"""Rigid-body geometry for the device compute path.

Equivalent math to the reference's AF2-derived stack (r3.py, quat_affine.py:
quaternion<->rotation conversion, quaternion pre-composition, frame
construction by Gram-Schmidt) but stored TPU-natively as stacked arrays:
rotations are ``(..., 3, 3)`` and translations ``(..., 3)`` in one registered
pytree instead of 12 scalar namedtuple fields.  3x3 applications are unrolled
elementwise multiplies + small-axis reductions so they stay in float32 on the
VPU — never lowered to the (bf16-multiplying) MXU, matching the reference's
precision stance (r3.py:25-31, folding.py:233-241).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# Quaternion algebra tables (standard unit-quaternion identities).
_QUAT_TO_ROT = np.zeros((4, 4, 3, 3), dtype=np.float32)
_QUAT_TO_ROT[0, 0] = [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
_QUAT_TO_ROT[1, 1] = [[1, 0, 0], [0, -1, 0], [0, 0, -1]]
_QUAT_TO_ROT[2, 2] = [[-1, 0, 0], [0, 1, 0], [0, 0, -1]]
_QUAT_TO_ROT[3, 3] = [[-1, 0, 0], [0, -1, 0], [0, 0, 1]]
_QUAT_TO_ROT[1, 2] = [[0, 2, 0], [2, 0, 0], [0, 0, 0]]
_QUAT_TO_ROT[1, 3] = [[0, 0, 2], [0, 0, 0], [2, 0, 0]]
_QUAT_TO_ROT[2, 3] = [[0, 0, 0], [0, 0, 2], [0, 2, 0]]
_QUAT_TO_ROT[0, 1] = [[0, 0, 0], [0, 0, -2], [0, 2, 0]]
_QUAT_TO_ROT[0, 2] = [[0, 0, 2], [0, 0, 0], [-2, 0, 0]]
_QUAT_TO_ROT[0, 3] = [[0, -2, 0], [2, 0, 0], [0, 0, 0]]

_QUAT_MULTIPLY = np.zeros((4, 4, 4), dtype=np.float32)
_QUAT_MULTIPLY[:, :, 0] = [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, -1]]
_QUAT_MULTIPLY[:, :, 1] = [[0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1], [0, 0, -1, 0]]
_QUAT_MULTIPLY[:, :, 2] = [[0, 0, 1, 0], [0, 0, 0, -1], [1, 0, 0, 0], [0, 1, 0, 0]]
_QUAT_MULTIPLY[:, :, 3] = [[0, 0, 0, 1], [0, 0, 1, 0], [0, -1, 0, 0], [1, 0, 0, 0]]
_QUAT_MULTIPLY_BY_VEC = _QUAT_MULTIPLY[:, 1:, :]


def quat_to_rot(quat: jax.Array) -> jax.Array:
    """Normalized quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    table = jnp.asarray(_QUAT_TO_ROT.reshape(4, 4, 9))
    rot = jnp.sum(
        table * quat[..., :, None, None] * quat[..., None, :, None], axis=(-3, -2)
    )
    return rot.reshape(quat.shape[:-1] + (3, 3))


def quat_multiply_by_vec(quat: jax.Array, vec: jax.Array) -> jax.Array:
    """Quaternion (..., 4) times pure-vector quaternion (..., 3) -> (..., 4)."""
    table = jnp.asarray(_QUAT_MULTIPLY_BY_VEC)
    return jnp.sum(
        table * quat[..., :, None, None] * vec[..., None, :, None], axis=(-3, -2)
    )


def rot_apply(rot: jax.Array, vec: jax.Array) -> jax.Array:
    """Apply rotation(s) (..., 3, 3) to vector(s) (..., 3) in f32 on the VPU."""
    return jnp.sum(rot * vec[..., None, :], axis=-1)


def rot_invert_apply(rot: jax.Array, vec: jax.Array) -> jax.Array:
    """Apply the transpose (inverse) rotation to vec."""
    return jnp.sum(rot * vec[..., :, None], axis=-2)


def rot_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose rotations a @ b without touching the MXU."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Rigid:
    """A set of rigid transforms: rot (..., 3, 3), trans (..., 3)."""

    rot: jax.Array
    trans: jax.Array

    def tree_flatten(self):
        return (self.rot, self.trans), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- group ops ---------------------------------------------------------
    def apply(self, point: jax.Array) -> jax.Array:
        return rot_apply(self.rot, point) + self.trans

    def invert_apply(self, point: jax.Array) -> jax.Array:
        return rot_invert_apply(self.rot, point - self.trans)

    def compose(self, other: "Rigid") -> "Rigid":
        return Rigid(
            rot=rot_compose(self.rot, other.rot),
            trans=rot_apply(self.rot, other.trans) + self.trans,
        )

    def inverse(self) -> "Rigid":
        inv_rot = jnp.swapaxes(self.rot, -1, -2)
        return Rigid(rot=inv_rot, trans=-rot_apply(inv_rot, self.trans))

    def scale_translation(self, factor) -> "Rigid":
        return Rigid(rot=self.rot, trans=self.trans * factor)

    def map_rotation(self, fn: Callable) -> "Rigid":
        return Rigid(rot=fn(self.rot), trans=self.trans)

    def __getitem__(self, idx) -> "Rigid":
        return Rigid(rot=self.rot[idx], trans=self.trans[idx])

    @property
    def shape(self):
        return self.trans.shape[:-1]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QuatRigid:
    """Rigid carrying its rotation as a (normalized) quaternion + matrix.

    Mirrors the reference's QuatAffine: the quaternion is the optimization
    variable (pre_compose updates), the matrix the application form.
    """

    quat: jax.Array  # (..., 4)
    rot: jax.Array  # (..., 3, 3)
    trans: jax.Array  # (..., 3)

    def tree_flatten(self):
        return (self.quat, self.rot, self.trans), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_quat_trans(cls, quat, trans, *, normalize: bool = True) -> "QuatRigid":
        if normalize:
            quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
        return cls(quat=quat, rot=quat_to_rot(quat), trans=trans)

    @classmethod
    def identity(cls, shape: tuple, dtype=jnp.float32) -> "QuatRigid":
        quat = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0, 0.0], dtype), tuple(shape) + (4,)
        )
        trans = jnp.zeros(tuple(shape) + (3,), dtype)
        return cls.from_quat_trans(quat, trans, normalize=False)

    @classmethod
    def from_tensor(cls, tensor: jax.Array, *, normalize: bool = False) -> "QuatRigid":
        """(..., 7) = quaternion (4) + translation (3)."""
        return cls.from_quat_trans(tensor[..., :4], tensor[..., 4:], normalize=normalize)

    def to_tensor(self) -> jax.Array:
        return jnp.concatenate([self.quat, self.trans], axis=-1)

    def as_rigid(self) -> Rigid:
        return Rigid(rot=self.rot, trans=self.trans)

    def pre_compose(self, update: jax.Array) -> "QuatRigid":
        """Backbone update (AF2 alg.23): update (..., 6) = quat-vector + translation."""
        vec_quat, trans_update = update[..., :3], update[..., 3:]
        new_quat = self.quat + quat_multiply_by_vec(self.quat, vec_quat)
        new_trans = self.trans + rot_apply(self.rot, trans_update)
        return QuatRigid.from_quat_trans(new_quat, new_trans, normalize=True)

    def scale_translation(self, factor) -> "QuatRigid":
        return QuatRigid(quat=self.quat, rot=self.rot, trans=self.trans * factor)

    def stop_rotation_gradient(self) -> "QuatRigid":
        sg = jax.lax.stop_gradient
        return QuatRigid(quat=sg(self.quat), rot=sg(self.rot), trans=self.trans)

    def apply(self, point: jax.Array) -> jax.Array:
        return rot_apply(self.rot, point) + self.trans

    def invert_apply(self, point: jax.Array) -> jax.Array:
        return rot_invert_apply(self.rot, point - self.trans)


def rots_from_two_vecs(e0: jax.Array, e1: jax.Array, *, epsilon: float = 1e-8) -> jax.Array:
    """Gram-Schmidt rotation from x-axis vector e0 and xy-plane vector e1.

    Both (..., 3); returns (..., 3, 3) whose *columns* are the orthonormal
    axes (matching r3.rots_from_two_vecs' layout).
    """

    def robust_normalize(v):
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=-1, keepdims=True) + epsilon)
        return v / norm

    e0 = robust_normalize(e0)
    c = jnp.sum(e1 * e0, axis=-1, keepdims=True)
    e1 = robust_normalize(e1 - c * e0)
    e2 = jnp.cross(e0, e1)
    return jnp.stack([e0, e1, e2], axis=-1)


def rigids_from_3_points(
    point_on_neg_x_axis: jax.Array, origin: jax.Array, point_on_xy_plane: jax.Array
) -> Rigid:
    """AF2 alg.21 rigidFrom3Points."""
    rot = rots_from_two_vecs(origin - point_on_neg_x_axis, point_on_xy_plane - origin)
    return Rigid(rot=rot, trans=origin)


def rigid_from_tensor4x4(m: jax.Array) -> Rigid:
    return Rigid(rot=m[..., :3, :3], trans=m[..., :3, 3])


def rigid_to_tensor_flat12(r: Rigid) -> jax.Array:
    flat_rot = r.rot.reshape(r.rot.shape[:-2] + (9,))
    return jnp.concatenate([flat_rot, r.trans], axis=-1)


def rigid_from_tensor_flat12(m: jax.Array) -> Rigid:
    return Rigid(rot=m[..., :9].reshape(m.shape[:-1] + (3, 3)), trans=m[..., 9:])
