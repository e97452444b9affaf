"""Training losses for the tokenizer autoencoder.

The reference release ships the loss functions but no optimizer driver
(/root/reference/structure_tokenizer/model/folding.py:528-649; SURVEY.md §3.4).
This module provides batched equivalents — clamped/unclamped backbone FAPE
over the refinement trajectory and the all-atom (backbone-atom) sidechain
FAPE — plus a composed training objective, enabling full from-scratch
training in this framework.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.geometry.backbone import frame_aligned_point_error
from protein_structure_tokenizer_tpu.geometry.rigid import (
    QuatRigid,
    Rigid,
    rigid_from_tensor_flat12,
)


@dataclasses.dataclass(frozen=True)
class FapeConfig:
    clamp_distance: float = 10.0
    loss_unit_distance: float = 10.0
    pct_unclamped: float = 0.0


@dataclasses.dataclass(frozen=True)
class LossConfig:
    fape: FapeConfig = FapeConfig()
    atom_clamp_distance: float = 10.0
    sidechain_length_scale: float = 10.0
    weight_frac: float = 0.5  # sidechain fraction of the structure loss
    weight: float = 1.0


def _batched_fape(pred_frames, target_frames, frames_mask, pred_pos, target_pos, pos_mask, **kw):
    """FAPE vmapped over arbitrary leading axes via broadcasting semantics."""
    fn = frame_aligned_point_error
    for _ in range(pred_frames.trans.ndim - 2):  # extra leading axes beyond (N, 3)
        fn = jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0), out_axes=0)
    return fn(pred_frames, target_frames, frames_mask, pred_pos, target_pos, pos_mask, **kw)


def backbone_loss(
    cfg: FapeConfig,
    traj: jax.Array,  # (L, B, N, 7) scaled affine trajectory
    backbone_affine_tensor: jax.Array,  # (B, N, 7) ground truth
    backbone_affine_mask: jax.Array,  # (B, N)
    nodes_mask: jax.Array,  # (B, N, 1)
    rng: Optional[jax.Array] = None,
) -> dict:
    """Backbone FAPE across intermediate refinement iterations.

    Mirrors the reference: intermediate layers only (traj[:-1]), CA = frame
    translation, clamped FAPE with optional stochastic unclamping
    (folding.py:553-604).
    """
    int_affines = traj[:-1]  # (L-1, B, N, 7)
    pred = QuatRigid.from_tensor(int_affines).as_rigid()
    gt = QuatRigid.from_tensor(backbone_affine_tensor).as_rigid()

    num_layers = int_affines.shape[0]
    gt_b = Rigid(
        rot=jnp.broadcast_to(gt.rot, (num_layers,) + gt.rot.shape),
        trans=jnp.broadcast_to(gt.trans, (num_layers,) + gt.trans.shape),
    )
    frames_mask = jnp.broadcast_to(
        backbone_affine_mask, (num_layers,) + backbone_affine_mask.shape
    )
    pos_mask = jnp.broadcast_to(
        nodes_mask[..., 0], (num_layers,) + nodes_mask.shape[:-1]
    )

    def fape(clamp):
        fn = jax.vmap(
            jax.vmap(
                lambda pf, tf, fm, pp, tp, pm: frame_aligned_point_error(
                    pf, tf, fm, pp, tp, pm,
                    length_scale=cfg.loss_unit_distance,
                    l1_clamp_distance=clamp,
                )
            )
        )
        return fn(pred, gt_b, frames_mask, pred.trans, gt_b.trans, pos_mask)

    clamped = fape(cfg.clamp_distance)  # (L-1, B)
    if cfg.pct_unclamped > 0 and rng is not None:
        unclamped = fape(None)
        use_unclamped = jax.random.uniform(rng, clamped.shape) < cfg.pct_unclamped
        loss_per_layer = jnp.where(use_unclamped, unclamped, clamped)
    else:
        loss_per_layer = clamped

    return {"fape": loss_per_layer[-1], "loss": jnp.mean(loss_per_layer)}


def sidechain_loss(
    cfg: LossConfig,
    sidechains: dict,  # stacked per-iteration outputs from the structure module
    features: dict,
    nodes_mask: jax.Array,  # (B, N, 1)
) -> dict:
    """Backbone-atom FAPE against the rigid-group ground truth (final iter).

    Mirrors folding.py:607-649 (which inherits the sample featurizer's O<->C
    atom14 slot swap — both sides use the same convention so the loss is
    consistent).
    """
    gt_frames_flat = features["rigidgroups_gt_frames"]  # (B, N, 4, 12)
    gt_frames_mask = features["rigidgroups_gt_exists"]  # (B, N, 4)
    atom14_gt_positions = features["atom14_gt_positions"]  # (B, N, 14, 3)
    atom14_gt_exists = features["atom14_gt_exists"]  # (B, N, 14)

    batch = gt_frames_flat.shape[0]
    flat_gt_frames = rigid_from_tensor_flat12(gt_frames_flat.reshape(batch, -1, 12))
    flat_frames_mask = gt_frames_mask.reshape(batch, -1)
    flat_gt_positions = atom14_gt_positions.reshape(batch, -1, 3)
    pos_exists = atom14_gt_exists * nodes_mask
    flat_positions_mask = pos_exists.reshape(batch, -1)

    # Final iteration predictions, flattened over (N, groups/atoms).
    pred_frames = sidechains["frames"]  # Rigid (L, B, N, 4)
    pred_pos = sidechains["atom_pos"]  # (L, B, N, 14, 3)
    flat_pred_frames = Rigid(
        rot=pred_frames.rot[-1].reshape(batch, -1, 3, 3),
        trans=pred_frames.trans[-1].reshape(batch, -1, 3),
    )
    flat_pred_positions = pred_pos[-1].reshape(batch, -1, 3)

    fape = jax.vmap(
        lambda pf, tf, fm, pp, tp, pm: frame_aligned_point_error(
            pf, tf, fm, pp, tp, pm,
            length_scale=cfg.sidechain_length_scale,
            l1_clamp_distance=cfg.atom_clamp_distance,
        )
    )(
        flat_pred_frames,
        flat_gt_frames,
        flat_frames_mask,
        flat_pred_positions,
        flat_gt_positions,
        flat_positions_mask,
    )
    return {"fape": fape, "loss": fape}


def structure_loss(
    cfg: LossConfig,
    decoded: dict,
    features: dict,
    nodes_mask: jax.Array,
    rng: Optional[jax.Array] = None,
) -> dict:
    bb = backbone_loss(
        cfg.fape,
        decoded["traj"],
        features["backbone_affine_tensor"],
        features["backbone_affine_mask"],
        nodes_mask,
        rng,
    )
    sc = sidechain_loss(cfg, decoded["sidechains"], features, nodes_mask)
    total = cfg.weight * (
        (1.0 - cfg.weight_frac) * bb["loss"] + cfg.weight_frac * jnp.mean(sc["loss"])
    )
    return {
        "loss": total,
        "backbone_fape": bb["loss"],
        "sidechain_fape": jnp.mean(sc["loss"]),
    }
