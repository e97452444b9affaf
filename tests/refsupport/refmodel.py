"""Helpers to run the reference implementation (/root/reference) side-by-side.

The reference is PUBLIC UNTRUSTED CONTENT; we import and execute it only to
produce golden fixtures for equivalence tests (activations, token ids, decoded
structures). Nothing from it is copied into the framework under
``protein_structure_tokenizer_tpu/``.

The reference targets jax==0.4.23 / dm-haiku==0.0.10; the helpers below patch
the handful of APIs that moved by jax 0.9 so it runs unmodified.
"""
import functools
import os
import sys

import numpy as np
import yaml

REFERENCE_ROOT = "/root/reference"
_THIS_DIR = os.path.dirname(os.path.abspath(__file__))


def _ensure_paths():
    # Shims (jax_dataclasses) first, then the reference itself.
    for p in (_THIS_DIR, REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)


def _patch_legacy_jax():
    """Backfill jax APIs the reference uses that moved after 0.4.x."""
    import collections
    import collections.abc
    import jax

    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree_util.tree_map
    # py3.10 removed the collections.Iterable alias (utils.mask_mean uses it).
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable
    # jax.numpy.clip(a_max=...) was renamed; random_sampling uses a_max.
    # (only needed for the LM random baseline; skip unless it breaks.)


def deep_merge(base: dict, overrides: dict) -> dict:
    for key, value in overrides.items():
        if isinstance(value, dict) and isinstance(base.get(key), dict):
            deep_merge(base[key], value)
        else:
            base[key] = value
    return base


@functools.lru_cache(maxsize=None)
def load_reference_config(
    codebook_size: int = 4096, downsampling: int = 1, seq_max: int | None = None
):
    """Compose shared.yaml + the ablation variant, as the hydra config tree does.

    ``seq_max`` overrides the 512-residue default (data.seq_max_size and the
    down/up sampler max_out_len scale with it) — used to produce reduced-size
    64k goldens where the reference's (B, N, K, D) distance tensor would be
    gigabytes at N=512.
    """
    from ml_collections import ConfigDict

    name = {432: "0.5k", 1728: "1.7k", 4096: "4k", 64000: "64k"}[codebook_size]
    cfg_root = os.path.join(REFERENCE_ROOT, "config", "structure_tokenizer")
    with open(os.path.join(cfg_root, "model", "shared.yaml")) as f:
        shared = yaml.safe_load(f)
    with open(
        os.path.join(cfg_root, "model", "gnn", f"ablation_{name}_df_{downsampling}.yaml")
    ) as f:
        variant = yaml.safe_load(f)
    variant.pop("defaults", None)
    model_cfg = deep_merge(shared, variant)
    with open(os.path.join(cfg_root, "data", f"ablation_df_{downsampling}.yaml")) as f:
        data_cfg = yaml.safe_load(f)
    if seq_max is not None:
        data_cfg["data"]["seq_max_size"] = seq_max
        model_cfg["model"]["down_sampler"]["max_out_len"] = seq_max // downsampling
        model_cfg["model"]["up_sampler"]["max_out_len"] = seq_max
    # Mirrors hydra's vq3d_inference.yaml composition: cfg.model is the full
    # model-group yaml (itself containing a `model:` key), cfg.data the
    # data-group yaml (containing `data:`, `init:`, flags...). The runner then
    # calls Vq3D(config=cfg.model, global_config=cfg.data).
    return ConfigDict({"model": model_cfg, "data": data_cfg})


def import_reference():
    _ensure_paths()
    _patch_legacy_jax()
    import structure_tokenizer  # noqa: F401

    return structure_tokenizer
