"""Continuous (NoQuantizer) ablation: use_codebook=false pass-through."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset, preset_name


def _tiny_graph(batch, seq_max, k, df, n_real):
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _synthetic_graph

    return _synthetic_graph(batch, seq_max, k, df, n_real)


def test_continuous_preset_shape():
    cfg = preset("continuous", 1)
    assert cfg.fsq is None
    assert cfg.down_proj_dim == 6
    assert preset_name(None, 2) == "continuous_df_2"


def test_continuous_encode_is_passthrough():
    cfg = preset(None, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    graph = _tiny_graph(1, cfg.data.seq_max_size, cfg.data.graph_max_neighbor, 1, 128)
    out = vq3d.encode_and_quantize(params, cfg, graph)
    # NoQuantizer: quantize == continuous embedding, no rounding.
    np.testing.assert_array_equal(
        np.asarray(out["quantize"]), np.asarray(out["continuous_embedding"])
    )
    assert out["quantize"].shape == (1, cfg.data.seq_max_size, 6)
    assert not np.array_equal(
        np.asarray(out["quantize"]), np.round(np.asarray(out["quantize"]))
    )


def test_continuous_has_no_token_codec():
    cfg = preset("continuous", 1)
    with pytest.raises(ValueError):
        vq3d.indexes_to_codes(cfg, jnp.zeros((1, 4), jnp.int32))
