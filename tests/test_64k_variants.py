"""64k-codebook variants (BASELINE configs 3-4): encode smoke + codec checks.

Model-level reference goldens are impractical at K=64000 (the reference
materializes a (B, N, K, D) distance tensor); the FSQ codec itself is proven
bijective for the 64k level set in test_fsq.py and the distance kernel in
test_ops.py.  Here: the full encode path runs at 64k for df 1/2/4 and emits
ids within vocabulary, consistent with the mixed-radix codec.
"""
import numpy as np
import pytest

import jax

from protein_structure_tokenizer_tpu.models import fsq as fsq_lib
from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset


@pytest.mark.parametrize("df", [1, 2, 4])
def test_64k_encode_smoke(df):
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _synthetic_graph

    cfg = preset(64000, df)
    assert cfg.fsq.levels == (8, 8, 8, 5, 5, 5)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    graph = _synthetic_graph(1, 512, 50, df, 100)
    out = vq3d.encode_and_quantize(params, cfg, graph, compute_usage=True)

    tokens = np.asarray(out["tokens"])
    assert tokens.shape == (1, 512 // df)
    assert tokens.max() < 64000

    # Round-trip: ids -> codes must equal the quantized embedding.
    codes = np.asarray(vq3d.indexes_to_codes(cfg, out["tokens"]))
    n = 100 // df
    np.testing.assert_array_equal(codes[:, :n], np.asarray(out["quantize"])[:, :n])

    assert np.isfinite(float(out["perplexity"]))
