"""Generate golden fixtures by running the reference implementation on CPU.

Produces, per model variant, an .npz with:
  * the reference's randomly-initialized parameters (flat "scope//name" keys)
  * a synthetic padded graph batch (seeded)
  * reference outputs for encode_and_quantize and decode_and_make_structure

Equivalence tests then load the same parameters into the new framework and
compare activations/token ids.  Run lazily from conftest when the fixture
file is missing (requires /root/reference mounted).
"""
import os
import pickle
import sys

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _THIS_DIR)

from refmodel import import_reference, load_reference_config  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(_THIS_DIR), "golden_cache")

# The quantizer's (B, N, K) distance/soft_proba diagnostic tensors dominate
# fixture size (tens of MB each); goldens are COMMITTED, so store them only at
# a deterministic subsample of rows and codes.  Parity at ~50 rows x ~2k codes
# still pins the codebook-grid math; token ids / quantize / embeddings stay
# full-size and bit-compared.
SUB_MAX_ROWS = 48
SUB_MAX_CODES = 2048


def _diag_subsample(n_rows: int, n_codes: int, n_real: int):
    rows = np.linspace(0, n_rows - 1, min(n_rows, SUB_MAX_ROWS)).round().astype(np.int64)
    # Always include the valid/padded boundary rows — masked-row semantics
    # (distances zeroed by the mask) are exactly where implementations drift.
    boundary = np.clip(np.array([n_real - 1, n_real]), 0, n_rows - 1)
    rows = np.unique(np.concatenate([rows, boundary]))
    if n_codes > SUB_MAX_CODES:
        codes = np.sort(
            np.random.RandomState(123).choice(n_codes, SUB_MAX_CODES, replace=False)
        ).astype(np.int64)
    else:
        codes = np.arange(n_codes, dtype=np.int64)
    return rows, codes


def slim_diagnostics(arrays: dict) -> dict:
    """Replace full enc::distances/soft_proba with their row/code subsample."""
    if "enc::distances" not in arrays:
        return arrays
    dist = arrays.pop("enc::distances")
    prob = arrays.pop("enc::soft_proba")
    _, n_rows, n_codes = dist.shape
    # The diagnostics' row axis is TOKENS (seq_max / df) — the boundary must
    # come from tokens_mask, not nodes_mask (they differ for df > 1).
    n_real = int(arrays["graph::tokens_mask"][0, :, 0].sum())
    rows, codes = _diag_subsample(n_rows, n_codes, n_real)
    arrays["enc::sub_rows"] = rows
    arrays["enc::sub_codes"] = codes
    arrays["enc::distances_sub"] = dist[:, rows][:, :, codes]
    arrays["enc::soft_proba_sub"] = prob[:, rows][:, :, codes]
    return arrays


def make_fake_graph(seed: int, batch: int, seq_max: int, k: int, downsampling: int, n_real: int):
    """A synthetic padded graph with the canonical sender/receiver layout."""
    rng = np.random.RandomState(seed)
    num_edges = seq_max * k
    senders = np.concatenate(
        [
            rng.randint(0, n_real, size=(n_real * k,)),
            np.repeat(np.arange(n_real, seq_max), k),
        ]
    ).astype(np.int32)
    receivers = np.repeat(np.arange(seq_max), k).astype(np.int32)
    nodes_mask = (np.arange(seq_max) < n_real).astype(np.float32)[:, None]
    n_tokens_real = n_real // downsampling
    t = seq_max // downsampling
    tokens_mask = (np.arange(t) < n_tokens_real).astype(np.float32)[:, None]
    edge_features = rng.randn(num_edges, 27).astype(np.float32)
    edge_features[n_real * k :] = 0.0
    coords = rng.randn(seq_max, 3).astype(np.float32) * 10
    coords[n_real:] = 0.0

    def tile(x):
        return np.stack([x] * batch)

    return dict(
        n_node=tile(np.array([n_real])),
        n_edge=tile(np.array([num_edges])),
        nodes_mask=tile(nodes_mask),
        tokens_mask=tile(tokens_mask),
        nodes_original_coordinates=tile(coords),
        node_features=tile(coords),
        edge_features=tile(edge_features),
        senders=tile(senders),
        receivers=tile(receivers),
    )


def generate(codebook_size: int = 4096, downsampling: int = 1, seed: int = 0,
             batch: int = 2, n_real: int = 77, seq_max: int | None = None) -> str:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    # The fixture must be produced under the same XLA device configuration the
    # comparing test session uses (device count changes CPU fusion at float-ulp
    # level, which the bitwise assertions would see), so key the cache on it.
    import jax

    ndev = len(jax.devices())
    tag = "" if seq_max is None else f"_n{seq_max}"
    out_path = os.path.join(
        GOLDEN_DIR, f"vq3d_{codebook_size}_df{downsampling}_s{seed}_d{ndev}{tag}.npz"
    )
    if os.path.exists(out_path):
        return out_path

    import_reference()
    import haiku as hk
    import jax
    import jax.numpy as jnp

    # pmean appears outside pmap in fixture generation (single host) — identity.
    jax.lax_pmean_orig = jax.lax.pmean
    jax.lax.pmean = lambda x, axis_name=None: x
    import structure_tokenizer.model.quantize as qmod

    qmod.jax.lax.pmean = jax.lax.pmean

    from structure_tokenizer.model.model import Vq3D
    from structure_tokenizer.types import ProteinGraph

    cfg = load_reference_config(codebook_size, downsampling, seq_max)
    seq_max = cfg.data.data.seq_max_size
    k = cfg.data.data.graph_max_neighbor
    graph_np = make_fake_graph(seed, batch, seq_max, k, downsampling, n_real)
    graph = ProteinGraph(**{key: jnp.asarray(v) for key, v in graph_np.items()})

    features = {
        "aatype": jnp.asarray(
            np.eye(21, dtype=np.float32)[
                np.random.RandomState(seed + 1).randint(0, 20, size=(batch, seq_max))
            ]
        ),
        "atom37_gt_exists": jnp.asarray(
            np.tile(
                np.concatenate(
                    [np.ones((seq_max, 3)), np.zeros((seq_max, 1)), np.ones((seq_max, 1)), np.zeros((seq_max, 32))],
                    axis=-1,
                ).astype(np.int32)[None],
                (batch, 1, 1),
            )
        ),
    }

    class BatchLike:
        def __init__(self, graph, features):
            self.graph = graph
            self.features = features

    def init_fn(graph, features):
        model = Vq3D(config=cfg.model, global_config=cfg.data)
        return model(BatchLike(graph, features), is_training=False)

    f_init = hk.transform(init_fn)
    key = jax.random.PRNGKey(seed)
    params = f_init.init(key, graph, features)

    def encode_fn(graph):
        model = Vq3D(config=cfg.model, global_config=cfg.data)
        return model.encode_and_quantize(graph, is_training=False)

    enc_out = hk.transform(encode_fn).apply(params, key, graph)

    def decode_fn(code, nodes_mask, tokens_mask):
        model = Vq3D(config=cfg.model, global_config=cfg.data)
        return model.decode_and_make_structure(
            code, nodes_mask, tokens_mask, is_training=False, safe_key=None
        )

    quantized = enc_out["quantize"]
    dec_out = hk.transform(decode_fn).apply(
        params, key, quantized, graph.nodes_mask, graph.tokens_mask
    )

    arrays = {}
    for scope, leaves in params.items():
        for name, arr in leaves.items():
            arrays[f"param::{scope}//{name}"] = np.asarray(arr)
    for key_, arr in graph_np.items():
        arrays[f"graph::{key_}"] = arr
    arrays["feat::aatype"] = np.asarray(features["aatype"])
    arrays["feat::atom37_gt_exists"] = np.asarray(features["atom37_gt_exists"])
    for key_ in ["tokens", "quantize", "continuous_embedding", "continuous_embedding_pre_proj", "perplexity", "soft_proba", "distances"]:
        if key_ in enc_out:
            arrays[f"enc::{key_}"] = np.asarray(enc_out[key_])
    arrays["dec::final_atom_positions"] = np.asarray(dec_out["final_atom_positions"])
    arrays["dec::final_atom_mask"] = np.asarray(dec_out["final_atom_mask"])
    arrays["dec::traj"] = np.asarray(dec_out["traj"])

    arrays = slim_diagnostics(arrays)
    np.savez_compressed(out_path + ".tmp.npz", **arrays)
    os.replace(out_path + ".tmp.npz", out_path)
    return out_path


def generate_released_ckpt(
    codebook_size: int = 4096, downsampling: int = 1, seed: int = 0,
    batch: int = 1, n_real: int = 49,
) -> str:
    """Write a checkpoint in the reference's *released on-disk format*.

    The released HF artifacts are ``params.npz`` (flat leaves in pytree order,
    read back positionally via ``uploaded.files``) plus ``state_variables.npy``
    (a pickled dict holding ``params_treedef``) — exactly as
    /root/reference/scripts/inference_runner.py:136-165,236-248 reads them.
    We initialize the reference's own ``ForwardVQ3D`` haiku transform (so the
    scopes carry the real ``forward_vq3_d/`` prefix, including layer_stack
    stacked leaves) and serialize through the actual params object's treedef —
    the closest offline simulation of the upstream writer.

    Alongside, writes:
      * ``expected.npz``: the prefix-stripped tree as explicit ``scope//name``
        keys (ground truth for loader equality assertions), and
      * ``golden.npz``: the fake graph + the reference's token ids computed
        with those params (so the loaded tree can be proven to reproduce
        bit-exact tokens end-to-end).
    """
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    import jax

    ndev = len(jax.devices())
    out_dir = os.path.join(
        GOLDEN_DIR, f"released_{codebook_size}_df{downsampling}_s{seed}_d{ndev}"
    )
    done_marker = os.path.join(out_dir, "golden.npz")
    if os.path.exists(done_marker):
        return out_dir

    import_reference()
    import haiku as hk
    import jax.numpy as jnp

    jax.lax.pmean = lambda x, axis_name=None: x
    import structure_tokenizer.model.quantize as qmod

    qmod.jax.lax.pmean = jax.lax.pmean

    from structure_tokenizer.model.model import ForwardVQ3D, Vq3D
    from structure_tokenizer.types import ProteinGraph

    cfg = load_reference_config(codebook_size, downsampling)
    seq_max = cfg.data.data.seq_max_size
    k = cfg.data.data.graph_max_neighbor
    graph_np = make_fake_graph(seed, batch, seq_max, k, downsampling, n_real)
    graph = ProteinGraph(**{key: jnp.asarray(v) for key, v in graph_np.items()})
    features = {
        "aatype": jnp.asarray(
            np.eye(21, dtype=np.float32)[
                np.random.RandomState(seed + 1).randint(0, 20, size=(batch, seq_max))
            ]
        ),
        "atom37_gt_exists": jnp.asarray(
            np.tile(
                np.concatenate(
                    [np.ones((seq_max, 3)), np.zeros((seq_max, 1)), np.ones((seq_max, 1)), np.zeros((seq_max, 32))],
                    axis=-1,
                ).astype(np.int32)[None],
                (batch, 1, 1),
            )
        ),
    }

    class BatchLike:
        def __init__(self, graph, features):
            self.graph = graph
            self.features = features

    def fwd(batch):
        return ForwardVQ3D(config=cfg.model, global_config=cfg.data)(
            batch, is_training=False
        )

    params = hk.transform(fwd).init(
        jax.random.PRNGKey(seed), BatchLike(graph, features)
    )

    os.makedirs(out_dir, exist_ok=True)
    # --- the released format, written the way the reference reads it back ---
    leaves, treedef = jax.tree_util.tree_flatten(params)
    tmp = os.path.join(out_dir, "params.npz.tmp.npz")
    with open(tmp, "wb") as f:
        np.savez(f, *[np.asarray(leaf) for leaf in leaves])
    os.replace(tmp, os.path.join(out_dir, "params.npz"))
    np.save(
        os.path.join(out_dir, "state_variables.npy"),
        {"params_treedef": treedef},
        allow_pickle=True,
    )

    # --- ground truth: the stripped tree + reference tokens it produces ---
    stripped = {
        scope.split("forward_vq3_d/", 1)[1]: dict(leaves_)
        for scope, leaves_ in params.items()
    }
    expected = {}
    for scope, leaves_ in stripped.items():
        for name, arr in leaves_.items():
            expected[f"{scope}//{name}"] = np.asarray(arr)
    tmp = os.path.join(out_dir, "expected.npz.tmp.npz")
    np.savez_compressed(tmp, **expected)
    os.replace(tmp, os.path.join(out_dir, "expected.npz"))

    def encode_fn(graph):
        model = Vq3D(config=cfg.model, global_config=cfg.data)
        return model.encode_and_quantize(graph, is_training=False)

    enc_out = hk.transform(encode_fn).apply(stripped, jax.random.PRNGKey(seed), graph)
    golden = {f"graph::{key}": arr for key, arr in graph_np.items()}
    golden["enc::tokens"] = np.asarray(enc_out["tokens"])
    tmp = os.path.join(out_dir, "golden.npz.tmp.npz")
    np.savez_compressed(tmp, **golden)
    os.replace(tmp, done_marker)
    return out_dir


def load_golden(path: str):
    data = np.load(path)
    params = {}
    graph = {}
    enc = {}
    dec = {}
    feats = {}
    for key in data.files:
        kind, name = key.split("::", 1)
        if kind == "param":
            scope, leaf = name.split("//")
            params.setdefault(scope, {})[leaf] = data[key]
        elif kind == "graph":
            graph[name] = data[key]
        elif kind == "enc":
            enc[name] = data[key]
        elif kind == "dec":
            dec[name] = data[key]
        elif kind == "feat":
            feats[name] = data[key]
    return params, graph, feats, enc, dec


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    df = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    print(generate(size, df))
