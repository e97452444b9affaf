"""protein_structure_tokenizer_tpu — a TPU-native protein structure tokenizer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of InstaDeep's
protein-structure-tokenizer ("Learning the Language of Protein Structure",
arXiv:2405.15840): PDB -> k-NN residue graph -> MPNN encoder ->
cross-attention downsampler -> FSQ tokens, and tokens -> upsampler -> pair
representation -> AF2-style structure module -> backbone coordinates, plus a
RoPE GPT over token sequences.  See README.md and docs/ARCHITECTURE.md.
"""
from protein_structure_tokenizer_tpu.models.config import (  # noqa: F401
    Vq3dConfig,
    preset,
    preset_name,
)

__version__ = "0.1.0"


def load_tokenizer(codebook_size: int = 4096, downsampling: int = 1, weights_dir=None):
    """Convenience constructor: (config, params) for a released variant."""
    import jax

    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.runtime import checkpoints

    cfg = preset(codebook_size, downsampling)
    template = vq3d.init(jax.random.PRNGKey(0), cfg)
    if weights_dir is not None:
        params = checkpoints.load_released_params(weights_dir, template)
    else:
        params = template
    return cfg, params
