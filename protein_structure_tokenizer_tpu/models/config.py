"""Typed model/data configuration + presets for every released variant.

One typed config tree replaces the reference's hydra/yaml/ml_collections
stack (SURVEY.md §5.6).  ``preset(codebook_size, downsampling)`` reproduces
each released checkpoint's architecture:
  codebook_size in {432, 1728, 4096, 64000} x downsampling in {1, 2, 4}
(/root/reference/config/structure_tokenizer/model/gnn/*.yaml and
 data/ablation_df_{1,2,4}.yaml).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

from protein_structure_tokenizer_tpu.models.attention import (
    AttentionConfig,
    ScalerConfig,
    TransitionConfig,
)
from protein_structure_tokenizer_tpu.models.fsq import FsqConfig
from protein_structure_tokenizer_tpu.models.gnn import GnnConfig
from protein_structure_tokenizer_tpu.models.seq_decoder import (
    PairRepConfig,
    SeqDecoderConfig,
)
from protein_structure_tokenizer_tpu.models.structure_module import (
    SidechainConfig,
    StructureModuleConfig,
)

FSQ_LEVELS = {
    432: (4, 4, 3, 3, 3),
    1728: (4, 4, 4, 3, 3, 3),
    4096: (4, 4, 4, 4, 4, 4),
    64000: (8, 8, 8, 5, 5, 5),
}


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    encoding_dimension: int = 128
    positional_encoding_dimension: int = 128
    gnn: GnnConfig = GnnConfig()


@dataclasses.dataclass(frozen=True)
class DataConfig:
    seq_max_size: int = 512
    graph_max_neighbor: int = 50
    downsampling_ratio: int = 1
    min_num_valid_res: int = 50
    noise_level: float = 0.0
    graph_residue_loc_is_alphac: bool = True
    batch_size_per_device: int = 16
    # NOTE: the reference hardcodes 4097 as the decode-side pad id for every
    # codebook size (a released-config quirk; ablation_df_1.yaml:23).
    pad_token_id: int = 4097


@dataclasses.dataclass(frozen=True)
class Vq3dConfig:
    encoder: EncoderConfig
    down_sampler: ScalerConfig
    down_proj_dim: Optional[int]  # None disables the projection
    fsq: Optional[FsqConfig]  # None = continuous ablation (NoQuantizer)
    up_proj_dim: Optional[int]
    up_sampler: ScalerConfig
    down_sampler_normalization: str = "spherical"
    up_sampler_normalization: str = "spherical"
    down_local_attn: bool = True
    down_causal_attn: bool = False
    up_local_attn: bool = False
    decoder: SeqDecoderConfig = SeqDecoderConfig()
    structure_module: StructureModuleConfig = StructureModuleConfig()
    data: DataConfig = DataConfig()

    @property
    def codes_dimension(self) -> int:
        return self.fsq.codes_dimension if self.fsq else self.down_sampler.out_emb_size


def preset(
    codebook_size=4096, downsampling: int = 1, *, seq_max: int = 512
) -> Vq3dConfig:
    """Config for a released variant.

    ``codebook_size`` of ``None`` (or ``"continuous"``) selects the continuous
    ablation — NoQuantizer pass-through with the 64k geometry (down_proj to 6
    dims, ``use_codebook: false``), per the reference's
    ``ablation_continuous_df_*.yaml``.

    ``seq_max`` lifts the reference's hard 512-residue ceiling
    (inference_runner.py:52-56): padding, scaler lengths and the positional
    -encoding base all scale together, so the architecture stays coherent at
    any length (pair memory is quadratic — use ``context_parallel`` past
    ~1k residues).  The RELEASED weights were trained at 512 and their PE
    base is bound to it; use non-default seq_max with retrained weights.
    """
    continuous = codebook_size in (None, "continuous")
    if continuous:
        codebook_size = 64000  # layout donor: 6-dim codes
    if codebook_size not in FSQ_LEVELS:
        raise ValueError(f"unknown codebook size {codebook_size}")
    if downsampling not in (1, 2, 4):
        raise ValueError(f"unknown downsampling ratio {downsampling}")
    if seq_max % downsampling:
        raise ValueError(f"seq_max {seq_max} not divisible by df={downsampling}")

    levels = FSQ_LEVELS[codebook_size]
    max_tokens = seq_max // downsampling
    data = DataConfig(seq_max_size=seq_max, downsampling_ratio=downsampling)

    down = ScalerConfig(
        out_emb_size=128,
        max_out_len=max_tokens,
        sc_num_block=3,
        use_original_posenc=False,
        use_global_node=0,
        positional_encoding_dimension=128,
        cross_attn=AttentionConfig(num_head=4, gating=True),
        resampled_transition=TransitionConfig(num_intermediate_factor=2),
        original_transition=TransitionConfig(num_intermediate_factor=2),
        use_remat=True,
    )
    up = ScalerConfig(
        out_emb_size=128,
        max_out_len=seq_max,
        sc_num_block=3,
        use_original_posenc=True,
        use_global_node=0,
        positional_encoding_dimension=128,
        cross_attn=AttentionConfig(num_head=4, gating=True),
        resampled_transition=TransitionConfig(num_intermediate_factor=2),
        original_transition=TransitionConfig(num_intermediate_factor=2),
        use_remat=True,
    )

    return Vq3dConfig(
        encoder=EncoderConfig(
            encoding_dimension=128,
            positional_encoding_dimension=128,
            gnn=GnnConfig(
                layer_cls="MPNNLayer",
                hidden_dimension=128,
                gnn_number_layers=3,
                shared_layers=False,
                graph_max_neighbor=50,
            ),
        ),
        down_sampler=down,
        down_proj_dim=len(levels),
        fsq=None if continuous else FsqConfig(levels=levels, renorm=False),
        up_proj_dim=128,
        up_sampler=up,
        down_local_attn=True,
        down_causal_attn=False,
        up_local_attn=False,
        decoder=SeqDecoderConfig(
            positional_encoding_dimension=128,
            seq_max_size=seq_max,
            pair_representation=PairRepConfig(
                num_intermediate_factor=2, output_dim=128, lnormalisation=True
            ),
            pair_transition=TransitionConfig(num_intermediate_factor=2),
        ),
        structure_module=StructureModuleConfig(
            num_layer=8,
            num_channel=384,
            num_head=12,
            num_layer_in_transition=3,
            num_point_qk=4,
            num_point_v=8,
            num_scalar_qk=16,
            num_scalar_v=16,
            position_scale=10.0,
            pair_channel=128,
            single_channel=128,
            sidechain=SidechainConfig(num_channel=128, num_residual_block=2),
        ),
        data=data,
    )


def tiny_preset(
    *, seq_max: int = 16, k: int = 4, downsampling: int = 2, dim: int = 16
) -> Vq3dConfig:
    """A miniature config with the full architecture topology.

    For CPU-mesh tests and the driver's multi-chip dryrun: every module is
    present (GNN, both scalers, FSQ, pair rep, IPA) at tiny dims/lengths.
    """

    def scaler(out_len: int, posenc: bool) -> ScalerConfig:
        return ScalerConfig(
            out_emb_size=dim,
            max_out_len=out_len,
            sc_num_block=2,
            use_original_posenc=posenc,
            positional_encoding_dimension=dim,
            cross_attn=AttentionConfig(num_head=2),
            resampled_transition=TransitionConfig(2),
            original_transition=TransitionConfig(2),
            use_remat=True,
        )

    return Vq3dConfig(
        encoder=EncoderConfig(
            encoding_dimension=dim,
            positional_encoding_dimension=dim,
            gnn=GnnConfig(hidden_dimension=dim, gnn_number_layers=2, graph_max_neighbor=k),
        ),
        down_sampler=scaler(seq_max // downsampling, False),
        down_proj_dim=6,
        fsq=FsqConfig(levels=(4, 4, 4, 4, 4, 4)),
        up_proj_dim=dim,
        up_sampler=scaler(seq_max, True),
        decoder=SeqDecoderConfig(
            positional_encoding_dimension=dim,
            seq_max_size=seq_max,
            pair_representation=PairRepConfig(output_dim=dim),
        ),
        structure_module=StructureModuleConfig(
            num_layer=2,
            num_channel=32,
            num_head=2,
            num_point_qk=2,
            num_point_v=2,
            num_scalar_qk=4,
            num_scalar_v=4,
            pair_channel=dim,
            single_channel=dim,
            sidechain=SidechainConfig(num_channel=16, num_residual_block=1),
        ),
        data=DataConfig(
            seq_max_size=seq_max, graph_max_neighbor=k, downsampling_ratio=downsampling
        ),
    )


def preset_name(codebook_size, downsampling: int) -> str:
    if codebook_size in (None, "continuous"):
        return f"continuous_df_{downsampling}"
    surname = {432: "0.5k", 1728: "1.7k", 4096: "4k", 64000: "64k"}[codebook_size]
    return f"{surname}_df_{downsampling}"
