"""Neural-net primitives (flax.linen modules, batch-last layout)."""

from .layers import (
    Attention,
    BatchNorm,
    ConcatDense,
    CrossAttention,
    DropPath,
    LayerScale,
    Mlp,
    dense,
    gelu,
    leaky_relu,
    trunc_normal_init,
)
from .local_attention import (
    DeformableLocalAttention,
    DeformableLocalCrossAttention,
    DynamicGraphAttention,
    ImprovedDeformableLocalCrossAttention,
    ImprovedDeformableLocalGraphAttention,
    OffsetNet,
)
from .blocks import (
    CrossAttnBlockApi,
    PointTransformerDecoder,
    PointTransformerEncoder,
    SelfAttnBlockApi,
    decoder_from_config,
    denoise_mask,
    encoder_from_config,
)
from .grouper import DGCNNGrouper, PCNEncoder, SimpleEncoder
from .heads import Fold, SimpleRebuildFCLayer, folding_seed
from . import legacy_blocks
from .image_encoders import ConvNextEncoder, ResNet18Encoder, ResNet50Encoder
