from .attention import MultiHeadAttention, scaled_dot_product_attention
from .dropout import Dropout, dropout16, dropout_bernoulli
from .encoder_block import EncoderBlock
from .feed_forward import FeedForwardBlock
from .flash_attention import fused_attention, flash_attention_available
from .fused_mlp import fused_mlp
from .initializers import InitScheme
from .mlp_head import MLPHead
from .moe import MoEFeedForward, expert_capacity, moe_routing
from .precision import resolve_precision
from .patch_embedding import (
    ConvPatchEmbed,
    DynamicPatchEmbed,
    ManualPatchEmbed,
    extract_patches,
    patches_to_image,
)

__all__ = [
    "MultiHeadAttention",
    "scaled_dot_product_attention",
    "Dropout",
    "dropout16",
    "dropout_bernoulli",
    "EncoderBlock",
    "FeedForwardBlock",
    "fused_attention",
    "flash_attention_available",
    "fused_mlp",
    "InitScheme",
    "MLPHead",
    "MoEFeedForward",
    "expert_capacity",
    "moe_routing",
    "ConvPatchEmbed",
    "DynamicPatchEmbed",
    "ManualPatchEmbed",
    "extract_patches",
    "patches_to_image",
    "resolve_precision",
]
