"""Pre-LN transformer encoder block.

Parity with `/root/reference/vit_core/encoder_block.py:9-53`:
LN → MHA → dropout → residual, LN → FFN → dropout → residual. LayerNorms
run in fp32 regardless of compute dtype (matching torch autocast, which
keeps normalisation in fp32), and the result is cast back to the compute
dtype so residual adds stay in bf16 on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .attention import MultiHeadAttention
from .dropout import Dropout
from .feed_forward import FeedForwardBlock
from .moe import MoEFeedForward


class EncoderBlock(nn.Module):
    d_model: int = 512
    num_heads: int = 8
    mlp_dim: int = 3072
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
    use_fused_mlp: bool = False
    fast_dropout: bool = True
    init_scheme: str = "reference"
    matmul_precision: str = "default"
    # TPU-native addition (no reference counterpart): num_experts > 0
    # replaces the dense FFN with a routed Mixture-of-Experts FFN
    # (ops/moe.py) — V-MoE-style capacity scaling, expert weights
    # shardable over the 'expert' mesh axis (parallel.ep)
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_group_size: int = 0
    moe_aux_weight: float = 0.01
    moe_zloss_weight: float = 1e-3
    moe_router_noise: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_attn: bool = False,
        block_size: int = 0,
    ):
        ln1 = nn.LayerNorm(
            epsilon=1e-5,  # torch nn.LayerNorm default (parity)
            dtype=jnp.float32, param_dtype=self.param_dtype, name="layer_norm1"
        )
        ln2 = nn.LayerNorm(
            epsilon=1e-5,  # torch nn.LayerNorm default (parity)
            dtype=jnp.float32, param_dtype=self.param_dtype, name="layer_norm2"
        )
        attention = MultiHeadAttention(
            d_model=self.d_model,
            num_heads=self.num_heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_flash=self.use_flash,
            init_scheme=self.init_scheme,
            matmul_precision=self.matmul_precision,
            name="self_attention",
        )
        if self.num_experts > 0:
            feed_forward = MoEFeedForward(
                d_model=self.d_model,
                d_ff=self.mlp_dim,
                num_experts=self.num_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                group_size=self.moe_group_size,
                aux_weight=self.moe_aux_weight,
                zloss_weight=self.moe_zloss_weight,
                router_noise=self.moe_router_noise,
                dropout=self.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                fast_dropout=self.fast_dropout,
                init_scheme=self.init_scheme,
                matmul_precision=self.matmul_precision,
                name="moe",
            )
        else:
            feed_forward = FeedForwardBlock(
                d_model=self.d_model,
                d_ff=self.mlp_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_fused=self.use_fused_mlp,
                fast_dropout=self.fast_dropout,
                init_scheme=self.init_scheme,
                matmul_precision=self.matmul_precision,
                name="feed_forward",
            )
        drop1 = Dropout(rate=self.dropout, fast=self.fast_dropout, name="drop1")
        drop2 = Dropout(rate=self.dropout, fast=self.fast_dropout, name="drop2")

        x = x.astype(self.dtype)
        residual = x
        h = ln1(x).astype(self.dtype)
        attn_probs = None
        if return_attn:
            h, attn_probs = attention(h, return_attn=True)
        else:
            # block_size > 0: block-diagonal attention for packed
            # sequences (LN/FFN/dropout are per-token, so only attention
            # needs to know about the packing)
            h = attention(h, block_size=block_size)
        h = drop1(h, deterministic=deterministic)
        x = h + residual

        residual = x
        h = ln2(x).astype(self.dtype)
        h = feed_forward(h, deterministic=deterministic)
        h = drop2(h, deterministic=deterministic)
        x = h + residual

        if return_attn:
            return x, attn_probs
        return x
