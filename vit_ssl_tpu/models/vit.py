"""Supervised Vision Transformer.

Parity with `/root/reference/vit_core/vit.py:9-45`: conv patch embedding →
N pre-LN encoder blocks → CLS token → LayerNorm+Linear head. ``return_attn``
yields the **last** block's attention probabilities (the reference computes
attention maps in every block and discards all but the last —
`vit.py:36-38`; here only the last block is asked for probabilities, which
is mathematically identical and avoids materialising N-1 unused maps).

Optional ``remat`` wraps each encoder block in ``jax.checkpoint`` to trade
FLOPs for HBM (useful for big batches / ViT-B+ scale on one chip).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import ConvPatchEmbed, EncoderBlock, MLPHead


class ViT(nn.Module):
    num_classes: int
    num_blocks: int
    input_shape: Tuple[int, int, int]  # (C, H, W)
    embed_dim: int
    patch_size: int
    num_heads: int = 8
    mlp_dim: int = 3072
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
    use_fused_mlp: bool = False
    init_scheme: str = "reference"
    matmul_precision: str = "default"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        x = ConvPatchEmbed(
            input_shape=self.input_shape,
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            matmul_precision=self.matmul_precision,
            name="patch_embedding",
        )(x)

        block_cls = EncoderBlock
        if self.remat:
            block_cls = nn.remat(EncoderBlock, static_argnums=(2, 3))

        attn_probs = None
        for i in range(self.num_blocks):
            block = block_cls(
                d_model=self.embed_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_flash=self.use_flash,
                use_fused_mlp=self.use_fused_mlp,
                init_scheme=self.init_scheme,
                matmul_precision=self.matmul_precision,
                name=f"encoder_blocks_{i}",
            )
            want_attn = return_attn and i == self.num_blocks - 1
            if want_attn:
                x, attn_probs = block(x, deterministic, True)
            else:
                x = block(x, deterministic, False)

        cls_token = x[:, 0]
        logits = MLPHead(
            d_model=self.embed_dim,
            num_classes=self.num_classes,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            matmul_precision=self.matmul_precision,
            name="classification_head",
        )(cls_token.astype(jnp.float32))

        if return_attn:
            return logits, attn_probs
        return logits
