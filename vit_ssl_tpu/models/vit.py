"""Supervised Vision Transformer.

Parity with `/root/reference/vit_core/vit.py:9-45`: conv patch embedding →
N pre-LN encoder blocks → CLS token → LayerNorm+Linear head. ``return_attn``
yields the **last** block's attention probabilities (the reference computes
attention maps in every block and discards all but the last —
`vit.py:36-38`; here only the last block is asked for probabilities, which
is mathematically identical and avoids materialising N-1 unused maps).

Optional ``remat`` wraps each encoder block in ``jax.checkpoint`` to trade
FLOPs for HBM (useful for big batches / ViT-B+ scale on one chip).

Optional ``scan_layers`` (``model.scan_layers``, default off) replaces the
unrolled block list with one ``nn.scan`` body over stacked params
(``ops/encoder_stack.py``): ~depth× faster compiles for deep models,
identical math; incompatible with ``return_attn`` and MoE (see the
encoder_stack module docstring for the full divergence list).

Optional ``patch_dropout`` (train-time only, off by default for reference
parity) keeps a random per-sample subset of patch tokens after the
positional embedding — PatchDropout (Liu et al., arXiv:2208.07220):
encoder FLOPs scale with the keep ratio (attention with its square) at
negligible accuracy cost for natural images. Static shapes: the keep
count is fixed at trace time, the subset is drawn in-jit per sample.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import ConvPatchEmbed, EncoderBlock, MLPHead
from ..ops.encoder_stack import scanned_encoder


class ViT(nn.Module):
    num_classes: int
    num_blocks: int
    input_shape: Tuple[int, int, int]  # (C, H, W)
    embed_dim: int
    patch_size: int
    num_heads: int = 8
    mlp_dim: int = 3072
    dropout: float = 0.1
    patch_dropout: float = 0.0  # train-time token dropping (CLS always kept)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
    use_fused_mlp: bool = False
    fast_dropout: bool = True
    init_scheme: str = "reference"
    matmul_precision: str = "default"
    remat: bool = False
    scan_layers: bool = False  # nn.scan over the stack (ops/encoder_stack.py)
    # TPU-native addition (no reference counterpart): Mixture-of-Experts
    # FFN blocks (ops/moe.py, V-MoE placement: every ``moe_every``-th
    # block starting from the second — arXiv:2106.05974 uses the same
    # alternating layout). moe_experts=0 (default) is the reference's
    # dense ViT. Expert weights shard over the 'expert' mesh axis
    # (``parallel.ep``).
    moe_experts: int = 0
    moe_every: int = 2
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_group_size: int = 0  # routing-group tokens (0 = one global group)
    moe_aux_weight: float = 0.01
    moe_zloss_weight: float = 1e-3
    moe_router_noise: float = 0.0

    def setup(self):
        # setup-style (rather than @nn.compact) so the forward decomposes
        # into ``embed`` → ``encode`` → ``finish`` methods: pipeline
        # parallelism (parallel/integrate.py) replaces ``encode`` with a
        # GPipe schedule over the pipe mesh axis. Param-tree names are
        # unchanged (attribute names == previous explicit names).
        self.patch_embedding = ConvPatchEmbed(
            input_shape=self.input_shape,
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            matmul_precision=self.matmul_precision,
        )
        if self.scan_layers:
            if self.moe_experts > 0:
                raise ValueError(
                    "model.scan_layers cannot be combined with "
                    "model.moe_experts > 0 — the scanned stack is "
                    "homogeneous; MoE blocks alternate with dense ones"
                )
            self.encoder_scan = scanned_encoder(
                self.num_blocks,
                dict(
                    d_model=self.embed_dim,
                    num_heads=self.num_heads,
                    mlp_dim=self.mlp_dim,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    use_flash=self.use_flash,
                    use_fused_mlp=self.use_fused_mlp,
                    fast_dropout=self.fast_dropout,
                    init_scheme=self.init_scheme,
                    matmul_precision=self.matmul_precision,
                ),
                remat=self.remat,
            )
            self.encoder_blocks = ()
        else:
            block_cls = EncoderBlock
            if self.remat:
                block_cls = nn.remat(EncoderBlock, static_argnums=(2, 3))
            self.encoder_blocks = [
                block_cls(
                    d_model=self.embed_dim,
                    num_heads=self.num_heads,
                    mlp_dim=self.mlp_dim,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    use_flash=self.use_flash,
                    use_fused_mlp=self.use_fused_mlp,
                    fast_dropout=self.fast_dropout,
                    init_scheme=self.init_scheme,
                    matmul_precision=self.matmul_precision,
                    num_experts=(
                        self.moe_experts if self._is_moe_block(i) else 0
                    ),
                    moe_top_k=self.moe_top_k,
                    moe_capacity_factor=self.moe_capacity_factor,
                    moe_group_size=self.moe_group_size,
                    moe_aux_weight=self.moe_aux_weight,
                    moe_zloss_weight=self.moe_zloss_weight,
                    moe_router_noise=self.moe_router_noise,
                )
                for i in range(self.num_blocks)
            ]
        self.classification_head = MLPHead(
            d_model=self.embed_dim,
            num_classes=self.num_classes,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            matmul_precision=self.matmul_precision,
        )

    def _is_moe_block(self, i: int) -> bool:
        """V-MoE alternating placement: blocks ``moe_every-1, 2·moe_every-1,
        …`` are MoE (every other block by default, starting from the
        second)."""
        if self.moe_experts <= 0:
            return False
        every = max(1, int(self.moe_every))
        return (i + 1) % every == 0

    def embed(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        allow_patch_dropout: bool = True,
    ) -> jnp.ndarray:
        x = self.patch_embedding(x)
        if not deterministic and self.patch_dropout > 0.0 and allow_patch_dropout:
            x = self._drop_patches(x)
        return x

    def encode(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        if self.scan_layers:
            if return_attn:
                raise ValueError(
                    "return_attn requires the unrolled encoder stack — "
                    "set model.scan_layers=false (checkpoints convert "
                    "between conventions via models.builder.load_weights)"
                )
            x, _ = self.encoder_scan(x, deterministic, 0)
            return x
        attn_probs = None
        for i, block in enumerate(self.encoder_blocks):
            if return_attn and i == self.num_blocks - 1:
                x, attn_probs = block(x, deterministic, True)
            else:
                x = block(x, deterministic, False)
        if return_attn:
            return x, attn_probs
        return x

    def finish(self, x: jnp.ndarray) -> jnp.ndarray:
        cls_token = x[:, 0]
        return self.classification_head(cls_token.astype(jnp.float32))

    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        # visualizers need the full token grid → no patch dropout
        x = self.embed(x, deterministic, allow_patch_dropout=not return_attn)
        attn_probs = None
        if return_attn:
            x, attn_probs = self.encode(x, deterministic, True)
        else:
            x = self.encode(x, deterministic, False)
        logits = self.finish(x)
        if return_attn:
            return logits, attn_probs
        return logits

    def _drop_patches(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Keep a per-sample random subset of patch tokens (CLS at index 0
        always survives). Keep count is static; the subset is uniform via
        argsort of iid scores."""
        b, n_with_cls, d = tokens.shape
        n = n_with_cls - 1
        keep = max(1, int(round(n * (1.0 - self.patch_dropout))))
        rng = self.make_rng("dropout")
        scores = jax.random.uniform(rng, (b, n))
        keep_idx = jnp.argsort(scores, axis=-1)[:, :keep]  # (B, keep)
        patches = jnp.take_along_axis(
            tokens[:, 1:], keep_idx[..., None], axis=1
        )
        return jnp.concatenate([tokens[:, :1], patches], axis=1)
