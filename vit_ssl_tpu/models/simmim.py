"""SimMIM masked-image-modeling ViT.

Parity with `/root/reference/vit_core/ssl/simmim/model.py:8-93` and
``masking.py:6-37``, redesigned for XLA's static-shape compilation model
(SURVEY.md §7 hard-part #1):

- The reference builds the mask with a per-sample host-side ``randperm``
  loop and then gathers a *ragged* set of masked tokens
  (``x[bool_mask]``, `model.py:56`). Ragged gathers don't compile; here the
  mask is generated **inside the jitted step** from the flax 'mask' rng —
  per-sample uniform scores, threshold at the k-th smallest — giving exactly
  ``int(N·mask_ratio)`` masked patches per sample with static shapes.
- The reconstruction head predicts pixels for **all** patch positions and
  the loss/metrics are weighted by the mask, which equals the reference's
  masked-only mean L1 exactly (same sum, same normaliser).

``__call__`` returns dense ``(predictions, targets, bool_mask)``; the
trainer applies the masked loss. ``inference_forward`` (no masking,
mean-pooled features) mirrors `model.py:65-93`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import EncoderBlock, extract_patches
from ..ops.encoder_stack import scanned_encoder
from ..ops.initializers import InitScheme
from ..ops.precision import resolve_precision


def make_random_mask(rng, batch: int, num_patches: int, mask_ratio: float):
    """Exactly-k random patch mask, (B, N) bool, k = int(N · mask_ratio).

    Static-shape equivalent of the reference's per-sample randperm
    (`/root/reference/vit_core/ssl/simmim/masking.py:24-35`).
    """
    num_masked = int(num_patches * mask_ratio)
    scores = jax.random.uniform(rng, (batch, num_patches))
    if num_masked == 0:
        return jnp.zeros((batch, num_patches), dtype=bool)
    kth = jnp.sort(scores, axis=-1)[:, num_masked - 1 : num_masked]
    return scores <= kth


class SimMIMViT(nn.Module):
    num_blocks: int
    input_shape: Tuple[int, int, int]  # (C, H, W)
    embed_dim: int
    patch_size: int
    num_heads: int = 8
    mlp_dim: int = 3072
    dropout: float = 0.1
    mask_ratio: float = 0.6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
    use_fused_mlp: bool = False
    fast_dropout: bool = True
    init_scheme: str = "reference"
    matmul_precision: str = "default"
    remat: bool = False
    scan_layers: bool = False  # nn.scan over the stack (ops/encoder_stack.py)

    def setup(self):
        init = InitScheme(self.init_scheme)
        c = self.input_shape[0]
        patch_dim = c * self.patch_size**2
        num_patches = (self.input_shape[1] // self.patch_size) ** 2

        self.projection = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=resolve_precision(self.matmul_precision),
            kernel_init=init.linear_kernel(),
            bias_init=init.linear_bias(patch_dim),
            name="projection",
        )
        self.mask_token = self.param(
            "mask_token", init.mask_token(), (1, 1, self.embed_dim), self.param_dtype
        )
        # No CLS slot: pos-embed length is (H/p)² (`model.py:32-34`).
        self.positional_embedding = self.param(
            "positional_embedding",
            init.pos_embed(),
            (1, num_patches, self.embed_dim),
            self.param_dtype,
        )
        self.simmim_head = nn.Dense(
            patch_dim,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            precision=resolve_precision(self.matmul_precision),
            kernel_init=init.linear_kernel(),
            bias_init=init.linear_bias(self.embed_dim),
            name="simmim_head",
        )

        block_kwargs = dict(
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
        )
        if self.scan_layers:
            self.encoder_scan = scanned_encoder(
                self.num_blocks, block_kwargs, remat=self.remat
            )
            self.encoder_blocks = ()
        else:
            block_cls = EncoderBlock
            if self.remat:
                block_cls = nn.remat(EncoderBlock, static_argnums=(2, 3))
            self.encoder_blocks = [
                block_cls(**block_kwargs, name=f"encoder_blocks_{i}")
                for i in range(self.num_blocks)
            ]

    def _encode(self, tokens: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.scan_layers:
            tokens, _ = self.encoder_scan(tokens, deterministic, 0)
            return tokens
        for block in self.encoder_blocks:
            tokens = block(tokens, deterministic, False)
        return tokens

    # -- pipeline-parallel decomposition (parallel/integrate.py) ----------
    def embed_masked(self, x: jnp.ndarray, mask=None):
        """Patchify + mask + project + pos-embed (everything before the
        encoder stack). Returns (tokens, target_patches, bool_mask)."""
        b = x.shape[0]
        patches = extract_patches(x, self.patch_size)
        if mask is not None:
            bool_mask = mask.astype(bool)
        else:
            rng = self.make_rng("mask")
            bool_mask = make_random_mask(rng, b, patches.shape[1], self.mask_ratio)
        tokens = self.projection(patches.astype(self.dtype))
        tokens = jnp.where(
            bool_mask[..., None], self.mask_token.astype(self.dtype), tokens
        )
        tokens = tokens + self.positional_embedding.astype(self.dtype)
        return tokens, patches, bool_mask

    def predict(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Reconstruction head (everything after the encoder stack)."""
        return self.simmim_head(tokens.astype(jnp.float32))

    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, mask=None
    ):
        """Masked forward. x: (B, H, W, C) NHWC.

        Returns (predictions, targets, bool_mask):
        predictions (B, N, C·p²) fp32, targets (B, N, C·p²), mask (B, N).
        ``mask`` injects an externally drawn (B, N) bool mask (oracle
        parity studies, visualizers); None draws from the 'mask' rng.
        """
        tokens, patches, bool_mask = self.embed_masked(x, mask)
        tokens = self._encode(tokens, deterministic)
        predictions = self.predict(tokens)
        return predictions, patches, bool_mask

    def inference_forward(
        self, x: jnp.ndarray, return_patch_features: bool = False
    ) -> jnp.ndarray:
        """Clean (unmasked) forward for feature extraction (`model.py:65-93`)."""
        patches = extract_patches(x, self.patch_size)
        tokens = self.projection(patches.astype(self.dtype))
        tokens = tokens + self.positional_embedding.astype(self.dtype)
        tokens = self._encode(tokens, deterministic=True)
        if return_patch_features:
            return tokens
        return tokens.mean(axis=1)


def masked_l1_loss(predictions, targets, bool_mask) -> jnp.ndarray:
    """Mean L1 over masked patches only — identical to the reference's
    ``L1Loss(preds[mask], targets[mask])`` (`simmim_trainer.py:66-67`) but
    with static shapes (dense, mask-weighted)."""
    err = jnp.abs(predictions.astype(jnp.float32) - targets.astype(jnp.float32))
    weights = bool_mask[..., None].astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(weights) * err.shape[-1], 1.0)
    return jnp.sum(err * weights) / denom
