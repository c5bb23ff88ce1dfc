"""DINO self-distillation ViT.

Parity with `/root/reference/vit_core/ssl/dino/` (model.py, head.py,
loss.py, dino_utils.py), redesigned functionally for XLA (SURVEY.md §7
hard-part #2): the reference holds teacher weights and the center buffer as
mutable module state updated under ``no_grad``; here the *student* is the
only flax module, and the teacher parameters + center live in the explicit
train state. EMA teacher update, center update, and the loss are pure
functions composed inside one jitted train step — no step-boundary host
syncs.

Distributed note: under a sharded jit, ``jnp.mean`` over the global batch in
:func:`update_center` is a cross-device mean (XLA inserts the collective),
which restores the paper's all-reduce that the reference dropped
(`model.py:91-99`, SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import DynamicPatchEmbed, EncoderBlock
from ..ops.encoder_stack import scanned_encoder
from ..ops.initializers import InitScheme
from ..ops.precision import resolve_precision


class WeightNormDense(nn.Module):
    """Dense layer with weight-norm parametrisation, matching torch's
    ``weight_norm(nn.Linear(...), name="weight")`` with default dim=0:
    each output unit's weight row is ``g · v / ‖v‖``.

    Parameters are stored as ``v`` (direction, (in, out)) and ``g``
    (magnitude, (out,)) plus ``bias``, mirroring torch's
    ``parametrizations.weight.original0/original1``.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    init_scheme: str = "reference"
    matmul_precision: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        init = InitScheme(self.init_scheme)

        def g_init(key, shape, dtype):
            # torch weight_norm initialises g = ‖w‖ of the wrapped layer
            del key
            v_val = self.get_variable("params", "v")
            return jnp.linalg.norm(v_val.astype(jnp.float32), axis=0).astype(dtype)

        v = self.param("v", init.linear_kernel(), (in_dim, self.features), self.param_dtype)
        g = self.param("g", g_init, (self.features,), self.param_dtype)
        bias = self.param("bias", init.linear_bias(in_dim), (self.features,), self.param_dtype)

        v32 = v.astype(jnp.float32)
        norm = jnp.linalg.norm(v32, axis=0, keepdims=True)
        kernel = (g.astype(jnp.float32) * v32 / (norm + 1e-12)).astype(self.dtype)
        y = jnp.dot(
            x.astype(self.dtype),
            kernel,
            precision=resolve_precision(self.matmul_precision),
        )
        return y + bias.astype(self.dtype)


class DINOHead(nn.Module):
    """3-layer GELU MLP → L2-normalise → weight-norm Linear
    (`/root/reference/vit_core/ssl/dino/head.py:7-23`)."""

    embed_dim: int
    output_dim: int
    hidden_dim: int = 2048
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    init_scheme: str = "reference"
    matmul_precision: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = InitScheme(self.init_scheme)

        def dense(features, fan_in, name):
            return nn.Dense(
                features,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                precision=resolve_precision(self.matmul_precision),
                kernel_init=init.linear_kernel(),
                bias_init=init.linear_bias(fan_in),
                name=name,
            )

        x = x.astype(self.dtype)
        x = dense(self.hidden_dim, self.embed_dim, "mlp_0")(x)
        x = x * 0.5 * (1.0 + jax.lax.erf(x * 0.7071067811865476))
        x = dense(self.hidden_dim, self.hidden_dim, "mlp_2")(x)
        x = x * 0.5 * (1.0 + jax.lax.erf(x * 0.7071067811865476))
        x = dense(self.embed_dim, self.hidden_dim, "mlp_4")(x)
        # L2-normalise in fp32 (torch F.normalize default eps 1e-12)
        x32 = x.astype(jnp.float32)
        x = (x32 / jnp.maximum(jnp.linalg.norm(x32, axis=1, keepdims=True), 1e-12)).astype(self.dtype)
        return WeightNormDense(
            features=self.output_dim,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            matmul_precision=self.matmul_precision,
            name="fully_connected",
        )(x)


class ViTBackbone(nn.Module):
    """DynamicPatchEmbed + encoder stack → CLS embedding
    (`/root/reference/vit_core/ssl/dino/model.py:12-45`)."""

    num_blocks: int
    input_shape: Tuple[int, int, int]
    embed_dim: int
    patch_size: int
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
    remat: bool = False
    scan_layers: bool = False  # nn.scan over the stack (ops/encoder_stack.py)

    def setup(self):
        # setup-style so the forward decomposes into embed/encode/finish
        # (pipeline-parallel routing, parallel/integrate.py). Param names
        # unchanged: attribute names match the previous explicit names.
        self.patch_embedding = DynamicPatchEmbed(
            input_shape=self.input_shape,
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            matmul_precision=self.matmul_precision,
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
                block_cls = nn.remat(EncoderBlock, static_argnums=(2, 3, 4))
            self.encoder_blocks = [
                block_cls(**block_kwargs) for _ in range(self.num_blocks)
            ]

    def embed(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        del deterministic  # patch embedding has no dropout
        return self.patch_embedding(x)

    def encode(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_attn: bool = False,
        block_size: int = 0,
    ):
        if self.scan_layers:
            if return_attn:
                raise ValueError(
                    "return_attn requires the unrolled encoder stack — "
                    "set model.scan_layers=false (checkpoints convert "
                    "between conventions via models.builder.load_weights)"
                )
            x, _ = self.encoder_scan(x, deterministic, block_size)
            return x
        attn_probs = None
        for i, block in enumerate(self.encoder_blocks):
            if return_attn and i == self.num_blocks - 1:
                x, attn_probs = block(x, deterministic, True, 0)
            else:
                x = block(x, deterministic, False, block_size)
        if return_attn:
            return x, attn_probs
        return x

    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        x = self.embed(x, deterministic)
        attn_probs = None
        if return_attn:
            x, attn_probs = self.encode(x, deterministic, True)
        else:
            x = self.encode(x, deterministic, False)
        cls_out = x[:, 0]
        if return_attn:
            return cls_out, attn_probs
        return cls_out


class DINONetwork(nn.Module):
    """Backbone + projection head — the module applied with *either* the
    student or the teacher parameter pytree."""

    num_blocks: int
    input_shape: Tuple[int, int, int]
    embed_dim: int
    patch_size: int
    num_heads: int = 8
    mlp_dim: int = 3072
    dropout: float = 0.1
    output_dim: int = 65536
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
    use_fused_mlp: bool = False
    fast_dropout: bool = True
    init_scheme: str = "reference"
    matmul_precision: str = "default"
    remat: bool = False
    scan_layers: bool = False

    def setup(self):
        self.backbone = ViTBackbone(
            num_blocks=self.num_blocks,
            input_shape=self.input_shape,
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
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
            remat=self.remat,
            scan_layers=self.scan_layers,
        )
        self.head = DINOHead(
            embed_dim=self.embed_dim,
            output_dim=self.output_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            init_scheme=self.init_scheme,
            matmul_precision=self.matmul_precision,
        )

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.head(self.backbone(x, deterministic))

    # -- pipeline-parallel decomposition (parallel/integrate.py) ----------
    def embed(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.backbone.embed(x, deterministic)

    def finish(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.head(tokens[:, 0])

    def forward_packed(
        self, x: jnp.ndarray, num_views: int, deterministic: bool = True
    ) -> jnp.ndarray:
        """Multi-crop views packed into block-diagonal sequences.

        ``x`` is the usual view-major concat of ``num_views`` crops,
        ``(V·B, h, w, C)``. Instead of running V·B independent length-N
        sequences (at DINO-locals N=37 the fused kernel loses to XLA —
        the measured gate falls back), the V crops of each image pack
        into ONE length-``V·N`` sequence after patch embedding, moving
        attention into the kernel's profitable regime; a block-diagonal
        mask inside the kernel keeps crops independent, so the result is
        bit-identical to the unpacked forward (LN/FFN/dropout are
        per-token; tests/test_dino.py). Output order matches the
        unpacked path: ``(V·B, K)`` view-major.
        """
        tokens = self.backbone.embed(x, deterministic)  # (V·B, N, D)
        vb, n, d = tokens.shape
        b = vb // num_views
        packed = (
            tokens.reshape(num_views, b, n, d)
            .transpose(1, 0, 2, 3)
            .reshape(b, num_views * n, d)
        )
        enc = self.backbone.encode(packed, deterministic, False, block_size=n)
        cls = (
            enc.reshape(b, num_views, n, d)[:, :, 0]  # (B, V, D)
            .transpose(1, 0, 2)
            .reshape(vb, d)
        )
        return self.head(cls)

    def features(self, x: jnp.ndarray, return_attn: bool = False):
        """Backbone CLS features (teacher-side inference path,
        `model.py:141-155`)."""
        return self.backbone(x, True, return_attn)

    def head_only(self, feats: jnp.ndarray) -> jnp.ndarray:
        return self.head(feats)


# ---------------------------------------------------------------------------
# Pure-function DINO dynamics (loss / center / EMA / schedules)
# ---------------------------------------------------------------------------

def dino_loss(
    teacher_output: jnp.ndarray,  # (Vt, B, K)
    student_output: jnp.ndarray,  # (Vs, B, K)
    center: jnp.ndarray,  # (1, K)
    teacher_temp: jnp.ndarray,
    student_temp: float,
) -> jnp.ndarray:
    """Exact replication of the reference's loss math
    (`/root/reference/vit_core/ssl/dino/loss.py:13-29`): teacher probs are
    centred+sharpened softmax, student log-softmax; the broadcast product is
    summed over the student-view axis and averaged over the rest. (Like the
    reference, the same-view pair is not excluded — SURVEY.md §7.)"""
    teacher_output = jax.lax.stop_gradient(teacher_output).astype(jnp.float32)
    student_output = student_output.astype(jnp.float32)
    student_logp = jax.nn.log_softmax(student_output / student_temp, axis=-1)
    teacher_p = jax.nn.softmax(
        (teacher_output - center[None]) / teacher_temp, axis=-1
    )
    # algebraically identical to the reference's broadcast-and-sum
    # (-(tp[:,None] * sp[None]).sum(axis=1).mean(), loss.py:26-29):
    # Σ_s tp·sp_s = tp · Σ_s sp_s — the (Vt, Vs, B, K) intermediate never
    # materialises.
    sp_sum = student_logp.sum(axis=0)  # (B, K)
    return -(teacher_p * sp_sum[None]).mean()


def update_center(
    center: jnp.ndarray,
    teacher_output: jnp.ndarray,
    center_momentum: float,
    weight: jnp.ndarray = None,
) -> jnp.ndarray:
    """EMA center update, DINO paper Eq. 4 (`model.py:91-99`). Under a
    sharded jit the batch mean is global across devices.

    ``weight`` (optional): per-row weights for the flattened
    ``(rows, K)`` teacher output — the loader pads short final batches
    with copies of sample 0 at weight 0 (`data/loader.py`), and an
    unweighted mean would let those duplicates pollute the center. With
    weights the update is exact w.r.t. the truncated batch (the
    reference never sees padding: torch loaders emit ragged final
    batches)."""
    flat = teacher_output.reshape(-1, teacher_output.shape[-1]).astype(jnp.float32)
    if weight is None:
        batch_mean = jnp.mean(flat, axis=0, keepdims=True)
    else:
        w = weight.reshape(-1, 1).astype(jnp.float32)
        batch_mean = jnp.sum(flat * w, axis=0, keepdims=True) / jnp.maximum(
            jnp.sum(w), 1.0
        )
    return center_momentum * center + (1.0 - center_momentum) * batch_mean


def momentum_update(teacher_params: Any, student_params: Any, momentum) -> Any:
    """EMA of every teacher parameter toward the student (`model.py:126-139`)."""
    return jax.tree_util.tree_map(
        lambda t, s: momentum * t + (1.0 - momentum) * s,
        teacher_params,
        student_params,
    )


def cosine_momentum_schedule(step, m_start: float, m_end: float, total_iters: int):
    """`DINOMomentumScheduler.get_momentum` (`dino_utils.py:4-17`)."""
    step = jnp.asarray(step, jnp.float32)
    cos_term = jnp.cos(jnp.pi * step / total_iters)
    value = m_end - (m_end - m_start) * 0.5 * (1.0 + cos_term)
    return jnp.where(step >= total_iters, m_end, value)


def teacher_temp_schedule(
    step, t_start: float, t_end: float, total_iters: int, schedule_type: str = "cosine"
):
    """`DINOTeacherTempScheduler.get_temp` (`dino_utils.py:19-36`)."""
    step = jnp.asarray(step, jnp.float32)
    progress = step / total_iters
    if schedule_type == "linear":
        value = t_start + (t_end - t_start) * progress
    else:
        cos_term = jnp.cos(jnp.pi * progress)
        value = t_end - (t_end - t_start) * 0.5 * (1.0 + cos_term)
    return jnp.where(step >= total_iters, t_end, value)
