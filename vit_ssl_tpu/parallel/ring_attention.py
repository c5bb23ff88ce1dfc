"""Ring attention: sequence-parallel attention over a mesh axis.

The reference has no distributed execution at all (SURVEY.md §2.6); at ViT
scale a single chip holds every sequence, and `ops/flash_blockwise.py`
already gives O(N)-memory attention on one chip. Ring attention is the
scale-out extension for token counts whose K/V no longer fit one device:
the sequence axis is sharded across a mesh axis, every device keeps its
Q shard resident, and the K/V shards rotate around the ring via
``jax.lax.ppermute`` (one ICI hop per step) while a blockwise online
softmax accumulates the exact result — attention memory per device is
O(N/devices), communication is overlap-friendly ring traffic, and the
math is bit-exact blockwise softmax (Liu et al., "Ring Attention with
Blockwise Transformers", 2023 — public algorithm, original implementation).

Gradients come from plain JAX autodiff: ``ppermute`` transposes to the
inverse rotation and the ``lax.scan`` body is rematerialised
(``jax.checkpoint``) so backward memory also stays O(N/devices).

Per-hop engine: each hop attends the resident Q shard to the current K/V
chunk and yields ``(o_hop, lse_hop)``; hops merge exactly via
``logaddexp`` (the flash decomposition). The hop body dispatches between
two engines — stock-XLA jnp, or the Pallas blockwise kernel
(:func:`vit_ssl_tpu.ops.flash_blockwise.blockwise_attention_lse`, whose
lse output is differentiable so autodiff through the merge is exact).
At ViT-family token counts the per-shard chunks are far below the
kernel's profitable regime (the measured gates in ops/flash_attention.py
/ docs/performance.md), so ``hop_kernel="auto"`` keeps jnp there and
switches to Pallas once the per-device chunk reaches
``RING_PALLAS_MIN_CHUNK`` tokens — the long-context regime ring
attention exists for, where the kernel wins ~3× over XLA.

Reachable from the training CLI as ``parallel.sp`` — ``MultiHeadAttention``
dispatches here at trace time via ``parallel/context.py``.

Usage (inside or outside shard_map):

    mesh = create_seq_mesh(8)                       # ('seq',) axis
    out = ring_attention_sharded(q, k, v, scale, mesh)   # global arrays

    # or inside an existing shard_map over axis 'seq':
    out = ring_attention(q_shard, k_shard, v_shard, scale, axis_name="seq")
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

SEQ_AXIS = "seq"

# Per-device chunk length at which "auto" switches the hop body from jnp to
# the Pallas blockwise kernel. Measured directly at hop shapes on v5e
# (scripts/ring_hop_bench.py, table in docs/performance.md): the kernel
# loses/ties below 1024 local tokens and wins at and above it (fwd+bwd
# 2.22x at 1024, 2.86x at 2048, 3.21x at 4096 after the round-3 blockwise
# tuning).
RING_PALLAS_MIN_CHUNK = 1024


def create_seq_mesh(num_devices: int = -1, axis_name: str = SEQ_AXIS) -> Mesh:
    devices = jax.devices()
    if num_devices is None or num_devices < 0:
        num_devices = len(devices)
    return Mesh(np.asarray(devices[:num_devices]), (axis_name,))


def _hop_jnp(q, kc, vc, scale):
    """Partial attention of the Q shard against one K/V chunk.

    q (B,H,Nl,D); kc/vc (B,H,Nc,D). Returns the hop's normalised output
    (fp32) and per-row log-sum-exp (B,H,Nl fp32)."""
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q, kc, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bhnm,bhmd->bhnd", p.astype(vc.dtype), vc,
        preferred_element_type=jnp.float32,
    ) / l
    return o, (m + jnp.log(l))[..., 0]


def _hop_pallas(q, kc, vc, scale):
    """Pallas-kernel hop: the blockwise flash kernel with differentiable
    lse output (backward is the 2-kernel Pallas scheme; the merge's lse
    cotangent folds into its delta term at zero extra cost)."""
    from ..ops.flash_blockwise import blockwise_attention_lse, default_interpret

    o, lse = blockwise_attention_lse(
        q, kc, vc, scale, interpret=default_interpret()
    )
    return o.astype(jnp.float32), lse


def _use_pallas_hop(hop_kernel: str, n_local: int) -> bool:
    if hop_kernel == "pallas":
        return True
    if hop_kernel == "jnp":
        return False
    if hop_kernel != "auto":
        raise ValueError(f"hop_kernel must be auto|pallas|jnp, got {hop_kernel!r}")
    return (
        jax.default_backend() == "tpu" and n_local >= RING_PALLAS_MIN_CHUNK
    )


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    axis_name: str = SEQ_AXIS,
    hop_kernel: str = "auto",
) -> jnp.ndarray:
    """Exact attention over the full (ring-distributed) sequence.

    Call INSIDE shard_map/pmap: q/k/v are this device's (B, H, N_local, D)
    shards of sequences sharded along ``axis_name``. Returns the local
    (B, H, N_local, D) output shard. ``hop_kernel`` picks the per-hop
    engine (``"auto"``: Pallas once the chunk is in the kernel-win regime,
    jnp otherwise).
    """
    n_ring = jax.lax.psum(1, axis_name)
    b, h, n_local, d = q.shape
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]
    hop = _hop_pallas if _use_pallas_hop(hop_kernel, n_local) else _hop_jnp

    o0 = jnp.zeros((b, h, n_local, d), jnp.float32)
    lse0 = jnp.full((b, h, n_local), -jnp.inf, jnp.float32)

    @jax.checkpoint
    def body(carry, _):
        o, lse, kc, vc = carry
        o_hop, lse_hop = hop(q, kc, vc, scale)
        # exact flash merge of the running result with this hop's chunk
        lse_new = jnp.logaddexp(lse, lse_hop)
        o = (
            o * jnp.exp(lse - lse_new)[..., None]
            + o_hop * jnp.exp(lse_hop - lse_new)[..., None]
        )
        # rotate K/V one hop around the ring while the next step's math
        # proceeds — XLA overlaps the collective with compute
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (o, lse_new, kc, vc), ()

    (o, _, _, _), _ = jax.lax.scan(body, (o0, lse0, k, v), None, length=n_ring)
    return o.astype(q.dtype)


def ring_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mesh: Mesh,
    axis_name: str = SEQ_AXIS,
    check_rep: bool = False,
    batch_axis: str = None,
    head_axis: str = None,
    hop_kernel: str = "auto",
) -> jnp.ndarray:
    """Global-array entry point: shards (B, H, N, D) along N over
    ``axis_name`` and runs :func:`ring_attention` under shard_map.

    ``batch_axis`` / ``head_axis`` (optional) additionally shard the batch
    and head dimensions over those mesh axes — used when the mesh also
    carries data ('data') and tensor ('model') parallelism, so the ring
    composes with dp/tp instead of forcing an all-gather of the batch at
    the shard_map boundary. The ring collectives only ever run over
    ``axis_name``; batch and heads are embarrassingly parallel here.
    """
    spec = P(batch_axis, head_axis, axis_name, None)
    fn = jax.shard_map(
        functools.partial(
            ring_attention, scale=scale, axis_name=axis_name,
            hop_kernel=hop_kernel,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=check_rep,
    )
    return fn(q, k, v)


def ring_attention_available(n: int, mesh: Optional[Mesh], axis_name: str = SEQ_AXIS) -> bool:
    return (
        mesh is not None
        and axis_name in mesh.shape
        and n % mesh.shape[axis_name] == 0
    )
