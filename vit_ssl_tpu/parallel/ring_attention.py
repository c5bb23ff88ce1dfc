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

Scope note (stated, not hidden): the per-hop blockwise attention inside
the shard_map body is jnp — stock XLA fusions per hop, not the Pallas
kernel. At ViT-family token counts the per-shard chunks are far below
the kernel's profitable regime (ops/flash_attention.py gates), so XLA is
the right engine here; swapping the hop body for a Pallas call is future
work that only pays at much longer sequences.

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


def create_seq_mesh(num_devices: int = -1, axis_name: str = SEQ_AXIS) -> Mesh:
    devices = jax.devices()
    if num_devices is None or num_devices < 0:
        num_devices = len(devices)
    return Mesh(np.asarray(devices[:num_devices]), (axis_name,))


def _attend_chunk(q, kc, vc, scale, o, l, m):
    """One blockwise-softmax accumulation of a K/V chunk.

    q (B,H,Nl,D); kc/vc (B,H,Nc,D); o fp32 accumulator; l/m running
    normaliser and max, (B,H,Nl,1) fp32."""
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q, kc, preferred_element_type=jnp.float32
    ) * scale
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)
    l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum(
        "bhnm,bhmd->bhnd", p.astype(vc.dtype), vc,
        preferred_element_type=jnp.float32,
    )
    o_new = o * corr + pv
    return o_new, l_new, m_new


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    axis_name: str = SEQ_AXIS,
) -> jnp.ndarray:
    """Exact attention over the full (ring-distributed) sequence.

    Call INSIDE shard_map/pmap: q/k/v are this device's (B, H, N_local, D)
    shards of sequences sharded along ``axis_name``. Returns the local
    (B, H, N_local, D) output shard.
    """
    n_ring = jax.lax.psum(1, axis_name)
    b, h, n_local, d = q.shape
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    o0 = jnp.zeros((b, h, n_local, d), jnp.float32)
    l0 = jnp.zeros((b, h, n_local, 1), jnp.float32)
    m0 = jnp.full((b, h, n_local, 1), -jnp.inf, jnp.float32)

    @jax.checkpoint
    def body(carry, _):
        o, l, m, kc, vc = carry
        o, l, m = _attend_chunk(q, kc, vc, scale, o, l, m)
        # rotate K/V one hop around the ring while the next step's math
        # proceeds — XLA overlaps the collective with compute
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (o, l, m, kc, vc), ()

    (o, l, _, _, _), _ = jax.lax.scan(
        body, (o0, l0, m0, k, v), None, length=n_ring
    )
    return (o / l).astype(q.dtype)


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
        functools.partial(ring_attention, scale=scale, axis_name=axis_name),
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
