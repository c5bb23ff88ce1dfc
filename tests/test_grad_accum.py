"""Gradient accumulation (training.grad_accum_steps): the accumulated
update must equal the full-batch update exactly (dropout 0 so the RNG
streams don't intentionally differ), including under padded-batch sample
weights and SimMIM mask weighting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vit_ssl_tpu.models import SimMIMViT, ViT
from vit_ssl_tpu.train.state import create_train_state
from vit_ssl_tpu.train.steps import make_simmim_steps, make_supervised_steps


def _vit():
    return ViT(
        num_classes=5, num_blocks=2, input_shape=(3, 16, 16), embed_dim=32,
        patch_size=8, num_heads=2, mlp_dim=64, dropout=0.0,
        use_flash=False, use_fused_mlp=False,
    )


def _batch(weights=None, b=8):
    rs = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rs.rand(b, 16, 16, 3).astype(np.float32)),
        "label": jnp.asarray(rs.randint(0, 5, b).astype(np.int32)),
        "weight": jnp.asarray(
            np.ones(b, np.float32) if weights is None else weights
        ),
    }


def _states(model, init_batch):
    tx = optax.adamw(1e-3, weight_decay=1e-3)
    if isinstance(model, SimMIMViT):
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            init_batch,
        )
        params = variables["params"]
    else:
        params = model.init(jax.random.PRNGKey(0), init_batch)["params"]
    return tx, create_train_state(params, tx, jax.random.PRNGKey(2))


@pytest.mark.parametrize("accum", [2, 4])
def test_supervised_matches_full_batch(accum):
    model = _vit()
    batch = _batch()
    tx, state_full = _states(model, batch["image"][:1])
    _, state_acc = _states(model, batch["image"][:1])

    step_full, _ = make_supervised_steps(model, tx, donate=False)
    step_acc, _ = make_supervised_steps(model, tx, donate=False, grad_accum=accum)

    for _ in range(3):
        state_full, out_f = step_full(state_full, batch)
        state_acc, out_a = step_acc(state_acc, batch)
    np.testing.assert_allclose(float(out_f["loss"]), float(out_a["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_full.params),
        jax.tree_util.tree_leaves(state_acc.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_f["preds"]), np.asarray(out_a["preds"]))


def test_supervised_weighted_padding_exact():
    """Padded samples (weight 0) in the last microbatch must not skew the
    normaliser."""
    w = np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32)
    model = _vit()
    batch = _batch(weights=w)
    tx, state_full = _states(model, batch["image"][:1])
    _, state_acc = _states(model, batch["image"][:1])
    step_full, _ = make_supervised_steps(model, tx, donate=False)
    step_acc, _ = make_supervised_steps(model, tx, donate=False, grad_accum=4)
    state_full, out_f = step_full(state_full, batch)
    state_acc, out_a = step_acc(state_acc, batch)
    np.testing.assert_allclose(float(out_f["loss"]), float(out_a["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_full.params),
        jax.tree_util.tree_leaves(state_acc.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)


def test_simmim_matches_full_batch():
    """Same mask stream required: inject determinism by comparing the
    accumulated step against a manual full-batch step using the SAME
    per-microbatch masks is complex; instead rely on mask-weight
    normalisation exactness — with mask_ratio fixed and dropout 0 the
    *loss scale* must match a manual recomputation."""
    model = SimMIMViT(
        num_blocks=1, input_shape=(3, 16, 16), embed_dim=32, patch_size=8,
        num_heads=2, mlp_dim=64, dropout=0.0, mask_ratio=0.5,
        use_flash=False, use_fused_mlp=False,
    )
    batch = {
        "image": jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32)),
        "weight": jnp.ones((8,), jnp.float32),
    }
    tx, state = _states(model, batch["image"][:1])
    step_acc, _ = make_simmim_steps(
        model, tx, patch_size=8, channels=3, donate=False, grad_accum=2
    )
    state2, out = step_acc(state, batch)
    assert np.isfinite(float(out["loss"]))
    # 4 patches/image × mask 0.5 × 8 images = 16 masked patches,
    # accumulated across both microbatches
    assert float(out["ssim_count"]) == 16.0
    # params actually updated
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(state2.params),
        )
    )
    assert moved


def test_indivisible_batch_raises():
    model = _vit()
    batch = _batch(b=6)
    tx, state = _states(model, batch["image"][:1])
    step_acc, _ = make_supervised_steps(model, tx, donate=False, grad_accum=4)
    with pytest.raises(ValueError, match="grad_accum"):
        step_acc(state, batch)


def test_dino_matches_full_batch():
    """Two-pass DINO accumulation == the fused full-batch step (dropout 0,
    deterministic teacher, precomputed views): identical loss, center, and
    updated params."""
    from vit_ssl_tpu.models import DINONetwork
    from vit_ssl_tpu.train.steps import make_dino_steps

    model = DINONetwork(
        num_blocks=1, input_shape=(3, 16, 16), embed_dim=32, patch_size=8,
        num_heads=2, mlp_dim=64, dropout=0.0, output_dim=16,
        use_flash=False, use_fused_mlp=False,
    )
    rs = np.random.RandomState(0)
    b = 8
    views = [
        jnp.asarray(rs.rand(b, 16, 16, 3).astype(np.float32)) for _ in range(2)
    ] + [jnp.asarray(rs.rand(b, 8, 8, 3).astype(np.float32)) for _ in range(2)]
    batch = {"views": views, "weight": jnp.ones((b,), jnp.float32)}

    def fresh_state(tx):
        student = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
        teacher = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), student)
        center = jnp.zeros((1, 16), jnp.float32)
        return create_train_state(
            student, tx, jax.random.PRNGKey(1),
            teacher_params=teacher, center=center,
        )

    tx = optax.adamw(1e-3, weight_decay=1e-3)
    kw = dict(num_global_views=2, num_all_views=4, student_temp=0.1,
              center_momentum=0.9, donate=False, teacher_dropout=False)
    step_full, _ = make_dino_steps(model, tx, **kw)
    step_acc, _ = make_dino_steps(model, tx, grad_accum=2, **kw)

    s_full = fresh_state(tx)
    s_acc = fresh_state(tx)
    tt, tm = jnp.float32(0.04), jnp.float32(0.996)
    # step 1: exact to fp32 reduction order
    s_full, out_f = step_full(s_full, batch, tt, tm)
    s_acc, out_a = step_acc(s_acc, batch, tt, tm)
    np.testing.assert_allclose(float(out_f["loss"]), float(out_a["loss"]), rtol=1e-6)
    for a, bb in zip(
        jax.tree_util.tree_leaves(s_full.params),
        jax.tree_util.tree_leaves(s_acc.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-5)
    # two more coupled steps: Adam amplifies reduction-order noise — stay
    # within loose fp32 drift bounds
    for _ in range(2):
        s_full, out_f = step_full(s_full, batch, tt, tm)
        s_acc, out_a = step_acc(s_acc, batch, tt, tm)
    np.testing.assert_allclose(float(out_f["loss"]), float(out_a["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_full.center), np.asarray(s_acc.center), atol=1e-6, rtol=1e-4
    )
    for a, bb in zip(
        jax.tree_util.tree_leaves(s_full.params),
        jax.tree_util.tree_leaves(s_acc.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-5, rtol=1e-3)
    for key in ("CosineSim", "TeacherSTD"):
        np.testing.assert_allclose(
            float(out_f["dino_stats"][key]), float(out_a["dino_stats"][key]),
            rtol=1e-4,
        )


def test_dino_weighted_padding_exact():
    """The repo contract says every loss/metric is weight-exact under
    padded batches (train/steps.py). For DINO that includes the center EMA
    and the collapse stats: a padded batch (loader pads with copies of
    sample 0 at weight 0) must produce the SAME loss, center, updated
    params, and distribution stats as the truncated batch."""
    from vit_ssl_tpu.models import DINONetwork
    from vit_ssl_tpu.train.steps import make_dino_steps

    model = DINONetwork(
        num_blocks=1, input_shape=(3, 16, 16), embed_dim=32, patch_size=8,
        num_heads=2, mlp_dim=64, dropout=0.0, output_dim=16,
        use_flash=False, use_fused_mlp=False,
    )
    rs = np.random.RandomState(3)
    b_real, b_pad = 6, 8

    def make_views(b):
        g = [rs.rand(b, 16, 16, 3).astype(np.float32) for _ in range(2)]
        l = [rs.rand(b, 8, 8, 3).astype(np.float32) for _ in range(2)]
        return g + l

    views_real = make_views(b_real)
    # pad rows duplicate sample 0 (data/loader.py::_collate contract)
    views_padded = [
        jnp.asarray(np.concatenate([v, np.repeat(v[:1], b_pad - b_real, 0)]))
        for v in views_real
    ]
    views_real = [jnp.asarray(v) for v in views_real]
    w_padded = np.zeros((b_pad,), np.float32)
    w_padded[:b_real] = 1.0

    batch_real = {"views": views_real, "weight": jnp.ones((b_real,), jnp.float32)}
    batch_padded = {"views": views_padded, "weight": jnp.asarray(w_padded)}

    def fresh_state(tx):
        student = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
        teacher = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), student)
        center = jnp.zeros((1, 16), jnp.float32)
        return create_train_state(
            student, tx, jax.random.PRNGKey(1),
            teacher_params=teacher, center=center,
        )

    tx = optax.adamw(1e-3, weight_decay=1e-3)
    kw = dict(num_global_views=2, num_all_views=4, student_temp=0.1,
              center_momentum=0.9, donate=False, teacher_dropout=False)
    step, _ = make_dino_steps(model, tx, **kw)

    s_real = fresh_state(tx)
    s_pad = fresh_state(tx)
    tt, tm = jnp.float32(0.04), jnp.float32(0.996)
    s_real, out_r = step(s_real, batch_real, tt, tm)
    s_pad, out_p = step(s_pad, batch_padded, tt, tm)

    np.testing.assert_allclose(
        float(out_r["loss"]), float(out_p["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_real.center), np.asarray(s_pad.center), atol=1e-7
    )
    for a, bb in zip(
        jax.tree_util.tree_leaves(s_real.params),
        jax.tree_util.tree_leaves(s_pad.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-6)
    for key, val in out_r["dino_stats"].items():
        np.testing.assert_allclose(
            float(val), float(out_p["dino_stats"][key]), rtol=1e-5, atol=1e-6,
            err_msg=f"stat {key} not weight-exact under padding",
        )


def test_dino_accum_weighted_padding_exact():
    """Same contract through the two-pass accumulation path: the padded
    batch at grad_accum=2 must match the fused truncated batch."""
    from vit_ssl_tpu.models import DINONetwork
    from vit_ssl_tpu.train.steps import make_dino_steps

    model = DINONetwork(
        num_blocks=1, input_shape=(3, 16, 16), embed_dim=32, patch_size=8,
        num_heads=2, mlp_dim=64, dropout=0.0, output_dim=16,
        use_flash=False, use_fused_mlp=False,
    )
    rs = np.random.RandomState(4)
    b_real, b_pad = 6, 8
    views_real = (
        [rs.rand(b_real, 16, 16, 3).astype(np.float32) for _ in range(2)]
        + [rs.rand(b_real, 8, 8, 3).astype(np.float32) for _ in range(2)]
    )
    views_padded = [
        jnp.asarray(np.concatenate([v, np.repeat(v[:1], b_pad - b_real, 0)]))
        for v in views_real
    ]
    w_padded = np.zeros((b_pad,), np.float32)
    w_padded[:b_real] = 1.0
    batch_real = {
        "views": [jnp.asarray(v) for v in views_real],
        "weight": jnp.ones((b_real,), jnp.float32),
    }
    batch_padded = {"views": views_padded, "weight": jnp.asarray(w_padded)}

    def fresh_state(tx):
        student = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
        teacher = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), student)
        return create_train_state(
            student, tx, jax.random.PRNGKey(1),
            teacher_params=teacher, center=jnp.zeros((1, 16), jnp.float32),
        )

    tx = optax.adamw(1e-3, weight_decay=1e-3)
    kw = dict(num_global_views=2, num_all_views=4, student_temp=0.1,
              center_momentum=0.9, donate=False, teacher_dropout=False)
    step_full, _ = make_dino_steps(model, tx, **kw)
    step_acc, _ = make_dino_steps(model, tx, grad_accum=2, **kw)

    s_real = fresh_state(tx)
    s_pad = fresh_state(tx)
    tt, tm = jnp.float32(0.04), jnp.float32(0.996)
    s_real, out_r = step_full(s_real, batch_real, tt, tm)
    s_pad, out_p = step_acc(s_pad, batch_padded, tt, tm)
    np.testing.assert_allclose(float(out_r["loss"]), float(out_p["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_real.center), np.asarray(s_pad.center), atol=1e-6
    )
    for a, bb in zip(
        jax.tree_util.tree_leaves(s_real.params),
        jax.tree_util.tree_leaves(s_pad.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-5)
