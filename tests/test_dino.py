"""DINO model tests: weight-norm head parity with torch, loss math parity
with the reference (`/root/reference/vit_core/ssl/dino/loss.py:13-29`),
center/EMA updates, and the multi-crop forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.models import (
    DINOHead,
    DINONetwork,
    WeightNormDense,
    cosine_momentum_schedule,
    dino_loss,
    momentum_update,
    teacher_temp_schedule,
    update_center,
)


def _network(**kw):
    defaults = dict(
        num_blocks=2,
        input_shape=(3, 32, 32),
        embed_dim=48,
        patch_size=8,
        num_heads=4,
        mlp_dim=96,
        dropout=0.0,
        output_dim=64,
        use_flash=False,
        use_fused_mlp=False,
    )
    defaults.update(kw)
    return DINONetwork(**defaults)


def test_weight_norm_dense_matches_torch():
    torch = pytest.importorskip("torch")
    from torch.nn.utils.parametrizations import weight_norm

    lin = weight_norm(torch.nn.Linear(8, 6), name="weight")
    x_np = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    with torch.no_grad():
        ref = lin(torch.from_numpy(x_np)).numpy()

    mod = WeightNormDense(features=6)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    # import torch's v/g/bias into our layout
    sd = {k: v.detach().numpy() for k, v in lin.state_dict().items()}
    v_t = sd["parametrizations.weight.original1"]  # (out, in)
    g_t = sd["parametrizations.weight.original0"]  # (out, 1)
    params = {
        "params": {
            "v": jnp.asarray(v_t.T),
            "g": jnp.asarray(g_t[:, 0]),
            "bias": jnp.asarray(sd["bias"]),
        }
    }
    out = mod.apply(params, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_weight_norm_g_initialised_to_norm():
    mod = WeightNormDense(features=6)
    params = mod.init(jax.random.PRNGKey(0), jnp.ones((1, 8)))["params"]
    expected = np.linalg.norm(np.asarray(params["v"]), axis=0)
    np.testing.assert_allclose(np.asarray(params["g"]), expected, rtol=1e-6)


def test_dino_loss_matches_torch_reference_math():
    torch = pytest.importorskip("torch")
    vt, vs, b, k = 2, 6, 4, 16
    rs = np.random.RandomState(0)
    t_np = rs.randn(vt, b, k).astype(np.float32)
    s_np = rs.randn(vs, b, k).astype(np.float32)
    c_np = rs.randn(1, k).astype(np.float32)
    t_temp, s_temp = 0.04, 0.1

    # the reference's exact computation (loss.py:23-29)
    t_t = torch.from_numpy(t_np)
    s_t = torch.from_numpy(s_np)
    sp = torch.log_softmax(s_t / s_temp, dim=-1)
    tp = torch.softmax((t_t - torch.from_numpy(c_np)) / t_temp, dim=-1)
    ref = -(tp.unsqueeze(1) * sp.unsqueeze(0)).sum(dim=1).mean()

    ours = dino_loss(jnp.asarray(t_np), jnp.asarray(s_np), jnp.asarray(c_np), t_temp, s_temp)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_dino_loss_stops_teacher_gradient():
    t = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
    s = jax.random.normal(jax.random.PRNGKey(1), (6, 4, 16))
    c = jnp.zeros((1, 16))
    gt = jax.grad(lambda t_: dino_loss(t_, s, c, 0.04, 0.1))(t)
    assert np.abs(np.asarray(gt)).max() == 0.0
    gs = jax.grad(lambda s_: dino_loss(t, s_, c, 0.04, 0.1))(s)
    assert np.abs(np.asarray(gs)).max() > 0.0


def test_update_center_ema():
    center = jnp.ones((1, 8))
    teacher_out = jnp.full((2, 4, 8), 3.0)  # mean = 3
    new = update_center(center, teacher_out, 0.9)
    np.testing.assert_allclose(np.asarray(new), 0.9 * 1.0 + 0.1 * 3.0, rtol=1e-6)


def test_momentum_update():
    teacher = {"w": jnp.zeros((3,)), "b": jnp.ones((2,))}
    student = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    out = momentum_update(teacher, student, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.9, rtol=1e-6)


def test_schedules_match_reference_values():
    import math

    # reference DINOMomentumScheduler (dino_utils.py:4-17)
    def ref_momentum(step, m_start, m_end, total):
        if step >= total:
            return m_end
        cos_term = math.cos(math.pi * step / total)
        return m_end - (m_end - m_start) * 0.5 * (1 + cos_term)

    for step in [0, 1, 50, 99, 100, 150]:
        ours = float(cosine_momentum_schedule(step, 0.996, 1.0, 100))
        np.testing.assert_allclose(ours, ref_momentum(step, 0.996, 1.0, 100), rtol=1e-6)

    def ref_temp(step, t0, t1, total, kind):
        if step >= total:
            return t1
        progress = step / total
        if kind == "linear":
            return t0 + (t1 - t0) * progress
        cos_term = math.cos(math.pi * progress)
        return t1 - (t1 - t0) * 0.5 * (1 + cos_term)

    for kind in ["cosine", "linear"]:
        for step in [0, 10, 99, 100]:
            ours = float(teacher_temp_schedule(step, 0.04, 0.07, 100, kind))
            np.testing.assert_allclose(ours, ref_temp(step, 0.04, 0.07, 100, kind), rtol=1e-6)


def test_network_multicrop_forward():
    net = _network()
    g = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))  # 2 views × B=2
    l = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))  # 4 views × B=2
    params = net.init(jax.random.PRNGKey(2), g)
    out_g = net.apply(params, g)
    out_l = net.apply(params, l)  # different resolution, same params
    assert out_g.shape == (4, 64)
    assert out_l.shape == (8, 64)


def test_network_features_path():
    net = _network()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(2), x)
    feats = net.apply(params, x, method=net.features)
    assert feats.shape == (2, 48)
    out = net.apply(params, feats, method=net.head_only)
    assert out.shape == (2, 64)


class TestPackedLocals:
    """Block-diagonal sequence packing of local crops
    (DINONetwork.forward_packed + model.dino_pack_locals)."""

    def _model(self, use_flash=False):
        from vit_ssl_tpu.models import DINONetwork

        return DINONetwork(
            num_blocks=2, input_shape=(3, 16, 16), embed_dim=32,
            patch_size=8, num_heads=2, mlp_dim=64, dropout=0.0,
            output_dim=16, use_flash=use_flash, use_fused_mlp=False,
        )

    def test_forward_packed_matches_unpacked(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        model = self._model()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        rs = np.random.RandomState(0)
        num_views, b = 4, 3
        x = jnp.asarray(rs.rand(num_views * b, 8, 8, 3).astype(np.float32))
        unpacked = model.apply(variables, x, True)
        packed = model.apply(
            variables, x, num_views, True, method="forward_packed"
        )
        np.testing.assert_allclose(
            np.asarray(packed), np.asarray(unpacked), atol=2e-5, rtol=1e-5
        )

    def test_packed_gradients_match_unpacked(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        model = self._model()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.rand(8, 8, 8, 3).astype(np.float32))

        def loss_unpacked(params):
            return jnp.sum(model.apply({"params": params}, x, True) ** 2)

        def loss_packed(params):
            return jnp.sum(
                model.apply(
                    {"params": params}, x, 4, True, method="forward_packed"
                ) ** 2
            )

        g_u = jax.grad(loss_unpacked)(variables["params"])
        g_p = jax.grad(loss_packed)(variables["params"])
        for a, b_ in zip(
            jax.tree_util.tree_leaves(g_u), jax.tree_util.tree_leaves(g_p)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3
            )

    def test_dino_step_pack_locals_matches(self):
        """make_dino_steps(pack_locals=True) == unpacked step at dropout 0."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from vit_ssl_tpu.train.state import create_train_state
        from vit_ssl_tpu.train.steps import make_dino_steps

        model = self._model()
        rs = np.random.RandomState(2)
        b = 4
        views = [
            jnp.asarray(rs.rand(b, 16, 16, 3).astype(np.float32))
            for _ in range(2)
        ] + [
            jnp.asarray(rs.rand(b, 8, 8, 3).astype(np.float32))
            for _ in range(4)
        ]
        batch = {"views": views, "weight": jnp.ones((b,), jnp.float32)}

        def fresh(tx):
            student = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
            )["params"]
            teacher = jax.tree_util.tree_map(
                lambda v: jnp.array(v, copy=True), student
            )
            return create_train_state(
                student, tx, jax.random.PRNGKey(1),
                teacher_params=teacher, center=jnp.zeros((1, 16), jnp.float32),
            )

        tx = optax.adamw(1e-3)
        kw = dict(num_global_views=2, num_all_views=6, student_temp=0.1,
                  center_momentum=0.9, donate=False, teacher_dropout=False)
        step_u, _ = make_dino_steps(model, tx, **kw)
        step_p, _ = make_dino_steps(model, tx, pack_locals=True, **kw)
        s_u, s_p = fresh(tx), fresh(tx)
        tt, tm = jnp.float32(0.04), jnp.float32(0.996)
        s_u, out_u = step_u(s_u, batch, tt, tm)
        s_p, out_p = step_p(s_p, batch, tt, tm)
        np.testing.assert_allclose(
            float(out_u["loss"]), float(out_p["loss"]), rtol=1e-5
        )
        for a, b_ in zip(
            jax.tree_util.tree_leaves(s_u.params),
            jax.tree_util.tree_leaves(s_p.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4
            )

    def test_dino_step_pack_locals_with_grad_accum(self):
        """Packing composes with the two-pass accumulation path."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from vit_ssl_tpu.train.state import create_train_state
        from vit_ssl_tpu.train.steps import make_dino_steps

        model = self._model()
        rs = np.random.RandomState(5)
        b = 4
        views = [
            jnp.asarray(rs.rand(b, 16, 16, 3).astype(np.float32))
            for _ in range(2)
        ] + [
            jnp.asarray(rs.rand(b, 8, 8, 3).astype(np.float32))
            for _ in range(4)
        ]
        batch = {"views": views, "weight": jnp.ones((b,), jnp.float32)}

        def fresh(tx):
            student = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
            )["params"]
            teacher = jax.tree_util.tree_map(
                lambda v: jnp.array(v, copy=True), student
            )
            return create_train_state(
                student, tx, jax.random.PRNGKey(1),
                teacher_params=teacher, center=jnp.zeros((1, 16), jnp.float32),
            )

        tx = optax.adamw(1e-3)
        kw = dict(num_global_views=2, num_all_views=6, student_temp=0.1,
                  center_momentum=0.9, donate=False, teacher_dropout=False)
        step_full, _ = make_dino_steps(model, tx, pack_locals=True, **kw)
        step_acc, _ = make_dino_steps(
            model, tx, pack_locals=True, grad_accum=2, **kw
        )
        s_f, s_a = fresh(tx), fresh(tx)
        tt, tm = jnp.float32(0.04), jnp.float32(0.996)
        s_f, out_f = step_full(s_f, batch, tt, tm)
        s_a, out_a = step_acc(s_a, batch, tt, tm)
        np.testing.assert_allclose(
            float(out_f["loss"]), float(out_a["loss"]), rtol=1e-5
        )
        for a, b_ in zip(
            jax.tree_util.tree_leaves(s_f.params),
            jax.tree_util.tree_leaves(s_a.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-5
            )
