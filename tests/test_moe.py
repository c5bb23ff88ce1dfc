"""Mixture-of-Experts FFN + expert parallelism (ops/moe.py, parallel.ep).

TPU-native addition with no reference counterpart (the reference FFN is
dense, `/root/reference/vit_core/feed_forward.py:7-28`). Coverage:

- GShard dense routing == a naive seated-one-by-one Python oracle
  (capacity, slot-major priority, drops) on random logits.
- Identical experts + ample capacity == the dense FFN exactly (the
  normalized top-k gates form a convex combination).
- Load-balance aux == 1.0 under uniform routing; > 1 when skewed.
- ViT with moe_experts places MoE in every moe_every-th block and trains
  through make_supervised_steps (aux loss wired, loss finite, params move).
- parallel.ep=2 through the REAL training CLI matches the ep=1 run's
  numerics (same seed; sharding must not change math), and the expert
  weights are actually sharded over the 'expert' mesh axis.
- Config validation: ep without MoE, MoE+pp, MoE in SSL modes, bad top_k.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from make_synthetic_data import make

import train as train_cli
from vit_ssl_tpu.config import compose, validate_train_config
from vit_ssl_tpu.config.schemas import ConfigValidationError
from vit_ssl_tpu.models import ViT
from vit_ssl_tpu.ops import FeedForwardBlock, MoEFeedForward, moe_routing
from vit_ssl_tpu.ops.moe import expert_capacity
from vit_ssl_tpu.parallel import EXPERT_AXIS, mesh_from_config
from vit_ssl_tpu.utils.checkpoint import load_checkpoint


# ---------------------------------------------------------------------------
# routing
# ---------------------------------------------------------------------------


def _naive_routing(logits, top_k, capacity, normalize=True):
    """Reference semantics, seated one token at a time: slot-major then
    token-major priority, kept-only capacity counting."""
    t, e = logits.shape
    x = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(x) / np.exp(x).sum(axis=1, keepdims=True)
    gate_idx = np.argsort(-probs, kind="stable", axis=1)[:, :top_k]
    gate_vals = np.take_along_axis(probs, gate_idx, axis=1)
    if normalize:
        gate_vals = gate_vals / gate_vals.sum(axis=1, keepdims=True)
    combine = np.zeros((t, e, capacity), np.float32)
    counts = np.zeros(e, np.int64)
    for slot in range(top_k):
        for tok in range(t):
            ex = int(gate_idx[tok, slot])
            if counts[ex] < capacity:
                combine[tok, ex, counts[ex]] = gate_vals[tok, slot]
                counts[ex] += 1
    return combine


@pytest.mark.parametrize("top_k,capacity", [(1, 4), (2, 4), (2, 16), (2, 1)])
def test_routing_matches_naive_oracle(top_k, capacity):
    rng = np.random.RandomState(0)
    logits = rng.randn(37, 5).astype(np.float32) * 2.0
    combine, aux = moe_routing(jnp.asarray(logits), top_k, capacity)
    expected = _naive_routing(logits, top_k, capacity)
    np.testing.assert_allclose(np.asarray(combine), expected, atol=1e-6)
    assert 0.0 <= float(aux["dropped_frac"]) <= 1.0


def test_routing_capacity_drops_lowest_priority():
    # three tokens want expert 0, capacity 1: only the first is seated
    logits = jnp.array(
        [[2.0, 0.0], [2.0, 0.0], [2.0, 0.0], [0.0, 2.0]], jnp.float32
    )
    combine, aux = moe_routing(logits, top_k=1, capacity=1)
    seated = np.asarray((combine > 0).sum(axis=(1, 2)))
    np.testing.assert_array_equal(seated, [1, 0, 0, 1])
    assert float(aux["dropped_frac"]) == pytest.approx(0.5)


def test_balance_loss_uniform_is_one_and_skew_larger():
    t, e = 64, 4
    uniform = jnp.zeros((t, e), jnp.float32)
    _, aux_u = moe_routing(uniform, top_k=2, capacity=t)
    assert float(aux_u["balance"]) == pytest.approx(1.0, abs=1e-5)
    skewed = jnp.tile(jnp.array([[4.0, 2.0, 0.0, 0.0]], jnp.float32), (t, 1))
    _, aux_s = moe_routing(skewed, top_k=2, capacity=t)
    assert float(aux_s["balance"]) > 1.0


def test_expert_capacity_static():
    # ceil(2*290/8*1.25)=91 → rounded to 96; capped at T; min 1
    assert expert_capacity(290, 8, 2, 1.25) == 96
    assert expert_capacity(10, 2, 1, 100.0) == 10
    assert expert_capacity(4, 8, 1, 1.0) == 4


# ---------------------------------------------------------------------------
# the module
# ---------------------------------------------------------------------------


def _tie_experts(params):
    return dict(
        params,
        w1=jnp.broadcast_to(params["w1"][0], params["w1"].shape),
        b1=jnp.broadcast_to(params["b1"][0], params["b1"].shape),
        w2=jnp.broadcast_to(params["w2"][0], params["w2"].shape),
        b2=jnp.broadcast_to(params["b2"][0], params["b2"].shape),
    )


def test_identical_experts_equal_dense_ffn():
    d, f, e = 16, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, d))
    moe = MoEFeedForward(
        d_model=d, d_ff=f, num_experts=e, top_k=2,
        capacity_factor=float(e), dropout=0.0,
    )
    p = moe.init(jax.random.PRNGKey(1), x)["params"]
    y_moe = moe.apply({"params": _tie_experts(p)}, x)
    dense = FeedForwardBlock(d_model=d, d_ff=f, dropout=0.0)
    pd = {"w1": p["w1"][0], "b1": p["b1"][0], "w2": p["w2"][0], "b2": p["b2"][0]}
    y_dense = dense.apply({"params": pd}, x)
    np.testing.assert_allclose(
        np.asarray(y_moe), np.asarray(y_dense), atol=1e-5
    )


def test_grouped_routing_equals_dense_ffn():
    """group_size > 0 (GShard's (G, S) layout) must still be an exact
    convex combination: tied experts + ample per-group capacity == the
    dense FFN, independent of the grouping."""
    d, f, e = 16, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, d))  # T = 24
    dense = FeedForwardBlock(d_model=d, d_ff=f, dropout=0.0)
    for gs in (0, 8, 12):
        moe = MoEFeedForward(
            d_model=d, d_ff=f, num_experts=e, top_k=2,
            capacity_factor=float(e), group_size=gs, dropout=0.0,
        )
        p = moe.init(jax.random.PRNGKey(1), x)["params"]
        y_moe = moe.apply({"params": _tie_experts(p)}, x)
        pd = {"w1": p["w1"][0], "b1": p["b1"][0],
              "w2": p["w2"][0], "b2": p["b2"][0]}
        y_dense = dense.apply({"params": pd}, x)
        np.testing.assert_allclose(
            np.asarray(y_moe), np.asarray(y_dense), atol=1e-5,
            err_msg=f"group_size={gs}",
        )


def test_group_size_must_divide_tokens():
    d, f = 8, 16
    x = jnp.zeros((2, 5, d))  # T = 10
    moe = MoEFeedForward(
        d_model=d, d_ff=f, num_experts=2, group_size=4, dropout=0.0
    )
    with pytest.raises(ValueError, match="group_size"):
        moe.init(jax.random.PRNGKey(0), x)


def test_grouped_capacity_is_per_group():
    """Per-group capacity: with G groups, an expert can seat `capacity`
    tokens in EVERY group, so grouping changes which assignments drop."""
    t, e = 16, 2
    # all tokens want expert 0
    logits = jnp.tile(jnp.array([[2.0, 0.0]], jnp.float32), (t, 1))
    # one global group, capacity 8: 8 of 16 seated
    c_global, aux_g = moe_routing(logits, top_k=1, capacity=8)
    assert float(aux_g["dropped_frac"]) == pytest.approx(0.5)
    # two groups of 8, capacity 8 each: everyone seated
    grouped = logits.reshape(2, 8, e)
    c2, aux2 = jax.vmap(lambda lg: moe_routing(lg, 1, 8))(grouped)
    assert float(jnp.mean(aux2["dropped_frac"])) == 0.0


def test_moe_eval_deterministic_and_grads_finite():
    d, f, e = 8, 16, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, d))
    moe = MoEFeedForward(d_model=d, d_ff=f, num_experts=e, dropout=0.1)
    variables = moe.init(jax.random.PRNGKey(1), x)
    y1 = moe.apply(variables, x)
    y2 = moe.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def loss(p):
        y, mut = moe.apply(
            {"params": p}, x, False,
            rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["losses"],
        )
        aux = sum(jax.tree_util.tree_leaves(mut["losses"]))
        return jnp.sum(y**2) + aux

    grads = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # the router must receive gradient (through combine weights + aux)
    assert float(jnp.max(jnp.abs(grads["router"]))) > 0.0


# ---------------------------------------------------------------------------
# model + steps integration
# ---------------------------------------------------------------------------


def _tiny_moe_vit(**over):
    kw = dict(
        num_classes=3, num_blocks=4, input_shape=(3, 24, 24), embed_dim=32,
        patch_size=8, num_heads=4, mlp_dim=64, dropout=0.0, use_flash=False,
        moe_experts=2, moe_every=2, moe_capacity_factor=4.0,
    )
    kw.update(over)
    return ViT(**kw)


def test_vit_moe_block_placement():
    model = _tiny_moe_vit()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3))
    )["params"]
    # moe_every=2 → blocks 1 and 3 are MoE, blocks 0 and 2 dense
    for i in (0, 2):
        assert "feed_forward" in params[f"encoder_blocks_{i}"]
        assert "moe" not in params[f"encoder_blocks_{i}"]
    for i in (1, 3):
        assert "moe" in params[f"encoder_blocks_{i}"]
        assert params[f"encoder_blocks_{i}"]["moe"]["w1"].shape == (2, 32, 64)


def test_supervised_steps_train_moe():
    import optax

    from vit_ssl_tpu.train.state import create_train_state
    from vit_ssl_tpu.train.steps import make_supervised_steps

    model = _tiny_moe_vit(dropout=0.1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3))
    )["params"]
    tx = optax.adamw(1e-3)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    train_step, eval_step = make_supervised_steps(model, tx, donate=False)
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.rand(8, 24, 24, 3).astype(np.float32),
        "label": rs.randint(0, 3, 8).astype(np.int32),
        "weight": np.ones(8, np.float32),
    }
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    for _ in range(3):
        state, out = train_step(state, batch)
        assert np.isfinite(float(out["loss"]))
        # routing observability surfaces; ample capacity (cf=4) drops none
        assert float(out["moe_dropped_frac"]) == 0.0
    assert not np.allclose(
        np.asarray(p0), np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    )
    ev = eval_step(state, batch)
    assert np.isfinite(float(ev["loss"]))
    assert "moe_dropped_frac" not in ev


def test_moe_with_remat():
    """parallel.remat wraps blocks in nn.remat; the sown router losses and
    moe_stats must survive rematerialisation (train loss still carries a
    positive aux vs the eval loss at lr 0)."""
    import optax

    from vit_ssl_tpu.train.state import create_train_state
    from vit_ssl_tpu.train.steps import make_supervised_steps

    model = _tiny_moe_vit(remat=True)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3))
    )["params"]
    tx = optax.sgd(0.0)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    train_step, eval_step = make_supervised_steps(model, tx, donate=False)
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.rand(8, 24, 24, 3).astype(np.float32),
        "label": rs.randint(0, 3, 8).astype(np.int32),
        "weight": np.ones(8, np.float32),
    }
    _, out = train_step(state, batch)
    ev = eval_step(state, batch)
    aux = float(out["loss"]) - float(ev["loss"])
    assert 0.0 < aux < 1.0  # sown aux survives remat (dropout 0, lr 0)
    assert float(out["moe_dropped_frac"]) == 0.0


def test_moe_dropped_frac_reports_overflow():
    """Starved capacity must surface as a positive dropped fraction in the
    train step's output."""
    import optax

    from vit_ssl_tpu.train.state import create_train_state
    from vit_ssl_tpu.train.steps import make_supervised_steps

    model = _tiny_moe_vit(moe_capacity_factor=0.25, moe_top_k=1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3))
    )["params"]
    tx = optax.sgd(0.0)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    train_step, _ = make_supervised_steps(model, tx, donate=False)
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.rand(8, 24, 24, 3).astype(np.float32),
        "label": rs.randint(0, 3, 8).astype(np.int32),
        "weight": np.ones(8, np.float32),
    }
    _, out = train_step(state, batch)
    dropped = float(out["moe_dropped_frac"])
    assert 0.0 < dropped < 1.0


def test_moe_grad_accum_trains():
    """grad_accum with MoE is a per-microbatch estimator (routing capacity
    applies per microbatch — documented in make_supervised_steps); it must
    run, stay finite, and carry the aux loss per microbatch."""
    import optax

    from vit_ssl_tpu.train.state import create_train_state
    from vit_ssl_tpu.train.steps import make_supervised_steps

    model = _tiny_moe_vit()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3))
    )["params"]
    tx = optax.adamw(1e-3)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step, _ = make_supervised_steps(model, tx, donate=False, grad_accum=2)
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.rand(8, 24, 24, 3).astype(np.float32),
        "label": rs.randint(0, 3, 8).astype(np.int32),
        "weight": np.ones(8, np.float32),
    }
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    for _ in range(2):
        state, out = step(state, batch)
        assert np.isfinite(float(out["loss"]))
    assert not np.allclose(
        p0, np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    )


def test_moe_aux_included_in_train_loss_only():
    """The train loss must carry the router losses (≈ aux_weight·balance +
    zloss_weight·zloss > 0 for any router), the eval loss must not."""
    import optax

    from vit_ssl_tpu.train.state import create_train_state
    from vit_ssl_tpu.train.steps import make_supervised_steps

    model = _tiny_moe_vit()  # dropout 0 → train fwd == eval fwd up to aux
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3))
    )["params"]
    tx = optax.sgd(0.0)  # lr 0: params frozen, losses comparable
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    train_step, eval_step = make_supervised_steps(model, tx, donate=False)
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.rand(8, 24, 24, 3).astype(np.float32),
        "label": rs.randint(0, 3, 8).astype(np.int32),
        "weight": np.ones(8, np.float32),
    }
    _, out = train_step(state, batch)
    ev = eval_step(state, batch)
    aux = float(out["loss"]) - float(ev["loss"])
    assert aux > 0.0  # z-loss is positive for any finite logits
    assert aux < 1.0  # …but the coefficients keep it small


def test_torch_export_rejects_moe():
    """The reference has no MoE, so exporting a MoE model to its torch
    layout must fail with a named block, not a KeyError."""
    from vit_ssl_tpu.utils.checkpoint import vit_params_to_torch

    model = _tiny_moe_vit()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3))
    )["params"]
    with pytest.raises(ValueError, match="Mixture-of-Experts"):
        vit_params_to_torch(params)


def test_sparse_upcycling_dense_to_moe():
    """load_weights from a dense checkpoint into a MoE model replicates
    the dense FFN into every expert (arXiv:2212.05055); with normalized
    top-k gates + ample capacity the upcycled forward equals the dense
    forward exactly at init."""
    from vit_ssl_tpu.models.builder import load_weights

    dense = _tiny_moe_vit(moe_experts=0)
    moe = _tiny_moe_vit()  # 2 experts in blocks 1 and 3, cf=4.0
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 24, 24, 3))
    dense_params = dense.init(jax.random.PRNGKey(0), x[:1])["params"]
    moe_params = moe.init(jax.random.PRNGKey(1), x[:1])["params"]

    loaded = load_weights(moe_params, dense_params)
    blk = loaded["encoder_blocks_1"]["moe"]
    src = dense_params["encoder_blocks_1"]["feed_forward"]
    for name in ("w1", "b1", "w2", "b2"):
        for e in range(2):
            np.testing.assert_array_equal(
                np.asarray(blk[name][e]), np.asarray(src[name]), err_msg=name
            )
    # router untouched (fresh init), non-MoE blocks transfer directly
    np.testing.assert_array_equal(
        np.asarray(blk["router"]),
        np.asarray(moe_params["encoder_blocks_1"]["moe"]["router"]),
    )
    np.testing.assert_array_equal(
        np.asarray(loaded["encoder_blocks_0"]["feed_forward"]["w1"]),
        np.asarray(dense_params["encoder_blocks_0"]["feed_forward"]["w1"]),
    )

    y_dense = dense.apply({"params": dense_params}, x, deterministic=True)
    y_moe = moe.apply({"params": loaded}, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(y_moe), np.asarray(y_dense), atol=1e-5
    )


def test_sparse_upcycling_from_ssl_backbone():
    """Extended transfer (DINO/SimMIM → finetune) must upcycle too: the
    dense FFN under the backbone prefix replicates into the experts."""
    from vit_ssl_tpu.models.builder import load_weights

    dense = _tiny_moe_vit(moe_experts=0)
    moe = _tiny_moe_vit()
    x0 = jnp.zeros((1, 24, 24, 3))
    dense_params = dense.init(jax.random.PRNGKey(0), x0)["params"]
    moe_params = moe.init(jax.random.PRNGKey(1), x0)["params"]

    src = {"teacher": {"backbone": dense_params}}
    loaded = load_weights(moe_params, src, extended=True)
    blk = loaded["encoder_blocks_1"]["moe"]
    ref = dense_params["encoder_blocks_1"]["feed_forward"]
    for name in ("w1", "b1", "w2", "b2"):
        for e in range(2):
            np.testing.assert_array_equal(
                np.asarray(blk[name][e]), np.asarray(ref[name]), err_msg=name
            )
    # without extended, SSL-prefixed sources stay untouched (fresh init)
    loaded_plain = load_weights(moe_params, src, extended=False)
    np.testing.assert_array_equal(
        np.asarray(loaded_plain["encoder_blocks_1"]["moe"]["w1"]),
        np.asarray(moe_params["encoder_blocks_1"]["moe"]["w1"]),
    )


# ---------------------------------------------------------------------------
# expert parallelism through the real CLI
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make(str(tmp_path_factory.mktemp("synth")), n=32, size=24, num_classes=3)


def _run_moe_cli(data_root, run_dir, extra=()):
    train_cli.main(
        [
            "--config-name", "supervised",
            f"data.data_dir={data_root}/train_images",
            f"data.data_csv={data_root}/train_labels.json",
            "model.num_classes=3",
            "data.img_size=24",
            "data.num_workers=0",
            "model.embed_dim=32",
            "model.num_heads=4",
            "model.num_blocks=2",
            "model.mlp_dim=64",
            "model.patch_size=8",
            "model.dropout=0.0",
            "model.use_flash_attention=false",
            "model.moe_experts=2",
            "model.moe_capacity_factor=4.0",
            "training.num_epochs=1",
            "training.batch_size=8",
            "training.warmup_epochs=1",
            "training.plain_logging=true",
            "eval.interval=0",
            f"hydra.run.dir={run_dir}",
            *extra,
        ]
    )
    tree, _ = load_checkpoint(os.path.join(run_dir, "last_model"))
    return tree


@pytest.fixture(scope="module")
def ep1_base(data_root, tmp_path_factory):
    """The unsharded MoE CLI run both sharded-numerics tests compare
    against (one full train on the 1-core host, shared)."""
    return _run_moe_cli(data_root, str(tmp_path_factory.mktemp("ep1")))


def test_ep2_cli_matches_ep1(data_root, ep1_base, tmp_path):
    tree = _run_moe_cli(
        data_root, str(tmp_path / "ep2"), extra=("parallel.ep=2",)
    )
    ref_leaves = jax.tree_util.tree_leaves(ep1_base["params"])
    leaves = jax.tree_util.tree_leaves(tree["params"])
    assert len(ref_leaves) == len(leaves)
    for a, b in zip(ref_leaves, leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def test_tp_ep_composed_cli_matches_ep1(data_root, ep1_base, tmp_path):
    """Axes compose: dp=2 × tp=2 × ep=2 through the real CLI — the MoE
    rule table emits both 'expert' (w1 dim 0) and 'model' (w1 dim 2)
    axes; combined-mesh numerics must equal the unsharded run."""
    tree = _run_moe_cli(
        data_root, str(tmp_path / "tp_ep"),
        extra=("parallel.tp=2", "parallel.ep=2"),
    )
    ref_leaves = jax.tree_util.tree_leaves(ep1_base["params"])
    leaves = jax.tree_util.tree_leaves(tree["params"])
    assert len(ref_leaves) == len(leaves)
    for a, b in zip(ref_leaves, leaves):
        # composed meshes reorder the fp32 reductions (same bound as the
        # tp×sp composition test in tests/test_parallel_cli.py)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4
        )


def test_tp_ep_param_specs():
    """On a ('data','model','expert') mesh the expert kernels shard on
    BOTH axes; dims the mesh axis size doesn't divide fall back loudly."""
    from jax.sharding import Mesh
    from vit_ssl_tpu.parallel.sharding_rules import shard_params

    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "model", EXPERT_AXIS))
    model = _tiny_moe_vit()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3))
    )["params"]
    placed = shard_params(params, mesh)
    w1 = placed["encoder_blocks_1"]["moe"]["w1"]  # (E=2, d=32, f=64)
    assert w1.sharding.spec[0] == EXPERT_AXIS
    assert w1.sharding.spec[2] == "model"
    w2 = placed["encoder_blocks_1"]["moe"]["w2"]  # (E, f, d)
    assert w2.sharding.spec[0] == EXPERT_AXIS
    assert w2.sharding.spec[1] == "model"


def test_sp_ep_composed_cli_matches_ep1(data_root, ep1_base, tmp_path):
    """sp × ep compose: ring attention (shard_map over 'seq') around the
    expert-sharded MoE FFN; numerics must equal the unsharded run (the
    10-token sequences divide sp=2)."""
    tree = _run_moe_cli(
        data_root, str(tmp_path / "sp_ep"),
        extra=("parallel.sp=2", "parallel.ep=2"),
    )
    ref_leaves = jax.tree_util.tree_leaves(ep1_base["params"])
    leaves = jax.tree_util.tree_leaves(tree["params"])
    assert len(ref_leaves) == len(leaves)
    for a, b in zip(ref_leaves, leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4
        )


def test_ep_mesh_and_param_sharding(data_root, tmp_path):
    """shard_params under an ('data','expert') mesh puts expert weights on
    the expert axis and leaves dense/router weights replicated."""
    from vit_ssl_tpu.parallel.sharding_rules import shard_params

    cfg = compose(
        "configs", "supervised",
        ["model.num_classes=3", "model.moe_experts=2", "parallel.ep=2",
         "data.data_dir=/tmp", "data.data_csv=/tmp/x"],
    )
    mesh = mesh_from_config(cfg)
    assert dict(mesh.shape) == {"data": 4, "expert": 2}

    model = _tiny_moe_vit()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3))
    )["params"]
    placed = shard_params(params, mesh)
    moe_leaf = placed["encoder_blocks_1"]["moe"]["w1"]
    spec = moe_leaf.sharding.spec
    assert spec[0] == EXPERT_AXIS
    router = placed["encoder_blocks_1"]["moe"]["router"]
    assert router.sharding.is_fully_replicated
    dense = placed["encoder_blocks_0"]["feed_forward"]["w1"]
    assert dense.sharding.is_fully_replicated


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


def _cfg(*overrides):
    base = [
        "model.num_classes=3", "data.data_dir=/tmp", "data.data_csv=/tmp/x",
    ]
    return compose("configs", "supervised", base + list(overrides))


def test_ep_without_moe_rejected():
    with pytest.raises(ConfigValidationError, match="moe_experts"):
        validate_train_config(_cfg("parallel.ep=2"))


def test_moe_with_pp_rejected():
    with pytest.raises(ConfigValidationError, match="pp"):
        validate_train_config(_cfg("model.moe_experts=4", "parallel.pp=2"))


def test_moe_fsdp_with_ep_rejected():
    with pytest.raises(ConfigValidationError, match="fsdp"):
        validate_train_config(
            _cfg("model.moe_experts=4", "parallel.ep=2", "parallel.fsdp=true")
        )


def test_moe_top_k_validated():
    with pytest.raises(ConfigValidationError, match="moe_top_k"):
        validate_train_config(_cfg("model.moe_experts=2", "model.moe_top_k=3"))


def test_ep_must_divide_experts():
    with pytest.raises(ConfigValidationError, match="divide"):
        validate_train_config(_cfg("model.moe_experts=3", "parallel.ep=2"))


def test_moe_rejected_for_ssl_modes():
    cfg = compose(
        "configs", "dino",
        ["model.moe_experts=4", "data.data_dir=/tmp", "data.data_csv=/tmp/x"],
    )
    with pytest.raises(ConfigValidationError, match="supervised/finetune"):
        validate_train_config(cfg)
