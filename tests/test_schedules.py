"""LR schedule parity against the reference's actual torch machinery:
LinearWarmupScheduler semantics + CosineAnnealingLR's recursive update
(`/root/reference/utils/schedulers.py`, `base_trainer.py:79-82`).
The torch oracle is rebuilt here with torch.optim to validate the closed
form our pure-function schedule uses.
"""

import numpy as np
import pytest

from vit_ssl_tpu.train.schedules import reference_lr_schedule

torch = pytest.importorskip("torch")


def _torch_lr_trace(start_lr, target_lr, eta_min, warmup_epochs, num_epochs, steps_per_epoch):
    """Replays the reference's scheduler stepping protocol and records the
    lr used by each optimizer step."""
    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([param], lr=start_lr)
    main = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=num_epochs - warmup_epochs, eta_min=eta_min
    )
    warmup_steps = max(1, warmup_epochs * steps_per_epoch)

    lrs = []
    step_count = 0
    for epoch in range(1, num_epochs + 1):
        for _ in range(steps_per_epoch):
            lrs.append(opt.param_groups[0]["lr"])  # lr used by this step
            # reference warmup: step() after optimizer.step(), only during
            # warmup epochs (`supervised_trainer.py:42-43`)
            if epoch <= warmup_epochs:
                step_count += 1
                if step_count <= warmup_steps:
                    scale = step_count / warmup_steps
                    opt.param_groups[0]["lr"] = start_lr + scale * (target_lr - start_lr)
        if epoch > warmup_epochs:
            main.step()  # per-epoch after warmup (`base_trainer.py:79-82`)
    return np.asarray(lrs)


@pytest.mark.parametrize(
    "warmup_epochs,num_epochs,steps_per_epoch",
    [(2, 8, 5), (1, 4, 3), (3, 10, 2)],
)
def test_schedule_matches_torch_reference(warmup_epochs, num_epochs, steps_per_epoch):
    start_lr, target_lr, eta_min = 1e-6, 1e-4, 1e-6
    oracle = _torch_lr_trace(
        start_lr, target_lr, eta_min, warmup_epochs, num_epochs, steps_per_epoch
    )
    schedule = reference_lr_schedule(
        start_lr=start_lr,
        target_lr=target_lr,
        eta_min=eta_min,
        warmup_epochs=warmup_epochs,
        num_epochs=num_epochs,
        steps_per_epoch=steps_per_epoch,
    )
    ours = np.asarray([float(schedule(i)) for i in range(len(oracle))])
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_step_granularity_monotone_decay_after_warmup():
    schedule = reference_lr_schedule(
        start_lr=1e-6, target_lr=1e-4, eta_min=1e-6,
        warmup_epochs=1, num_epochs=5, steps_per_epoch=10, granularity="step",
    )
    lrs = [float(schedule(i)) for i in range(50)]
    assert lrs[9] <= 1e-4 + 1e-12
    post = lrs[10:]
    assert all(a >= b - 1e-12 for a, b in zip(post, post[1:]))
    assert post[-1] >= 1e-6 - 1e-12
