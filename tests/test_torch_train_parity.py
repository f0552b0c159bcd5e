"""Training-dynamics parity vs the torch oracle (the accuracy north star's
strongest controlled evidence): N SGD steps on identical init + data through

  * torch: TorchResNet18TSM + Linear head + CE, torch.optim.SGD with param
    groups mirroring the reference CILTSMOptimizerConstructorImprovised
    policy (libs/models/cil_heads/tsm.py:189-303 — conv weights lr/wd,
    BN lr/no-wd, classifier weight s*lr/wd, classifier bias 2s*lr/no-wd)
  * ours: the real jitted CIL train step (labeled fused SGD, optim.py)

with the torch weights converted by models/pretrained.load_torch_resnet_backbone.
Per-step train losses and final parameters must track within float32
cross-framework tolerance. This pins BN train-mode statistics/updates, the
TSM shift, the head/consensus path, CE, and the 6-group SGD policy as ONE
system, not per-op.
"""

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow  # full-model compile + coupled train steps

import jax
import jax.numpy as jnp

from bdvcil_tpu.models import build_model, init_model_params
from bdvcil_tpu.models.pretrained import load_torch_resnet_backbone
from bdvcil_tpu.optim import build_optimizer
from bdvcil_tpu.runtime import TrainState, make_train_step
from tests.torch_oracle import TorchResNet18TSM

T = 2
HW = 32
NUM_CLASSES = 4
BATCH = 6
STEPS = 4  # beyond ~4 steps the noisy-data trajectory is chaotic:
# per-step float noise (~1e-6) amplifies ~100-300x/step through ReLU flips,
# so longer horizons measure chaos, not framework disagreement
LR = 0.004  # stable regime: divergent runs amplify float noise chaotically
MOMENTUM = 0.9
WD = 1e-4
FC_SCALE = 5.0


class _TorchTrainModel(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet18TSM(num_segments=T)
        self.fc = torch.nn.Linear(512, NUM_CLASSES)

    def forward(self, x):  # x: (N*T, 3, H, W)
        feats = self.backbone(x)["layer4"]
        pooled = feats.mean(dim=(2, 3))  # (N*T, C) = TSMHead avg_pool
        scores = self.fc(pooled)
        return scores.view(-1, T, NUM_CLASSES).mean(dim=1)  # AvgConsensus


def _torch_param_groups(model):
    """The reference constructor's group policy for this model shape."""
    conv_w, bn_params = [], []
    for name, p in model.backbone.named_parameters():
        if p.ndim == 4:
            conv_w.append(p)  # first conv + normal conv weights: lr, wd
        else:
            bn_params.append(p)  # BN scale/bias: lr, no wd
    return [
        {"params": conv_w, "lr": LR, "weight_decay": WD},
        {"params": bn_params, "lr": LR, "weight_decay": 0.0},
        {"params": [model.fc.weight], "lr": LR * FC_SCALE, "weight_decay": WD},
        {"params": [model.fc.bias], "lr": LR * 2 * FC_SCALE, "weight_decay": 0.0},
    ]


def test_coupled_sgd_steps_match_torch():
    torch.manual_seed(0)
    tm = _TorchTrainModel()
    tm.train()

    # snapshot the INIT weights for our side before torch trains
    init_backbone_sd = {
        ("backbone." + k): v.clone() for k, v in tm.backbone.state_dict().items()
    }
    init_fc_w = tm.fc.weight.detach().numpy().copy()
    init_fc_b = tm.fc.bias.detach().numpy().copy()

    rng = np.random.default_rng(42)
    batches = rng.normal(size=(STEPS, BATCH, T, HW, HW, 3)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, size=(STEPS, BATCH))

    # ---- torch run -----------------------------------------------------
    opt = torch.optim.SGD(_torch_param_groups(tm), momentum=MOMENTUM)
    torch_losses = []
    for s in range(STEPS):
        x = torch.from_numpy(
            batches[s].transpose(0, 1, 4, 2, 3).reshape(BATCH * T, 3, HW, HW)
        )
        y = torch.from_numpy(labels[s])
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(tm(x), y)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- our run (converted init weights, real train step) --------------
    cfg = dict(
        type="CILRecognizer2D",
        backbone=dict(type="ResNetTSM", depth=18, num_segments=T, shift_div=8),
        cls_head=dict(
            type="IncrementalTSMHead",
            num_classes=NUM_CLASSES,
            in_channels=512,
            inc_head_config=dict(type="SimpleLinear", out_features=NUM_CLASSES),
            num_segments=T,
            loss_cls=dict(type="CrossEntropyLoss"),
            dropout_ratio=0.0,  # avoid cross-framework RNG
        ),
        test_cfg=dict(average_clips="prob"),
    )
    spec = build_model(cfg)
    init_model_params(spec, jax.random.PRNGKey(0), (1, T, HW, HW, 3))  # shape check
    bk_params, bk_stats = load_torch_resnet_backbone(init_backbone_sd)
    variables = {
        "params": {
            "backbone": bk_params,
            "head": {
                "fc_weight": jnp.asarray(init_fc_w),
                "fc_bias": jnp.asarray(init_fc_b),
            },
        },
        "batch_stats": {"backbone": bk_stats},
    }

    tx = build_optimizer(
        variables["params"],
        dict(
            type="SGD",
            constructor="CILTSMOptimizerConstructorImprovised",
            paramwise_cfg=dict(fc_lr_scale_factor=FC_SCALE),
            lr=LR,
            momentum=MOMENTUM,
            weight_decay=WD,
        ),
    )
    state = TrainState.create(variables, tx)
    step = make_train_step(spec, tx, num_classes=NUM_CLASSES, method="base", task_idx=0)

    our_losses = []
    key = jax.random.PRNGKey(1)  # dropout_ratio=0 -> unused
    for s in range(STEPS):
        state, metrics = step(
            state, None, jnp.asarray(batches[s]), jnp.asarray(labels[s][:, None]), {}, key
        )
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-3, atol=2e-4)

    # final parameters track too (spot-check classifier + a deep conv)
    np.testing.assert_allclose(
        np.asarray(state.params["head"]["fc_weight"]),
        tm.fc.weight.detach().numpy(),
        rtol=2e-3, atol=2e-4,
    )
    torch_k = tm.backbone.layer4[0].conv1.weight.detach().numpy()  # (O,I,H,W)
    ours_k = np.transpose(
        np.asarray(state.params["backbone"]["layer4_0"]["conv1"]["kernel"]), (3, 2, 0, 1)
    )
    np.testing.assert_allclose(ours_k, torch_k, rtol=2e-3, atol=2e-4)

    # train-mode BN running mean tracks as well (running var is excluded:
    # torch updates it with the unbiased batch variance, flax with the
    # biased one — an eval-time-only n/(n-1) difference)
    ours_mean = np.asarray(state.batch_stats["backbone"]["bn1"]["mean"])
    torch_mean = tm.backbone.bn1.running_mean.detach().numpy()
    np.testing.assert_allclose(ours_mean, torch_mean, rtol=5e-3, atol=5e-4)
