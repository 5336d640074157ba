"""PoseNet parity: flax implementation + torch converter vs a live torch oracle.

The oracle below replicates the reference PoseResNet
(sunflower/models/posenet.py:5-34) including torchvision's resnet18 topology
and state_dict naming, so `posenet_variables_from_torch` is validated against
the exact checkpoint format the reference saves (train_posenet.py:186).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from flope_tpu.models import (
    PoseNet,
    init_posenet,
    posenet_variables_from_torch,
    posenet_state_dict_to_torch,
)


# ------------- torch oracle: torchvision-compatible resnet18 ----------------

class TorchBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        if stride != 1 or inplanes != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(tnn.Module):
    """Structural twin of torchvision.models.resnet18 (same state_dict keys)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TorchBasicBlock(256, 512, 2), TorchBasicBlock(512, 512))
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Sequential(tnn.Linear(512, 2048), tnn.ReLU())

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


class TorchPoseResNet(tnn.Module):
    """Reference PoseResNet twin (sunflower/models/posenet.py:5-34)."""

    def __init__(self):
        super().__init__()
        self.base = TorchResNet18()
        self.fc_rot = tnn.Linear(2048, 9)

    def forward(self, x):
        f = torch.nn.functional.relu(self.base(x))  # double ReLU like reference
        return self.fc_rot(f)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchPoseResNet()
    # Randomize BN running stats so parity actually exercises them.
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


class TestTorchParity:
    def test_forward_matches_torch(self, torch_model, rng):
        x = rng.uniform(0, 1, size=(4, 96, 96, 3)).astype(np.float32)
        with torch.no_grad():
            want = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        variables = posenet_variables_from_torch(torch_model.state_dict())
        model = PoseNet()
        got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    def test_roundtrip_export(self, torch_model):
        variables = posenet_variables_from_torch(torch_model.state_dict())
        back = posenet_state_dict_to_torch(variables)
        sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()
              if "num_batches_tracked" not in k}
        assert set(back) == set(sd)
        for k in sd:
            np.testing.assert_allclose(back[k], sd[k], rtol=1e-6)


class TestPoseNetModel:
    def test_init_and_shapes(self):
        model, variables = init_posenet(jax.random.key(0), image_size=64)
        out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
        assert out.shape == (2, 9)

    def test_s2d_stem_exact_and_checkpoint_compatible(self, rng):
        """The space-to-depth stem is an exact reparametrization of the same
        conv1 kernel: identical outputs (f32 reassociation only) and an
        identical parameter tree, so checkpoints interchange between the
        two stem implementations."""
        model, variables = init_posenet(jax.random.key(0), image_size=64)
        x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
        a = PoseNet().apply(variables, x, train=False)
        b = PoseNet(s2d_stem=True).apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        v2 = PoseNet(s2d_stem=True).init(jax.random.key(1), x, train=False)
        ta = jax.tree.structure(variables)
        tb = jax.tree.structure(v2)
        assert ta == tb

    def test_nchw_input_layout_exact_and_checkpoint_compatible(self, rng):
        """input_layout='NCHW' consumes planar crops (the Pallas kernel's
        native layout) through the same conv1 kernel param: identical
        outputs and an identical parameter tree as the NHWC model."""
        model, variables = init_posenet(jax.random.key(0), image_size=64)
        x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
        a = PoseNet().apply(variables, x, train=False)
        b = PoseNet(input_layout="NCHW").apply(
            variables, x.transpose(0, 3, 1, 2), train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        v2 = PoseNet(input_layout="NCHW").init(
            jax.random.key(1), x.transpose(0, 3, 1, 2), train=False)
        assert jax.tree.structure(variables) == jax.tree.structure(v2)

    def test_to_rotmats_valid(self, rng):
        r9 = jnp.asarray(rng.normal(size=(5, 9)).astype(np.float32))
        R = PoseNet.to_rotmats(r9)
        eye = np.broadcast_to(np.eye(3), (5, 3, 3))
        np.testing.assert_allclose(np.asarray(R @ R.transpose(0, 2, 1)), eye, atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_to_rotmats_yaw_nullified(self, rng):
        from scipy.spatial.transform import Rotation as sciR
        r9 = jnp.asarray(rng.normal(size=(5, 9)).astype(np.float32))
        R = np.asarray(PoseNet.to_rotmats(r9, yaw_nullify=True))
        e = sciR.from_matrix(R).as_euler("zyx", degrees=True)
        np.testing.assert_allclose(e[:, 0], 0.0, atol=1e-3)

    def test_dropout_train_vs_eval(self):
        model, variables = init_posenet(jax.random.key(0), image_size=64)
        x = jnp.ones((2, 64, 64, 3))
        out1 = model.apply(variables, x, train=False)
        out2 = model.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        # train mode needs dropout rng and differs across seeds
        t1 = model.apply(variables, x, train=True,
                         rngs={"dropout": jax.random.key(1)},
                         mutable=["batch_stats"])[0]
        t2 = model.apply(variables, x, train=True,
                         rngs={"dropout": jax.random.key(2)},
                         mutable=["batch_stats"])[0]
        assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 0

    def test_zero_input_finite(self):
        """Padded lanes feed black crops; outputs must stay finite."""
        model, variables = init_posenet(jax.random.key(0), image_size=64)
        out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
        assert bool(jnp.isfinite(out).all())
        R = PoseNet.to_rotmats(out)
        assert bool(jnp.isfinite(R).all())
