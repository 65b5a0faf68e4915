"""Numerical parity vs torch: load identical weights into the reference-style
torch backbone and our JAX backbone and compare outputs.

This pins conv/BN semantics (padding, strides, eps, channel order) exactly —
the strongest form of the reference's __main__ shape-smoke contract
(backbone/r3d.py:159-170). The torch model here is built from
torchvision-free primitives following the architecture spec, NOT imported
from the reference repo.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dualvar_tpu.models.backbones import select_backbone  # noqa: E402


class TorchR3DBlock(nn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        stride = 2 if downsample else 1
        self.conv1 = nn.Conv3d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm3d(cout)
        self.conv2 = nn.Conv3d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm3d(cout)
        self.downsample = downsample
        if downsample:
            self.dconv = nn.Conv3d(cin, cout, 1, stride=2, bias=False)
            self.dbn = nn.BatchNorm3d(cout)

    def forward(self, x):
        r = torch.relu(self.bn1(self.conv1(x)))
        r = self.bn2(self.conv2(r))
        if self.downsample:
            x = self.dbn(self.dconv(x))
        return torch.relu(x + r)


class TorchR3D(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv3d(3, 64, (3, 7, 7), stride=(1, 2, 2),
                               padding=(1, 3, 3), bias=False)
        self.bn1 = nn.BatchNorm3d(64)
        self.blocks = nn.ModuleList([
            TorchR3DBlock(64, 64, False),
            TorchR3DBlock(64, 128, True),
            TorchR3DBlock(128, 256, True),
            TorchR3DBlock(256, 512, True),
        ])

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        for b in self.blocks:
            x = b(x)
        return x


def t2j_conv(w):
    # torch (O, I, kt, kh, kw) -> jax (kt, kh, kw, I, O)
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 4, 1, 0))


def copy_bn(tbn, jparams, jstats):
    jparams["scale"] = jnp.asarray(tbn.weight.detach().numpy())
    jparams["bias"] = jnp.asarray(tbn.bias.detach().numpy())
    jstats["mean"] = jnp.asarray(tbn.running_mean.detach().numpy())
    jstats["var"] = jnp.asarray(tbn.running_var.detach().numpy())


def test_r3d_matches_torch_eval_mode():
    torch.manual_seed(0)
    tm = TorchR3D().eval()
    # randomize BN running stats so the eval path is non-trivial
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    model, _ = select_backbone("r3d")
    x_np = np.random.RandomState(0).rand(2, 3, 8, 64, 64).astype(np.float32)
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))  # -> (B, T, H, W, C)
    variables = model.init(jax.random.PRNGKey(0), xj, train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    params["conv1"]["kernel"] = t2j_conv(tm.conv1.weight)
    copy_bn(tm.bn1, params["bn1"]["bn"], stats["bn1"]["bn"])
    for li, block in enumerate(tm.blocks):
        name = f"layer{li + 1}_block0"
        params[name]["conv1"]["kernel"] = t2j_conv(block.conv1.weight)
        params[name]["conv2"]["kernel"] = t2j_conv(block.conv2.weight)
        copy_bn(block.bn1, params[name]["bn1"]["bn"], stats[name]["bn1"]["bn"])
        copy_bn(block.bn2, params[name]["bn2"]["bn"], stats[name]["bn2"]["bn"])
        if block.downsample:
            params[name]["downsample_conv"]["kernel"] = t2j_conv(block.dconv.weight)
            copy_bn(block.dbn, params[name]["downsample_bn"]["bn"],
                    stats[name]["downsample_bn"]["bn"])

    with torch.no_grad():
        yt = tm(torch.from_numpy(x_np)).numpy()  # (B, C, T, H, W)
    yj = model.apply({"params": params, "batch_stats": stats}, xj, train=False)
    yj = np.asarray(yj).transpose(0, 4, 1, 2, 3)

    assert yt.shape == yj.shape
    # atol: f32 accumulation through 8 convs+BNs drifts up to ~7e-4 between
    # XLA:CPU and torch (exact magnitude varies with each library's conv
    # reassociation; observed 6.8e-4 on this container's current wheels)
    np.testing.assert_allclose(yj, yt, atol=1.5e-3, rtol=1e-3)


def test_r3d_train_mode_batch_stats_match_torch():
    """Train-mode BN: batch moments + running-stat update semantics."""
    torch.manual_seed(1)
    tbn = nn.BatchNorm3d(4)  # momentum 0.1, eps 1e-5
    x_np = np.random.RandomState(1).rand(2, 4, 3, 5, 5).astype(np.float32)
    y_t = tbn(torch.from_numpy(x_np)).detach().numpy()

    from dualvar_tpu.models.layers import BatchNorm

    bn = BatchNorm()
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))
    variables = bn.init(jax.random.PRNGKey(0), xj, False)
    yj, updated = bn.apply(variables, xj, False, mutable=["batch_stats"])
    yj = np.asarray(yj).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(yj, y_t, atol=1e-5, rtol=1e-4)
    # running stats after one step: torch ra = 0.9*init + 0.1*batch (unbiased var)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["bn"]["mean"]),
        tbn.running_mean.detach().numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["bn"]["var"]),
        tbn.running_var.detach().numpy(), atol=1e-4, rtol=1e-3)


class TorchC3D(nn.Module):
    """C3D spec: 5 conv stages w/ BN + pools (reference backbone/c3d.py)."""

    def __init__(self):
        super().__init__()
        chans = [(3, 64), (64, 128), (128, 256), (256, 256), (256, 512),
                 (512, 512), (512, 512), (512, 512)]
        self.convs = nn.ModuleList(
            [nn.Conv3d(i, o, 3, padding=1) for i, o in chans])
        self.bns = nn.ModuleList([nn.BatchNorm3d(o) for _, o in chans])

    def forward(self, x):
        pools = {0: (1, 2, 2), 1: 2, 3: 2, 5: 2}
        for i, (c, b) in enumerate(zip(self.convs, self.bns)):
            x = torch.relu(b(c(x)))
            if i in pools:
                x = torch.nn.functional.max_pool3d(x, pools[i])
        return x


def test_c3d_matches_torch_eval_mode():
    torch.manual_seed(2)
    tm = TorchC3D().eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    model, _ = select_backbone("c3d")
    x_np = np.random.RandomState(2).rand(1, 3, 8, 32, 32).astype(np.float32)
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))
    variables = model.init(jax.random.PRNGKey(0), xj, train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    names = ["1", "2", "3a", "3b", "4a", "4b", "5a", "5b"]
    for name, conv, bn in zip(names, tm.convs, tm.bns):
        params[f"conv{name}"]["kernel"] = t2j_conv(conv.weight)
        params[f"conv{name}"]["bias"] = jnp.asarray(conv.bias.detach().numpy())
        copy_bn(bn, params[f"bn{name}"]["bn"], stats[f"bn{name}"]["bn"])

    with torch.no_grad():
        yt = tm(torch.from_numpy(x_np)).numpy()
    yj = model.apply({"params": params, "batch_stats": stats}, xj, train=False)
    yj = np.asarray(yj).transpose(0, 4, 1, 2, 3)
    assert yt.shape == yj.shape
    np.testing.assert_allclose(yj, yt, atol=2e-4, rtol=1e-3)


class TorchSTConv(nn.Module):
    """Factored (2+1)D conv with the paper's intermediate-channel formula
    (reference backbone/r21d.py:11-70)."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        import math as m

        def trip(v):
            return (v, v, v) if isinstance(v, int) else v

        k, s, p = trip(k), trip(stride), trip(padding)
        mid = int(m.floor((k[0] * k[1] * k[2] * cin * cout)
                          / (k[1] * k[2] * cin + k[0] * cout)))
        self.spatial = nn.Conv3d(cin, mid, (1, k[1], k[2]),
                                 stride=(1, s[1], s[2]),
                                 padding=(0, p[1], p[2]), bias=False)
        self.bn = nn.BatchNorm3d(mid)
        self.temporal = nn.Conv3d(mid, cout, (k[0], 1, 1),
                                  stride=(s[0], 1, 1),
                                  padding=(p[0], 0, 0), bias=False)

    def forward(self, x):
        return self.temporal(torch.relu(self.bn(self.spatial(x))))


class TorchR21DBlock(nn.Module):
    def __init__(self, cin, cout, down):
        super().__init__()
        self.down = down
        self.conv1 = TorchSTConv(cin, cout, 3, stride=2 if down else 1,
                                 padding=1)
        self.bn1 = nn.BatchNorm3d(cout)
        self.conv2 = TorchSTConv(cout, cout, 3, padding=1)
        self.bn2 = nn.BatchNorm3d(cout)
        if down:
            self.dconv = TorchSTConv(cin, cout, 1, stride=2)
            self.dbn = nn.BatchNorm3d(cout)

    def forward(self, x):
        r = torch.relu(self.bn1(self.conv1(x)))
        r = self.bn2(self.conv2(r))
        if self.down:
            x = self.dbn(self.dconv(x))
        return torch.relu(x + r)


class TorchR21D(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TorchSTConv(3, 64, (3, 7, 7), stride=(1, 2, 2),
                                 padding=(1, 3, 3))
        self.bn1 = nn.BatchNorm3d(64)
        self.blocks = nn.ModuleList([
            TorchR21DBlock(64, 64, False), TorchR21DBlock(64, 128, True),
            TorchR21DBlock(128, 256, True), TorchR21DBlock(256, 512, True),
        ])

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        for b in self.blocks:
            x = b(x)
        return x


def copy_stconv(t: "TorchSTConv", jp, js):
    jp["spatial_conv"]["kernel"] = t2j_conv(t.spatial.weight)
    jp["temporal_conv"]["kernel"] = t2j_conv(t.temporal.weight)
    copy_bn(t.bn, jp["bn"]["bn"], js["bn"]["bn"])


def test_r21d_matches_torch_eval_mode():
    """Flagship backbone: identical weights -> identical outputs."""
    torch.manual_seed(3)
    tm = TorchR21D().eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    # parameter-count cross-check against the golden first
    n = sum(p.numel() for p in tm.parameters())
    assert n == 14_365_303, n

    model, _ = select_backbone("r21d")
    x_np = np.random.RandomState(3).rand(1, 3, 8, 32, 32).astype(np.float32)
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))
    variables = model.init(jax.random.PRNGKey(0), xj, train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    copy_stconv(tm.conv1, params["conv1"], stats["conv1"])
    copy_bn(tm.bn1, params["bn1"]["bn"], stats["bn1"]["bn"])
    for li, block in enumerate(tm.blocks):
        name = f"layer{li + 1}_block0"
        copy_stconv(block.conv1, params[name]["conv1"], stats[name]["conv1"])
        copy_stconv(block.conv2, params[name]["conv2"], stats[name]["conv2"])
        copy_bn(block.bn1, params[name]["bn1"]["bn"], stats[name]["bn1"]["bn"])
        copy_bn(block.bn2, params[name]["bn2"]["bn"], stats[name]["bn2"]["bn"])
        if block.down:
            copy_stconv(block.dconv, params[name]["downsample_conv"],
                        stats[name]["downsample_conv"])
            copy_bn(block.dbn, params[name]["downsample_bn"]["bn"],
                    stats[name]["downsample_bn"]["bn"])

    with torch.no_grad():
        yt = tm(torch.from_numpy(x_np)).numpy()
    yj = model.apply({"params": params, "batch_stats": stats}, xj, train=False)
    yj = np.asarray(yj).transpose(0, 4, 1, 2, 3)
    assert yt.shape == yj.shape
    np.testing.assert_allclose(yj, yt, atol=5e-4, rtol=1e-3)


class TorchBasicConv(nn.Module):
    def __init__(self, cin, cout, k=1, s=1, p=0):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TorchS3DST(nn.Module):
    """STConv3d (reference backbone/s3dg.py:30-65)."""

    def __init__(self, cin, cout, k, s=1, p=0):
        super().__init__()
        ts = s[0] if isinstance(s, tuple) else s
        ss = s[-1] if isinstance(s, tuple) else s
        self.conv1 = nn.Conv3d(cin, cout, (1, k, k), stride=(1, ss, ss),
                               padding=(0, p, p), bias=False)
        self.conv2 = nn.Conv3d(cout, cout, (k, 1, 1), stride=(ts, 1, 1),
                               padding=(p, 0, 0), bias=False)
        self.bn1 = nn.BatchNorm3d(cout)
        self.bn2 = nn.BatchNorm3d(cout)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        return torch.relu(self.bn2(self.conv2(x)))


class TorchSepInception(nn.Module):
    def __init__(self, cin, planes, gating=False):
        super().__init__()
        b0, b1a, b1b, b2a, b2b, b3b = planes
        self.b0 = TorchBasicConv(cin, b0)
        self.b1_0 = TorchBasicConv(cin, b1a)
        self.b1_1 = TorchS3DST(b1a, b1b, 3, 1, 1)
        self.b2_0 = TorchBasicConv(cin, b2a)
        self.b2_1 = TorchS3DST(b2a, b2b, 3, 1, 1)
        self.b3_1 = TorchBasicConv(cin, b3b)
        self.gating = gating
        if gating:
            self.g0 = nn.Linear(b0, b0)
            self.g1 = nn.Linear(b1b, b1b)
            self.g2 = nn.Linear(b2b, b2b)
            self.g3 = nn.Linear(b3b, b3b)

    @staticmethod
    def gate(fc, x):
        w = torch.sigmoid(fc(x.mean(dim=[2, 3, 4])))
        return w[:, :, None, None, None] * x

    def forward(self, x):
        x0 = self.b0(x)
        x1 = self.b1_1(self.b1_0(x))
        x2 = self.b2_1(self.b2_0(x))
        x3 = self.b3_1(torch.nn.functional.max_pool3d(x, 3, 1, 1))
        if self.gating:
            x0, x1 = self.gate(self.g0, x0), self.gate(self.g1, x1)
            x2, x3 = self.gate(self.g2, x2), self.gate(self.g3, x3)
        return torch.cat([x0, x1, x2, x3], 1)


def copy_basic(t, jp, js):
    jp["conv"]["kernel"] = t2j_conv(t.conv.weight)
    copy_bn(t.bn, jp["bn"]["bn"], js["bn"]["bn"])


def copy_st(t, jp, js):
    jp["conv1"]["kernel"] = t2j_conv(t.conv1.weight)
    jp["conv2"]["kernel"] = t2j_conv(t.conv2.weight)
    copy_bn(t.bn1, jp["bn1"]["bn"], js["bn1"]["bn"])
    copy_bn(t.bn2, jp["bn2"]["bn"], js["bn2"]["bn"])


def test_s3dg_inception_block_matches_torch():
    """One gated SepInception block with identical weights (the S3D-G
    building block, reference s3dg.py:81-132)."""
    from dualvar_tpu.models.backbones.s3dg import SepInception

    torch.manual_seed(4)
    planes = [16, 8, 12, 8, 12, 10]
    tm = TorchSepInception(24, planes, gating=True).eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    jm = SepInception(planes, gating=True)
    x_np = np.random.RandomState(4).rand(2, 24, 4, 8, 8).astype(np.float32)
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))
    variables = jm.init(jax.random.PRNGKey(0), xj, False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    copy_basic(tm.b0, params["branch0"], stats["branch0"])
    copy_basic(tm.b1_0, params["branch1_0"], stats["branch1_0"])
    copy_st(tm.b1_1, params["branch1_1"], stats["branch1_1"])
    copy_basic(tm.b2_0, params["branch2_0"], stats["branch2_0"])
    copy_st(tm.b2_1, params["branch2_1"], stats["branch2_1"])
    copy_basic(tm.b3_1, params["branch3_1"], stats["branch3_1"])
    for gname, fc in (("gating_b0", tm.g0), ("gating_b1", tm.g1),
                      ("gating_b2", tm.g2), ("gating_b3", tm.g3)):
        params[gname]["fc"]["kernel"] = jnp.asarray(
            fc.weight.detach().numpy().T)
        params[gname]["fc"]["bias"] = jnp.asarray(fc.bias.detach().numpy())

    with torch.no_grad():
        yt = tm(torch.from_numpy(x_np)).numpy()
    yj = jm.apply({"params": params, "batch_stats": stats}, xj, False)
    yj = np.asarray(yj).transpose(0, 4, 1, 2, 3)
    assert yt.shape == yj.shape
    np.testing.assert_allclose(yj, yt, atol=2e-4, rtol=1e-3)


class TorchS3DFull(nn.Module):
    """Full S3D(-G) spec (reference backbone/s3dg.py:135-218, non-slow)."""

    PLANES = {
        "Mixed_3b": (192, [64, 96, 128, 16, 32, 32]),
        "Mixed_3c": (256, [128, 128, 192, 32, 96, 64]),
        "Mixed_4b": (480, [192, 96, 208, 16, 48, 64]),
        "Mixed_4c": (512, [160, 112, 224, 24, 64, 64]),
        "Mixed_4d": (512, [128, 128, 256, 24, 64, 64]),
        "Mixed_4e": (512, [112, 144, 288, 32, 64, 64]),
        "Mixed_4f": (528, [256, 160, 320, 32, 128, 128]),
        "Mixed_5b": (832, [256, 160, 320, 32, 128, 128]),
        "Mixed_5c": (832, [384, 192, 384, 48, 128, 128]),
    }

    def __init__(self, gating=True):
        super().__init__()
        self.conv_1a = TorchS3DST(3, 64, 7, 2, 3)
        self.conv_2b = TorchBasicConv(64, 64, 1)
        self.conv_2c = TorchS3DST(64, 192, 3, 1, 1)
        self.mixed = nn.ModuleDict({
            name: TorchSepInception(cin, planes, gating=gating)
            for name, (cin, planes) in self.PLANES.items()
        })

    def forward(self, x):
        mp = torch.nn.functional.max_pool3d
        x = self.conv_1a(x)
        x = mp(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = self.conv_2c(self.conv_2b(x))
        x = mp(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = self.mixed["Mixed_3c"](self.mixed["Mixed_3b"](x))
        x = mp(x, 3, 2, 1)
        for n in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = self.mixed[n](x)
        x = mp(x, 2, 2, 0)
        return self.mixed["Mixed_5c"](self.mixed["Mixed_5b"](x))


def copy_inception(t: "TorchSepInception", jp, js, gating=True):
    copy_basic(t.b0, jp["branch0"], js["branch0"])
    copy_basic(t.b1_0, jp["branch1_0"], js["branch1_0"])
    copy_st(t.b1_1, jp["branch1_1"], js["branch1_1"])
    copy_basic(t.b2_0, jp["branch2_0"], js["branch2_0"])
    copy_st(t.b2_1, jp["branch2_1"], js["branch2_1"])
    copy_basic(t.b3_1, jp["branch3_1"], js["branch3_1"])
    if gating:
        for gname, fc in (("gating_b0", t.g0), ("gating_b1", t.g1),
                          ("gating_b2", t.g2), ("gating_b3", t.g3)):
            jp[gname]["fc"]["kernel"] = jnp.asarray(fc.weight.detach().numpy().T)
            jp[gname]["fc"]["bias"] = jnp.asarray(fc.bias.detach().numpy())


def test_s3dg_full_net_matches_torch():
    """Full S3D-G with transplanted weights (reference s3dg.py:135-218)."""
    torch.manual_seed(5)
    tm = TorchS3DFull(gating=True).eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    model, param = select_backbone("s3dg")
    assert param["feature_size"] == 1024
    x_np = np.random.RandomState(5).rand(1, 3, 8, 64, 64).astype(np.float32)
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))
    variables = model.init(jax.random.PRNGKey(0), xj, train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    copy_st(tm.conv_1a, params["Conv_1a"], stats["Conv_1a"])
    copy_basic(tm.conv_2b, params["Conv_2b"], stats["Conv_2b"])
    copy_st(tm.conv_2c, params["Conv_2c"], stats["Conv_2c"])
    for name in TorchS3DFull.PLANES:
        copy_inception(tm.mixed[name], params[name], stats[name])

    with torch.no_grad():
        yt = tm(torch.from_numpy(x_np)).numpy()
    yj = model.apply({"params": params, "batch_stats": stats}, xj, train=False)
    yj = np.asarray(yj).transpose(0, 4, 1, 2, 3)
    assert yt.shape == yj.shape
    np.testing.assert_allclose(yj, yt, atol=5e-4, rtol=1e-3)


class TorchR2D3DBlock(nn.Module):
    """BasicBlock2d (reference resnet_2d3d.py:45-80): (1,3,3) convs,
    spatial-only strides."""

    def __init__(self, cin, cout, stride, final_relu=True):
        super().__init__()
        self.conv1 = nn.Conv3d(cin, cout, (1, 3, 3), stride=(1, stride, stride),
                               padding=(0, 1, 1), bias=False)
        self.bn1 = nn.BatchNorm3d(cout)
        self.conv2 = nn.Conv3d(cout, cout, (1, 3, 3), padding=(0, 1, 1),
                               bias=False)
        self.bn2 = nn.BatchNorm3d(cout)
        self.final_relu = final_relu
        self.has_ds = stride != 1 or cin != cout
        if self.has_ds:
            self.dconv = nn.Conv3d(cin, cout, 1, stride=(1, stride, stride),
                                   bias=False)
            self.dbn = nn.BatchNorm3d(cout)

    def forward(self, x):
        r = torch.relu(self.bn1(self.conv1(x)))
        r = self.bn2(self.conv2(r))
        if self.has_ds:
            x = self.dbn(self.dconv(x))
        out = x + r
        return torch.relu(out) if self.final_relu else out


class TorchR2D3D18(nn.Module):
    """ResNet2d3d_full([BasicBlock2d]*4, [2,2,2,2]) (reference :203-269,352)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv3d(3, 64, (1, 7, 7), stride=(1, 2, 2),
                               padding=(0, 3, 3), bias=False)
        self.bn1 = nn.BatchNorm3d(64)
        blocks = []
        inp = 64
        for li, (planes, stride) in enumerate(
                [(64, 1), (128, 2), (256, 2), (256, 2)]):
            for bi in range(2):
                final_relu = not (li == 3 and bi == 1)
                blocks.append(TorchR2D3DBlock(
                    inp, planes, stride if bi == 0 else 1, final_relu))
                inp = planes
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.nn.functional.max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        for b in self.blocks:
            x = b(x)
        return x


def test_r2d3d18_matches_torch_eval_mode():
    torch.manual_seed(6)
    tm = TorchR2D3D18().eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    model, param = select_backbone("r2d3d18")
    assert param["feature_size"] == 256
    x_np = np.random.RandomState(6).rand(1, 3, 4, 64, 64).astype(np.float32)
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))
    variables = model.init(jax.random.PRNGKey(0), xj, train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    params["conv1"]["kernel"] = t2j_conv(tm.conv1.weight)
    copy_bn(tm.bn1, params["bn1"]["bn"], stats["bn1"]["bn"])
    for i, block in enumerate(tm.blocks):
        name = f"layer{i // 2 + 1}_block{i % 2}"
        params[name]["conv1"]["kernel"] = t2j_conv(block.conv1.weight)
        params[name]["conv2"]["kernel"] = t2j_conv(block.conv2.weight)
        copy_bn(block.bn1, params[name]["bn1"]["bn"], stats[name]["bn1"]["bn"])
        copy_bn(block.bn2, params[name]["bn2"]["bn"], stats[name]["bn2"]["bn"])
        if block.has_ds:
            params[name]["downsample_conv"]["kernel"] = t2j_conv(block.dconv.weight)
            copy_bn(block.dbn, params[name]["downsample_bn"]["bn"],
                    stats[name]["downsample_bn"]["bn"])

    with torch.no_grad():
        yt = tm(torch.from_numpy(x_np)).numpy()
    yj = model.apply({"params": params, "batch_stats": stats}, xj, train=False)
    yj = np.asarray(yj).transpose(0, 4, 1, 2, 3)
    assert yt.shape == yj.shape
    np.testing.assert_allclose(yj, yt, atol=2e-4, rtol=1e-3)


def test_param_count_goldens():
    """Param-count goldens for every backbone registry entry (the reference's
    __main__ smoke contract, e.g. backbone/r21d.py:269-280)."""
    # values cross-checked against equal-spec torch models (this file)
    goldens = {
        "r3d": 14_361_792, "r21d": 14_365_303, "c3d": 27_661_440,
        "s3d": 7_910_048, "s3dg": 9_098_000, "r2d3d18": 5_210_176,
        "r50": 17_401_920,
    }
    for name, expected in goldens.items():
        model, _ = select_backbone(name)
        xj = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda m=model, x=xj: m.init(jax.random.PRNGKey(0), x, train=False))
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(variables["params"]))
        assert n == expected, (name, n, expected)
