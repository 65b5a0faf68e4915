"""Reference-checkpoint import (core/convert.py).

Each test takes a clean-room torch model (from test_torch_parity), renames
its state_dict keys to the REFERENCE's key grammar (the .pth.tar format a
reference user arrives with — attribute names per backbone/*.py), runs the
converter, and asserts exact tree structure (strict merge both directions)
plus forward parity between the torch model and ours under the converted
weights.
"""

import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import torch

from test_torch_parity import (
    TorchC3D,
    TorchR2D3D18,
    TorchR3D,
    TorchR21D,
    TorchS3DFull,
)

from dualvar_tpu.core.checkpoint import CheckpointStore, merge_matching_leaves
from dualvar_tpu.core.convert import (
    backbone_from_torch,
    classifier_from_torch,
    extract_backbone_state,
)
from dualvar_tpu.models.backbones import select_backbone


def _randomize_bn(tm):
    for m in tm.modules():
        if isinstance(m, (torch.nn.BatchNorm3d, torch.nn.BatchNorm1d)):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)


def _np_sd(tm):
    return {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}


def _rename(sd, renames):
    out = {}
    for k, v in sd.items():
        for pat, repl in renames:
            k = re.sub(pat, repl, k)
        out[k] = v
    return out


def _strict_template_merge(model, xj, params, stats):
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), xj, train=False))
    tmpl_p = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                          variables["params"])
    tmpl_s = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                          variables["batch_stats"])
    params, _ = merge_matching_leaves(tmpl_p, params, strict=True)
    stats, _ = merge_matching_leaves(tmpl_s, stats, strict=True)
    return params, stats


def _forward_check(net, tm, ref_sd, x_np, atol=2e-4):
    params, stats = backbone_from_torch(ref_sd, net)
    model, _ = select_backbone(net)
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 4, 1))
    params, stats = _strict_template_merge(model, xj, params, stats)
    with torch.no_grad():
        yt = tm(torch.from_numpy(x_np)).numpy()
    yj = model.apply({"params": params, "batch_stats": stats}, xj,
                     train=False)
    yj = np.asarray(yj).transpose(0, 4, 1, 2, 3)
    assert yt.shape == yj.shape
    np.testing.assert_allclose(yj, yt, atol=atol, rtol=1e-3)


# ---------------------------------------------------------------- reference
# key grammars, synthesized from the clean-room models (rename specs cite
# the reference attribute names they reproduce)

def _r3d_reference_sd(tm):
    # R3DNet: conv{2..5}.block1.*, SpatioTemporalConv wraps the conv as
    # temporal_spatial_conv (reference backbone/r3d.py:33,59-80,139-148)
    return _rename(_np_sd(tm), [
        (r"^blocks\.(\d+)\.",
         lambda m: f"conv{int(m.group(1)) + 2}.block1."),
        (r"\.dconv\.", ".downsampleconv."),
        (r"\.dbn\.", ".downsamplebn."),
        (r"(conv1|conv2|downsampleconv)\.weight$",
         r"\1.temporal_spatial_conv.weight"),
    ])


def _r21d_reference_sd(tm):
    # R2Plus1DNet: spatial_conv/bn/temporal_conv inside each factored conv
    # (reference backbone/r21d.py:54-64,91-111,227-236)
    return _rename(_np_sd(tm), [
        (r"^blocks\.(\d+)\.",
         lambda m: f"conv{int(m.group(1)) + 2}.block1."),
        (r"\.spatial\.", ".spatial_conv."),
        (r"\.temporal\.", ".temporal_conv."),
        (r"\.dconv\.", ".downsampleconv."),
        (r"\.dbn\.", ".downsamplebn."),
    ])


def _c3d_reference_sd(tm):
    # C3D: conv1..conv5b / bn1..bn5b (reference backbone/c3d.py:15-47)
    names = ["1", "2", "3a", "3b", "4a", "4b", "5a", "5b"]
    return _rename(_np_sd(tm), [
        (r"^convs\.(\d+)\.", lambda m: f"conv{names[int(m.group(1))]}."),
        (r"^bns\.(\d+)\.", lambda m: f"bn{names[int(m.group(1))]}."),
    ])


def _s3dg_reference_sd(tm):
    # S3D: Conv_1a/Conv_2b/Conv_2c/Mixed_*; Sequential branches branch{b}.{i};
    # SelfGating holds fc (reference backbone/s3dg.py:71,93-116,143-186)
    return _rename(_np_sd(tm), [
        (r"^conv_1a\.", "Conv_1a."),
        (r"^conv_2b\.", "Conv_2b."),
        (r"^conv_2c\.", "Conv_2c."),
        (r"^mixed\.", ""),
        (r"\.b0\.", ".branch0.0."),
        (r"\.b1_0\.", ".branch1.0."),
        (r"\.b1_1\.", ".branch1.1."),
        (r"\.b2_0\.", ".branch2.0."),
        (r"\.b2_1\.", ".branch2.1."),
        (r"\.b3_1\.", ".branch3.1."),
        (r"\.g0\.", ".gating_b0.fc."),
        (r"\.g1\.", ".gating_b1.fc."),
        (r"\.g2\.", ".gating_b2.fc."),
        (r"\.g3\.", ".gating_b3.fc."),
    ])


def _r2d3d18_reference_sd(tm):
    # ResNet2d3d_full: layer{1..4}.{i}.*, downsample Sequential
    # (reference backbone/resnet_2d3d.py:210-246)
    return _rename(_np_sd(tm), [
        (r"^blocks\.(\d+)\.",
         lambda m: f"layer{int(m.group(1)) // 2 + 1}.{int(m.group(1)) % 2}."),
        (r"\.dconv\.", ".downsample.0."),
        (r"\.dbn\.", ".downsample.1."),
    ])


# -------------------------------------------------------------------- tests

def test_convert_r3d_forward_parity():
    torch.manual_seed(10)
    tm = TorchR3D().eval()
    _randomize_bn(tm)
    x = np.random.RandomState(10).rand(1, 3, 8, 32, 32).astype(np.float32)
    _forward_check("r3d", tm, _r3d_reference_sd(tm), x)


def test_convert_r21d_forward_parity():
    torch.manual_seed(11)
    tm = TorchR21D().eval()
    _randomize_bn(tm)
    x = np.random.RandomState(11).rand(1, 3, 8, 32, 32).astype(np.float32)
    _forward_check("r21d", tm, _r21d_reference_sd(tm), x)


def test_convert_c3d_forward_parity():
    torch.manual_seed(12)
    tm = TorchC3D().eval()
    _randomize_bn(tm)
    x = np.random.RandomState(12).rand(1, 3, 8, 32, 32).astype(np.float32)
    _forward_check("c3d", tm, _c3d_reference_sd(tm), x)


def test_convert_s3dg_forward_parity():
    torch.manual_seed(13)
    tm = TorchS3DFull(gating=True).eval()
    _randomize_bn(tm)
    sd = _s3dg_reference_sd(tm)
    # the reference registers the same modules twice (self.Conv_1a AND
    # self.block1 = Sequential(self.Conv_1a), s3dg.py:143-186); the block*
    # duplicates must be skipped, not double-assigned
    sd["block1.0.conv1.weight"] = sd["Conv_1a.conv1.weight"] * 0 + 99.0
    x = np.random.RandomState(13).rand(1, 3, 8, 64, 64).astype(np.float32)
    _forward_check("s3dg", tm, sd, x, atol=5e-4)


def test_convert_r2d3d18_forward_parity():
    torch.manual_seed(14)
    tm = TorchR2D3D18().eval()
    _randomize_bn(tm)
    x = np.random.RandomState(14).rand(1, 3, 4, 64, 64).astype(np.float32)
    _forward_check("r2d3d18", tm, _r2d3d18_reference_sd(tm), x)


def test_extract_backbone_state_pretrain_prefixes():
    sd = {
        "module.encoder_q.0.conv1.weight": 1,
        "module.encoder_q.0.bn1.weight": 2,
        "module.encoder_q.2.weight": 3,  # projection head — not backbone
        "module.queue": 4,
    }
    bb = extract_backbone_state(sd)
    assert bb == {"conv1.weight": 1, "bn1.weight": 2}


def test_extract_backbone_state_classifier_prefix():
    sd = {"backbone.conv1.weight": 1, "final_fc.1.weight": 2}
    assert extract_backbone_state(sd) == {"conv1.weight": 1}


def test_convert_classifier_logits_parity():
    """Reference-finetuned LinearClassifier ckpt (backbone.* + final_bn +
    final_fc.<i>, model/classifier.py:27-46) -> our LinearClassifier."""
    from dualvar_tpu.models.heads import LinearClassifier

    torch.manual_seed(15)
    tb = TorchR3D().eval()
    _randomize_bn(tb)
    fbn = torch.nn.BatchNorm1d(512).eval()
    fbn.running_mean.normal_(0, 0.05)
    fbn.running_var.uniform_(0.5, 1.5)
    fbn.weight.data.normal_(1, 0.1)
    fbn.bias.data.normal_(0, 0.1)
    fc = torch.nn.Linear(512, 7)

    sd = {"backbone." + k: v for k, v in _r3d_reference_sd(tb).items()}
    sd["final_bn.weight"] = fbn.weight.detach().numpy()
    sd["final_bn.bias"] = fbn.bias.detach().numpy()
    sd["final_bn.running_mean"] = fbn.running_mean.numpy()
    sd["final_bn.running_var"] = fbn.running_var.numpy()
    # use_dropout=True puts the Linear at Sequential index 1
    sd["final_fc.1.weight"] = fc.weight.detach().numpy()
    sd["final_fc.1.bias"] = fc.bias.detach().numpy()

    params, stats = classifier_from_torch(sd, "r3d")

    backbone, info = select_backbone("r3d")
    model = LinearClassifier(backbone=backbone,
                             feature_size=info["feature_size"], num_class=7,
                             use_dropout=True, use_final_bn=True)
    x = np.random.RandomState(15).rand(2, 3, 8, 32, 32).astype(np.float32)
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    params, stats = _strict_template_merge(model, xj, params, stats)

    with torch.no_grad():
        feat = tb(torch.from_numpy(x))
        feat = torch.nn.functional.adaptive_avg_pool3d(feat, 1).flatten(1)
        logit_t = fc(fbn(feat)).numpy()
    logit_j, feat_j = model.apply({"params": params, "batch_stats": stats},
                                  xj, False)
    np.testing.assert_allclose(np.asarray(feat_j), feat.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logit_j), logit_t,
                               atol=2e-4, rtol=1e-3)


def test_convert_cli_roundtrip(tmp_path):
    """End-to-end: a reference-format .pth.tar -> CheckpointStore dir that
    load_pretrained_backbone grafts into a classifier tree."""
    from dualvar_tpu.core import convert
    from dualvar_tpu.core.checkpoint import load_pretrained_backbone
    from dualvar_tpu.models.heads import LinearClassifier

    torch.manual_seed(16)
    tm = TorchR3D().eval()
    _randomize_bn(tm)
    sd = {"module.encoder_q.0." + k: torch.from_numpy(np.array(v))
          for k, v in _r3d_reference_sd(tm).items()}
    sd["module.encoder_q.2.weight"] = torch.zeros(128, 512)  # proj head
    ckpt_path = os.path.join(tmp_path, "latest.pth.tar")
    torch.save({"epoch": 37, "state_dict": sd, "best_acc": 0.0}, ckpt_path)

    out = os.path.join(tmp_path, "converted")
    convert.main(["--ckpt", ckpt_path, "--net", "r3d", "--out", out])

    store = CheckpointStore(out)
    assert store.latest_epoch() == 37
    state = store.restore()
    kernel = np.asarray(state["params"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        kernel, tm.conv1.weight.detach().numpy().transpose(2, 3, 4, 1, 0))
    store.close()

    # graft into a fresh classifier exactly like train/classifier.py does
    backbone, info = select_backbone("r3d")
    model = LinearClassifier(backbone=backbone,
                             feature_size=info["feature_size"], num_class=5)
    xj = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xj, train=False)
    grafted = load_pretrained_backbone(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        {"params": state["params"], "batch_stats": state["batch_stats"]},
    )
    np.testing.assert_allclose(
        np.asarray(grafted["params"]["backbone"]["conv1"]["kernel"]), kernel)


def _r3d_ssl_reference_sd(seed, dim=8, n_series=2, series_dim=4, K=16):
    """Synthesize a full reference MoCo_TimeSeriesV4 state_dict
    (model/moco.py:275-323): encoder_q/k = [backbone, pool, conv1x1, relu,
    conv1x1], series_proj_head_{q,k}, queue/series_queue (dim-major) and
    queue_ptr."""
    torch.manual_seed(seed)
    fs = 512
    parts = {}
    torch_modules = {}
    for enc in ("encoder_q", "encoder_k"):
        bb = TorchR3D().eval()
        _randomize_bn(bb)
        torch_modules[enc] = bb
        for k, v in _r3d_reference_sd(bb).items():
            parts[f"{enc}.0.{k}"] = v
        for idx, (cin, cout) in (("2", (fs, fs)), ("4", (fs, dim))):
            conv = torch.nn.Conv3d(cin, cout, 1, bias=True)
            torch_modules[f"{enc}.{idx}"] = conv
            parts[f"{enc}.{idx}.weight"] = conv.weight.detach().numpy()
            parts[f"{enc}.{idx}.bias"] = conv.bias.detach().numpy()
    for head in ("series_proj_head_q", "series_proj_head_k"):
        for idx, (cin, cout) in (("0", (fs, fs)),
                                 ("2", (fs, series_dim * n_series))):
            conv = torch.nn.Conv3d(cin, cout, 1, bias=True)
            torch_modules[f"{head}.{idx}"] = conv
            parts[f"{head}.{idx}.weight"] = conv.weight.detach().numpy()
            parts[f"{head}.{idx}.bias"] = conv.bias.detach().numpy()
    rs = np.random.RandomState(seed)
    parts["queue"] = rs.rand(dim, K).astype(np.float32)
    parts["series_queue"] = rs.rand(series_dim * n_series, K).astype(np.float32)
    parts["queue_ptr"] = np.array([4], np.int64)
    return parts, torch_modules


def test_convert_ssl_moco_tsv4_state():
    """Full MoCo TimeSeriesV4 import: heads, key encoder, queues, pointer —
    strict tree match against task.init plus numeric head parity."""
    from dualvar_tpu.core.config import ModelConfig
    from dualvar_tpu.core.convert import ssl_from_torch
    from dualvar_tpu.train.tasks import make_task

    sd, tmods = _r3d_ssl_reference_sd(20)
    out = ssl_from_torch(sd, "r3d")

    cfg = ModelConfig(net="r3d", model="moco_timeseriesv4", dtype="float32",
                      moco_dim=8, moco_k=16, n_series=2, series_dim=4)
    task = make_task(cfg)
    example = jnp.zeros((4, task.n_views, 4, 32, 32, 3), jnp.float32)
    t = task.init(jax.random.PRNGKey(0), example)

    def _strict(dst, src):
        merged, _ = merge_matching_leaves(
            jax.tree.map(np.asarray, dst), src, strict=True)
        return merged

    params = _strict(t.params, out["params"])
    _strict(t.batch_stats, out["batch_stats"])
    _strict(t.moco.params_k, out["moco"]["params_k"])
    _strict(t.moco.batch_stats_k, out["moco"]["batch_stats_k"])
    assert out["moco"]["queue"].shape == t.moco.queue.shape
    assert out["moco"]["series_queue"].shape == t.moco.series_queue.shape
    np.testing.assert_allclose(out["moco"]["queue"], sd["queue"].T)
    assert int(out["moco"]["ptr"]) == 4

    # numeric: the 1x1x1-conv head == our MLPHead on pooled features
    from dualvar_tpu.models.heads import MLPHead

    x = np.random.RandomState(20).rand(3, 512).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x)[:, :, None, None, None]
        yt = tmods["encoder_q.4"](
            torch.relu(tmods["encoder_q.2"](xt))).numpy().reshape(3, 8)
    yj = MLPHead(8).apply({"params": params["clip_head"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-5, rtol=1e-5)


def test_pretrain_weights_load_roundtrip(tmp_path):
    """_load_pretrain_weights restores a converted SSL state (and our own
    saved TrainState) into a fresh TrainState: weights/queues load, step and
    optimizer stay at init (reference --pretrain semantics,
    pretrain.py:306-319)."""
    import optax

    from dualvar_tpu.core.config import ModelConfig
    from dualvar_tpu.core.convert import ssl_from_torch
    from dualvar_tpu.train.pretrain import TrainState, _load_pretrain_weights
    from dualvar_tpu.train.tasks import make_task

    sd, _ = _r3d_ssl_reference_sd(21)
    out = ssl_from_torch(sd, "r3d")
    store_dir = os.path.join(tmp_path, "converted")
    store = CheckpointStore(store_dir)
    store.save(0, out)
    store.close()

    cfg = ModelConfig(net="r3d", model="moco_timeseriesv4", dtype="float32",
                      moco_dim=8, moco_k=16, n_series=2, series_dim=4)
    task = make_task(cfg)
    example = jnp.zeros((4, task.n_views, 4, 32, 32, 3), jnp.float32)
    t = task.init(jax.random.PRNGKey(1), example)
    tx = optax.sgd(0.1, momentum=0.9)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=t.params,
                       batch_stats=t.batch_stats, moco=t.moco,
                       opt_state=tx.init(t.params))

    loaded = _load_pretrain_weights(state, store_dir, None)
    np.testing.assert_allclose(
        np.asarray(loaded.params["backbone"]["conv1"]["kernel"]),
        out["params"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(np.asarray(loaded.moco.queue), sd["queue"].T)
    np.testing.assert_allclose(
        np.asarray(loaded.moco.params_k["clip_head"]["fc2"]["kernel"]),
        out["moco"]["params_k"]["clip_head"]["fc2"]["kernel"])
    assert int(loaded.moco.ptr) == 4
    assert int(loaded.step) == 0

    # our own full TrainState round-trips through the same path (the
    # cross-experiment reuse case): struct fields restore as dicts
    own_dir = os.path.join(tmp_path, "own")
    store2 = CheckpointStore(own_dir)
    store2.save(3, loaded)
    store2.close()
    re = _load_pretrain_weights(state, own_dir, None)
    np.testing.assert_allclose(np.asarray(re.moco.queue), sd["queue"].T)
    np.testing.assert_allclose(
        np.asarray(re.params["backbone"]["conv1"]["kernel"]),
        out["params"]["backbone"]["conv1"]["kernel"])


def _roundtrip_check(net, ref_sd, skip=()):
    """ref torch sd -> our trees -> exported torch sd must reproduce every
    key and value exactly (conv transposes are lossless)."""
    from dualvar_tpu.core.convert import backbone_to_torch

    params, stats = backbone_from_torch(ref_sd, net)
    back = backbone_to_torch(params, stats, net)
    want = {k: v for k, v in ref_sd.items()
            if not k.endswith("num_batches_tracked")
            and not any(k.startswith(s) for s in skip)}
    got = {k: v for k, v in back.items()
           if not k.endswith("num_batches_tracked")}
    assert sorted(got) == sorted(want), (
        sorted(set(got) ^ set(want))[:10])
    for k, v in want.items():
        np.testing.assert_array_equal(got[k], np.asarray(v), err_msg=k)


def test_export_roundtrip_all_families():
    torch.manual_seed(30)
    for net, build, make_sd, skip in [
        ("r3d", TorchR3D, _r3d_reference_sd, ()),
        ("r21d", TorchR21D, _r21d_reference_sd, ()),
        ("c3d", TorchC3D, _c3d_reference_sd, ()),
        ("s3dg", lambda: TorchS3DFull(gating=True), _s3dg_reference_sd,
         ("block",)),
        ("r2d3d18", TorchR2D3D18, _r2d3d18_reference_sd, ()),
    ]:
        tm = build().eval()
        _randomize_bn(tm)
        _roundtrip_check(net, make_sd(tm), skip=skip)


def test_export_cli_reverse(tmp_path):
    """--reverse: one of our CheckpointStore dirs -> a reference-format
    .pth.tar that re-imports to the identical tree."""
    from dualvar_tpu.core import convert
    from dualvar_tpu.core.convert import backbone_to_torch

    torch.manual_seed(31)
    tm = TorchR3D().eval()
    _randomize_bn(tm)
    ref_sd = _r3d_reference_sd(tm)
    params, stats = backbone_from_torch(ref_sd, "r3d")
    store_dir = os.path.join(tmp_path, "store")
    store = CheckpointStore(store_dir)
    store.save(7, {"params": {"backbone": params},
                   "batch_stats": {"backbone": stats}})
    store.close()

    out_pth = os.path.join(tmp_path, "exported.pth.tar")
    convert.main(["--ckpt", store_dir, "--net", "r3d", "--out", out_pth,
                  "--reverse"])
    raw = torch.load(out_pth, map_location="cpu", weights_only=False)
    assert raw["epoch"] == 7
    assert any(k.startswith("encoder_q.0.") for k in raw["state_dict"])
    # re-import closes the loop
    sd2 = {k: v.numpy() for k, v in raw["state_dict"].items()}
    bb = extract_backbone_state(sd2)
    params2, stats2 = backbone_from_torch(bb, "r3d")
    for (k1, v1), (k2, v2) in zip(
            sorted(_flat(params)), sorted(_flat(params2))):
        assert k1 == k2
        np.testing.assert_array_equal(v1, v2, err_msg=k1)


def _flat(tree, prefix=""):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flat(v, prefix + k + ".")
        else:
            yield prefix + k, np.asarray(v)
