"""Import reference PyTorch checkpoints (.pth.tar) into dualvar_tpu.

The reference saves torch checkpoints ``{epoch, state_dict, best_acc,
optimizer, iteration}`` (reference pretrain.py:349-354, utils/utils.py:18-44).
A user switching frameworks arrives with those files; this module maps the
``state_dict`` onto our flax variable trees so that

- a reference-*pretrained* encoder can be finetuned / linear-probed /
  retrieval-evaluated here (``--what backbone``, the analogue of the
  reference's own ``encoder_q.0. -> backbone.`` remap, classifier.py:362-366),
- a reference-*finetuned* classifier can run our test protocols directly
  (``--what classifier``).

Torch key grammar per family (derived from the reference module attribute
names — the checkpoint file format is the behavioral spec):

- r3d: ``conv1.temporal_spatial_conv.weight``, ``bn1.*``,
  ``conv{2..5}.block1.{conv1,conv2}.temporal_spatial_conv.weight``,
  ``...{bn1,bn2}.*``, ``...downsampleconv.temporal_spatial_conv.weight``,
  ``...downsamplebn.*``; extra blocks at ``conv{k}.blocks.{i}.``
  (backbone/r3d.py:33-148).
- r21d: same block layout with ``{spatial_conv,bn,temporal_conv}`` inside
  each factored conv (backbone/r21d.py:54-64,227-236).
- c3d: ``conv{1,2,3a..5b}.{weight,bias}``, ``bn{...}.*``
  (backbone/c3d.py:15-47).
- s3d/s3dg: ``Conv_1a.*``, ``Conv_2b.*``, ``Conv_2c.*``, ``Mixed_{3b..5c}.
  branch{0..3}.{i}.*``, ``gating_b{0..3}.fc.*``; the ``block{1..5}.*`` keys
  are duplicate registrations of the same modules and are skipped
  (backbone/s3dg.py:93-116,143-186).
- r2d3d18/r50: ``conv1.weight``, ``bn1.*``, ``layer{1..4}.{i}.conv{1,2,3}.
  weight``, ``...bn{1,2,3}.*``, ``...downsample.{0,1}.*``
  (backbone/resnet_2d3d.py:45-260).

Value transforms: torch Conv3d weight (O, I, kt, kh, kw) -> flax
(kt, kh, kw, I, O); Linear weight (O, I) -> (I, O); BN weight/bias ->
scale/bias and running_mean/var -> batch_stats mean/var (our ``BatchNorm``
wrapper nests the flax BN one level down at ``<name>.bn``).

CLI::

    python -m dualvar_tpu.core.convert \
        --ckpt log/.../model/latest.pth.tar --net r21d --out converted_ckpt

writes a ``CheckpointStore`` directory consumable by ``--pretrain`` (backbone)
or ``--resume``/test (classifier) in the drivers.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np

__all__ = [
    "extract_backbone_state",
    "backbone_from_torch",
    "classifier_from_torch",
    "ssl_from_torch",
    "backbone_to_torch",
    "classifier_to_torch",
    "load_torch_checkpoint",
]


# ---------------------------------------------------------------- utilities

def _set(tree: dict, dotted: str, value) -> None:
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def load_torch_checkpoint(path: str) -> tuple[dict[str, np.ndarray], int]:
    """Read a reference ``.pth.tar`` -> (flat state_dict of numpy arrays,
    epoch). Accepts both full checkpoints and bare state dicts."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    epoch = raw.get("epoch", 0) if isinstance(raw, dict) else 0
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out, int(epoch)


def extract_backbone_state(sd: dict[str, Any]) -> dict[str, Any]:
    """Strip DDP's ``module.`` and select the backbone subtree: pretrain
    checkpoints root it at ``encoder_q.0.`` (model/simclr.py:42,
    model/moco.py:53 — encoder_q is a ModuleList with the backbone first);
    classifier checkpoints at ``backbone.`` (model/classifier.py:27)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    for prefix in ("encoder_q.0.", "backbone."):
        sub = {k.removeprefix(prefix): v
               for k, v in sd.items() if k.startswith(prefix)}
        if sub:
            return sub
    return sd  # already backbone-rooted


# ------------------------------------------------------- per-family mappers
# Each mapper rewrites a torch MODULE path (key minus the trailing leaf name)
# to our module path, or returns None to skip the key.

_BLOCK = re.compile(r"^conv(\d)\.block1\.")          # r3d / r21d first block
_BLOCKS = re.compile(r"^conv(\d)\.blocks\.(\d+)\.")  # r3d / r21d extra blocks
_LAYER = re.compile(r"^layer(\d)\.(\d+)\.")          # resnet_2d3d stages


def _map_r3d(mod: str) -> str | None:
    m = _BLOCK.match(mod)
    if m:
        mod = f"layer{int(m.group(1)) - 1}_block0." + mod[m.end():]
    else:
        m = _BLOCKS.match(mod)
        if m:
            mod = (f"layer{int(m.group(1)) - 1}_block{int(m.group(2)) + 1}."
                   + mod[m.end():])
    mod = mod.replace("downsampleconv", "downsample_conv")
    mod = mod.replace("downsamplebn", "downsample_bn")
    # full-3D convs are wrapped in a single-conv module; ours are plain Conv3d
    return mod.replace(".temporal_spatial_conv", "") \
        .removesuffix("temporal_spatial_conv").rstrip(".") or None


def _map_r21d(mod: str) -> str | None:
    m = _BLOCK.match(mod)
    if m:
        mod = f"layer{int(m.group(1)) - 1}_block0." + mod[m.end():]
    else:
        m = _BLOCKS.match(mod)
        if m:
            mod = (f"layer{int(m.group(1)) - 1}_block{int(m.group(2)) + 1}."
                   + mod[m.end():])
    mod = mod.replace("downsampleconv", "downsample_conv")
    return mod.replace("downsamplebn", "downsample_bn")


def _map_c3d(mod: str) -> str | None:
    return mod  # identical naming


def _map_s3d(mod: str) -> str | None:
    if mod.startswith("block"):
        return None  # duplicate registration of the same modules (s3dg.py:147-186)
    # Sequential branches -> flat names (branch3.0 is a parameterless pool)
    mod = re.sub(r"\bbranch0\.0\b", "branch0", mod)
    for b in (1, 2, 3):
        mod = re.sub(rf"\bbranch{b}\.(\d)\b", rf"branch{b}_\g<1>", mod)
    return mod


def _map_r2d3d(mod: str) -> str | None:
    m = _LAYER.match(mod)
    if m:
        mod = f"layer{m.group(1)}_block{m.group(2)}." + mod[m.end():]
    mod = mod.replace("downsample.0", "downsample_conv")
    return mod.replace("downsample.1", "downsample_bn")


_MAPPERS: dict[str, Callable[[str], str | None]] = {
    "r3d": _map_r3d,
    "r21d": _map_r21d,
    "c3d": _map_c3d,
    "s3d": _map_s3d,
    "s3dg": _map_s3d,
    "r2d3d18": _map_r2d3d,
    "r50": _map_r2d3d,
}


def _convert_modules(
    sd: dict[str, np.ndarray], mapper: Callable[[str], str | None],
    bn_nests: bool,
) -> tuple[dict, dict]:
    """Generic torch->flax tree builder. BN-ness of a module is detected by
    its ``running_mean`` sibling; ``bn_nests`` adds the extra ``.bn`` level
    of our backbone BatchNorm wrapper (models/layers.py BatchNorm)."""
    bn_mods = {k.rsplit(".", 1)[0] for k in sd if k.endswith("running_mean")}
    params: dict = {}
    stats: dict = {}
    for key, v in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        mod, leaf = key.rsplit(".", 1)
        our = mapper(mod)
        if our is None:
            continue
        is_bn = mod in bn_mods
        if is_bn and bn_nests:
            our += ".bn"
        v = np.asarray(v)
        if leaf == "running_mean":
            _set(stats, our + ".mean", v)
        elif leaf == "running_var":
            _set(stats, our + ".var", v)
        elif leaf == "weight":
            if is_bn:
                _set(params, our + ".scale", v)
            elif v.ndim == 5:  # Conv3d (O, I, kt, kh, kw) -> (kt, kh, kw, I, O)
                _set(params, our + ".kernel", v.transpose(2, 3, 4, 1, 0))
            elif v.ndim == 2:  # Linear (O, I) -> (I, O)
                _set(params, our + ".kernel", v.T)
            else:
                raise ValueError(f"unhandled weight rank for {key}: {v.shape}")
        elif leaf == "bias":
            _set(params, our + ".bias", v)
        else:
            raise ValueError(f"unhandled torch leaf {key!r}")
    return params, stats


def backbone_from_torch(
    sd: dict[str, np.ndarray], net: str
) -> tuple[dict, dict]:
    """Backbone-rooted torch state_dict -> (params, batch_stats) trees
    matching ``select_backbone(net)``'s variable structure."""
    if net not in _MAPPERS:
        raise NotImplementedError(
            f"no torch key mapping for backbone {net!r} "
            f"(supported: {sorted(_MAPPERS)})")
    return _convert_modules(sd, _MAPPERS[net], bn_nests=True)


def classifier_from_torch(
    sd: dict[str, np.ndarray], net: str
) -> tuple[dict, dict]:
    """Full reference LinearClassifier state_dict -> our LinearClassifier
    (params, batch_stats): backbone subtree + optional ``final_bn`` (plain
    flax BN in models/heads.py, no wrapper nesting) + the ``final_fc``
    Linear, whose Sequential index varies with dropout/nonlinear config
    (model/classifier.py:34-46) — located as the 2-D weight."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    bb = {k.removeprefix("backbone."): v
          for k, v in sd.items() if k.startswith("backbone.")}
    if not bb:
        raise ValueError("no 'backbone.' keys — is this a classifier ckpt? "
                         "Use --what backbone for pretrain checkpoints.")
    params, stats = backbone_from_torch(bb, net)
    params = {"backbone": params}
    stats = {"backbone": stats} if stats else {}

    fc_w = [(k, v) for k, v in sd.items()
            if k.startswith("final_fc.") and k.endswith(".weight")
            and np.asarray(v).ndim == 2]
    if len(fc_w) != 1:
        raise ValueError(
            f"expected exactly one final_fc Linear, found {[k for k, _ in fc_w]} "
            "(the nonlinear two-Linear head has no equivalent here)")
    k, w = fc_w[0]
    _set(params, "final_fc.kernel", np.asarray(w).T)
    b = sd.get(k.rsplit(".", 1)[0] + ".bias")
    if b is not None:
        _set(params, "final_fc.bias", np.asarray(b))

    if "final_bn.weight" in sd:  # BatchNorm1d (model/classifier.py:29-31)
        _set(params, "final_bn.scale", np.asarray(sd["final_bn.weight"]))
        _set(params, "final_bn.bias", np.asarray(sd["final_bn.bias"]))
        _set(stats, "final_bn.mean", np.asarray(sd["final_bn.running_mean"]))
        _set(stats, "final_bn.var", np.asarray(sd["final_bn.running_var"]))
    return params, stats


def _mlp_head_from_conv1x1(sd: dict, prefix: str, i0: int, i1: int) -> dict:
    """Two 1x1x1 Conv3d layers (the reference projection heads,
    model/simclr.py:46-50,176-180) -> our MLPHead {fc1, fc2} Dense params.
    A 1x1x1 conv on pooled (B, C, 1, 1, 1) features IS a Dense layer:
    weight (O, I, 1, 1, 1) -> kernel (I, O)."""
    head = {}
    for name, idx in (("fc1", i0), ("fc2", i1)):
        w = np.asarray(sd[f"{prefix}.{idx}.weight"])
        head[name] = {"kernel": w.reshape(w.shape[0], w.shape[1]).T}
        b = sd.get(f"{prefix}.{idx}.bias")
        if b is not None:
            head[name]["bias"] = np.asarray(b)
    return head


def ssl_from_torch(sd: dict[str, np.ndarray], net: str) -> dict:
    """Full reference SSL-model state_dict -> our pretrain TrainState
    fields ``{params, batch_stats[, moco]}`` (weights-only — optimizer
    state starts fresh, matching --pretrain semantics).

    Handles all four families: the query encoder (``encoder_q.0`` backbone
    + ``encoder_q.{2,4}`` clip head, model/simclr.py:42-50) and series head
    (``series_proj_head[_q].{0,2}``, model/simclr.py:176-180 /
    model/moco.py:288-292); for MoCo additionally the key encoder
    (``encoder_k.*``, ``series_proj_head_k.*``) and the negative queues +
    pointer (``queue`` (dim, K) -> ours (K, dim); ``series_queue``
    (n_series*series_dim, K) -> (K, n_series*series_dim) — both sides are
    n_series-major, moco.py:319-323 / models/ssl/moco.py init;
    ``queue_ptr`` -> scalar int32)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    def encoder(prefix: str, series_prefix: str):
        bb = {k.removeprefix(prefix + ".0."): v
              for k, v in sd.items() if k.startswith(prefix + ".0.")}
        if not bb:
            return None, None
        p, s = backbone_from_torch(bb, net)
        params = {"backbone": p}
        stats = {"backbone": s}
        if f"{prefix}.2.weight" in sd:
            params["clip_head"] = _mlp_head_from_conv1x1(sd, prefix, 2, 4)
        if f"{series_prefix}.0.weight" in sd:
            params["series_head"] = _mlp_head_from_conv1x1(
                sd, series_prefix, 0, 2)
        return params, stats

    is_moco = any(k.startswith("encoder_k.") for k in sd)
    q_series = "series_proj_head_q" if is_moco else "series_proj_head"
    params, stats = encoder("encoder_q", q_series)
    if params is None:
        raise ValueError("no 'encoder_q.0.' keys — not an SSL pretrain ckpt")
    out = {"params": params, "batch_stats": stats}
    if is_moco:
        params_k, stats_k = encoder("encoder_k", "series_proj_head_k")
        moco = {"params_k": params_k, "batch_stats_k": stats_k}
        if "queue" in sd:
            moco["queue"] = np.ascontiguousarray(np.asarray(sd["queue"]).T)
        if "series_queue" in sd:
            moco["series_queue"] = np.ascontiguousarray(
                np.asarray(sd["series_queue"]).T)
        if "queue_ptr" in sd:
            moco["ptr"] = np.asarray(sd["queue_ptr"]).reshape(()).astype(
                np.int32)
        out["moco"] = moco
    return out


# ------------------------------------------------------------------ export
# The reverse direction: our variable trees -> reference-format torch
# state_dicts, so a TPU-pretrained backbone can be consumed by the torch
# ecosystem (the reference's own classifier.py:357-376 load path included).

def _inv_r3d(mod: str, kind: str) -> str:
    m = re.match(r"^layer(\d)_block(\d+)\.", mod)
    if m:
        li, bi = int(m.group(1)), int(m.group(2))
        tail = mod[m.end():]
        mod = (f"conv{li + 1}.block1." if bi == 0
               else f"conv{li + 1}.blocks.{bi - 1}.") + tail
    mod = mod.replace("downsample_conv", "downsampleconv")
    mod = mod.replace("downsample_bn", "downsamplebn")
    if kind == "conv5d":
        mod += ".temporal_spatial_conv"
    return mod


def _inv_r21d(mod: str, kind: str) -> str:
    m = re.match(r"^layer(\d)_block(\d+)\.", mod)
    if m:
        li, bi = int(m.group(1)), int(m.group(2))
        tail = mod[m.end():]
        mod = (f"conv{li + 1}.block1." if bi == 0
               else f"conv{li + 1}.blocks.{bi - 1}.") + tail
    mod = mod.replace("downsample_conv", "downsampleconv")
    return mod.replace("downsample_bn", "downsamplebn")


def _inv_c3d(mod: str, kind: str) -> str:
    return mod


def _inv_s3d(mod: str, kind: str) -> str:
    mod = re.sub(r"\bbranch0\b", "branch0.0", mod)
    return re.sub(r"\bbranch([123])_(\d)\b", r"branch\1.\2", mod)


def _inv_r2d3d(mod: str, kind: str) -> str:
    m = re.match(r"^layer(\d)_block(\d+)\.", mod)
    if m:
        mod = f"layer{m.group(1)}.{m.group(2)}." + mod[m.end():]
    mod = mod.replace("downsample_conv", "downsample.0")
    return mod.replace("downsample_bn", "downsample.1")


_INV_MAPPERS: dict[str, Callable[[str, str], str]] = {
    "r3d": _inv_r3d,
    "r21d": _inv_r21d,
    "c3d": _inv_c3d,
    "s3d": _inv_s3d,
    "s3dg": _inv_s3d,
    "r2d3d18": _inv_r2d3d,
    "r50": _inv_r2d3d,
}


def _flatten(tree: dict, prefix: str = ""):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + k + ".")
        else:
            yield prefix + k, v


def backbone_to_torch(
    params: dict, batch_stats: dict, net: str
) -> dict[str, np.ndarray]:
    """Our backbone (params, batch_stats) -> a reference-format torch
    state_dict (inverse of backbone_from_torch; round-trip pinned by
    tests/test_convert.py). ``num_batches_tracked`` is emitted as 0 for
    every BN so strict torch load_state_dict works."""
    if net not in _INV_MAPPERS:
        raise NotImplementedError(f"no torch export for backbone {net!r}")
    inv = _INV_MAPPERS[net]
    out: dict[str, np.ndarray] = {}
    for path, v in _flatten(params):
        mod, leaf = path.rsplit(".", 1)
        v = np.asarray(v)
        if mod.endswith(".bn"):  # our BatchNorm wrapper nesting
            tmod = inv(mod[:-3], "bn")
            out[tmod + (".weight" if leaf == "scale" else ".bias")] = v
        elif leaf == "kernel":
            if v.ndim == 5:
                out[inv(mod, "conv5d") + ".weight"] = np.ascontiguousarray(
                    v.transpose(4, 3, 0, 1, 2))
            else:
                out[inv(mod, "dense") + ".weight"] = np.ascontiguousarray(v.T)
        elif leaf == "bias":
            out[inv(mod, "dense") + ".bias"] = v
        else:
            raise ValueError(f"unhandled param leaf {path!r}")
    for path, v in _flatten(batch_stats):
        mod, leaf = path.rsplit(".", 1)
        if not mod.endswith(".bn") or leaf not in ("mean", "var"):
            raise ValueError(f"unhandled batch_stats leaf {path!r}")
        tmod = inv(mod[:-3], "bn")
        out[tmod + ".running_" + leaf] = np.asarray(v)
        out.setdefault(tmod + ".num_batches_tracked", np.zeros((), np.int64))
    return out


def classifier_to_torch(
    params: dict, batch_stats: dict, net: str
) -> dict[str, np.ndarray]:
    """Our LinearClassifier tree -> reference classifier state_dict
    (backbone.* + final_bn.* + final_fc.1.* — the use_dropout layout,
    model/classifier.py:34-37)."""
    out = {"backbone." + k: v for k, v in backbone_to_torch(
        params["backbone"], batch_stats.get("backbone", {}), net).items()}
    fc = params["final_fc"]
    out["final_fc.1.weight"] = np.ascontiguousarray(np.asarray(fc["kernel"]).T)
    if "bias" in fc:
        out["final_fc.1.bias"] = np.asarray(fc["bias"])
    if "final_bn" in params:
        out["final_bn.weight"] = np.asarray(params["final_bn"]["scale"])
        out["final_bn.bias"] = np.asarray(params["final_bn"]["bias"])
        out["final_bn.running_mean"] = np.asarray(
            batch_stats["final_bn"]["mean"])
        out["final_bn.running_var"] = np.asarray(
            batch_stats["final_bn"]["var"])
        out["final_bn.num_batches_tracked"] = np.zeros((), np.int64)
    return out


# ----------------------------------------------------------------- validate

def _validate_backbone(params: dict, stats: dict, net: str, logger=None):
    """Strict-merge the converted trees into a freshly initialized backbone:
    every leaf must land with the exact path and shape, both directions."""
    import jax
    import jax.numpy as jnp

    from ..models.backbones import select_backbone
    from .checkpoint import merge_matching_leaves

    module, _ = select_backbone(net)
    example = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), example, train=False))
    tmpl_p = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                          variables["params"])
    tmpl_s = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                          variables.get("batch_stats", {}))
    merged_p, _ = merge_matching_leaves(tmpl_p, params, logger, strict=True,
                                        prefix="params")
    merged_s, _ = merge_matching_leaves(tmpl_s, stats, logger, strict=True,
                                        prefix="batch_stats")
    return merged_p, merged_s


def main(argv=None):
    import argparse

    from .checkpoint import CheckpointStore
    from .logging import get_logger

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ckpt", required=True, help="reference .pth.tar")
    p.add_argument("--net", required=True, choices=sorted(_MAPPERS))
    p.add_argument("--out", required=True,
                   help="output CheckpointStore directory")
    p.add_argument("--what", default="auto",
                   choices=["auto", "backbone", "classifier", "ssl"],
                   help="backbone: encoder backbone only (for --pretrain in "
                        "the classifier); ssl: full SSL model incl. heads, "
                        "key encoder, and queues (for --pretrain in the "
                        "pretrain driver); classifier: finetuned model")
    p.add_argument("--no_validate", action="store_true",
                   help="skip the strict shape/path validation "
                        "(backbone mode only)")
    p.add_argument("--reverse", action="store_true",
                   help="export instead of import: --ckpt is one of OUR "
                        "CheckpointStore dirs, --out a torch .pth.tar in the "
                        "reference's format (pretrain-style encoder_q.0.* "
                        "for backbone, classifier-style otherwise)")
    args = p.parse_args(argv)
    logger = get_logger()

    if args.reverse:
        import torch

        from .checkpoint import CheckpointStore as _Store

        store = _Store(args.ckpt)
        state = store.restore()
        epoch = store.latest_epoch() or 0
        store.close()
        if args.what in ("auto", "backbone"):
            sd = {"encoder_q.0." + k: v for k, v in backbone_to_torch(
                state["params"]["backbone"],
                state.get("batch_stats", {}).get("backbone", {}),
                args.net).items()}
        else:
            sd = classifier_to_torch(state["params"],
                                     state.get("batch_stats", {}), args.net)
        torch.save(
            {"epoch": epoch,
             "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}},
            args.out)
        logger.info(f"exported {len(sd)} torch tensors (epoch {epoch}) "
                    f"to '{args.out}'")
        return

    sd, epoch = load_torch_checkpoint(args.ckpt)
    stripped = {k.removeprefix("module."): v for k, v in sd.items()}
    what = args.what
    if what == "auto":
        what = ("backbone"
                if any(k.startswith("encoder_q.") for k in stripped)
                else "classifier" if any(k.startswith("backbone.")
                                         for k in stripped)
                else "backbone")
        logger.info(f"--what auto -> {what}")

    if what == "backbone":
        bb = extract_backbone_state(stripped)
        params, stats = backbone_from_torch(bb, args.net)
        if not args.no_validate:
            params, stats = _validate_backbone(params, stats, args.net, logger)
        state = {"params": {"backbone": params},
                 "batch_stats": {"backbone": stats}}
    elif what == "ssl":
        state = ssl_from_torch(stripped, args.net)
    else:
        params, stats = classifier_from_torch(stripped, args.net)
        state = {"params": params, "batch_stats": stats}

    n = len(list(map(str, _flat_keys(state))))
    store = CheckpointStore(args.out, keep_all=True)
    store.save(epoch, state)
    store.close()
    logger.info(f"wrote {n} leaves (epoch {epoch}) to '{args.out}'; "
                f"use it as --pretrain (backbone) or --resume/test "
                f"(classifier)")


def _flat_keys(tree, prefix=""):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flat_keys(v, prefix + k + ".")
        else:
            yield prefix + k


if __name__ == "__main__":
    main()
