"""AOT serving export: freeze a trained classifier into a serialized
StableHLO artifact that runs without this package at serve time.

The reference deploys by re-instantiating the torch model in Python and
loading a checkpoint (reference classifier.py:152-250); the TPU-native
production analogue is an ahead-of-time-lowered XLA program via
``jax.export``: the trained weights are baked in as program constants, the
input signature is static, and the artifact is a self-describing bytes blob
that any JAX runtime (or PJRT C API consumer) can deserialize and execute —
no model code, checkpoint surgery, or flax on the serving host.

Two serving signatures, both taking the SAME raw uint8 frames the data
loader produces (decode/resize stays host-side; center-crop + normalize is
compiled into the artifact, mirroring the eval paths byte-for-byte):

* single-clip: ``(B, T, H0, W0, 3) u8 -> (probs, logits, feat)`` — the
  validate/center-crop forward (train/classifier.py make_eval_step).
* ten-clip:    ``(B, 10*T, H0, W0, 3) u8 -> (probs, logits10, feat)`` with
  probs = mean softmax over the 10 uniform clips — the published inference
  protocol (reference classifier.py:657-738; our test_temporal_tenclip).

CLI::

    python -m dualvar_tpu.export --preset paper_table1_ucf_ft \
        --ckpt log/.../model --out serving.jaxexp --ten_clip --batch 8
"""

from __future__ import annotations

import argparse
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .aug.pipeline import AugConfig, eval_batch, tenclip_batch
from .core.config import CLASSIFIER_PRESETS, ClassifierConfig


def make_serving_fn(model, variables: dict[str, Any], aug_cfg: AugConfig,
                    ten_clip: bool = False):
    """A pure ``frames_u8 -> (probs, logits, feat)`` closure with the trained
    variables captured (they become constants under export). Shapes:

    * ``ten_clip=False``: frames (B, T, H0, W0, 3) -> probs/logits (B, C),
      feat (B, F) — the pooled feature retrieval consumes.
    * ``ten_clip=True``: frames (B, 10*T, H0, W0, 3) -> probs (B, C) clip-
      averaged, logits (B, 10, C) per clip, feat (B, 10, F).
    """

    def single(frames_u8):
        clips = eval_batch(frames_u8, aug_cfg)
        logit, feat = model.apply(variables, clips, train=False)
        probs = jax.nn.softmax(logit.astype(jnp.float32), axis=-1)
        return probs, logit, feat

    def ten(frames_u8):
        clips = tenclip_batch(frames_u8, aug_cfg)  # (B, 10, T, d, d, C)
        B = clips.shape[0]
        flat = clips.reshape(B * 10, *clips.shape[2:])
        logit, feat = model.apply(variables, flat, train=False)
        probs = jax.nn.softmax(logit.astype(jnp.float32), axis=-1)
        return (probs.reshape(B, 10, -1).mean(axis=1),
                logit.reshape(B, 10, -1), feat.reshape(B, 10, -1))

    return ten if ten_clip else single


def export_serving(model, variables: dict[str, Any], aug_cfg: AugConfig,
                   input_shape: tuple[int, ...], path: str,
                   ten_clip: bool = False,
                   platforms: tuple[str, ...] = ("tpu", "cpu")) -> bytes:
    """Lower the serving closure for `platforms` and serialize it to `path`.

    `input_shape` is the full uint8 frames shape incl. batch (static — AOT
    programs have one signature; export once per served batch size, or use a
    bucketing frontend). Returns the serialized bytes as written.
    """
    fn = make_serving_fn(model, variables, aug_cfg, ten_clip=ten_clip)
    spec = jax.ShapeDtypeStruct(input_shape, jnp.uint8)
    exp = jax_export.export(jax.jit(fn), platforms=list(platforms))(spec)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return blob


def load_serving(path: str):
    """Deserialize an exported artifact into a jitted callable.

    This is the entire serving-host dependency surface: jax + the blob.
    """
    with open(path, "rb") as f:
        exp = jax_export.deserialize(bytearray(f.read()))
    return jax.jit(exp.call)


def _load_variables(cfg: ClassifierConfig, model, ckpt: str):
    """Trained (params, batch_stats) from a CheckpointStore dir, a single
    orbax path, or a reference torch ``.pth.tar`` (converted on the fly)."""
    from .core.checkpoint import CheckpointStore, restore_single

    if ckpt.endswith((".pth.tar", ".pth")):
        from .core.checkpoint import merge_matching_leaves
        from .core.convert import classifier_from_torch, load_torch_checkpoint

        example = jnp.zeros(
            (1, cfg.data.seq_len, cfg.data.img_dim, cfg.data.img_dim, 3))
        variables = model.init({"params": jax.random.key(0)}, example,
                               train=False)
        sd, _ = load_torch_checkpoint(ckpt)
        params_t, stats_t = classifier_from_torch(sd, cfg.model.net)
        params, _ = merge_matching_leaves(variables["params"], params_t)
        stats, _ = merge_matching_leaves(variables["batch_stats"], stats_t)
        return params, stats
    # template-free restore returns the raw array tree (same pattern as the
    # test protocols' _load_test_state, train/classifier.py:405-427)
    state = (CheckpointStore(ckpt) if os.path.isdir(ckpt)
             else None)
    tree = state.restore() if state is not None else restore_single(ckpt)
    return tree["params"], tree["batch_stats"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--preset", default="smoke",
                   choices=sorted(CLASSIFIER_PRESETS))
    p.add_argument("--ckpt", required=True,
                   help="CheckpointStore dir, orbax single path, or "
                        "reference .pth.tar")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--ten_clip", action="store_true")
    p.add_argument("--platforms", nargs="*", default=["tpu", "cpu"])
    args = p.parse_args(argv)

    from .train.classifier import build_model

    cfg = CLASSIFIER_PRESETS[args.preset]
    model = build_model(cfg)
    params, batch_stats = _load_variables(cfg, model, args.ckpt)
    aug_cfg = AugConfig(img_dim=cfg.data.img_dim, seq_len=cfg.data.seq_len)
    T = cfg.data.seq_len * (10 if args.ten_clip else 1)
    H0, W0 = cfg.data.scale_hw
    blob = export_serving(
        model, {"params": params, "batch_stats": batch_stats}, aug_cfg,
        (args.batch, T, H0, W0, 3), args.out, ten_clip=args.ten_clip,
        platforms=tuple(args.platforms))
    print(f"wrote {args.out}: {len(blob)} bytes, input "
          f"({args.batch}, {T}, {H0}, {W0}, 3) u8, "
          f"platforms={args.platforms}")


if __name__ == "__main__":
    main()
