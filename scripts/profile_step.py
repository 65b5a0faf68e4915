"""Capture a device trace of the bench train step and print the top HLO ops.

Usage: python scripts/profile_step.py [--steps 5] [--out /tmp/dv_profile]

Parses the xplane with tensorboard_plugin_profile (hlo_stats tool) and
prints a per-op-category time breakdown plus the top 30 individual fusions,
so perf work can target the actual hot ops rather than guesses.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build_step(B=128, T=16, H0=171, W0=128, img=112):
    from dualvar_tpu.aug.pipeline import AugConfig
    from dualvar_tpu.models.ssl.simclr import SimCLRNaked
    from dualvar_tpu.train.tasks import total_loss
    import dualvar_tpu.aug.pipeline as P

    model = SimCLRNaked(network="r3d", dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    aug_cfg = AugConfig(img_dim=img, seq_len=T)
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((B, 2, T, img, img, 3), jnp.float32)
    variables = model.init({"params": rng}, example, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))
    opt_state = tx.init(params)
    frames = jax.device_put(
        np.random.default_rng(0).integers(0, 255, (B, 2 * T, H0, W0, 3),
                                          dtype=np.uint8))

    def train_step(params, batch_stats, opt_state, frames_u8, key):
        block = P.pretrain_batch(key, frames_u8, aug_cfg)

        def loss_fn(p):
            ret, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, block,
                train=True, mutable=["batch_stats"])
            return total_loss(ret), upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    return step, (params, batch_stats, opt_state, frames)


def parse_trace(out_dir: str, min_ms: float = 0.5):
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {out_dir}"
    path = max(paths, key=os.path.getmtime)
    data, _ = raw_to_tool_data.xspace_to_tool_data([path], "hlo_stats^",
                                                   params={})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/dv_profile")
    ap.add_argument("--json", default="")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; parse an existing trace (run with "
                         "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if "
                         "the plugin's pb2 files clash with protobuf)")
    args = ap.parse_args()

    if args.parse_only:
        _report(args)
        return

    step, state = build_step()
    params, batch_stats, opt_state, frames = state
    key = jax.random.PRNGKey(1)
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, frames, key)
    print("compiled; warmup loss", float(loss), flush=True)

    jax.profiler.start_trace(args.out)
    for i in range(args.steps):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, frames, jax.random.fold_in(key, i))
    _ = float(loss)
    jax.profiler.stop_trace()
    time.sleep(1)
    _report(args)


def _report(args):
    rows = parse_trace(args.out)
    # rows: list-of-dicts or a table; handle the tool's gviz JSON shape
    if isinstance(rows, dict) and "rows" in rows:
        cols = [c["label"] for c in rows["cols"]]
        table = [[c.get("v") for c in r["c"]] for r in rows["rows"]]
    else:
        print(type(rows))
        print(str(rows)[:2000])
        return
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"cols": cols, "rows": table}, f)

    ci = {name: i for i, name in enumerate(cols)}
    print("columns:", cols, flush=True)
    tcol = next((c for c in cols if "time" in c.lower() and "self" in c.lower()), None)
    ccol = next((c for c in cols if "categor" in c.lower()), None)
    ncol = next((c for c in cols if c.lower() in ("hlo op name", "op name", "name")), None)
    ecol = next((c for c in cols if "expression" in c.lower()), None)
    by_cat: dict[str, float] = {}
    for r in table:
        cat = r[ci[ccol]] if ccol else "?"
        t = float(r[ci[tcol]] or 0)
        by_cat[cat] = by_cat.get(cat, 0.0) + t
    total = sum(by_cat.values())
    print(f"\n== category breakdown (total {total/1e6:.1f} ms over {args.steps} steps) ==")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e6:9.2f} ms  {100*t/total:5.1f}%  {cat}")

    print("\n== top 30 ops ==")
    rows_sorted = sorted(table, key=lambda r: -float(r[ci[tcol]] or 0))
    for r in rows_sorted[:30]:
        t = float(r[ci[tcol]] or 0)
        name = r[ci[ncol]] if ncol else "?"
        expr = (r[ci[ecol]] or "")[:110] if ecol else ""
        print(f"{t/1e6:9.2f} ms  {100*t/total:5.1f}%  {name}  {expr}")


if __name__ == "__main__":
    main()
