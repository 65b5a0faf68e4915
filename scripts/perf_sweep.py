"""Train-step perf sweep on the real TPU (R3D SimCLR, full step incl. aug).

Timing notes for this environment: the axon relay makes
``block_until_ready`` unreliable; a host transfer (``float(loss)``) is the
only hard barrier, and it costs one tunnel round trip. We therefore time a
chain of n donated steps with a single final ``float`` (each step consumes
the previous step's outputs, so the final loss transitively waits on every
step) and subtract one measured RTT.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dualvar_tpu.aug.pipeline import AugConfig
import dualvar_tpu.aug.pipeline as P
from dualvar_tpu.models.ssl.simclr import SimCLRNaked
from dualvar_tpu.train.tasks import total_loss


def bench(B, n=20, T=16, H0=171, W0=128, img=112, remat=False, net="r3d",
          out_dtype="float32"):
    model = SimCLRNaked(network=net, dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    aug_cfg = AugConfig(img_dim=img, seq_len=T, out_dtype=out_dtype)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 2, T, 32, 32, 3), jnp.float32)
    variables = model.init({"params": rng}, small, train=True)
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))
    opt = tx.init(params)
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (B, 2 * T, H0, W0, 3), dtype=np.uint8))

    apply = model.apply
    if remat:
        apply = jax.checkpoint(
            lambda v, b: model.apply(v, b, train=True, mutable=["batch_stats"])
        )

    def train_step(params, bs, opt, frames_u8, key):
        block = P.pretrain_batch(key, frames_u8, aug_cfg)

        def loss_fn(p):
            if remat:
                ret, upd = apply({"params": p, "batch_stats": bs}, block)
            else:
                ret, upd = model.apply({"params": p, "batch_stats": bs},
                                       block, train=True,
                                       mutable=["batch_stats"])
            return total_loss(ret), upd["batch_stats"]

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, nopt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), nbs, nopt, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, bs, opt, loss = step(params, bs, opt, frames, key)
    _ = float(loss)
    print(f"  compile+1step {time.perf_counter() - t0:.1f}s", flush=True)
    # median-of-3 RTT: a single probe can catch a tunnel hiccup and
    # over-correct (a 1572 ms probe once inflated a B=192 run by 79 ms/step)
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, i].astype(jnp.float32)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    t0 = time.perf_counter()
    for i in range(n):
        params, bs, opt, loss = step(params, bs, opt, frames,
                                     jax.random.fold_in(key, 100 + i))
    final = float(loss)
    dt = time.perf_counter() - t0
    per = (dt - rtt) / n
    print(f"B={B} net={net} remat={remat} out={out_dtype}: "
          f"{per * 1e3:.1f} ms/step "
          f"(rtt {rtt * 1e3:.0f} ms), {B * 2 / per:.0f} clips/s, "
          f"final {final:.3f}", flush=True)
    return B * 2 / per


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["16", "32", "64"]:
        if arg.startswith("remat"):
            bench(int(arg[5:]), remat=True)
        elif arg.startswith("bf16out"):  # bf16 aug output (memory lever)
            bench(int(arg[7:]), out_dtype="bfloat16")
        else:
            bench(int(arg))
