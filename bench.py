"""Throughput benchmark: R3D-18 SimCLR pretrain clips/sec/chip.

Matches the driver metric (BASELINE.json): clips/sec/chip for the R3D
16x112^2 contrastive pretrain step. One full jitted train step is measured —
uint8 host batch -> on-device augmentation -> 2-view forward -> NT-Xent with
global negatives -> backward -> SGD update — i.e. everything between
dataloader and optimizer in the reference hot loop (pretrain.py:394-451).

"Clips" counts encoded 16-frame clips (2 per sample, matching the
reference's 2-view SimCLR compute). ``vs_baseline`` is measured throughput /
an analytic A100 estimate for the PyTorch reference: the reference trains
fp32/TF32 cuDNN without AMP; assuming a generous 45% MXU-equivalent
utilisation of A100 TF32 (156 TFLOP/s) on these conv shapes and 3x forward
FLOPs per train step, est_A100 = 0.45 * 156e12 / (3 * F_fwd) clips/s, with
F_fwd taken from XLA's own cost analysis of the forward. The north-star
target is vs_baseline >= 3.

Prints exactly one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

# persistent compile cache: the softdtw self-check + train step are ~a dozen
# XLA programs; through the relay a cold compile run costs several minutes
jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Fail-fast plumbing. BENCH_r03 burned its whole driver budget (rc 124, no
# JSON) because the axon relay was wedged and backend init blocked forever
# inside the first device call. Three guards make that impossible now:
#   1. _preflight(): probe the backend in a SUBPROCESS with a short deadline
#      before the parent touches any device — a dead relay yields an error
#      record in ~75s instead of a silent hang.
#   2. _run_json_subprocess(): each auxiliary device-check runs in its own
#      subprocess with its own deadline.
#   3. _arm_watchdog(): if the whole bench overruns BENCH_DEADLINE_S
#      (default 1200s, inside the driver's ~25 min budget) an error JSON
#      line is still printed before exit.
# ---------------------------------------------------------------------------

_STAGE = {"stage": "start"}  # mutated as the bench progresses (watchdog tail)

# Every successful headline run persists its record here; error records
# attach it as `last_known_good` so a relay wedge at driver-bench time
# (BENCH_r03's failure mode) still yields the most recent on-hardware
# measurement with provenance instead of an empty record.
_LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LAST_GOOD.json")


def _save_last_good(record: dict):
    import datetime
    try:
        with open(_LAST_GOOD_PATH, "w") as f:
            json.dump({**record, "measured_at": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds")}, f,
                indent=1)
    except OSError as e:  # read-only checkout etc. — never fail the bench
        log("could not persist last-good record:", e)


def _load_last_good():
    try:
        with open(_LAST_GOOD_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _error_record(msg: str) -> dict:
    rec = {
        "metric": "clips/sec/chip pretrain (R3D-18 SimCLR, 16x112^2, bf16, "
                  "full train step incl. on-device aug)",
        "value": None,
        "unit": "clips/s/chip",
        "vs_baseline": None,
        "error": msg,
        "backend": os.environ.get("JAX_PLATFORMS", "<default>"),
        "stage": _STAGE["stage"],
    }
    last = _load_last_good()
    if last is not None:
        rec["last_known_good"] = last
    return rec


# Absolute watchdog bookkeeping: BENCH_START_TS is stamped at first launch
# and survives preflight re-execs, so retries can never push the bench past
# the driver's budget.
_DEADLINE = {"t_end": None}


def _watchdog_remaining_s() -> float:
    t_end = _DEADLINE["t_end"]
    return float("inf") if t_end is None else t_end - time.monotonic()


def _arm_watchdog(deadline_s: float):
    import threading

    start_ts = os.environ.get("BENCH_START_TS")
    if start_ts is not None:
        # re-exec'd attempt: shrink the deadline by wall time already spent
        deadline_s = max(30.0, deadline_s - (time.time() - float(start_ts)))
    else:
        os.environ["BENCH_START_TS"] = repr(time.time())
    _DEADLINE["t_end"] = time.monotonic() + deadline_s

    def fire():
        # if the headline was already measured (a post-timing stage wedged,
        # e.g. an in-parent kernel check), print the REAL record with the
        # wedge noted — the metric must survive anything after "timing"
        rec = _STAGE.get("record")
        if rec is not None:
            rec = {**rec, "note": f"watchdog fired after {deadline_s:.0f}s "
                                  f"in stage {_STAGE['stage']}"}
        else:
            rec = _error_record(
                f"bench watchdog fired after {deadline_s:.0f}s")
        print(json.dumps(rec), flush=True)
        sys.stdout.flush()
        os._exit(0)

    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()
    return t


def _bounded_run(argv: list[str], deadline_s: float, tag: str):
    """Run argv bounded by a hard deadline, immune to the relay wedge modes.

    subprocess.run(capture_output=True, timeout=...) is NOT safe here: on
    TimeoutExpired it kills only the direct child and then blocks in
    communicate() until the pipes close — and the axon PJRT client forks
    helpers that inherit those pipes, so a wedged relay left the round-4
    preflight hanging PAST its own deadline (observed live: 200s, no
    output). Two changes make the bound unconditional: stdout/stderr go to
    temp FILES (wait() never touches pipes; orphaned grandchildren can't
    block anything), and the child gets its own session so the deadline
    kill takes down the whole process group.
    """
    import signal
    import subprocess
    import tempfile

    with tempfile.TemporaryFile() as out, tempfile.TemporaryFile() as err:
        p = subprocess.Popen(argv, stdout=out, stderr=err,
                             start_new_session=True)
        try:
            rc = p.wait(timeout=deadline_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except OSError:
                p.kill()
            p.wait()
            return None, "", f"{tag} timed out after {deadline_s:.0f}s"
        out.seek(0)
        err.seek(0)
        stdout = out.read().decode("utf-8", "replace")
        stderr = err.read().decode("utf-8", "replace")
    return rc, stdout, stderr


def _preflight(deadline_s: float = 75.0) -> dict:
    """Probe backend init in a subprocess. Returns {'backend':..., 'n':...}
    on success, {'error':...} on failure/timeout — the parent has NOT touched
    the backend yet either way, so it can exit cleanly."""
    code = ("import jax, json; d = jax.devices(); "
            "import jax.numpy as jnp; jnp.ones((8, 8)).sum().item(); "
            "print(json.dumps({'backend': jax.default_backend(),"
            " 'n': len(d)}))")
    rc, stdout, stderr = _bounded_run([sys.executable, "-c", code],
                                      deadline_s, "backend init")
    if rc is None:
        return {"error": stderr}
    if rc == 0:
        for line in reversed(stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    tail = (stderr.strip().splitlines() or ["<no stderr>"])[-1]
    return {"error": f"backend init failed rc={rc}: {tail[:300]}"}


def _preflight_inparent(deadline_s: float) -> dict:
    """Probe backend init in THIS process under a hard deadline.

    The child-probe variant (_preflight) is kept for reference but is wrong
    on a single-session relay: sitecustomize has already dialed from the
    parent at interpreter start, so the child's claim queues behind it (and
    behind any half-dead sessions a SIGKILL'd probe leaves on the server).
    If init wedges past the deadline, a daemon timer handles it — same
    parseable-JSON contract as the child path, without the second session.

    Retry policy (round-4 lesson: one transient relay outage nulled the
    round's record): a wedged init cannot be retried in-process (the PJRT
    client holds its init lock in the blocked main thread), so the timer
    RE-EXECS the whole bench with BENCH_ATTEMPT+1 after a backoff — a fresh
    process gets a fresh relay dial. BENCH_START_TS rides the environment so
    the global watchdog deadline is absolute across re-execs; when attempts
    or remaining budget run out, the timer prints the error record and
    exits as before."""
    import threading

    done = threading.Event()
    attempt = int(os.environ.get("BENCH_ATTEMPT", "1"))
    max_attempts = int(os.environ.get("BENCH_PREFLIGHT_ATTEMPTS", "3"))

    def _fire():
        if done.wait(deadline_s):
            return
        msg = (f"backend init timed out after {deadline_s:.0f}s "
               f"(attempt {attempt}/{max_attempts})")
        log("backend preflight failed:", msg)
        backoff = 15.0 * attempt
        remaining = _watchdog_remaining_s()
        # only re-exec if a full retry (backoff + preflight + margin for
        # compile/measure) still fits inside the absolute deadline
        if attempt < max_attempts and remaining > backoff + deadline_s + 420:
            log(f"retrying after {backoff:.0f}s backoff "
                f"({remaining:.0f}s of watchdog budget left)")
            # the backoff doubles as a grace window: if init completes just
            # past the deadline, do NOT discard the now-healthy run
            if done.wait(backoff):
                log("backend init completed during backoff; retry aborted")
                return
            env = dict(os.environ, BENCH_ATTEMPT=str(attempt + 1))
            sys.stdout.flush()
            sys.stderr.flush()
            try:
                os.execve(sys.executable,
                          [sys.executable] + list(sys.argv), env)
            except OSError as e:
                log("re-exec failed:", e)
        if done.is_set():  # init landed after the final deadline — keep it
            log("backend init completed late; continuing without retry")
            return
        print(json.dumps(_error_record(msg)), flush=True)
        os._exit(0)

    threading.Thread(target=_fire, daemon=True).start()
    try:
        d = jax.devices()
        jnp.ones((8, 8)).sum().item()
        return {"backend": jax.default_backend(), "n": len(d)}
    except Exception as e:  # unregistered backend, init failure, ...
        return {"error": f"backend init failed: {str(e)[:300]}"}
    finally:
        done.set()


def _run_json_subprocess(argv: list[str], deadline_s: float, tag: str) -> dict:
    """Run a script that prints one JSON line; bound it with a deadline so a
    mid-run relay death cannot wedge the bench."""
    rc, stdout, stderr = _bounded_run([sys.executable] + argv, deadline_s, tag)
    if rc is None:
        return {"error": stderr}
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    tail = (stderr.strip().splitlines() or ["<no output>"])[-1]
    return {"error": f"{tag} rc={rc}: {tail[:300]}"}


def _write_synthetic_jpegs(root: str, n_videos: int, vlen: int,
                           scale=(171, 128)):
    """One-time synthetic JPEG tree in the JpegFrameSource layout
    ({video}/image_%05d.jpg). Deterministic; cached across runs."""
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return
    from PIL import Image

    from dualvar_tpu.data.loader import SyntheticFrameSource, synthetic_entries

    entries, _ = synthetic_entries(n_videos, 8, min_len=vlen, max_len=vlen + 1)
    src = SyntheticFrameSource(scale=scale)
    for e in entries:
        d = os.path.join(root, e.vname)
        os.makedirs(d, exist_ok=True)
        frames = src(e.vname, np.arange(vlen))
        for i in range(vlen):
            Image.fromarray(frames[i]).save(
                os.path.join(d, f"image_{i + 1:05d}.jpg"), quality=80)
    open(marker, "w").write("ok")


def input_pipeline_bench(train_step, params, batch_stats, opt_state, B, T):
    """Feed the SAME train step through the real host path: JPEG files ->
    native decoder -> HostLoader threads -> one-step-ahead device placement
    (the FastDataLoader role, reference utils/utils.py:267-311).

    Reports achieved clips/s next to per-core decode rate and the host core
    count — on a 1-core container this is decode-bound by construction, so
    the companion numbers say how many cores saturate the chip.
    """
    from dualvar_tpu.data.loader import (HostLoader, JpegFrameSource,
                                         PretrainDataset, synthetic_entries)

    root = "/tmp/dualvar_bench_jpegs"
    n_videos, vlen = 4 * B + 16, 140  # >=4 batches/epoch so prefetch overlaps
    t0 = time.perf_counter()
    _write_synthetic_jpegs(root, n_videos, vlen)
    log(f"jpeg tree ready in {time.perf_counter() - t0:.1f}s")

    entries, class_index = synthetic_entries(n_videos, 8, min_len=vlen,
                                             max_len=vlen + 1)
    ncores = len(os.sched_getaffinity(0))
    source = JpegFrameSource(root, scale=(171, 128),
                             native_threads=max(1, min(4, ncores)))
    dataset = PretrainDataset(
        entries=entries, class_index=class_index, source=source,
        num_frames=T, ds=4, rand_flip=False, aug_series=False)

    # standalone decode rate (one worker): clips/s-equivalent on this host
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    n_probe = 8
    for i in range(n_probe):
        dataset(i % n_videos, rng)
    dt_probe = (time.perf_counter() - t0) / n_probe
    decode_clips = 2 / dt_probe  # 2 views per sample
    log(f"host decode: {dt_probe * 1e3:.0f} ms/sample (2x{T} frames) = "
        f"{decode_clips:.1f} clips/s/core on {ncores} core(s)")
    # companion: the opt-in DCT-scaled decode rate (--fast_decode driver flag)
    source.fast_decode = True
    t0 = time.perf_counter()
    for i in range(n_probe):
        dataset(i % n_videos, rng)
    fast_clips = 2 * n_probe / (time.perf_counter() - t0)
    source.fast_decode = False
    log(f"host decode (fast_decode): {fast_clips:.1f} clips/s/core "
        f"({fast_clips / decode_clips:.2f}x)")

    # H2D probe: on this rig transfers ride the axon tunnel (~tens of MB/s
    # vs ~20 GB/s PCIe on a real TPU host) — measured so the end-to-end
    # number can be attributed
    probe = np.zeros((B, 2 * T, 171, 128, 3), np.uint8)
    d = jax.device_put(probe)
    _ = float(jnp.sum(d[:1, 0, 0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    d = jax.device_put(probe)
    _ = float(jnp.sum(d[:1, 0, 0, 1].astype(jnp.float32)))
    h2d_mbps = probe.nbytes / (time.perf_counter() - t0) / 1e6
    log(f"H2D: {h2d_mbps:.0f} MB/s for a {probe.nbytes / 1e6:.0f} MB batch")

    loader = HostLoader(dataset, B, shuffle=True, seed=0,
                        num_workers=max(2, 2 * ncores), drop_last=True)
    key = jax.random.PRNGKey(1)
    n_steps, clips = 0, 0
    t0 = time.perf_counter()
    lookahead = None
    for epoch in range(1000):
        for b in loader.epoch(epoch):
            frames = jax.device_put(b["frames"])
            if lookahead is not None:
                params, batch_stats, opt_state, loss = train_step(
                    params, batch_stats, opt_state, lookahead,
                    jax.random.fold_in(key, n_steps))
                n_steps += 1
                clips += B * 2
            lookahead = frames
            if n_steps >= 4:
                break
        if n_steps >= 4:
            break
    _ = float(loss)
    dt = time.perf_counter() - t0
    achieved = clips / dt
    return achieved, decode_clips, ncores, h2d_mbps, fast_clips


def _run_check_in_thread(fn, deadline_s: float, tag: str) -> dict:
    """Run a device self-check IN-PARENT (child processes open a second
    relay session that starves on single-session days — Aug 20: both checks
    timed out as children right after the parent measured 832 clips/s) in a
    daemon thread joined with a deadline. A wedged check is abandoned, not
    the bench: by the time checks run the headline record is stashed in
    _STAGE['record'], main() exits via os._exit so an abandoned thread
    cannot block interpreter teardown, and the watchdog prints the real
    record if even this thread bookkeeping wedges."""
    import threading

    box: dict = {}

    def _go():
        try:
            box["result"] = fn()
        except Exception as e:
            box["result"] = {"error": f"{tag} failed: {str(e)[:300]}"}

    t = threading.Thread(target=_go, daemon=True)
    t.start()
    t.join(deadline_s)
    if "result" not in box:
        _STAGE["abandoned_check"] = True
        box["result"] = {"error": f"{tag} wedged past {deadline_s:.0f}s "
                                  "(abandoned in-parent)"}
    log(f"{tag}:", box["result"])
    return box["result"]


def softdtw_device_check(deadline_s: float = 600.0) -> dict:
    """Continuous re-verification of the Pallas soft-DTW kernels vs the XLA
    oracle on whatever backend the bench runs on (the PARITY bit-exactness
    claim; reference self-check pattern utils/soft_dtw_cuda.py:373-409)."""
    def _check():
        here = os.path.dirname(os.path.abspath(__file__))
        sys.path.insert(0, os.path.join(here, "scripts"))
        import softdtw_device_check as sc
        fwd, bwd, impl = sc.run_check(verbose=False)
        return {"impl": impl, "fwd_err": fwd, "bwd_err": bwd,
                "exact": fwd == 0.0 and bwd == 0.0}

    return {"softdtw_check": _run_check_in_thread(
        _check, deadline_s, "softdtw check")}


def aug_fused_device_check(deadline_s: float = 600.0) -> dict:
    """Re-verify the fused aug kernel against the unfused pipeline on the
    actual device (same pattern as the soft-DTW check): same key => same
    random decisions, so outputs must agree to f32 chain tolerance."""
    def _check():
        here = os.path.dirname(os.path.abspath(__file__))
        sys.path.insert(0, os.path.join(here, "scripts"))
        import aug_fused_device_check as ac
        # attribute=True proves the max_err is the unfused blur's bf16 MXU
        # operands (residual with an f32-blur reference must collapse) —
        # the record carries {op, bound, rationale} per round-4 VERDICT #6
        err, err32 = ac.run_check(attribute=True)
        return {"max_err": err, "ok": err < 0.2 and err32 < 5e-3,
                "attribution": ac.attribution(err, err32),
                "backend": jax.default_backend()}

    return {"aug_fused_check": _run_check_in_thread(
        _check, deadline_s, "fused aug check")}


def main():
    # must fire BEFORE the driver's own ~25 min timeout (BENCH_r03 rc 124)
    # so a mid-run relay wedge still yields a parseable error record
    _arm_watchdog(float(os.environ.get("BENCH_DEADLINE_S", "1200")))
    _STAGE["stage"] = "preflight"
    # the probe includes a real compute (devices() alone returned while
    # compute hung in one observed wedge mode). It runs IN THIS PROCESS:
    # the axon sitecustomize dials the relay at interpreter start, so a
    # child-process probe opens a SECOND relay session that can starve
    # behind the parent's (observed Aug 20: back-to-back child preflights
    # timed out at 120/150/300s while single-session probes took 10-73s on
    # the same degraded-but-alive relay). A daemon timer prints the error
    # record and hard-exits if init truly wedges — the relay dial is a
    # network wait that releases the GIL, so the timer thread runs.
    pf = _preflight_inparent(float(os.environ.get("BENCH_PREFLIGHT_S", "300")))
    if "error" in pf:
        log("backend preflight failed:", pf["error"])
        print(json.dumps(_error_record(pf["error"])), flush=True)
        return
    log(f"backend preflight ok: {pf['backend']} x{pf['n']}")

    from dualvar_tpu.aug.pipeline import AugConfig
    from dualvar_tpu.models.ssl.simclr import SimCLRNaked
    from dualvar_tpu.train.tasks import total_loss
    import dualvar_tpu.aug.pipeline as P

    _STAGE["stage"] = "train_step"

    # B=128 is the measured throughput frontier on v5e: B=192 fits once the
    # fused aug kernel removed the staged f32 intermediates, but scales
    # sublinearly (472.7 vs 307.3 ms best-of-3 = 812 vs 833 clips/s, round 4;
    # an earlier 923 clips/s reading was an RTT-overcorrection artifact).
    # The candidate list keeps an OOM fallback for smaller-HBM parts.
    T, H0, W0 = 16, 171, 128
    img = 112
    batch_candidates = (128, 64)
    model = SimCLRNaked(network="r3d", dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    # fused Pallas aug kernel (ops/aug_fused.py): one VMEM-resident pass for
    # crop->jitter->blur->normalize; f32 out (f32 aug-out measured faster
    # than bf16 out on v5e for the unfused path; fused re-measured equal)
    aug_cfg = AugConfig(img_dim=img, seq_len=T, fused="auto",
                        jitter_order="sample")  # driver default

    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, 2, T, img, img, 3), jnp.float32)
    variables = model.init({"params": rng}, example, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))
    opt_state = tx.init(params)

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

    # forward-FLOP estimate from XLA for the baseline model (per-clip, so any
    # batch size gives the same denominator; use the first candidate)
    def fwd_only(p, bs, block):
        ret, _ = model.apply({"params": p, "batch_stats": bs}, block,
                             train=True, mutable=["batch_stats"])
        return total_loss(ret)

    try:
        bc = batch_candidates[0]
        block_shape = jax.ShapeDtypeStruct((bc, 2, T, img, img, 3),
                                           jnp.float32)
        cost = jax.jit(fwd_only).lower(params, batch_stats, block_shape) \
            .compile().cost_analysis()
        f_fwd_total = float(cost.get("flops", 0.0)) / bc
    except Exception as e:  # cost analysis is best-effort
        log("cost_analysis failed:", e)
        f_fwd_total = 0.0

    # warmup (compile) then timed steps. NOTE on timing: under the axon relay
    # block_until_ready is unreliable; a host transfer (float()) is the only
    # hard barrier and costs one tunnel round trip. Time a chain of donated
    # steps (each consumes the previous outputs, so the final loss transitively
    # waits on all of them) with a single final float(), minus a measured RTT.
    key = jax.random.PRNGKey(1)
    _STAGE["stage"] = "compile"
    for B in batch_candidates:
        frames = jax.device_put(
            np.random.default_rng(0).integers(0, 255, (B, 2 * T, H0, W0, 3),
                                              dtype=np.uint8))
        try:
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, frames, key)
            log(f"compiled B={B}; warmup loss", float(loss))
            break
        except Exception as e:
            # donated args are consumed even on failure paths; rebuild state
            if B == batch_candidates[-1]:
                raise
            log(f"B={B} failed ({type(e).__name__}: {str(e)[:200]}); "
                f"falling back")
            variables = model.init({"params": rng}, example, train=True)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
            opt_state = tx.init(params)
    _STAGE["stage"] = "timing"

    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, 0].astype(jnp.float32)) + i)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    # best of 3 chains: the relay adds 10-25% run-to-run noise; the best
    # chain measures the chip, the others the tunnel
    n_steps, chains = 20, 3
    dts = []
    for c in range(chains):
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, frames,
                jax.random.fold_in(key, 100 + c * n_steps + i))
        final = float(loss)
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    dt = min(dts)

    clips_per_sec = B * 2 * n_steps / dt
    log(f"step {dt / n_steps * 1e3:.1f} ms best-of-{chains} "
        f"(all: {', '.join(f'{d / n_steps * 1e3:.1f}' for d in dts)} ms; "
        f"rtt {rtt * 1e3:.0f} ms), "
        f"{clips_per_sec:.1f} clips/s, final loss {final:.3f}")

    if f_fwd_total > 0:
        f_fwd_per_clip = f_fwd_total / 2  # f_fwd_total is per-sample (2 views)
        a100_est = 0.45 * 156e12 / (3.0 * f_fwd_per_clip)
        # the denominator is ANALYTIC; its one free parameter is the assumed
        # A100 TF32 utilisation. Publish the sensitivity band so the ratio
        # is honest: 35% (good real-world cuDNN 3D-conv), 45% (generous,
        # the headline assumption), 55% (near cuDNN best-case).
        a100_band = {
            f"vs_baseline_at_{int(u * 100)}pct_a100_util":
                round(clips_per_sec / (u * 156e12 / (3.0 * f_fwd_per_clip)), 3)
            for u in (0.35, 0.45, 0.55)
        }
        log(f"fwd {f_fwd_per_clip / 1e9:.1f} GFLOP/clip, "
            f"A100 reference estimate {a100_est:.1f} clips/s "
            f"(sensitivity: {a100_band})")
    else:
        a100_est = float("nan")
        a100_band = {}

    if "--input-pipeline" in sys.argv:
        (achieved, decode_clips, ncores, h2d_mbps,
         fast_clips) = input_pipeline_bench(
            step, params, batch_stats, opt_state, B, T)
        need = clips_per_sec / max(decode_clips, 1e-9)
        # bytes/clip of uint8 frames -> H2D-sustainable clip rate
        clip_bytes = T * 171 * 128 * 3
        h2d_clips = h2d_mbps * 1e6 / clip_bytes
        record = {
            "metric": "clips/sec/chip pretrain fed by the real input path "
                      "(JPEG files -> native decode -> HostLoader -> H2D)",
            "value": round(achieved, 2),
            "unit": "clips/s/chip",
            "vs_baseline": round(achieved / clips_per_sec, 3),
            "resident_batch_clips_per_sec": round(clips_per_sec, 2),
            "host_decode_clips_per_sec_per_core": round(decode_clips, 2),
            "fast_decode_clips_per_sec_per_core": round(fast_clips, 2),
            "host_cores": ncores,
            "cores_to_saturate_chip": round(need, 1),
            "h2d_MBps": round(h2d_mbps, 1),
            "h2d_sustainable_clips_per_sec": round(h2d_clips, 1),
            "note": "this rig: 1 host core and H2D over the axon tunnel; "
                    "a real v5e host (112 cores, PCIe ~20GB/s) is not "
                    "pipeline-bound at these per-core/per-byte rates",
        }
        log(f"input-pipeline-fed: {achieved:.1f} clips/s "
            f"({achieved / clips_per_sec:.1%} of resident-batch); "
            f"~{need:.0f} cores would saturate the chip; tunnel H2D caps at "
            f"{h2d_clips:.0f} clips/s")
        with open("BENCH_PIPELINE.json", "w") as f:
            json.dump(record, f, indent=1)
        print(json.dumps(record))
        return

    record = {
        "metric": "clips/sec/chip pretrain (R3D-18 SimCLR, 16x112^2, bf16, "
                  "full train step incl. on-device aug)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / a100_est, 3)
        if a100_est == a100_est else None,
        **a100_band,
        "batch_size": B,
        "backend": jax.default_backend(),
    }
    # the headline is measured: from here on the watchdog prints THIS record
    # (annotated) rather than an error record, whatever wedges below
    _STAGE["record"] = record

    # kernel self-checks AFTER the headline measurement, in-parent (see
    # _run_check_in_thread) so they share this process' relay session; each
    # is deadline-bounded and abandoned on wedge — never the metric
    _STAGE["stage"] = "softdtw_check"
    check_s = float(os.environ.get("BENCH_CHECK_S", "240"))
    softdtw_info = softdtw_device_check(check_s)
    _STAGE["stage"] = "aug_fused_check"
    if _STAGE.get("abandoned_check"):
        # the backend is wedged in an abandoned thread — a second in-parent
        # check would block on the same device lock
        aug_info = {"aug_fused_check": {
            "error": "skipped: softdtw check wedged the backend"}}
    else:
        aug_info = aug_fused_device_check(check_s)

    record = {**record, **softdtw_info, **aug_info}
    if jax.default_backend() != "cpu":  # only real-hardware runs are citable
        _save_last_good(record)
    print(json.dumps(record), flush=True)
    if _STAGE.get("abandoned_check"):
        os._exit(0)  # don't let an abandoned check thread block teardown


if __name__ == "__main__":
    main()
