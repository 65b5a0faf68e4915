"""Launch-and-retry helper for the 2-process jax.distributed scripts.

The gloo rendezvous has a ~30s context-init window that a loaded 1-core
rig can overrun (observed: both workers exit rc 1 with no output when the
full pytest suite runs alongside other compiles). A transient overrun must
not read as a code break, and a real break must be diagnosable: workers
run with captured output, every worker's log tail is printed on failure,
and the whole launch retries ONCE on a fresh port — a genuine failure
reproduces, a load flake doesn't.
"""

import os
import subprocess
import sys
import tempfile


def run_workers(script, n_proc, base_port, per_attempt_timeout, env,
                attempts=2, pre_attempt=None):
    """Spawn ``script worker <i> <port>`` n_proc times; retry once on a
    fresh port. Raises RuntimeError when every attempt fails."""
    for attempt in range(attempts):
        port = base_port + attempt
        if pre_attempt is not None:
            pre_attempt()
        logs, procs = [], []
        for i in range(n_proc):
            f = tempfile.NamedTemporaryFile(
                "w+", suffix=f"_w{i}.log", delete=False)
            logs.append(f)
            procs.append(subprocess.Popen(
                [sys.executable, "-u", script, "worker", str(i), str(port)],
                env=env, stdout=f, stderr=subprocess.STDOUT))
        codes = []
        for p in procs:
            try:
                codes.append(p.wait(timeout=per_attempt_timeout))
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
                codes.append("timeout")
        ok = codes == [0] * n_proc
        for i, f in enumerate(logs):
            f.flush()
            f.seek(0, os.SEEK_END)
            size = f.tell()
            tail = 2_000 if ok else 8_000
            f.seek(max(0, size - tail))
            text = f.read()
            label = f"--- worker {i} rc={codes[i]} (attempt {attempt}) ---"
            print(label, flush=True)
            print("\n".join(text.splitlines()[-(10 if ok else 60):]),
                  flush=True)
            f.close()
            os.unlink(f.name)
        if ok:
            return
        print(f"attempt {attempt} failed: codes={codes}"
              + ("" if attempt == attempts - 1 else " — retrying on a fresh port"),
              flush=True)
    raise RuntimeError(f"all {attempts} attempts failed")
