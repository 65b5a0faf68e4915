"""Metric sinks: JSONL scalars + optional async TensorBoard.

The reference writes tensorboardX scalars from a background thread
(utils/tensorboard_utils.py:4-28 PlotterThread) under local/ and global/
namespaces discovered from the model's loss dict (pretrain.py:460-482).
Here a JSONL file is the primary machine-readable sink (one object per
scalar), with tensorboardX behind the same queue when available.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir=log_dir)
            except ImportError:
                pass
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def add_scalar(self, tag: str, value: float, step: int):
        self._q.put(("scalar", tag, float(value), int(step)))

    def _drain(self):
        while True:
            kind, tag, value, step = self._q.get()
            if kind == "stop":
                return
            self._jsonl.write(
                json.dumps({"tag": tag, "value": value, "step": step,
                            "ts": time.time()}) + "\n"
            )
            self._jsonl.flush()
            if self._tb is not None:
                self._tb.add_scalar(tag, value, step)

    def close(self):
        self._q.put(("stop", "", 0.0, 0))
        self._thread.join(timeout=5)
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
