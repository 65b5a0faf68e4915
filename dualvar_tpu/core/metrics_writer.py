"""Metric sinks: JSONL scalars + images + optional async TensorBoard.

The reference writes tensorboardX scalars AND images from a background
thread (utils/tensorboard_utils.py:4-28 PlotterThread, whose do_work
dispatches on the 'scalar'/'image' data_type) under local/ and global/
namespaces discovered from the model's loss dict (pretrain.py:460-482).
Here a JSONL file is the primary machine-readable scalar sink (one object
per scalar) and PNG files under ``{log_dir}/img/`` the primary image sink,
with tensorboardX behind the same queue when available.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time

import numpy as np


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
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

    def add_image(self, tag: str, image, step: int):
        """Queue an image (reference PlotterThread.add_data(...,
        data_type='image'), tensorboard_utils.py:17). ``image`` is (H, W, C)
        or (H, W), float in [0, 1] or uint8; written as
        ``{log_dir}/img/{tag}_{step}.png`` (tag path-sanitized) and mirrored
        to TensorBoard when available."""
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        self._q.put(("image", tag, img, int(step)))

    def _write_image(self, tag: str, img: np.ndarray, step: int):
        img_dir = os.path.join(self.log_dir, "img")
        os.makedirs(img_dir, exist_ok=True)
        safe = tag.replace("/", "_").replace(" ", "_")
        path = os.path.join(img_dir, f"{safe}_{step}.png")
        try:
            from PIL import Image

            Image.fromarray(img).save(path)
        except ImportError:  # PIL is optional at the library boundary
            np.save(path.replace(".png", ".npy"), img)
        if self._tb is not None:
            chw = img[None] if img.ndim == 2 else img.transpose(2, 0, 1)
            self._tb.add_image(tag, chw, step)

    def _drain(self):
        while True:
            kind, tag, value, step = self._q.get()
            if kind == "stop":
                return
            try:
                if kind == "image":
                    self._write_image(tag, value, step)
                    continue
                self._jsonl.write(
                    json.dumps({"tag": tag, "value": value, "step": step,
                                "ts": time.time()}) + "\n"
                )
                self._jsonl.flush()
                if self._tb is not None:
                    self._tb.add_scalar(tag, value, step)
            except Exception as e:  # a bad item must not kill the sink
                # (disk full, unwritable img dir, TB failure): later
                # scalars/images still matter more than this one
                print(f"[metrics_writer] dropped {kind} {tag!r}: {e}",
                      flush=True)

    def close(self):
        self._q.put(("stop", "", 0.0, 0))
        self._thread.join(timeout=5)
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
