"""Run logging: scalar writer + stdout logging setup + perf timing.

Equivalents of the reference observability stack (SURVEY.md §5):
  * ``SummaryWriter`` — TensorBoard-compatible scalar logging (reference logs losses
    and val metrics to TB, pc_nerf/trainer.py:617-623, 936-939). Scalars always go to
    a JSONL events file; if a real TensorBoard writer is importable it mirrors there.
  * ``default_log_setup`` — stdout + per-run log.txt (reference app/app_utils.py:13-28).
  * ``PerfTimer`` — checkpoint-style phase timer threaded through NeFs/tracers in the
    reference (wisp PerfTimer; --perf flag, config_parser.py:56). On TPU it also
    hooks ``jax.profiler`` trace dumps when activated with a trace dir.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional


def default_log_setup(level: int = logging.INFO, log_dir: Optional[str] = None):
    """stdout logging + optional per-run log.txt (app/app_utils.py:13-28)."""
    handlers = [logging.StreamHandler()]
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(log_dir, "log.txt")))
    logging.basicConfig(level=level, handlers=handlers, force=True,
                        format="%(asctime)s|%(levelname)8s| %(message)s")


class SummaryWriter:
    """Scalar event writer: JSONL always; TensorBoard if available."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "events.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter as TB
            self._tb = TB(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step), "wall": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_image(self, tag: str, img, step: int):
        """Validation-render image logging (--log-2d, reference
        config_parser.py:365 / trainer.py log_images). ``img`` is [H, W, 3]
        uint8. JSONL records the event (tag/step/shape) so headless runs keep
        an inspectable trace; the pixels go to TensorBoard when available."""
        import numpy as np
        img = np.asarray(img)
        self._f.write(json.dumps({"tag": tag, "image_shape": list(img.shape),
                                  "step": int(step), "wall": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class PerfTimer:
    """Phase checkpoint timer (wisp PerfTimer equivalent). ``activate=False`` makes
    every call a no-op, matching how the reference threads inactive timers through
    hot paths (pc_nerf/trainer.py:393). With ``trace_dir`` set, start()/stop() wrap
    a jax.profiler trace for device-side timing."""

    def __init__(self, activate: bool = False, trace_dir: Optional[str] = None):
        self.activate = activate
        self.trace_dir = trace_dir
        self._last = time.perf_counter()
        self.records = {}

    def reset(self):
        self._last = time.perf_counter()

    def check(self, name: str):
        if not self.activate:
            return
        now = time.perf_counter()
        dt = now - self._last
        self.records[name] = self.records.get(name, 0.0) + dt
        logging.getLogger("perf").info("%s: %.2fms", name, dt * 1000)
        self._last = now

    def start_trace(self):
        if self.activate and self.trace_dir:
            import jax
            jax.profiler.start_trace(self.trace_dir)

    def stop_trace(self):
        if self.activate and self.trace_dir:
            import jax
            jax.profiler.stop_trace()
