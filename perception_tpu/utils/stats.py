"""Runtime statistics and stage timing.

Replaces the reference's EnvStats (utils/utils.h:114-120: scenes_rendered,
scenes_valid, time, icp_time, peak_gpu_mem) and the chrono span prints inside
render_cuda_multi_unified (renderer.cu:1526-1931). Device memory is tracked
via jax's live-buffer accounting when available.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@dataclasses.dataclass
class EnvStats:
    scenes_rendered: int = 0
    scenes_valid: int = 0
    expands: int = 0
    time: float = 0.0           # total recognition seconds
    input_time: float = 0.0
    gpu_time: float = 0.0       # device dispatch seconds
    icp_time: float = 0.0
    cost: int = -1
    peak_device_mem_mb: float = 0.0

    def update_peak_memory(self) -> None:
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats()
            if stats and "peak_bytes_in_use" in stats:
                self.peak_device_mem_mb = max(
                    self.peak_device_mem_mb,
                    stats["peak_bytes_in_use"] / 1e6)
        except Exception:
            pass


class StageTimer:
    """Named wall-clock spans: `with timer.span("render"): ...`."""

    def __init__(self):
        self.spans: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.spans[name] = self.spans.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {v:.3f}s/{self.counts[k]}" for k, v in self.spans.items())
