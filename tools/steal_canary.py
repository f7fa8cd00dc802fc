"""Mid-run host-steal canary for timed legs (round-4 protocol gap:
endpoint probe brackets cannot certify legs longer than ~1 min — a
210.8 s steal artifact once sailed through clean 150+ GFLOP/s
endpoint probes because the burst happened INSIDE the leg).

Instead of an in-band matmul (which competes for CPU with the very
32-thread job it is certifying, so its interior readings are
confounded by the leg's own load), this samples the kernel's
hypervisor-steal counter from ``/proc/stat``: per-interval
steal share = Δsteal / Δtotal ticks across all cpus — measured by the
kernel at zero cost, nonzero exactly when the hypervisor runs someone
else on our cores. Quiet-host baseline on this VM is ~1%; the round-4
artifact class shows up as interior intervals at tens of percent.

Usage::

    with StealCanary() as canary:
        ... timed leg ...
    record.update(canary.summary())          # steal_* keys + certified

    # or with auto-retry (VERDICT r4 next-round item 4):
    result, steal = run_certified(lambda: timed_leg(), retries=2)
"""

from __future__ import annotations

import threading
import time

# per-interval steal share above this marks the leg uncertified; the
# quiet-host baseline here is ~1%, the artifact class is >30%
DEFAULT_GATE_PCT = 10.0


def _ticks() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7]  # total ticks, steal ticks


class StealCanary:
    def __init__(self, interval_s: float = 5.0, gate_pct: float = DEFAULT_GATE_PCT):
        self.interval_s = interval_s
        self.gate_pct = gate_pct
        self._samples: list[float] = []  # per-interval steal pct
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self) -> None:
        prev_total, prev_steal = _ticks()
        while not self._stop.wait(self.interval_s):
            total, steal = _ticks()
            dt, ds = total - prev_total, steal - prev_steal
            prev_total, prev_steal = total, steal
            if dt > 0:
                self._samples.append(100.0 * ds / dt)

    def __enter__(self) -> "StealCanary":
        self._t0_total, self._t0_steal = _ticks()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval_s + 1)
        # close the final partial interval so short legs get >=1 sample
        total, steal = _ticks()
        dt = total - self._t0_total
        ds = steal - self._t0_steal
        self._whole_pct = 100.0 * ds / dt if dt > 0 else 0.0

    def summary(self) -> dict:
        mx = max(self._samples) if self._samples else self._whole_pct
        mean = (
            sum(self._samples) / len(self._samples)
            if self._samples
            else self._whole_pct
        )
        return {
            "steal_interval_s": self.interval_s,
            "steal_samples": len(self._samples),
            "steal_pct_whole": round(self._whole_pct, 2),
            "steal_pct_interior_max": round(mx, 2),
            "steal_pct_interior_mean": round(mean, 2),
            "steal_gate_pct": self.gate_pct,
            "steal_certified": bool(mx < self.gate_pct),
        }


def run_certified(
    fn,
    retries: int = 2,
    interval_s: float = 5.0,
    gate_pct: float = DEFAULT_GATE_PCT,
    cooloff_s: float = 30.0,
):
    """Run ``fn`` under a canary; re-run (after a cool-off) while the
    interior steal exceeds the gate and retries remain. Returns
    (last_result, canary_summary) — the summary says whether the
    returned timing is claimable."""
    last = None
    summary: dict = {}
    for attempt in range(retries + 1):
        with StealCanary(interval_s=interval_s, gate_pct=gate_pct) as c:
            last = fn()
        summary = c.summary()
        summary["steal_attempts"] = attempt + 1
        if summary["steal_certified"]:
            break
        if attempt < retries:
            time.sleep(cooloff_s)
    return last, summary
