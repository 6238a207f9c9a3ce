"""Telemetry: throughput metering and run configuration reporting.

The reference's observability is printf-based: each harness prints the
code parameters at startup (berTestK7.c:56-64) and the speed benches
print a Mbps line roughly once per second from timespec deltas wrapped in
compiler barriers (speedEncode.c:25-35,84-103).  The TPU equivalents:
`describe` renders a CodeSpec the same way, and `ThroughputMeter`
implements the steady-state Mbps loop around device computations (the
device-side `block_until_ready` plays the role of the reference's asm
barriers: nothing is counted until results are actually materialized).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from ..params import CodeSpec


def describe(spec: CodeSpec) -> str:
    """Human-readable code parameter block (cf. berTestK7.c:56-64)."""
    g_oct = ", ".join(f"0o{gi:o}" for gi in spec.g)
    lines = [
        f"Convolutional code: K={spec.K}, k={spec.k}, n={spec.n}, "
        f"Rc={spec.k}/{spec.n}",
        f"  generators (Proakis MSB-first): [{g_oct}]",
        f"  states: {spec.num_states}, traceback_len: {spec.traceback_len}",
        f"  butterfly/poly-symmetry eligible: {spec.has_poly_symmetry}",
    ]
    return "\n".join(lines)


@dataclass
class ThroughputMeter:
    """Steady-state throughput meter (cf. speedEncode.c:64-103).

    Usage:
        meter = ThroughputMeter()
        while ...:
            out = step(...)          # device computation
            out.block_until_ready()
            line = meter.tick(bits_processed)
            if line: print(line)
    """
    report_every_s: float = 1.0
    _t0: float = field(default=0.0, init=False)
    _bits: int = field(default=0, init=False)
    _total_bits: int = field(default=0, init=False)
    _start: float = field(default=0.0, init=False)

    def __post_init__(self):
        self._t0 = self._start = time.perf_counter()

    def tick(self, bits: int) -> str | None:
        """Account `bits`; returns a rate line once per report interval."""
        self._bits += bits
        self._total_bits += bits
        now = time.perf_counter()
        dt = now - self._t0
        if dt >= self.report_every_s:
            rate = self._bits / dt / 1e6
            self._t0 = now
            self._bits = 0
            return f"{rate:.2f} Mbit/s"
        return None

    @property
    def average_mbps(self) -> float:
        dt = time.perf_counter() - self._start
        return self._total_bits / dt / 1e6 if dt > 0 else 0.0
