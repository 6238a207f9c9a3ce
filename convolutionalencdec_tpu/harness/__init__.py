"""Test/benchmark harnesses — the TPU-native equivalents of the
reference's L4 executables (SURVEY.md §1): BER validation (berTestK7),
throughput benches (speedEncode/speedDecode)."""

from .ber import (
    BER_EXPECTED_K7,
    ber_point,
    ber_sweep,
    run_reference_ber_test,
)

__all__ = [
    "BER_EXPECTED_K7",
    "ber_point",
    "ber_sweep",
    "run_reference_ber_test",
]
