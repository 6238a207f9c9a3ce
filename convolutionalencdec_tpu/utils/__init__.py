"""Utilities: telemetry, code description."""

from .telemetry import ThroughputMeter, describe

__all__ = ["ThroughputMeter", "describe"]
