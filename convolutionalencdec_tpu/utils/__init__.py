"""Utilities: telemetry, code description."""

from .telemetry import (ThroughputMeter, describe,
                        kernel_traffic, traffic_report)

__all__ = ["ThroughputMeter", "describe"]
