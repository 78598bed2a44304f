"""Observability and host-side utilities."""

from voicesplit_tpu.utils.logging import MetricsLogger
