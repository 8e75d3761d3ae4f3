"""Shared utilities: line-atomic logging, timing/metrics."""

from .logging import BufferedWriter  # noqa: F401
from .metrics import AlignMetrics  # noqa: F401
