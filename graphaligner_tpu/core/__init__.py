"""Alignment engine core (reference L2).

oracle    — exact scalar slice DP: the behavioral specification (and test
            oracle) for the vectorized engines
band      — score-based band projection
hmm       — 2-state alignment-correctness HMM
table     — slice/table dataclasses
backtrace — predecessor walk and trace assembly
align     — seed-and-extend / full-band orchestration
result    — AlignmentResult and trace items
"""

from .params import AlignerParams  # noqa: F401
from .result import AlignmentResult, TraceItem, TraceMatchType  # noqa: F401
