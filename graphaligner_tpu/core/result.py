"""Alignment result and trace types (reference GraphAlignerWrapper.h:11-50)."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from ..io import vg

INT32_MAX = 2**31 - 1


class TraceMatchType(enum.IntEnum):
    MATCH = 1
    MISMATCH = 2
    INSERTION = 3
    DELETION = 4
    FORWARDBACKWARDSPLIT = 5


@dataclass
class TraceItem:
    node_id: int
    offset: int
    reverse: bool
    readpos: int
    type: TraceMatchType
    graph_char: str
    read_char: str


class LazyTrace(list):
    """Trace-item list materialized on first access — the per-step
    TraceItem construction (getTraceInfo, GraphAligner.h:690-780) costs
    ~1ms/read in Python, and is only needed when trace files are
    actually written."""

    def __init__(self, thunk):
        super().__init__()
        self._thunk = thunk

    def _materialize(self):
        if self._thunk is not None:
            self.extend(self._thunk())
            self._thunk = None

    def __iter__(self):
        self._materialize()
        return super().__iter__()

    def __len__(self):
        self._materialize()
        return super().__len__()

    def __getitem__(self, i):
        self._materialize()
        return super().__getitem__(i)

    def __bool__(self):
        self._materialize()
        return super().__len__() > 0


@dataclass
class AlignmentResult:
    alignment: vg.Alignment = field(default_factory=vg.Alignment)
    alignment_failed: bool = True
    cells_processed: int = 0
    elapsed_milliseconds: int = 0
    alignment_start: int = 0
    alignment_end: int = 0
    trace: list = field(default_factory=list)


def empty_alignment(elapsed_ms: int, cells_processed: int) -> AlignmentResult:
    aln = vg.Alignment(score=INT32_MAX)
    return AlignmentResult(
        alignment=aln,
        alignment_failed=True,
        cells_processed=cells_processed,
        elapsed_milliseconds=elapsed_ms,
    )
