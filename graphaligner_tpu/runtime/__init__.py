"""Driver / runtime layer (reference L3: Aligner.cpp, AlignerMain.cpp)."""

from .aligner import align_reads  # noqa: F401
