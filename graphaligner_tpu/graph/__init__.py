"""Graph preprocessing layer (reference L1).

bigraph   — bidirected vg/GFA → doubled digraph conversion
alignment_graph — the runtime graph index as flat numpy/device arrays
scc       — SCC condensation + topological order (host-side precompute)
bluntify  — overlap-GFA → blunt-ended GFA conversion tool support
"""

from .alignment_graph import AlignmentGraph  # noqa: F401
from .bigraph import (  # noqa: F401
    graph_from_gfa_file,
    graph_from_vg_file,
    load_alignment_graph,
)
