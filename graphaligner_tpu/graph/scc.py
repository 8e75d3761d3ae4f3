"""Strongly-connected components and topological order (host precompute).

The reference runs an iterative Tarjan over the *banded subgraph on every
slice* (GraphAligner.h:1751-1901, called at 2352-2359). The TPU design
moves this to graph-load time: one whole-graph SCC condensation whose
component ids and topological order are static device arrays; per-slice
band processing then orders nodes by component topo rank and only runs a
fixpoint for components marked cyclic.
"""

from __future__ import annotations

import numpy as np


def tarjan_scc(out_ptr: np.ndarray, out_idx: np.ndarray) -> tuple[np.ndarray, int]:
    """Iterative Tarjan SCC.

    Args:
      out_ptr: CSR row pointers, shape [N+1].
      out_idx: CSR column indices (out-neighbors), shape [E].

    Returns:
      (comp_id[N], num_components) with components numbered in *reverse
      topological order of discovery* — Tarjan emits components in
      reverse topological order, so comp_id c has edges only into
      components with id < c ... i.e. ascending comp_id is a valid
      reverse-topo order; we re-number so ascending id = topological
      (sources first).
    """
    n = len(out_ptr) - 1
    index = np.full(n, -1, dtype=np.int64)
    lowlink = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp_id = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    next_index = 0
    num_comps = 0

    # Explicit DFS stack of (node, edge-cursor) to avoid recursion limits
    # on pangenome-scale graphs.
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, out_ptr[root])]
        index[root] = lowlink[root] = next_index
        next_index += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, cursor = work[-1]
            if cursor < out_ptr[v + 1]:
                work[-1] = (v, cursor + 1)
                w = out_idx[cursor]
                if index[w] == -1:
                    index[w] = lowlink[w] = next_index
                    next_index += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, out_ptr[w]))
                elif on_stack[w]:
                    if index[w] < lowlink[v]:
                        lowlink[v] = index[w]
            else:
                work.pop()
                if work:
                    parent = work[-1][0]
                    if lowlink[v] < lowlink[parent]:
                        lowlink[parent] = lowlink[v]
                if lowlink[v] == index[v]:
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        comp_id[w] = num_comps
                        if w == v:
                            break
                    num_comps += 1

    # Tarjan numbers components in reverse topological order; flip so that
    # ascending component id is a topological order (sources first).
    comp_id = (num_comps - 1) - comp_id
    return comp_id, num_comps


def condensation(
    out_ptr: np.ndarray, out_idx: np.ndarray
) -> tuple[np.ndarray, int, np.ndarray, np.ndarray]:
    """SCC condensation summary.

    Returns:
      comp_id[N]      — topologically-numbered component per node
      num_comps       — number of components
      comp_cyclic[C]  — True if the component has a cycle (size > 1 or
                        a self-loop)
      topo_node_order[N] — node indices sorted by (comp_id, node index):
                        a topological processing order for the DP.
    """
    n = len(out_ptr) - 1
    comp_id, num_comps = tarjan_scc(out_ptr, out_idx)
    comp_size = np.bincount(comp_id, minlength=num_comps)
    comp_cyclic = comp_size > 1
    # self-loops make single-node components cyclic too
    for v in range(n):
        for e in range(out_ptr[v], out_ptr[v + 1]):
            if out_idx[e] == v:
                comp_cyclic[comp_id[v]] = True
    topo_node_order = np.lexsort((np.arange(n), comp_id))
    return comp_id, num_comps, comp_cyclic, topo_node_order
