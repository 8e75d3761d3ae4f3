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
    comp_id, num_comps = _scc_fast(out_ptr, out_idx, n)
    if comp_id is None:
        comp_id, num_comps = tarjan_scc(out_ptr, out_idx)
    comp_size = np.bincount(comp_id, minlength=num_comps)
    comp_cyclic = comp_size > 1
    # self-loops make single-node components cyclic too (vectorized)
    if len(out_idx):
        src_nodes = np.repeat(
            np.arange(n, dtype=np.int64), np.diff(out_ptr)
        )
        self_loops = src_nodes[src_nodes == out_idx]
        comp_cyclic[comp_id[self_loops]] = True
    topo_node_order = np.lexsort((np.arange(n), comp_id))
    return comp_id, num_comps, comp_cyclic, topo_node_order


def _scc_fast(out_ptr, out_idx, n):
    """scipy SCC (C speed — the Python Tarjan takes minutes at pangenome
    scale). scipy does not document a topological label order, so the
    result is verified (every cross-component edge ascending) and
    renumbered by Kahn's algorithm when needed; falls back to the Python
    Tarjan when scipy is absent."""
    if n == 0:
        return None, 0
    try:
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import connected_components
    except Exception:
        return None, 0
    m = csr_matrix(
        (np.ones(len(out_idx), dtype=np.int8), out_idx, out_ptr),
        shape=(n, n),
    )
    num, labels = connected_components(
        m, directed=True, connection="strong", return_labels=True
    )
    labels = labels.astype(np.int64)
    src_nodes = np.repeat(np.arange(n, dtype=np.int64), np.diff(out_ptr))
    cs, cd = labels[src_nodes], labels[out_idx]
    cross = cs != cd
    if not np.any(cross) or np.all(cs[cross] < cd[cross]):
        return labels, num
    if np.all(cs[cross] > cd[cross]):
        return (num - 1) - labels, num
    # arbitrary labels: topo-number the condensation DAG (Kahn)
    cs, cd = cs[cross], cd[cross]
    indeg = np.bincount(cd, minlength=num)
    order = np.argsort(cd, kind="stable")
    cd_s, cs_s = cd[order], cs[order]
    ptr = np.zeros(num + 1, dtype=np.int64)
    np.add.at(ptr, cd_s + 1, 1)
    # build out-adjacency of the comp DAG instead
    order = np.argsort(cs, kind="stable")
    cs_s, cd_s = cs[order], cd[order]
    cptr = np.zeros(num + 1, dtype=np.int64)
    np.add.at(cptr, cs_s + 1, 1)
    cptr = np.cumsum(cptr)
    new_id = np.full(num, -1, dtype=np.int64)
    from collections import deque

    q = deque(np.nonzero(indeg == 0)[0].tolist())
    nxt = 0
    while q:
        c = q.popleft()
        new_id[c] = nxt
        nxt += 1
        for e in range(cptr[c], cptr[c + 1]):
            t = cd_s[e]
            indeg[t] -= 1
            if indeg[t] == 0:
                q.append(t)
    assert nxt == num
    return new_id[labels], num
