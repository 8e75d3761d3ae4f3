"""Synthetic pangenome-scale variation-graph generator (chr20-class
shapes: linear backbone with SNP bubbles), shared by the CI scale test
and bench_biggraph.py."""

import numpy as np

from graphaligner_tpu.graph.bigraph import graph_from_vg
from graphaligner_tpu.io import vg

BASES = np.array(list("ACGT"))


def make_big_graph(n_segments, seg_len=8, bubble_every=4, seed=11):
    """Backbone of n_segments nodes (seg_len bp) with a SNP bubble after
    every bubble_every-th segment. Returns (AlignmentGraph, backbone
    node ids, backbone sequence string). Bigraph nodes ≈ n_segments *
    (1 + 1/bubble_every); digraph nodes = 2x that."""
    rng = np.random.default_rng(seed)
    nodes = []
    edges = []
    backbone = []
    nid = 0
    prev_tails = []
    seqs = []
    for i in range(n_segments):
        seq = "".join(rng.choice(BASES, seg_len))
        nid += 1
        nodes.append(vg.Node(id=nid, sequence=seq))
        backbone.append(nid)
        seqs.append(seq)
        for t in prev_tails:
            edges.append(vg.Edge(from_=t, to=nid))
        if (i % bubble_every) == bubble_every - 1 and i + 1 < n_segments:
            # SNP alternative to the NEXT segment's first base handled as
            # a 1bp bubble node in parallel with a 1bp anchor
            alt_seq = str(rng.choice(BASES))
            nid += 1
            nodes.append(vg.Node(id=nid, sequence=alt_seq))
            prev_tails = [backbone[-1]]
            # bubble: backbone[-1] -> {anchor(next seg), alt -> next seg}
            edges.append(vg.Edge(from_=backbone[-1], to=nid))
            prev_tails = [backbone[-1], nid]
        else:
            prev_tails = [backbone[-1]]
        # flush into vg.Graph chunks to bound list sizes
    graph = graph_from_vg([vg.Graph(node=nodes, edge=edges)])
    return graph, backbone, "".join(seqs)


def make_reads(backbone_seq, n_reads, read_len, graph, backbone,
               seg_len=8, err=0.03, seed=5):
    """Reads sampled from the backbone with substitution errors + the
    matching (node, pos0, fw) seed for each."""
    rng = np.random.default_rng(seed)
    reads = []
    for i in range(n_reads):
        start = int(rng.integers(0, len(backbone_seq) - read_len - 1))
        # snap to a segment boundary so the seed node/readpos pair is easy
        start -= start % seg_len
        sub = list(backbone_seq[start : start + read_len])
        n_err = int(err * read_len)
        for p in rng.integers(0, read_len, n_err):
            sub[p] = str(rng.choice(BASES))
        seed_node = backbone[start // seg_len]
        reads.append((f"bigread{i}", "".join(sub), seed_node))
    return reads


def make_big_vg_multi(n_segments, n_components, seg_len=8, bubble_every=4,
                      seed=11):
    """n_components DISJOINT replicas (id-offset copies) of a
    chr-class backbone+bubble graph, as raw vg lists — the
    component-sharded pangenome bench shape (each replica = one
    chromosome-like connected component). Returns
    (vg_chunks, node_bp, edges, per_comp) where per_comp[k] =
    (backbone ids, backbone sequence) of component k."""
    rng = np.random.default_rng(seed)
    per_seg = n_segments // n_components
    nodes, edges_vg, edges = [], [], []
    node_bp = {}
    per_comp = []
    nid = 0
    for k in range(n_components):
        backbone = []
        seqs = []
        prev_tails = []
        for i in range(per_seg):
            seq = "".join(rng.choice(BASES, seg_len))
            nid += 1
            nodes.append(vg.Node(id=nid, sequence=seq))
            node_bp[nid] = seg_len
            backbone.append(nid)
            seqs.append(seq)
            for t in prev_tails:
                edges_vg.append(vg.Edge(from_=t, to=nid))
                edges.append((t, nid))
            if (i % bubble_every) == bubble_every - 1 and i + 1 < per_seg:
                alt_seq = str(rng.choice(BASES))
                nid += 1
                nodes.append(vg.Node(id=nid, sequence=alt_seq))
                node_bp[nid] = 1
                edges_vg.append(vg.Edge(from_=backbone[-1], to=nid))
                edges.append((backbone[-1], nid))
                prev_tails = [backbone[-1], nid]
            else:
                prev_tails = [backbone[-1]]
        per_comp.append((backbone, "".join(seqs)))
    chunks = [vg.Graph(node=nodes, edge=edges_vg)]
    return chunks, node_bp, edges, per_comp
