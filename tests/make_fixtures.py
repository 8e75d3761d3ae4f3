"""Generate differential-test fixtures.

Builds synthetic variation graphs (vg format), simulates reads with the
reference SimulateReads binary, and aligns them with the reference
Aligner binary (NDEBUG build in /tmp/refbuild/bin) to produce golden
GAMs. Run manually when fixtures need regeneration:

    python tests/make_fixtures.py

The generated graphs/reads/goldens are committed under tests/fixtures/.
"""

import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from graphaligner_tpu.io import stream, vg  # noqa: E402

REFBIN = "/tmp/refbuild/bin"
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def make_bubble_graph(rng, n_segments=60, seg_len=25, bubble_prob=0.4):
    """Linear backbone with SNP/indel bubbles — a small variation graph."""
    bases = "ACGT"
    nodes = []
    edges = []
    next_id = 1

    def add_node(seq):
        nonlocal next_id
        nodes.append(vg.Node(id=next_id, sequence=seq))
        next_id += 1
        return next_id - 1

    prev_tails = []
    for _ in range(n_segments):
        seg = "".join(rng.choice(bases) for _ in range(rng.randint(10, seg_len)))
        nid = add_node(seg)
        for t in prev_tails:
            edges.append(vg.Edge(from_=t, to=nid))
        if prev_tails or len(nodes) == 1:
            pass
        if rng.random() < bubble_prob:
            # bubble: two alternatives after this segment
            alt_a = add_node("".join(rng.choice(bases) for _ in range(rng.randint(1, 8))))
            alt_b = add_node("".join(rng.choice(bases) for _ in range(rng.randint(1, 8))))
            edges.append(vg.Edge(from_=nid, to=alt_a))
            edges.append(vg.Edge(from_=nid, to=alt_b))
            prev_tails = [alt_a, alt_b]
        else:
            prev_tails = [nid]
    return vg.Graph(node=nodes, edge=edges)


def make_cyclic_gfa(path, rng, n_nodes=20):
    """A GFA with a repeat cycle (tests SCC fixpoint paths)."""
    bases = "ACGT"
    with open(path, "w") as f:
        seqs = {}
        for i in range(1, n_nodes + 1):
            seqs[i] = "".join(rng.choice(bases) for _ in range(rng.randint(8, 20)))
            f.write(f"S\t{i}\t{seqs[i]}\n")
        for i in range(1, n_nodes):
            f.write(f"L\t{i}\t+\t{i+1}\t+\t0M\n")
        # back edge forming a cycle over nodes 8..12, plus a self-loop-ish
        f.write("L\t12\t+\t8\t+\t0M\n")
        f.write(f"L\t{n_nodes}\t+\t1\t+\t0M\n")


def run(cmd, **kw):
    print("+", " ".join(cmd))
    return subprocess.run(cmd, check=True, capture_output=True, **kw)


def main():
    rng = random.Random(42)
    os.makedirs(os.path.join(FIXTURES, "sim"), exist_ok=True)
    simdir = os.path.join(FIXTURES, "sim")

    graph_path = os.path.join(simdir, "bubbles.vg")
    g = make_bubble_graph(rng)
    stream.write_messages(graph_path, [g])
    print(f"graph: {len(g.node)} nodes, {sum(len(n.sequence) for n in g.node)} bp")

    make_cyclic_gfa(os.path.join(simdir, "cyclic.gfa"), rng)

    # simulate reads (reference binary; seeds truth too)
    run(
        [
            f"{REFBIN}/SimulateReads",
            graph_path,
            f"{simdir}/truth.gam",
            f"{simdir}/sim.fastq",
            "20",
            "600",
            "0.05",
            "0.05",
            f"{simdir}/seeds.gam",
            "0.05",
        ]
    )

    # golden alignments at two bandwidth configs
    for name, args in {
        "golden_b35": ["-b", "35"],
        "golden_b5_B20": ["-b", "5", "-B", "20"],
    }.items():
        outdir = os.path.join(simdir, name)
        os.makedirs(outdir, exist_ok=True)
        run(
            [
                f"{REFBIN}/Aligner",
                "-g",
                graph_path,
                "-f",
                f"{simdir}/sim.fastq",
                "-s",
                f"{simdir}/seeds.gam",
                "-a",
                f"{outdir}/out.gam",
                "-t",
                "1",
            ]
            + args,
            cwd=outdir,
        )

    # gwws_fail_ex1.vg: the reference repo's historical crash-regression
    # graph (/root/reference/test/gwws_fail_ex1.vg — a ~296bp bubble
    # chain that broke a past engine). Simulate short reads over it and
    # golden both bandwidth configs (test_gwws.py byte-identity).
    gwwsdir = os.path.join(FIXTURES, "gwws")
    os.makedirs(gwwsdir, exist_ok=True)
    gwws_graph = os.path.join(FIXTURES, "gwws_fail_ex1.vg")
    run(
        [
            f"{REFBIN}/SimulateReads",
            gwws_graph,
            f"{gwwsdir}/truth.gam",
            f"{gwwsdir}/sim.fastq",
            "12",
            "250",
            "0.05",
            "0.05",
            f"{gwwsdir}/seeds.gam",
            "0.05",
        ]
    )
    for name, args in {
        "golden_b35": ["-b", "35"],
        "golden_b5_B20": ["-b", "5", "-B", "20"],
    }.items():
        outdir = os.path.join(gwwsdir, name)
        os.makedirs(outdir, exist_ok=True)
        run(
            [
                f"{REFBIN}/Aligner",
                "-g", gwws_graph,
                "-f", f"{gwwsdir}/sim.fastq",
                "-s", f"{gwwsdir}/seeds.gam",
                "-a", f"{outdir}/out.gam",
                "-t", "1",
            ]
            + args,
            cwd=outdir,
        )

    # PickSeedHits goldens (test_tools.py byte-identity)
    run(
        [
            f"{REFBIN}/PickSeedHits",
            f"{simdir}/pick_seeds_golden_cap2.gam",
            "2",
            f"{simdir}/seeds.gam",
        ]
    )
    run(
        [
            f"{REFBIN}/PickSeedHits",
            f"{simdir}/pick_seeds_golden_cap1_multi.gam",
            "1",
            f"{simdir}/seeds.gam",
            f"{simdir}/seeds_rc.gam",
        ]
    )
    print("done")


if __name__ == "__main__":
    main()
