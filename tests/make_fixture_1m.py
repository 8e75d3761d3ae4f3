"""Generate the 1Mbp-read fixture (tests/fixtures/longsim/mega):
a ~600k-segment synthetic variation graph (~4.8Mbp backbone), 2 reads
of 1,000,000bp simulated by the reference SimulateReads binary, and the
reference Aligner's alignments as goldens — both the plain -b 35 run
and a -b 5 -B 20 run whose 5% error rate forces bandwidth-ramp rewinds
and HMM cuts mid window-chain (VERDICT r3 item 7: long-mode chaining at
10x the previously tested 100kb depth). Mirrors make_fixture_100k.py;
run once on a box with /tmp/refbuild/bin present."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFBIN = "/tmp/refbuild/bin"
HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures", "longsim", "mega")


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import numpy as np

    from biggraph_util import BASES
    from graphaligner_tpu.io import stream, vg

    os.makedirs(OUT, exist_ok=True)
    graph_path = os.path.join(OUT, "graph.vg")

    rng = np.random.default_rng(29)
    n_segments, seg_len, bubble_every = 600_000, 8, 4
    nodes, edges, prev_tails = [], [], []
    nid = 0
    for i in range(n_segments):
        seq = "".join(rng.choice(BASES, seg_len))
        nid += 1
        nodes.append(vg.Node(id=nid, sequence=seq))
        for t in prev_tails:
            edges.append(vg.Edge(from_=t, to=nid))
        head = nid
        if (i % bubble_every) == bubble_every - 1 and i + 1 < n_segments:
            alt_seq = str(rng.choice(BASES))
            nid += 1
            nodes.append(vg.Node(id=nid, sequence=alt_seq))
            edges.append(vg.Edge(from_=head, to=nid))
            prev_tails = [head, nid]
        else:
            prev_tails = [head]
    stream.write_messages(graph_path, [vg.Graph(node=nodes, edge=edges)])
    print(f"graph: {len(nodes)} nodes, {seg_len * n_segments} bp backbone")

    subprocess.run(
        [
            f"{REFBIN}/SimulateReads",
            graph_path,
            os.path.join(OUT, "truth.gam"),
            os.path.join(OUT, "reads.fastq"),
            "2",
            "1000000",
            "0.05",
            "0.05",
            os.path.join(OUT, "seeds.gam"),
            "0.05",
        ],
        check=True,
    )
    for name, extra in (
        ("golden_b35.gam", ["-b", "35"]),
        ("golden_b5B20.gam", ["-b", "5", "-B", "20"]),
    ):
        subprocess.run(
            [
                f"{REFBIN}/Aligner",
                "-g", graph_path,
                "-f", os.path.join(OUT, "reads.fastq"),
                "-s", os.path.join(OUT, "seeds.gam"),
                "-a", os.path.join(OUT, name),
                "-t", "1",
            ] + extra,
            check=True,
            cwd=OUT,
        )
        print("golden:", name)
    os.remove(os.path.join(OUT, "truth.gam"))
    print("done:", OUT)


if __name__ == "__main__":
    main()
