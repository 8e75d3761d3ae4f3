"""Generate the 100kb-read fixture (tests/fixtures/longsim/huge):
a ~16k-segment synthetic variation graph (~128kb backbone), 3 reads of
100kb simulated by the reference SimulateReads binary, and the reference
Aligner's alignments as the golden. Mirrors the giant (30kb) fixture
recipe; run once on a box with /tmp/refbuild/bin present."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFBIN = "/tmp/refbuild/bin"
HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures", "longsim", "huge")


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import numpy as np

    from biggraph_util import BASES
    from graphaligner_tpu.io import stream, vg

    os.makedirs(OUT, exist_ok=True)
    graph_path = os.path.join(OUT, "graph.vg")

    # linear backbone with SNP bubbles (biggraph_util shape, sized so a
    # 100kb read fits with headroom)
    rng = np.random.default_rng(23)
    n_segments, seg_len, bubble_every = 60_000, 8, 4
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
            "4",
            "100000",
            "0.05",
            "0.05",
            os.path.join(OUT, "seeds.gam"),
            "0.05",
        ],
        check=True,
    )
    subprocess.run(
        [
            f"{REFBIN}/Aligner",
            "-g", graph_path,
            "-f", os.path.join(OUT, "reads.fastq"),
            "-s", os.path.join(OUT, "seeds.gam"),
            "-a", os.path.join(OUT, "golden.gam"),
            "-t", "1",
            "-b", "35",
        ],
        check=True,
        cwd=OUT,
    )
    os.remove(os.path.join(OUT, "truth.gam"))
    print("done:", OUT)


if __name__ == "__main__":
    main()
