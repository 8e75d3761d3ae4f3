"""Generate the ONT-error tier fixture (tests/fixtures/ont): 10kb reads
at ~18% total error (6% sub / 6% ins / 6% del) over the longsim
variation graph — the error regime the correctness-estimation HMM's
constants assume (AlignmentCorrectnessEstimation.cpp:6-8), so ramping
(-b 5 -B 20) fires heavily. Reference-binary goldens at both bandwidth
configs. Run manually when the fixture needs regeneration:

    python tests/make_fixture_ont.py   (needs /tmp/refbuild/bin)
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REFBIN = "/tmp/refbuild/bin"
LS = os.path.join(HERE, "fixtures", "longsim")
OUT = os.path.join(HERE, "fixtures", "ont")


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, **kw)


def main():
    os.makedirs(OUT, exist_ok=True)
    graph = os.path.join(LS, "graph.vg")
    run(
        [
            f"{REFBIN}/SimulateReads",
            graph,
            f"{OUT}/truth.gam",
            f"{OUT}/reads.fastq",
            "25",
            "10000",
            "0.06",
            "0.06",
            f"{OUT}/seeds.gam",
            "0.06",
        ]
    )
    for name, args in {
        "golden_b35.gam": ["-b", "35"],
        "golden_b5B20.gam": ["-b", "5", "-B", "20"],
    }.items():
        workdir = os.path.join(OUT, "work_" + name.split(".")[0])
        os.makedirs(workdir, exist_ok=True)
        run(
            [
                f"{REFBIN}/Aligner",
                "-g", graph,
                "-f", f"{OUT}/reads.fastq",
                "-s", f"{OUT}/seeds.gam",
                "-a", os.path.join(OUT, name),
                "-t", "1",
            ]
            + args,
            cwd=workdir,
        )
    # the per-read sidecar files aren't fixtures; keep only the .gam
    import shutil

    for name in os.listdir(OUT):
        if name.startswith("work_"):
            shutil.rmtree(os.path.join(OUT, name))
    print("done")


if __name__ == "__main__":
    main()
