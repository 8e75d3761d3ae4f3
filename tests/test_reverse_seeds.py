"""Reverse-orientation seeds against reference goldens.

The checked-in sim/longsim corpora carry only forward seeds (the
reference's own SimulateReads never sets is_reverse — reverse seeds
come from external minimizer tools via ReadIndexToId). This corpus
reverse-complements the sim reads and flips their seeds, exercising the
seed-orientation swap (fw node <-> rc node, GraphAligner.h:2969-3024)
end-to-end; goldens produced by the reference binary."""

import glob
import gzip

import pytest

from graphaligner_tpu.core.params import AlignerParams
from graphaligner_tpu.io import stream, vg
from graphaligner_tpu.runtime.aligner import align_reads

from pathlib import Path

SIM = Path(__file__).parent / "fixtures" / "sim"


@pytest.mark.parametrize("backend", ["oracle", "jax"])
def test_reverse_seeds_match_reference(tmp_path, backend):
    params = AlignerParams(
        graph_file=str(SIM / "bubbles.vg"),
        fastq_file=str(SIM / "reads_rc.fastq"),
        alignment_file=str(tmp_path / "out.gam"),
        seed_file=str(SIM / "seeds_rc.gam"),
        initial_bandwidth=35,
    )
    align_reads(params, log=lambda m: None, output_dir=str(tmp_path), backend=backend)
    golden_dir = SIM / "golden_b35_rev"
    for g in sorted(glob.glob(str(golden_dir / "trace_*"))):
        mine = tmp_path / Path(g).name
        assert mine.exists(), Path(g).name
        assert open(g, "rb").read() == open(mine, "rb").read(), Path(g).name
    golden = stream.read_messages(str(golden_dir / "out.gam"), vg.Alignment)
    mine = stream.read_messages(str(tmp_path / "out.gam"), vg.Alignment)
    assert [repr(a) for a in golden] == [repr(b) for b in mine]
    for g in sorted(glob.glob(str(golden_dir / "alignment_*"))):
        mine = tmp_path / Path(g).name
        assert gzip.open(g, "rb").read() == gzip.open(str(mine), "rb").read(), (
            Path(g).name
        )
