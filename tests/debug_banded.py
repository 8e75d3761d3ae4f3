"""Debug driver: differential-check engine_banded against the oracle."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from graphaligner_tpu.core import align as al
from graphaligner_tpu.core.align import _pad_to_word
from graphaligner_tpu.core.engine import _READ_CODE, encode_read
from graphaligner_tpu.core.engine_banded import (
    EMPTY,
    INF,
    BandedGraphTables,
    banded_scan,
    build_graph_tables,
    make_seed_carry,
)
from graphaligner_tpu.core.oracle import (
    compute_slice,
    make_initial_slice_one_node,
)
from graphaligner_tpu.core.band import project_forward_from_min_score
from graphaligner_tpu.graph import load_alignment_graph
from graphaligner_tpu.io import load_fastq
from graphaligner_tpu.io.stream import read_messages
from graphaligner_tpu.io import vg
from graphaligner_tpu.ops.packing import unpack_deltas_np

WORD = 64


def run_oracle_slices(graph, seq, node, bandwidth, num_slices):
    """Oracle get_table without ramping/HMM stopping: all slices."""
    last = make_initial_slice_one_node(graph, node)
    out = []
    for i in range(num_slices):
        band = project_forward_from_min_score(graph, last, bandwidth)
        s = compute_slice(graph, seq, i * WORD, band, last, i, bandwidth)
        out.append(s)
        last = s
    return out


def main():
    graph = load_alignment_graph("tests/fixtures/sim/bubbles.vg")
    reads = load_fastq("tests/fixtures/sim/sim.fastq")
    seeds = read_messages("tests/fixtures/sim/seeds.gam", vg.Alignment)
    seedmap = {}
    for s in seeds:
        seedmap[s.name] = (
            s.path.mapping[0].position.node_id,
            s.query_position,
            s.path.mapping[0].position.is_reverse,
        )
    tables = build_graph_tables(graph)
    Nm, Cm, bandwidth = 32, 448, 35
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from graphaligner_tpu.io.sequences import reverse_complement

    problems = []  # (seq, start_node)
    for r in reads[:n_reads]:
        node_id, pos, reverse = seedmap[r.seq_id]
        # forward + backward parts, like get_split_alignment
        if reverse:
            fw_node = graph.node_lookup[node_id * 2 + 1]
            bw_node = graph.node_lookup[node_id * 2]
        else:
            fw_node = graph.node_lookup[node_id * 2]
            bw_node = graph.node_lookup[node_id * 2 + 1]
        if pos < len(r.sequence) - 1:
            fw_seq = _pad_to_word(r.sequence[pos:])
            problems.append((fw_seq, fw_node, r.seq_id + ":fw"))
        if pos > 0:
            bw_seq = _pad_to_word(
                reverse_complement(r.sequence[: pos + graph.dbg_overlap])
            )
            problems.append((bw_seq, bw_node, r.seq_id + ":bw"))

    B = len(problems)
    S_max = max(len(p[0]) // WORD for p in problems)
    codes = np.full((B, S_max * WORD), _READ_CODE["N"], dtype=np.uint8)
    seq_len = np.zeros(B, dtype=np.int32)
    num_steps = np.zeros(B, dtype=np.int32)
    starts = np.zeros(B, dtype=np.int32)
    for i, (seq, node, _) in enumerate(problems):
        codes[i, : len(seq)] = encode_read(seq)
        seq_len[i] = len(seq)
        num_steps[i] = len(seq) // WORD
        starts[i] = node
    bw = np.full((S_max, B), bandwidth, dtype=np.int32)
    carry = make_seed_carry(tables, starts, Nm, Cm)
    out = banded_scan(
        *tables.device_args(),
        codes,
        seq_len,
        num_steps,
        np.zeros(B, dtype=np.int32),
        bw,
        *carry,
        S_max=S_max,
        Nm=Nm,
        Cm=Cm,
    )
    out = {k: np.asarray(v) for k, v in out.items()}

    nfail = 0
    for i, (seq, node, name) in enumerate(problems):
        oracle = run_oracle_slices(graph, seq, node, bandwidth, int(num_steps[i]))
        for s, osl in enumerate(oracle):
            if out["overflow"][s, i]:
                print(f"[{name}] slice {s}: OVERFLOW flagged")
                nfail += 1
                break
            dev_ids = out["band_ids"][s, :, i]
            dev_ids = sorted(int(x) for x in dev_ids if x != EMPTY)
            oset = sorted(osl.rows.keys())
            if dev_ids != oset:
                print(
                    f"[{name}] slice {s}: band mismatch\n  dev={dev_ids}\n  ora={oset}"
                )
                nfail += 1
                break
            if int(out["min_score"][s, i]) != osl.min_score:
                print(
                    f"[{name}] slice {s}: min {out['min_score'][s, i]} != {osl.min_score}"
                )
                nfail += 1
            if int(out["num_cells"][s, i]) != osl.num_cells:
                print(
                    f"[{name}] slice {s}: cells {out['num_cells'][s, i]} != {osl.num_cells}"
                )
                nfail += 1
            # per-cell comparison in topo-sorted node order
            order = np.argsort(tables.topo_rank[np.array(dev_ids)])
            nodes_sorted = [dev_ids[j] for j in order]
            c = 0
            cols = out["cols"][s, :, :, i].T  # [Cm, 7]
            bad = False
            for n in nodes_sorted:
                L = int(graph.node_len[n])
                seg = cols[c : c + L]
                rows = unpack_deltas_np(
                    seg[:, 0].astype(np.uint32),
                    seg[:, 1].astype(np.uint32),
                    seg[:, 2].astype(np.uint32),
                    seg[:, 3].astype(np.uint32),
                    seg[:, 4],
                ).T  # [64, L]
                orows = osl.rows[n]
                osbs = osl.sbs[n]
                oex = osl.sbs_exists[n]
                if not np.array_equal(seg[:, 4], osbs):
                    print(f"[{name}] slice {s} node {n}: sbs dev={seg[:,4]} ora={osbs}")
                    bad = True
                if not np.array_equal(rows, orows):
                    d = np.argwhere(rows != orows)
                    print(
                        f"[{name}] slice {s} node {n}: rows differ at {d[:4]}"
                        f" dev={rows[d[0][0], d[0][1]]} ora={orows[d[0][0], d[0][1]]}"
                    )
                    bad = True
                if not np.array_equal((seg[:, 6] & 1).astype(bool), oex):
                    print(
                        f"[{name}] slice {s} node {n}: exists dev={seg[:,6]} ora={oex.astype(int)}"
                    )
                    bad = True
                c += L
                if bad:
                    break
            if bad:
                nfail += 1
                break
        else:
            print(f"[{name}] {len(oracle)} slices OK")
    print("FAIL" if nfail else "ALL OK")
    return nfail


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
