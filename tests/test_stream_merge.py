"""Streaming GAM writer/reader and the ordinal-ordered shard merge.

The multi-host merge must (a) reconstruct the single-process output
order even when some reads emit NO message (no seeds / failed
alignment), and (b) run in O(1) memory in corpus size (VERDICT r2
items: merge correctness + true streaming)."""

import os
import subprocess
import sys

import pytest

from graphaligner_tpu.io import stream, vg
from graphaligner_tpu.parallel import distributed


def _payloads(n, tag=b"p"):
    return [
        tag + str(i).encode() * ((i % 7) + 1) + b"x" * (i % 53) for i in range(n)
    ]


@pytest.mark.parametrize("n", [0, 3, 1000, 2345])
def test_payload_stream_writer_bytes_identical(tmp_path, n):
    """PayloadStreamWriter must produce byte-identical files to the
    one-shot write_payloads (same framing groups, same gzip stream)."""
    pl = _payloads(n)
    a = str(tmp_path / "a.gam")
    b = str(tmp_path / "b.gam")
    stream.write_payloads(a, pl)
    w = stream.PayloadStreamWriter(b)
    for p in pl:
        w.write(p)
    assert w.close() == n
    assert open(a, "rb").read() == open(b, "rb").read()


def test_iter_payloads_file_matches_iter_messages(tmp_path):
    pl = _payloads(2100)
    path = str(tmp_path / "x.gam")
    stream.write_payloads(path, pl)
    # tiny chunk size forces every incremental code path (varints and
    # payloads straddling chunk boundaries)
    got = list(stream.iter_payloads_file(path, chunk_size=37))
    assert got == pl

    # multi-member gzip (two files concatenated)
    two = str(tmp_path / "two.gam")
    with open(two, "wb") as f:
        f.write(open(path, "rb").read())
        f.write(open(path, "rb").read())
    assert list(stream.iter_payloads_file(two, chunk_size=101)) == pl + pl
    with open(two, "rb") as f:
        assert list(stream.iter_messages(f.read())) == pl + pl

    # uncompressed framed bytes
    raw = str(tmp_path / "raw.bin")
    with open(raw, "wb") as f:
        f.write(stream.frame_payloads(pl))
    assert list(stream.iter_payloads_file(raw, chunk_size=64)) == pl


def test_merge_shards_by_ordinal_with_missing_reads(tmp_path):
    """Reads that emit no message must not shift later reads out of the
    single-process order (the round-robin interleave bug)."""
    pc = 3
    n_reads = 11
    # global traversal order: read k; reads 1, 4, 5, 9 fail (no message)
    fails = {1, 4, 5, 9}
    payload_of = {k: f"read{k}".encode() * 3 for k in range(n_reads)}
    out = str(tmp_path / "all.gam")
    for pi in range(pc):
        ordinals = [
            k for k in range(pi, n_reads, pc) if k not in fails
        ]
        stream.write_payloads(
            distributed.shard_path(out, pi), [payload_of[k] for k in ordinals]
        )
        with open(distributed.ordinal_path(out, pi), "w") as f:
            f.write("".join(f"{k}\n" for k in ordinals))
    n = distributed.merge_shards(out, pc)
    expect = [payload_of[k] for k in range(n_reads) if k not in fails]
    assert n == len(expect)
    solo = str(tmp_path / "solo.gam")
    stream.write_payloads(solo, expect)
    assert open(out, "rb").read() == open(solo, "rb").read()


def test_write_shard_ordinals_name_matching(tmp_path):
    class A:  # minimal alignment stand-in
        def __init__(self, name):
            self.name = name

    out = str(tmp_path / "x.gam")
    # shard (traversal order) = reads r0 r3 r6 r9 of a 2-stride split,
    # r3 emitted nothing
    ids = ["r0", "r3", "r6", "r9"]
    path = distributed.write_shard_ordinals(
        out, 1, 2, ids, [A("r0"), A("r6"), A("r9")]
    )
    assert open(path).read().split() == ["1", "5", "7"]


_RSS_SCRIPT = r"""
import resource, sys
sys.path.insert(0, sys.argv[1])
tmp = sys.argv[2]
from graphaligner_tpu.io import stream
from graphaligner_tpu.parallel import distributed

N, SZ = 40000, 1000  # 2 shards x 40 MB raw payloads
out = tmp + "/big.gam"
for pi in range(2):
    w = stream.PayloadStreamWriter(distributed.shard_path(out, pi))
    with open(distributed.ordinal_path(out, pi), "w") as f:
        for j in range(N):
            w.write(("%08d" % (pi + 2 * j)).encode() * (SZ // 8))
            f.write(str(pi + 2 * j) + "\n")
    w.close()
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
n = distributed.merge_shards(out, 2)
assert n == 2 * N, n
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(base, peak)
"""


def test_merge_is_streaming_in_memory(tmp_path):
    """Peak RSS growth of the merge must be far below the corpus size
    (80 MB of payloads here; the old merge held them all)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "rss.py"
    script.write_text(_RSS_SCRIPT)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(script), repo, str(tmp_path)],
        capture_output=True,
        timeout=300,
        env=env,
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    base_kb, peak_kb = map(int, r.stdout.split())
    growth_mb = (peak_kb - base_kb) / 1024
    assert growth_mb < 25, f"merge grew RSS by {growth_mb:.0f} MB"
    # and the merged bytes equal the one-shot writer's
    merged = open(str(tmp_path / "big.gam"), "rb").read()
    expect = [
        ("%08d" % k).encode() * (1000 // 8) for k in range(2 * 40000)
    ]
    one = str(tmp_path / "one.gam")
    stream.write_payloads(one, expect)
    assert merged == open(one, "rb").read()
