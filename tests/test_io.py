"""I/O layer tests: wire codec, vg messages, stream framing, FASTQ, GFA.

The smallexample fixtures are real files from the reference's test suite;
decoding them and re-encoding must round-trip.
"""

import gzip

import pytest

from graphaligner_tpu.io import fastq, gfa, sequences, stream, vg, wire


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**32 - 1, 2**63 - 1]:
        enc = wire.encode_varint(v)
        dec, pos = wire.decode_varint(enc, 0)
        assert dec == v and pos == len(enc)


def test_negative_int_varint():
    # Negative int32/int64 are sign-extended to 64 bits (10-byte varint).
    enc = wire.encode_varint(-1)
    assert len(enc) == 10
    dec, _ = wire.decode_signed_varint(enc, 0)
    assert dec == -1


def test_zigzag():
    for v in [0, -1, 1, -2, 2, -(2**31), 2**31 - 1]:
        enc = wire.encode_zigzag(v)
        dec, _ = wire.decode_zigzag(enc, 0)
        assert dec == v


def test_alignment_roundtrip():
    aln = vg.Alignment(
        name="read1",
        sequence="ACGT",
        score=3,
        query_position=5,
        path=vg.Path(
            mapping=[
                vg.Mapping(
                    position=vg.Position(node_id=42, is_reverse=True),
                    edit=[vg.Edit(from_length=4, to_length=4)],
                    rank=1,
                )
            ]
        ),
    )
    data = aln.encode()
    back = vg.Alignment.decode(data)
    assert back == aln
    assert back.path.mapping[0].position.node_id == 42


def test_encode_matches_protobuf_runtime(tmp_path):
    # Cross-check our hand-rolled encoder against the real protobuf
    # runtime using the schema recovered from the reference.
    pb2 = pytest.importorskip("google.protobuf")  # noqa: F841
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    proto_src_fields = None  # built inline below
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "vg_test.proto"
    fdp.package = "vgt"
    fdp.syntax = "proto3"
    msg = fdp.message_type.add()
    msg.name = "Position"
    for i, (name, typ) in enumerate(
        [("node_id", 3), ("offset", 3), ("unused3", 3), ("is_reverse", 8), ("name", 9)],
        start=1,
    ):
        f = msg.field.add()
        f.name = name
        f.number = i
        f.type = typ
        f.label = 1
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    cls = message_factory.GetMessageClass(pool.FindMessageTypeByName("vgt.Position"))
    ref = cls(node_id=12345, offset=-7, is_reverse=True, name="x")
    ours = vg.Position(node_id=12345, offset=-7, is_reverse=True, name="x")
    assert ours.encode() == ref.SerializeToString()


def test_read_smallexample_graph(smallexample_dir):
    graphs = stream.read_messages(str(smallexample_dir / "sub_test.vg"), vg.Graph)
    nodes = [n for g in graphs for n in g.node]
    edges = [e for g in graphs for e in g.edge]
    # The reference log's "38 nodes / 332bp / 50 edges" is post-doubling
    # (2×18+2 dummies, 2×165+2 dummy chars, 2×25); the raw bigraph is:
    assert len(nodes) == 18
    assert sum(len(n.sequence) for n in nodes) == 165
    assert len(edges) == 25
    assert all(set(n.sequence) <= set("ACGT") for n in nodes)


def test_read_smallexample_seed(smallexample_dir):
    alns = stream.read_messages(str(smallexample_dir / "seedalignment.gam"), vg.Alignment)
    assert len(alns) == 1
    a = alns[0]
    assert a.name == "read1"
    assert a.path.mapping[0].position.node_id == 6738
    assert a.query_position == 0


def test_stream_roundtrip(tmp_path):
    msgs = [vg.Alignment(name=f"r{i}", score=i) for i in range(5)]
    path = str(tmp_path / "x.gam")
    stream.write_messages(path, msgs)
    with open(path, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"  # gzipped
    back = stream.read_messages(path, vg.Alignment)
    assert back == msgs


def test_stream_reads_golden_gam(fixtures_dir):
    alns = stream.read_messages(str(fixtures_dir / "golden" / "seeded.gam"), vg.Alignment)
    assert len(alns) == 1
    assert alns[0].name == "read1"
    assert len(alns[0].path.mapping) >= 1


def test_fastq_loading(smallexample_dir):
    reads = fastq.load_fastq(str(smallexample_dir / "read.fastq"))
    assert len(reads) == 1
    assert reads[0].seq_id == "read1"
    assert len(reads[0].sequence) == 66
    assert reads[0].sequence.startswith("CAACAATTATC")


def test_fasta_loading(tmp_path):
    p = tmp_path / "x.fasta"
    p.write_text(">r1\nACGT\nTTAA\n>r2\nGGG\n")
    reads = fastq.load_fastq(str(p))
    assert len(reads) == 2
    assert reads[0].sequence == "ACGTTTAA"
    assert reads[0].quality == "!" * 8
    assert reads[1].sequence == "GGG"


def test_reverse_complement():
    assert sequences.reverse_complement("ACGT") == "ACGT"
    assert sequences.reverse_complement("AACGT") == "ACGTT"
    assert sequences.reverse_complement("acgtn") == "NACGT"
    assert sequences.reverse_complement("RYKMSWBDHV") == "BDHVWSKMRY"
    with pytest.raises(ValueError):
        sequences.reverse_complement("ACGX")


def test_characters_match():
    assert sequences.characters_match("A", "A")
    assert not sequences.characters_match("A", "T")
    assert sequences.characters_match("N", "G")
    assert sequences.characters_match("R", "A")
    assert sequences.characters_match("r", "G")
    assert not sequences.characters_match("R", "C")


def test_gfa_roundtrip(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_text("S\t1\tACGT\nS\t2\tGGCA\nL\t1\t+\t2\t+\t0M\n")
    g = gfa.GfaGraph.load(str(p))
    assert g.nodes == {1: "ACGT", 2: "GGCA"}
    assert g.edges[(1, True)] == [(2, True)]
    assert g.edge_overlap == 0
    out = tmp_path / "out.gfa"
    g.save(str(out))
    g2 = gfa.GfaGraph.load(str(out))
    assert g2.nodes == g.nodes and g2.edges == g.edges


def test_gfa_subgraph(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_text(
        "S\t1\tAC\nS\t2\tGG\nS\t3\tTT\nL\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\n"
    )
    g = gfa.GfaGraph.load(str(p))
    sub = g.subgraph({1, 2})
    assert set(sub.nodes) == {1, 2}
    assert sub.edges[(1, True)] == [(2, True)]
    assert (2, True) not in sub.edges or all(t[0] != 3 for t in sub.edges[(2, True)])


def test_native_codec_matches_python(smallexample_dir, tmp_path):
    """Native gzip/framing/FASTQ/GFA fast paths must agree with the
    pure-Python implementations."""
    from graphaligner_tpu.io import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    data = (smallexample_dir / "sub_test.vg").read_bytes()
    raw = native.gunzip(data)
    assert raw == stream._decompress_all(data)
    frames = native.frame_offsets(raw)
    assert frames is not None
    offsets, lengths = frames
    py_msgs = []
    pos = 0
    while pos < len(raw):
        count, pos = wire.decode_varint(raw, pos)
        for _ in range(count):
            size, pos = wire.decode_varint(raw, pos)
            py_msgs.append(raw[pos : pos + size])
            pos += size
    assert [raw[o : o + l] for o, l in zip(offsets, lengths)] == py_msgs
    # gzip round trip + truncation detection
    comp = native.gzip_bytes(raw)
    assert native.gunzip(comp) == raw
    with pytest.raises(ValueError):
        native.gunzip(comp[:20])
    # FASTQ: native vs python line parser
    p = tmp_path / "x.fastq"
    p.write_text("@r1\nACGT\n+\n!!!!\n@r2\nGG\n+\n!!\n")
    parsed = native.parse_reads(p.read_bytes(), False)
    assert parsed == [("r1", "ACGT", "!!!!"), ("r2", "GG", "!!")]
    fa = tmp_path / "x.fasta"
    fa.write_text(">r1\nAC\nGT\n>r2\nTT\n")
    parsed = native.parse_reads(fa.read_bytes(), True)
    assert parsed == [("r1", "ACGT", "!!!!"), ("r2", "TT", "!!")]
    # GFA tokenizer
    s, l = native.parse_gfa(b"S\t3\tACGT\nL\t3\t+\t4\t-\t5M\nS\t4\tTT\n")
    assert s == [(3, "ACGT"), (4, "TT")]
    assert l == [(3, False, 4, True, 5)]
