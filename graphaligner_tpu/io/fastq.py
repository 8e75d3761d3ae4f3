"""FASTA/FASTQ loading (reference: fastqloader.cpp).

Format selected by extension (.fastq/.fq → FASTQ, .fasta/.fa → FASTA,
fastqloader.cpp:63-70); CRLF tolerant; FASTA records get '!' qualities
(fastqloader.cpp:54-57). Multi-line FASTA sequences are concatenated.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .sequences import reverse_complement


@dataclass
class FastQ:
    seq_id: str = ""
    sequence: str = ""
    quality: str = ""

    def reverse_complement(self) -> "FastQ":
        return FastQ(
            seq_id=self.seq_id,
            sequence=reverse_complement(self.sequence),
            quality=self.quality[::-1],
        )


def _load_fastq(path: str) -> list[FastQ]:
    reads = []
    with open(path, "r") as f:
        lines = [ln.rstrip("\r\n") for ln in f]
    i = 0
    while i < len(lines):
        if not lines[i].startswith("@"):
            i += 1
            continue
        if i + 3 >= len(lines) + 1 and i + 1 >= len(lines):
            break
        seq_id = lines[i][1:]
        sequence = lines[i + 1] if i + 1 < len(lines) else ""
        quality = lines[i + 3] if i + 3 < len(lines) else ""
        reads.append(FastQ(seq_id=seq_id, sequence=sequence, quality=quality))
        i += 4
    return reads


def _load_fasta(path: str) -> list[FastQ]:
    reads = []
    current: FastQ | None = None
    with open(path, "r") as f:
        for raw in f:
            line = raw.rstrip("\r\n")
            if line.startswith(">"):
                if current is not None:
                    current.quality = "!" * len(current.sequence)
                    reads.append(current)
                current = FastQ(seq_id=line[1:])
            elif current is not None:
                current.sequence += line
    if current is not None:
        current.quality = "!" * len(current.sequence)
        reads.append(current)
    return reads


def load_fastq(path: str) -> list[FastQ]:
    """Load reads, format keyed by extension; unknown extensions → [].

    Uses the native parser (io.native) when available."""
    if path.endswith(".fastq") or path.endswith(".fq"):
        is_fasta = False
    elif path.endswith(".fasta") or path.endswith(".fa"):
        is_fasta = True
    else:
        return []
    from . import native

    with open(path, "rb") as f:
        data = f.read()
    parsed = native.parse_reads(data, is_fasta)
    if parsed is not None:
        return [FastQ(seq_id=n, sequence=s, quality=q) for n, s, q in parsed]
    return _load_fasta(path) if is_fasta else _load_fastq(path)
