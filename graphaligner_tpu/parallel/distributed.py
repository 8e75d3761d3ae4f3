"""Multi-host orchestration: jax.distributed bring-up, per-host read
sharding, and GAM shard merging.

Mirrors the reference's single-machine structure at pod scale: the graph
index is replicated per host (component sharding is the pangenome-scale
follow-up), the read set is split across hosts (DCN) and across each
host's devices (ICI, parallel.mesh), each read's alignment stays on one
chip, and results are written as per-host GAM shards then concatenated —
the pod-scale analogue of the reference's per-thread result vectors +
final concat (Aligner.cpp:276-314).
"""

from __future__ import annotations

import os

from ..io import stream, vg


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> tuple:
    """Bring up jax.distributed (no-op for single-process runs).

    Returns (process_index, process_count)."""
    import jax

    if coordinator_address is not None:
        if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
            # CPU multi-process needs the gloo collectives client or the
            # backend stays single-process (process_count() == 1)
            try:
                jax.config.update(
                    "jax_cpu_collectives_implementation", "gloo"
                )
            except Exception:
                pass
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def shard_reads_for_host(reads: list, process_index: int, process_count: int) -> list:
    """Strided split of the read set across hosts — deterministic, no
    coordination needed (every host computes its own shard)."""
    return reads[process_index::process_count]


def shard_path(alignment_file: str, process_index: int) -> str:
    root, ext = os.path.splitext(alignment_file)
    return f"{root}.shard{process_index}{ext}"


def write_host_shard(alignment_file: str, alignments: list, process_index: int) -> str:
    path = shard_path(alignment_file, process_index)
    stream.write_messages(path, alignments)
    return path


def barrier(name: str = "ga-shards") -> None:
    """Block until every process reaches this point (host 0 must not
    merge before the other hosts finish writing their shards). No-op for
    single-process runs."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def merge_shards(alignment_file: str, process_count: int) -> int:
    """Merge per-host GAM shards into the final file (host 0, after
    barrier()) as a STREAM: raw message payloads are re-framed without
    protobuf decode/encode (decoding every alignment made host 0 the
    pangenome-scale bottleneck), and shards are interleaved round-robin
    to undo the strided read split, so the merged bytes equal a
    single-process run's output exactly. Returns the alignment count."""
    per_shard = []
    for i in range(process_count):
        with open(shard_path(alignment_file, i), "rb") as f:
            per_shard.append(list(stream.iter_messages(f.read())))
    merged = []
    for j in range(max(len(s) for s in per_shard) if per_shard else 0):
        for s in per_shard:
            if j < len(s):
                merged.append(s[j])
    stream.write_payloads(alignment_file, merged)
    return len(merged)
