"""Data-parallel read sharding over a device mesh.

The unit of parallelism is a read (as in the reference's thread pool,
Aligner.cpp:290); here a batch of reads is sharded across the 'dp' mesh
axis. The graph index and column schedule are replicated per device
(sharding by connected component is the pangenome-scale follow-up), so
the alignment of one read never crosses a chip and the computation needs
zero collectives — results are gathered host-side exactly like the
reference's per-thread result vectors (Aligner.cpp:301-306).
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int | None = None, axis: str = "dp"):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_reads_aligner(graph, mesh, axis: str = "dp"):
    """Returns a function aligning a batch of encoded reads with the batch
    dimension sharded over the mesh and the graph replicated."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.engine import BatchAligner, _align_batch_device

    ba = BatchAligner(graph)
    batch_sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    sched_args = tuple(
        jax.device_put(jnp.asarray(x), replicated)
        for x in (
            ba.sched.code,
            ba.sched.is_start,
            ba.sched.is_source_start,
            ba.sched.pred_nodes,
            ba.sched.node_slot,
        )
    )

    def run(read_codes: np.ndarray, num_slices: int):
        codes = jax.device_put(jnp.asarray(read_codes), batch_sharding)
        return _align_batch_device(
            codes,
            *sched_args,
            num_slices=num_slices,
            num_nodes=ba.sched.num_nodes,
        )

    return ba, run


def shard_banded_scan(graph, mesh, Nm: int = 8, Cm: int = 64, axis: str = "dp"):
    """One banded DP round (core.engine_banded._banded_scan) sharded over
    the mesh: the problem batch is split along `axis` via shard_map, the
    graph tables are replicated, and every lane's band scan runs entirely
    on its device (zero collectives — the multi-chip layout mirrors the
    reference's independent per-thread reads, Aligner.cpp:290).

    Returns (tables, run) where run(codes, seq_lens, steps, start, bw,
    *seed_carry, S_max=...) -> the banded_scan output dict with the batch
    axis sharded."""
    import functools

    import jax
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..core.engine import _MATCH_TABLE
    from ..core.engine_banded import _banded_scan, build_graph_tables

    tables = build_graph_tables(graph)

    def run(codes, seq_lens, steps, start, bw, init_ids, init_send,
            init_nmin, init_nend, init_min, *, S_max: int):
        # use_pallas follows the backend (the production Mosaic cell
        # kernel runs under shard_map on TPU meshes; CPU meshes take the
        # XLA path) — the round-1 use_pallas=False pin is gone
        use_pallas = (
            jax.default_backend() != "cpu"
            and Nm <= 32
            and tables.k_in <= 5
        )
        fn = functools.partial(
            _banded_scan, S_max=S_max, Nm=Nm, Cm=Cm, use_pallas=use_pallas
        )
        rep = P()
        in_specs = (
            (rep,) * 6  # graph tables, replicated
            + (P(axis), P(axis), P(axis), P(axis), P(None, axis))
            + (P(axis), P(axis), P(axis), P(axis), P(axis))
            + (rep,)  # match table
        )
        out_specs = {
            "tie16": P(None, None, axis),
            "ids_sub": P(None, axis),
            "band_ids": P(None, None, axis),
            "node_min": P(None, None, axis),
            "node_end": P(None, None, axis),
            "min_score": P(None, axis),
            "num_cells": P(None, axis),
            "overflow": P(None, axis),
            "control": P(None, axis),
            "cols": P(None, None, None, axis),
            "sends": P(None, None, axis),
            "lens_tab": P(None, None, axis),
            "pred_tab": P(None, None, axis),
            "pred_prev": P(None, None, axis),
            "codes": P(None, None, axis),
        }
        try:
            sm = shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        except TypeError:  # older jax spelling
            sm = shard_map(
                fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_rep=False,
            )
        import jax.numpy as jnp

        args = tuple(jnp.asarray(a) for a in tables.device_args()) + (
            jnp.asarray(codes),
            jnp.asarray(seq_lens),
            jnp.asarray(steps),
            jnp.asarray(start),
            jnp.asarray(bw),
            jnp.asarray(init_ids),
            jnp.asarray(init_send),
            jnp.asarray(init_nmin),
            jnp.asarray(init_nend),
            jnp.asarray(init_min),
            jnp.asarray(_MATCH_TABLE),
        )
        return jax.jit(sm)(*args)

    return tables, run
