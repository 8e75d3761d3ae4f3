"""Pallas TPU kernel: bit-parallel exhaustive-mode alignment DP.

The production realization of the reference's Myers bit-parallel column
advance (GraphAligner.h getNextSlice:1349-1427), TPU-native:

- Each 64-row DP word is a pair of uint32 lanes (TPUs have no native
  64-bit integers); every word op runs across the whole read batch on
  the VPU — batch × 64 cells per vector op, vs 64 on the reference CPU.
- The column loop runs *inside* the kernel with all state in
  VMEM/registers, avoiding XLA's per-iteration loop overhead.
- Node-start columns (the graph joins, ~10% of steps) are merged in
  score space under `lax.cond` predication: in-neighbor columns are
  expanded from their packed bits, advanced, min-folded, re-packed
  (replacing the reference's differenceMasks SWAR merge,
  WordSlice.h:361-421, with a form the VPU handles directly).

Exhaustive-mode simplification (every cell in the previous band): the
horizontal boundary input hin = R[t] - R[pred] is provably in {-1,0,+1}
(R[t] = min(old_end[t], R[pred]+1) and old slices satisfy their own
horizontal recurrence), so the reference's post-advance merge with a
uniform column (GraphAligner.h:1504-1509) is subsumed by seeding the
column's row -1 with the closed R[t].

Outputs match core.engine._align_batch_device bit-for-bit:
(vp_lo, vp_hi, vn_lo, vn_hi, sbs, score_end), each [S, P, B].
"""

from __future__ import annotations

import functools

import numpy as np

WORD_SIZE = 64
INF = np.int32(1 << 30)


def _u64(lo, hi):
    return (lo, hi)


def _build_eq_vectors(read_codes: np.ndarray, match_table: np.ndarray, num_slices: int):
    """Per-slice per-graph-code Eq bitvectors (reference BA/BT/BC/BG,
    GraphAligner.h:2337-2351), host-side.

    read_codes [B, S*64] uint8 → eq [S, 5, 2, B] uint32 (lo, hi)."""
    B = read_codes.shape[0]
    eq = np.zeros((num_slices, 5, 2, B), dtype=np.uint32)
    # match_rows [B, S*64, 5]
    match_rows = match_table[read_codes]
    for s in range(num_slices):
        rows = match_rows[:, s * WORD_SIZE : (s + 1) * WORD_SIZE, :]  # [B,64,5]
        bits_lo = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)
        for c in range(5):
            eq[s, c, 0] = (rows[:, :32, c] * bits_lo).sum(axis=1, dtype=np.uint32)
            eq[s, c, 1] = (rows[:, 32:, c] * bits_lo).sum(axis=1, dtype=np.uint32)
    return eq


def make_kernel(P: int, N: int, max_indeg: int, B_blk: int, num_slices: int):
    """Builds the pallas_call for fixed shapes."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _iotas():
        # created inside the kernel trace (pallas forbids captured consts)
        iota64 = jax.lax.broadcasted_iota(jnp.int32, (WORD_SIZE, B_blk), 0)
        return iota64, iota64.astype(jnp.uint32)

    def expand_bits(lo, hi):
        """[1,B] u32 pair → [64,B] int32 of bits.

        min/max computed on int32 (Mosaic lacks unsigned min/minui),
        shifts on uint32."""
        iota64, _ = _iotas()
        sh_lo = jnp.minimum(iota64, 31).astype(jnp.uint32)
        sh_hi = jnp.minimum(jnp.maximum(iota64 - 32, 0), 31).astype(jnp.uint32)
        lo_rows = (jnp.broadcast_to(lo, (WORD_SIZE, B_blk)) >> sh_lo) & 1
        hi_rows = (jnp.broadcast_to(hi, (WORD_SIZE, B_blk)) >> sh_hi) & 1
        return jnp.where(iota64 < 32, lo_rows, hi_rows).astype(jnp.int32)

    def pack_bits(rows):
        """[64,B] int32 0/1 → ([1,B] u32 lo, [1,B] u32 hi).

        Sums run in int32 (Mosaic lacks unsigned reductions); int32
        addition wraps, preserving the 32-bit pattern."""
        iota64, _ = _iotas()
        shifted = rows << (iota64 % 32)
        lo = jnp.sum(jnp.where(iota64 < 32, shifted, 0), axis=0, keepdims=True)
        hi = jnp.sum(jnp.where(iota64 >= 32, shifted, 0), axis=0, keepdims=True)
        return (
            jax.lax.bitcast_convert_type(lo, jnp.uint32),
            jax.lax.bitcast_convert_type(hi, jnp.uint32),
        )

    def cumsum_rows(x):
        iota64, _ = _iotas()
        k = 1
        while k < WORD_SIZE:
            x = x + jnp.where(iota64 >= k, pltpu.roll(x, k, axis=0), 0)
            k *= 2
        return x

    def cummin_rows(x):
        iota64, _ = _iotas()
        k = 1
        while k < WORD_SIZE:
            x = jnp.minimum(x, jnp.where(iota64 >= k, pltpu.roll(x, k, axis=0), INF))
            k *= 2
        return x

    def shift_down1(x, row0):
        """x[r-1] with row0 at r=0."""
        iota64, _ = _iotas()
        rolled = pltpu.roll(x, 1, axis=0)
        return jnp.where(iota64 == 0, jnp.broadcast_to(row0, x.shape), rolled)

    def kernel(
        # scalar prefetch
        code_sm, start_sm, source_sm, preds_sm, slot_sm,
        # inputs
        eq_ref,  # [1, 5, 2, B_blk] this slice's Eq vectors
        # outputs
        vp_lo_ref, vp_hi_ref, vn_lo_ref, vn_hi_ref, sbs_ref, send_ref,
        # scratch
        old_end_ref,  # [P, B_blk] i32 (persists across slices)
        store_ref,  # [N, 8, B_blk] i32 (bits bitcast to i32; sbs; send; E)
    ):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            old_end_ref[:] = jnp.zeros_like(old_end_ref)

        def col_step(t, carry):
            vp_lo, vp_hi, vn_lo, vn_hi, sbs, send, e_prev = carry
            code_t = code_sm[t]
            start_t = start_sm[t]
            source_t = source_sm[t]
            slot_t = slot_sm[t]
            old_end_t = old_end_ref[t, :][None, :]  # [1,B]
            eq_lo0 = eq_ref[0, code_t, 0, :][None, :]
            eq_hi = eq_ref[0, code_t, 1, :][None, :]

            def chain_branch(args):
                (vp_lo, vp_hi, vn_lo, vn_hi, sbs, send, e_prev) = args
                r_t = jnp.minimum(old_end_t, sbs + 1)
                e_t = (r_t == old_end_t).astype(jnp.int32)
                hin = r_t - sbs  # in {-1, 0, +1}
                # Eq bit0 gating: row-0 diagonal needs the predecessor's
                # sbs to exist (getNextSlice: "if (!scoreBeforeExists)")
                eq_lo = jnp.where(e_prev == 1, eq_lo0, eq_lo0 & ~jnp.uint32(1))
                eq_lo = jnp.where(hin < 0, eq_lo | 1, eq_lo)
                # Myers core on uint32 pairs
                xv_lo = eq_lo | vn_lo
                xv_hi = eq_hi | vn_hi
                t_lo = eq_lo & vp_lo
                t_hi = eq_hi & vp_hi
                sum_lo = t_lo + vp_lo
                carry_bit = (sum_lo < t_lo).astype(jnp.uint32)
                sum_hi = t_hi + vp_hi + carry_bit
                xh_lo = (sum_lo ^ vp_lo) | eq_lo
                xh_hi = (sum_hi ^ vp_hi) | eq_hi
                ph_lo = vn_lo | ~(xh_lo | vp_lo)
                ph_hi = vn_hi | ~(xh_hi | vp_hi)
                mh_lo = vp_lo & xh_lo
                mh_hi = vp_hi & xh_hi
                send_new = (
                    send
                    + ((ph_hi >> 31) & 1).astype(jnp.int32)
                    - ((mh_hi >> 31) & 1).astype(jnp.int32)
                )
                ph_hi = (ph_hi << 1) | (ph_lo >> 31)
                ph_lo = ph_lo << 1
                mh_hi = (mh_hi << 1) | (mh_lo >> 31)
                mh_lo = mh_lo << 1
                ph_lo = jnp.where(hin > 0, ph_lo | 1, ph_lo)
                mh_lo = jnp.where(hin < 0, mh_lo | 1, mh_lo)
                nvp_lo = mh_lo | ~(xv_lo | ph_lo)
                nvp_hi = mh_hi | ~(xv_hi | ph_hi)
                nvn_lo = ph_lo & xv_lo
                nvn_hi = ph_hi & xv_hi
                return (nvp_lo, nvp_hi, nvn_lo, nvn_hi, r_t, send_new, e_t)

            def start_branch(args):
                # score-space merge over in-neighbor columns
                iota64, _ = _iotas()
                eq_rows = expand_bits(eq_lo0, eq_hi)  # match bits [64,B]
                r_in = jnp.full((1, B_blk), INF, jnp.int32)
                merged = jnp.full((WORD_SIZE, B_blk), INF, jnp.int32)
                for k in range(max_indeg):
                    pred = preds_sm[t * max_indeg + k]
                    valid = pred >= 0
                    safe = jnp.maximum(pred, 0)
                    prow = store_ref[safe]  # [8, B]
                    p_vp_lo = prow[0][None, :].astype(jnp.uint32)
                    p_vp_hi = prow[1][None, :].astype(jnp.uint32)
                    p_vn_lo = prow[2][None, :].astype(jnp.uint32)
                    p_vn_hi = prow[3][None, :].astype(jnp.uint32)
                    p_sbs = prow[4][None, :]
                    p_e = prow[6][None, :]
                    deltas = expand_bits(p_vp_lo, p_vp_hi) - expand_bits(
                        p_vn_lo, p_vn_hi
                    )
                    p_scores = p_sbs + cumsum_rows(deltas)  # [64,B]
                    # advance: min(horizontal+1, diagonal+cost)
                    diag = shift_down1(p_scores, p_sbs)
                    cost = 1 - eq_rows
                    cost0 = jnp.where((eq_rows[0:1] == 1) & (p_e == 1), 0, 1)
                    cost = jnp.where(iota64 == 0, jnp.broadcast_to(cost0, cost.shape), cost)
                    adv = jnp.minimum(p_scores + 1, diag + cost)
                    adv = jnp.where(valid, adv, INF)
                    merged = jnp.minimum(merged, adv)
                    r_in = jnp.minimum(r_in, jnp.where(valid, p_sbs + 1, INF))
                r_t = jnp.minimum(old_end_t, r_in)
                e_t = (r_t == old_end_t).astype(jnp.int32)
                # vertical from own row -1; free-start match for band
                # sources at slice 0 (getSourceSliceFromStartMatch)
                row0 = jnp.minimum(merged[0:1], r_t + 1)
                sm_cost = jnp.where(eq_rows[0:1] == 1, 0, 1)
                row0 = jnp.minimum(
                    row0,
                    jnp.where((source_t == 1) & (s == 0), r_t + sm_cost, INF),
                )
                merged = jnp.where(
                    iota64 == 0, jnp.broadcast_to(row0, merged.shape), merged
                )
                merged = cummin_rows(merged - iota64) + iota64
                # repack to bits
                prev = shift_down1(merged, r_t)
                d = merged - prev
                nvp_lo, nvp_hi = pack_bits((d > 0).astype(jnp.int32))
                nvn_lo, nvn_hi = pack_bits((d < 0).astype(jnp.int32))
                return (nvp_lo, nvp_hi, nvn_lo, nvn_hi, r_t, merged[63:64], e_t)

            out = jax.lax.cond(start_t == 1, start_branch, chain_branch, carry)
            nvp_lo, nvp_hi, nvn_lo, nvn_hi, r_t, send_new, e_t = out

            # node store (last write per node wins = its last column)
            store_ref[slot_t, 0] = nvp_lo[0].astype(jnp.int32)
            store_ref[slot_t, 1] = nvp_hi[0].astype(jnp.int32)
            store_ref[slot_t, 2] = nvn_lo[0].astype(jnp.int32)
            store_ref[slot_t, 3] = nvn_hi[0].astype(jnp.int32)
            store_ref[slot_t, 4] = r_t[0]
            store_ref[slot_t, 5] = send_new[0]
            store_ref[slot_t, 6] = e_t[0]

            vp_lo_ref[0, t] = nvp_lo[0]
            vp_hi_ref[0, t] = nvp_hi[0]
            vn_lo_ref[0, t] = nvn_lo[0]
            vn_hi_ref[0, t] = nvn_hi[0]
            sbs_ref[0, t] = r_t[0]
            send_ref[0, t] = send_new[0]
            old_end_ref[t, :] = send_new[0]
            return out

        init = (
            jnp.zeros((1, B_blk), jnp.uint32),
            jnp.zeros((1, B_blk), jnp.uint32),
            jnp.zeros((1, B_blk), jnp.uint32),
            jnp.zeros((1, B_blk), jnp.uint32),
            jnp.full((1, B_blk), INF, jnp.int32),
            jnp.full((1, B_blk), INF, jnp.int32),
            jnp.zeros((1, B_blk), jnp.int32),
        )
        jax.lax.fori_loop(0, P, col_step, init)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1, num_slices),  # batch blocks handled by vmap-like outer calls
        in_specs=[
            pl.BlockSpec(
                (1, 5, 2, B_blk), lambda b, s, *_: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, P, B_blk), lambda b, s, *_: (s, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        * 6,
        scratch_shapes=[
            pltpu.VMEM((P, B_blk), jnp.int32),
            pltpu.VMEM((N, 8, B_blk), jnp.int32),
        ],
    )

    import jax

    S = num_slices

    def run(code, start, source, preds, slot, eq):
        import jax.numpy as jnp
        from jax.experimental import pallas as pl_  # noqa: F401

        out_shape = [
            jax.ShapeDtypeStruct((S, P, B_blk), jnp.uint32),
            jax.ShapeDtypeStruct((S, P, B_blk), jnp.uint32),
            jax.ShapeDtypeStruct((S, P, B_blk), jnp.uint32),
            jax.ShapeDtypeStruct((S, P, B_blk), jnp.uint32),
            jax.ShapeDtypeStruct((S, P, B_blk), jnp.int32),
            jax.ShapeDtypeStruct((S, P, B_blk), jnp.int32),
        ]
        from jax.experimental import pallas as plm

        return plm.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            compiler_params=__import__(
                "jax.experimental.pallas.tpu", fromlist=["x"]
            ).CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(code, start, source, preds, slot, eq)

    return run


@functools.lru_cache(maxsize=8)
def _cached_kernel(P, N, max_indeg, B_blk, num_slices):
    return make_kernel(P, N, max_indeg, B_blk, num_slices)


def align_exhaustive_pallas(sched, read_codes: np.ndarray, num_slices: int, match_table):
    """Drop-in computation matching engine._align_batch_device outputs.

    read_codes [B, num_slices*64]; B must currently equal the kernel block
    size (pad the batch to a multiple host-side)."""
    import jax
    import jax.numpy as jnp

    B = read_codes.shape[0]
    P = len(sched.cell_pos)
    eq = _build_eq_vectors(read_codes, match_table, num_slices)
    run = _cached_kernel(P, sched.num_nodes, sched.pred_nodes.shape[1], B, num_slices)
    out = run(
        jnp.asarray(sched.code),
        jnp.asarray(sched.is_start.astype(np.int32)),
        jnp.asarray(sched.is_source_start.astype(np.int32)),
        jnp.asarray(sched.pred_nodes.reshape(-1)),
        jnp.asarray(sched.node_slot),
        jnp.asarray(eq),
    )
    return out
