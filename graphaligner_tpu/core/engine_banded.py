"""Banded seeded alignment engine on device (the reference's primary path).

TPU-first redesign of the reference's seed-and-extend banded DP
(GraphAligner.h getSqrtSlices/pickMethodAndExtendFill/calculateSlice,
2571-2856, 2331-2451). Where the reference processes one read per thread
with a dynamic per-slice node set, this engine runs a *batch* of
(read, seed) extension problems per device with fully static shapes:

- The band is a fixed-capacity node-slot list ([Nm] slots, topo-rank
  sorted) + a fixed-capacity cell array ([Cm] cells, node-major), with
  per-lane overflow flags routing oversized problems to bigger compiled
  buckets or the host oracle — the TPU analog of the reference's
  bitvector/alternate method switch (GraphAligner.h:2483).
- Band projection (reference projectForwardFromMinScore,
  GraphAligner.h:1110-1159) becomes a sort-based Bellman-Ford over the
  slot list: candidate generation via out-edge gathers, dedup-by-min via
  one `lax.sort` per relaxation round, iterated to fixpoint in a bounded
  `while_loop`.
- The slice DP is the bit-parallel Myers block advance on uint32 pairs
  (ops.wordops, reference getNextSlice GraphAligner.h:1349-1427) over a
  `lax.scan` of band cells; node joins merge via the differenceMasks bit
  algebra (WordSlice.h:361-421). Cells are processed in whole-graph SCC
  condensation topo-rank order (precomputed at graph load — replacing
  the reference's per-slice Tarjan, GraphAligner.h:2352), so acyclic
  bands converge in ONE pass; cyclic bands re-run the pass to a bounded
  fixpoint (the reference's UniqueQueue/confirmedRows loop,
  GraphAligner.h:2360-2427).
- All data-dependent control flow (per-lane slice counts, band sizes,
  cyclicity) is masks, not branches; the HMM/bandwidth-ramping control
  loop of getSqrtSlices runs host-side in float64 between batched rounds
  (see core.batch_align), consuming only the tiny per-slice
  (min_score, num_cells) records.

Scores use INF = 2^20 as "outside the band"; all word columns stay valid
(|row delta| <= 1) so the merge/advance bit algebra is exact throughout.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..graph.alignment_graph import AlignmentGraph
from ..graph.scc import condensation
from .engine import _MATCH_TABLE
from .params import WORD_SIZE

INF = np.int32(1 << 20)  # band-absent score (real scores < 2^18)
EMPTY = np.int32(2**31 - 1)  # empty node slot sentinel
PRI_RANGE = 1024  # projection priority range; requires bandwidth+64 < 1023
INF_PRI = np.int32(PRI_RANGE - 1)
I32MAX = np.int32(2**31 - 1)


@dataclass
class BandedGraphTables:
    """Host copies of the device-resident graph arrays for the banded
    engine (uploaded once per graph)."""

    node_len: np.ndarray  # [N] int32
    node_start: np.ndarray  # [N] int32
    seq_codes: np.ndarray  # [BP] int32 (0-3 bases, 4 dummy)
    in_nbrs: np.ndarray  # [N, K_in] int32, -1 pad
    out_nbrs: np.ndarray  # [N, K_out] int32, -1 pad
    topo_rank: np.ndarray  # [N] int32, unique, ascending ~ topo order
    pos_to_node: np.ndarray  # [BP] int32 (backtrace walk)
    node_end: np.ndarray  # [N] int32 (= node_start + node_len)
    k_in: int
    k_out: int
    num_nodes: int

    def device_args(self):
        return (
            self.node_len,
            self.node_start,
            self.seq_codes,
            self.in_nbrs,
            self.out_nbrs,
            self.topo_rank,
        )


def build_graph_tables(graph: AlignmentGraph) -> BandedGraphTables:
    n = graph.node_count
    assert n < (int(I32MAX) // PRI_RANGE) - 1, "graph too large for int32 sort keys"

    def pad_adj(ptr, idx):
        deg = np.diff(ptr)
        k = max(1, int(deg.max()))
        out = np.full((n, k), -1, dtype=np.int32)
        for i in range(n):
            out[i, : deg[i]] = idx[ptr[i] : ptr[i + 1]]
        return out, k

    in_nbrs, k_in = pad_adj(graph.in_ptr, graph.in_idx)
    out_nbrs, k_out = pad_adj(graph.out_ptr, graph.out_idx)
    _, _, _, topo_order = condensation(graph.out_ptr, graph.out_idx)
    topo_rank = np.empty(n, dtype=np.int32)
    topo_rank[np.asarray(topo_order)] = np.arange(n, dtype=np.int32)
    return BandedGraphTables(
        node_len=graph.node_len.astype(np.int32),
        node_start=graph.node_start.astype(np.int32),
        seq_codes=graph.seq_codes.astype(np.int32),
        in_nbrs=in_nbrs,
        out_nbrs=out_nbrs,
        topo_rank=topo_rank,
        pos_to_node=graph.pos_to_node.astype(np.int32),
        node_end=(graph.node_start + graph.node_len).astype(np.int32),
        k_in=k_in,
        k_out=k_out,
        num_nodes=n,
    )


# One jit instance per full signature (statics + batch size). Working
# around a jax 0.9.0 bug: with multiple compiled entries in one jit's
# cache, cache-hit executions of any entry compiled after the first fail
# with "Execution supplied N buffers but compiled program expected M"
# (triggered by this function's nested scan/while_loop structure).
_JIT_CACHE: dict = {}


def banded_scan(*args, S_max, Nm, Cm, I_proj=32, P_fix=16):
    B = args[6].shape[0]
    key = (S_max, Nm, Cm, I_proj, P_fix, B)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        import jax

        fn = jax.jit(
            functools.partial(
                _banded_scan, S_max=S_max, Nm=Nm, Cm=Cm, I_proj=I_proj, P_fix=P_fix
            )
        )
        _JIT_CACHE[key] = fn
    # match table passed as an argument, not closed over (see note below)
    return fn(*args, _MATCH_TABLE)


def _banded_scan(
    # graph tables
    node_len,
    node_start,
    seq_codes,
    in_nbrs,
    out_nbrs,
    topo_rank,
    # per-problem inputs
    read_codes,  # [B, S_max*64] uint8 (N-padded)
    seq_len,  # [B] int32: padded sequence length (num_slices*64)
    num_steps,  # [B] int32: slices to compute this round
    start_slice,  # [B] int32: global index of this round's first slice
    bandwidth,  # [S_max, B] int32
    # initial carry (previous-slice state)
    init_ids,  # [B, Nm] int32 (topo-rank sorted, EMPTY pad)
    init_cell_send,  # [B, Cm] int32 last-row scores of prev slice cells
    init_node_min,  # [B, Nm] int32
    init_node_end,  # [B, Nm] int32 (last cell last-row score)
    init_min,  # [B] int32
    match_table,  # [R, 5] bool read-code x graph-code match table
    *,
    S_max: int,
    Nm: int,
    Cm: int,
    I_proj: int = 32,
    P_fix: int = 16,
):
    import jax
    import jax.numpy as jnp

    from ..ops import wordops

    B = read_codes.shape[0]
    K_in = in_nbrs.shape[1]
    K_out = out_nbrs.shape[1]
    # NOTE: all index vectors use lax.iota (traced ops), never captured
    # numpy constants — non-scalar jaxpr constants become hidden executable
    # parameters that the jax 0.9.0 dispatch fastpath miscounts on repeat
    # executions ("supplied N buffers but compiled program expected M").
    iota_nm = jax.lax.iota(jnp.int32, Nm)
    iota_cm = jax.lax.iota(jnp.int32, Cm)
    ONES = jnp.uint32(0xFFFFFFFF)

    def gather_node(table, ids, fill):
        """table[ids] with EMPTY slots mapped to `fill`."""
        safe = jnp.clip(ids, 0, table.shape[0] - 1)
        out = table[safe]
        mask = (ids < EMPTY).reshape(ids.shape + (1,) * (out.ndim - ids.ndim))
        return jnp.where(mask, out, fill)

    # ------------------------------------------------------ band projection
    def project_band(p_ids, p_node_min, p_node_end, p_min, bw):
        """projectForwardFromMinScore (GraphAligner.h:1110-1159) as a
        sort-deduped Bellman-Ford over node slots. Universe entries are
        (id, pri, outp): pri = the Dijkstra priority (0 for qualifying
        previous-band seeds), outp = the priority this entry's expansion
        assigns to out-neighbors (seed: end_score-min+1; expanded:
        pri+len)."""
        ew = bw + WORD_SIZE  # [B]
        valid_slot = p_ids < EMPTY
        qualified = valid_slot & (p_node_min <= (p_min + bw)[:, None])
        ids0 = jnp.where(qualified, p_ids, EMPTY)
        pri0 = jnp.where(qualified, 0, INF_PRI).astype(jnp.int32)
        seed_exp = qualified & (p_node_end <= (p_min + ew)[:, None])
        outp0 = jnp.where(
            seed_exp, p_node_end - p_min[:, None] + 1, jnp.int32(INF_PRI)
        ).astype(jnp.int32)

        def body(state):
            ids, pri, outp, over, it, _ = state
            cand_id = gather_node(out_nbrs, ids, -1)  # [B, Nm, K_out]
            cand_valid = (
                (ids < EMPTY)[:, :, None]
                & (cand_id >= 0)
                & (outp[:, :, None] <= ew[:, None, None])
            )
            cand_id = jnp.where(cand_valid, cand_id, EMPTY)
            cand_pri = jnp.where(cand_valid, outp[:, :, None], INF_PRI)
            cand_len = gather_node(node_len, cand_id, 0)
            cand_outp = jnp.minimum(cand_pri + cand_len, INF_PRI)
            all_id = jnp.concatenate([ids, cand_id.reshape(B, -1)], axis=1)
            all_pri = jnp.concatenate([pri, cand_pri.reshape(B, -1)], axis=1)
            all_outp = jnp.concatenate([outp, cand_outp.reshape(B, -1)], axis=1)
            rank = gather_node(topo_rank, all_id, int(I32MAX) // PRI_RANGE - 1)
            key = jnp.where(
                (all_id < EMPTY) & (all_pri < INF_PRI),
                rank * PRI_RANGE + all_pri,
                I32MAX,
            )
            key, s_id, s_pri, s_outp = jax.lax.sort(
                (key, all_id, all_pri, all_outp), num_keys=1
            )
            first = jnp.concatenate(
                [jnp.ones((B, 1), bool), s_id[:, 1:] != s_id[:, :-1]], axis=1
            )
            keep = first & (key < I32MAX)
            over = over | (jnp.sum(keep, axis=1) > Nm)
            key2 = jnp.where(keep, key, I32MAX)
            key2, s_id, s_pri, s_outp = jax.lax.sort(
                (key2, s_id, s_pri, s_outp), num_keys=1
            )
            ok = key2[:, :Nm] < I32MAX
            n_ids = jnp.where(ok, s_id[:, :Nm], EMPTY)
            n_pri = jnp.where(ok, s_pri[:, :Nm], INF_PRI)
            n_outp = jnp.where(ok, s_outp[:, :Nm], INF_PRI)
            changed = jnp.any((n_ids != ids) | (n_pri != pri))
            return (n_ids, n_pri, n_outp, over, it + 1, changed)

        def cond(state):
            return state[5] & (state[4] < I_proj)

        state = (
            ids0,
            pri0,
            outp0,
            jnp.zeros(B, bool),
            jnp.int32(0),
            jnp.bool_(True),
        )
        ids, pri, outp, over, it, changed = jax.lax.while_loop(cond, body, state)
        over = over | changed  # hit the iteration cap while still changing
        return ids, over

    # -------------------------------------------------------------- slice step
    def slice_step(carry, xs):
        p_ids, p_cell_send, p_node_min, p_node_end, p_min = carry
        bw, t = xs  # [B], scalar
        active = t < num_steps  # [B]
        g_slice = start_slice + t  # [B] global slice index

        ids, proj_over = project_band(p_ids, p_node_min, p_node_end, p_min, bw)
        valid_slot = ids < EMPTY

        # ---- cell layout -------------------------------------------------
        lens = gather_node(node_len, ids, 0)  # [B, Nm]
        offsets = jnp.cumsum(lens, axis=1) - lens  # exclusive
        c_used = jnp.sum(lens, axis=1)  # [B]
        cell_over = c_used > Cm
        le = (offsets[:, None, :] <= iota_cm[None, :, None]) & valid_slot[:, None, :]
        cell_slot = jnp.maximum(jnp.sum(le, axis=2) - 1, 0)  # [B, Cm]
        valid_cell = iota_cm[None, :] < jnp.minimum(c_used, Cm)[:, None]
        cell_node = jnp.take_along_axis(ids, cell_slot, axis=1)
        cell_off = iota_cm[None, :] - jnp.take_along_axis(offsets, cell_slot, axis=1)
        cell_pos = gather_node(node_start, cell_node, 0) + cell_off
        cell_pos = jnp.clip(cell_pos, 0, seq_codes.shape[0] - 1)
        cell_code = jnp.where(valid_cell, seq_codes[cell_pos], 4)
        cell_len = jnp.take_along_axis(lens, cell_slot, axis=1)
        is_start = (cell_off == 0) & valid_cell
        is_end = (cell_off == cell_len - 1) & valid_cell

        # ---- previous-band matching --------------------------------------
        same = (
            (ids[:, :, None] == p_ids[:, None, :])
            & valid_slot[:, :, None]
            & (p_ids < EMPTY)[:, None, :]
        )
        node_in_prev = jnp.any(same, axis=2)  # [B, Nm]
        prev_slot = jnp.argmax(same, axis=2)  # [B, Nm]
        p_lens = gather_node(node_len, p_ids, 0)
        p_offsets = jnp.cumsum(p_lens, axis=1) - p_lens
        prev_base = jnp.take_along_axis(p_offsets, prev_slot, axis=1)  # [B, Nm]
        cell_in_prev = jnp.take_along_axis(node_in_prev, cell_slot, axis=1) & valid_cell
        old_idx = jnp.clip(
            jnp.take_along_axis(prev_base, cell_slot, axis=1) + cell_off, 0, Cm - 1
        )
        old_end = jnp.where(
            cell_in_prev, jnp.take_along_axis(p_cell_send, old_idx, axis=1), INF
        )

        # ---- in-neighbor classification per slot --------------------------
        nb = gather_node(in_nbrs, ids, -1)  # [B, Nm, K_in]
        nb_valid = (nb >= 0) & valid_slot[:, :, None]
        eq_cur = (nb[:, :, :, None] == ids[:, None, None, :]) & nb_valid[..., None]
        nb_in_cur = jnp.any(eq_cur, axis=3)
        nb_cur_slot = jnp.argmax(eq_cur, axis=3)  # [B, Nm, K_in]
        eq_prev = (
            (nb[:, :, :, None] == p_ids[:, None, None, :])
            & nb_valid[..., None]
            & (p_ids < EMPTY)[:, None, None, :]
        )
        nb_in_prev = jnp.any(eq_prev, axis=3)
        nb_prev_slot = jnp.argmax(eq_prev, axis=3)
        nb_prev_end = jnp.where(
            nb_in_prev,
            jnp.take_along_axis(p_node_end[:, None, :], nb_prev_slot, axis=2),
            INF,
        )
        pseudo_mask = nb_in_prev & ~nb_in_cur
        slot_pseudo = jnp.min(jnp.where(pseudo_mask, nb_prev_end, INF), axis=2)
        any_banded = jnp.any(nb_in_cur | nb_in_prev, axis=2)  # [B, Nm]
        band_source = ~any_banded & valid_slot
        src_noprev_slot = band_source & ~node_in_prev
        src_sm_slot = band_source & node_in_prev & (g_slice == 0)[:, None]

        # per-cell views (start cells only consume these)
        pseudo_cell = jnp.take_along_axis(slot_pseudo, cell_slot, axis=1)
        src_noprev = jnp.take_along_axis(src_noprev_slot, cell_slot, axis=1) & is_start
        src_sm = jnp.take_along_axis(src_sm_slot, cell_slot, axis=1) & is_start
        pred_slot = jnp.take_along_axis(nb_cur_slot, cell_slot[:, :, None], axis=1)
        pred_valid = (
            jnp.take_along_axis(nb_in_cur, cell_slot[:, :, None], axis=1)
            & is_start[:, :, None]
        )  # [B, Cm, K_in]

        # ---- Eq vectors per cell ------------------------------------------
        rc_base = jnp.clip(g_slice * WORD_SIZE, 0, read_codes.shape[1] - WORD_SIZE)
        rc = jnp.take_along_axis(
            read_codes.astype(jnp.int32),
            rc_base[:, None] + jax.lax.iota(jnp.int32, WORD_SIZE)[None, :],
            axis=1,
        )  # [B, 64]
        mt = match_table[rc]  # [B, 64, 5]
        w32 = (
            jnp.uint32(1) << jax.lax.iota(jnp.uint32, 32)
        )[None, :, None]
        eq_lo_all = jnp.sum(
            jnp.where(mt[:, :32], w32, jnp.uint32(0)), axis=1, dtype=jnp.uint32
        )  # [B, 5]
        eq_hi_all = jnp.sum(
            jnp.where(mt[:, 32:], w32, jnp.uint32(0)), axis=1, dtype=jnp.uint32
        )
        eq_lo_cell = jnp.take_along_axis(eq_lo_all, cell_code, axis=1)  # [B, Cm]
        eq_hi_cell = jnp.take_along_axis(eq_hi_all, cell_code, axis=1)

        # ---- inner scan over cells (bit-parallel DP) ----------------------
        def inf_col():
            z = jnp.zeros(B, jnp.uint32)
            return (
                jnp.full(B, ONES, jnp.uint32),
                jnp.full(B, ONES, jnp.uint32),
                z,
                z,
                jnp.full(B, INF, jnp.int32),
                jnp.full(B, INF + WORD_SIZE, jnp.int32),
                jnp.zeros(B, jnp.int32),
            )

        cell_xs = (
            eq_lo_cell.T,
            eq_hi_cell.T,
            is_start.T,
            is_end.T,
            valid_cell.T,
            cell_slot.T,
            old_end.T,
            cell_in_prev.T,
            pseudo_cell.T,
            src_noprev.T,
            src_sm.T,
            jnp.transpose(pred_slot, (1, 0, 2)),
            jnp.transpose(pred_valid, (1, 0, 2)),
        )

        def cell_pass(buf_init):
            def cell_step(ccarry, cxs):
                col, buf, nmin = ccarry
                (
                    eq_lo,
                    eq_hi,
                    st,
                    en,
                    vc,
                    slot,
                    oe,
                    inprev,
                    pseudo_o,
                    srcnp,
                    srcsm,
                    pslot,
                    pvalid,
                ) = cxs
                vp_lo, vp_hi, vn_lo, vn_hi, sbs, send, e_prev = col

                # within-node chain advance
                r_chain = jnp.minimum(oe, sbs + 1)
                hin = r_chain - sbs
                eq_lo_c = jnp.where(e_prev == 1, eq_lo, eq_lo & ~jnp.uint32(1))
                c_vp_lo, c_vp_hi, c_vn_lo, c_vn_hi, c_send = wordops.myers_advance(
                    eq_lo_c, eq_hi, vp_lo, vp_hi, vn_lo, vn_hi, send, hin
                )

                # node-start path: merge candidate columns
                match0 = (eq_lo & 1).astype(jnp.int32)
                sm0 = jnp.where(srcsm, 1 - match0, 1)
                u_vp_lo = (ONES & ~jnp.uint32(1)) | sm0.astype(jnp.uint32)
                merged = (
                    jnp.where(inprev, u_vp_lo, ONES),
                    jnp.full(B, ONES, jnp.uint32),
                    jnp.zeros(B, jnp.uint32),
                    jnp.zeros(B, jnp.uint32),
                    jnp.where(inprev, oe, INF),
                    jnp.where(inprev, oe + 63 + sm0, INF + WORD_SIZE),
                    jnp.zeros(B, jnp.int32),
                )
                # pseudo column from previous-band-only in-neighbors
                has_pseudo = pseudo_o < INF
                ps = (
                    jnp.full(B, ONES & ~jnp.uint32(1), jnp.uint32),
                    jnp.full(B, ONES, jnp.uint32),
                    match0.astype(jnp.uint32),
                    jnp.zeros(B, jnp.uint32),
                    pseudo_o + 1,
                    pseudo_o + WORD_SIZE - match0,
                    jnp.zeros(B, jnp.int32),
                )
                cand = wordops.merge_slices(merged, ps)
                merged = tuple(
                    jnp.where(has_pseudo, c, m) for c, m in zip(cand, merged)
                )
                # band source never seen before: len(seq)+1 vertical column
                src_col = wordops.uniform_column(seq_len + 1) + (
                    jnp.zeros(B, jnp.int32),
                )
                cand = wordops.merge_slices(merged, src_col)
                merged = tuple(jnp.where(srcnp, c, m) for c, m in zip(cand, merged))
                # in-band predecessor columns (getNodeStartSlice)
                for k in range(K_in):
                    g = jnp.take_along_axis(buf, pslot[:, k][:, None, None], axis=1)[
                        :, 0
                    ]  # [B, 7]
                    g_vp_lo = jax.lax.bitcast_convert_type(g[:, 0], jnp.uint32)
                    g_vp_hi = jax.lax.bitcast_convert_type(g[:, 1], jnp.uint32)
                    g_vn_lo = jax.lax.bitcast_convert_type(g[:, 2], jnp.uint32)
                    g_vn_hi = jax.lax.bitcast_convert_type(g[:, 3], jnp.uint32)
                    eq_lo_k = jnp.where(g[:, 6] == 1, eq_lo, eq_lo & ~jnp.uint32(1))
                    a_vp_lo, a_vp_hi, a_vn_lo, a_vn_hi, a_send = (
                        wordops.myers_advance(
                            eq_lo_k,
                            eq_hi,
                            g_vp_lo,
                            g_vp_hi,
                            g_vn_lo,
                            g_vn_hi,
                            g[:, 5],
                            jnp.ones(B, jnp.int32),
                        )
                    )
                    adv = (
                        a_vp_lo,
                        a_vp_hi,
                        a_vn_lo,
                        a_vn_hi,
                        g[:, 4] + 1,
                        a_send,
                        g[:, 6],
                    )
                    cand = wordops.merge_slices(merged, adv)
                    merged = tuple(
                        jnp.where(pvalid[:, k], c, m) for c, m in zip(cand, merged)
                    )
                s_vp_lo, s_vp_hi, s_vn_lo, s_vn_hi, s_sbs, s_send, _ = merged

                ic = inf_col()
                n_vp_lo = jnp.where(vc, jnp.where(st, s_vp_lo, c_vp_lo), ic[0])
                n_vp_hi = jnp.where(vc, jnp.where(st, s_vp_hi, c_vp_hi), ic[1])
                n_vn_lo = jnp.where(vc, jnp.where(st, s_vn_lo, c_vn_lo), ic[2])
                n_vn_hi = jnp.where(vc, jnp.where(st, s_vn_hi, c_vn_hi), ic[3])
                n_sbs = jnp.where(vc, jnp.where(st, s_sbs, r_chain), INF)
                n_send = jnp.where(
                    vc, jnp.where(st, s_send, c_send), INF + WORD_SIZE
                )
                n_e = (inprev & (n_sbs == oe) & vc).astype(jnp.int32)

                vals = jnp.stack(
                    [
                        jax.lax.bitcast_convert_type(n_vp_lo, jnp.int32),
                        jax.lax.bitcast_convert_type(n_vp_hi, jnp.int32),
                        jax.lax.bitcast_convert_type(n_vn_lo, jnp.int32),
                        jax.lax.bitcast_convert_type(n_vn_hi, jnp.int32),
                        n_sbs,
                        n_send,
                        n_e,
                    ],
                    axis=1,
                )  # [B, 7]
                end_oh = (iota_nm[None, :] == slot[:, None]) & (en & vc)[:, None]
                buf = jnp.where(end_oh[:, :, None], vals[:, None, :], buf)
                min_oh = (iota_nm[None, :] == slot[:, None]) & vc[:, None]
                nmin = jnp.where(min_oh, jnp.minimum(nmin, n_send[:, None]), nmin)
                return (
                    (
                        (n_vp_lo, n_vp_hi, n_vn_lo, n_vn_hi, n_sbs, n_send, n_e),
                        buf,
                        nmin,
                    ),
                    vals,
                )

            init = (inf_col(), buf_init, jnp.full((B, Nm), INF, jnp.int32))
            (_, buf, nmin), cols = jax.lax.scan(cell_step, init, cell_xs)
            return cols, buf, nmin  # cols [Cm, B, 7]

        inf_buf = jnp.broadcast_to(
            jnp.stack(
                [jnp.int32(v) for v in
                 (-1, -1, 0, 0, int(INF), int(INF) + WORD_SIZE, 0)]
            ),
            (B, Nm, 7),
        )
        cols, buf, nmin = cell_pass(inf_buf)

        # bounded fixpoint for cyclic bands: back edge = pred slot >= own slot
        back_edge = jnp.any(
            pred_valid & (pred_slot >= cell_slot[:, :, None]), axis=(1, 2)
        )  # [B]

        def fix_cond(st):
            return st[3] & (st[5] < P_fix)

        def fix_body(st):
            cols0, buf0, nmin0, _, lane_ch, it = st
            cols1, buf1, nmin1 = cell_pass(buf0)
            lane_changed = jnp.any(cols1 != cols0, axis=(0, 2)) & back_edge
            return (cols1, buf1, nmin1, jnp.any(lane_changed), lane_changed, it + 1)

        cols, buf, nmin, still, lane_ch, fx = jax.lax.while_loop(
            fix_cond,
            fix_body,
            (cols, buf, nmin, jnp.any(back_edge), back_edge, jnp.int32(0)),
        )
        fix_fail = lane_ch & still  # per-lane: hit the cap while changing

        sends = cols[:, :, 5].T  # [B, Cm]
        node_end = buf[:, :, 5]  # [B, Nm]
        min_score = jnp.min(jnp.where(valid_slot, nmin, INF), axis=1)  # [B]
        overflow = proj_over | cell_over | fix_fail

        def upd(new, old):
            br = active.reshape((B,) + (1,) * (new.ndim - 1))
            return jnp.where(br, new, old)

        n_carry = (
            upd(ids, p_ids),
            upd(sends, p_cell_send),
            upd(nmin, p_node_min),
            upd(node_end, p_node_end),
            upd(min_score, p_min),
        )
        ys = (
            jnp.where(active[:, None], ids, EMPTY),
            jnp.where(active[:, None], nmin, INF),
            jnp.where(active[:, None], node_end, INF),
            jnp.where(active, min_score, INF),
            jnp.where(active, jnp.minimum(c_used, Cm), 0),
            overflow & active,
            jnp.where(active[None, :, None], cols, 0),
            jnp.where(active[:, None], sends, INF),
        )
        return n_carry, ys

    xs = (bandwidth, jax.lax.iota(jnp.int32, S_max))
    carry0 = (init_ids, init_cell_send, init_node_min, init_node_end, init_min)
    _, ys = jax.lax.scan(slice_step, carry0, xs)
    band_ids, node_min, node_end, min_score, num_cells, overflow, cols, sends = ys
    return {
        "band_ids": band_ids,  # [S, B, Nm]
        "node_min": node_min,  # [S, B, Nm]
        "node_end": node_end,  # [S, B, Nm] last cell's last-row score
        "min_score": min_score,  # [S, B]
        "num_cells": num_cells,  # [S, B]
        "overflow": overflow,  # [S, B]
        "cols": cols,  # [S, Cm, B, 7]: vp_lo vp_hi vn_lo vn_hi sbs send e
        "sends": sends,  # [S, B, Cm] per-cell last-row scores
    }


def make_seed_carry(tables: BandedGraphTables, start_nodes, Nm: int, Cm: int):
    """Initial carry for seeded problems: band = the seed node at score 0
    (reference getInitialSliceOnlyOneNode, GraphAligner.h:2945-2960)."""
    start_nodes = np.asarray(start_nodes, dtype=np.int32)
    B = len(start_nodes)
    ids = np.full((B, Nm), EMPTY, dtype=np.int32)
    ids[:, 0] = start_nodes
    lens = tables.node_len[start_nodes]
    cell_send = np.full((B, Cm), INF, dtype=np.int32)
    cell_send[np.arange(Cm)[None, :] < lens[:, None]] = 0
    node_min = np.full((B, Nm), INF, dtype=np.int32)
    node_min[:, 0] = 0
    node_end = np.full((B, Nm), INF, dtype=np.int32)
    node_end[:, 0] = 0
    mins = np.zeros(B, dtype=np.int32)
    return ids, cell_send, node_min, node_end, mins
