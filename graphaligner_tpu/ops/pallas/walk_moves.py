"""Pallas TPU kernel: backtrace walk emitting 4-bit move codes.

The reference backtrace (pickBacktracePredecessor/getTraceFromTable,
GraphAligner.h:493-591, 894-1021) is a per-read sequential walk with
random access into the DP table — the worst possible shape for both XLA
(whose per-element gathers run ~7ns/element) and the remote-TPU link
(shipping packed columns costs ~100KB/read). This kernel walks ALL lanes
in lockstep, slice by slice (grid = batch-block x table-slice,
descending), with each slice's packed columns DMA'd into VMEM and every
per-lane random access done as a one-hot masked sum over the VMEM block
— two orders of magnitude faster than XLA gathers.

Instead of (position, row) pairs, each lockstep step emits a 4-bit move
code per lane (PAD / STOP / V / within-node H / within-node D /
H-via-pred-k / D-via-pred-k), packed 8 per int32 — ~6KB per 10kb read
across the link instead of ~100KB. The host decodes moves back into the
exact trace with the native C++ decoder (native/ga_native.cpp), which
replays the same predecessor rules over the host graph.

The walk never touches graph positions on device: state is (slice,
band slot, in-node offset), with node identity resolved through the
per-slice band tables the engine already records — so no big-table
gathers exist anywhere in the kernel.

Move codes (K_in <= 4):
  0       PAD   (lane idle this lockstep step)
  1       STOP  (row-0 free start, GraphAligner.h:505-513; appends
                 (w, row-1) and terminates)
  2       V     vertical (w, row-1)
  3       H0    horizontal within node (w-1, row)
  4       D0    diagonal within node (w-1, row-1)
  8+k     Hk    horizontal via in-neighbor k (pred node end, row)
  12+k    Dk    diagonal via in-neighbor k (pred node end, row-1)
"""

from __future__ import annotations

import functools

import numpy as np

INF = np.int32(1 << 20)

_JIT_CACHE: dict = {}


# Mosaic's scoped-VMEM budget is 16 MiB and a compile that exceeds it
# FAILS (first hit by the 1Mbp fixture's Cm=1152 giant tier: 16.16 MiB
# requested vs 16.00). The walk kernel's VMEM projection, in int32
# words per lane: the two (1, 6, Cm, Bb) column blocks are
# double-buffered across the slice grid dim (24*Cm), the five Nm-deep
# band/lens/pred blocks likewise (10*Nm), the (T_w, Bb) moves block is
# resident, and codes/state add ~220. Validated against the observed
# failure within 0.1%. We size against 15 MiB for 1 MiB headroom.
_VMEM_BUDGET_WORDS = 15 * 2**20 // 4


def _per_lane_words(Cm, Nm, K):
    T_w = (K * 112 + 512 + 7) // 8
    return 24 * Cm + 12 * Nm + T_w + 220


def pick_block_width(cols_shape, Nm, Bb):
    """Lane-block width for a walk signature: Bb must divide B and —
    Mosaic's lane-dim rule — be a multiple of 128 (or equal to B), and
    the block set must fit the scoped-VMEM budget. Halving Bb is a pure
    scheduling knob (results are Bb-invariant). Bb floors at 128; the
    window sizing (max_window_slices) is responsible for keeping the
    per-lane projection feasible at that floor."""
    K1, _, Cm, B = cols_shape
    Bb = min(Bb, B)
    # (walk batches are padded to a bucket ladder but not to every
    # requested block width — e.g. sim's B=384 with GA_WALK_BB=256)
    while B % Bb:
        Bb //= 2
    per_lane = _per_lane_words(Cm, Nm, K1 - 1)
    while Bb > 128 and per_lane * Bb > _VMEM_BUDGET_WORDS:
        Bb //= 2
    return Bb


def moves_walk_fits(Cm, Nm) -> bool:
    """Whether the move-walk kernel fits ANY window in scoped VMEM at
    the Bb=128 lane-block floor. Giant capacity-retry tiers
    (Cm >= 1792) cannot — their two double-buffered 6-field column
    blocks alone bust the 16 MiB budget — so callers must route those
    lanes to the XLA walk (short tables) or fail them to the host
    fallback instead of submitting a compile that Mosaic rejects
    (first hit by the ONT b5/B20 tier's Cm=2304 ladder rung)."""
    return _per_lane_words(Cm, Nm, 32) * 128 <= _VMEM_BUDGET_WORDS


def max_window_slices(Cm, Nm):
    """Largest walk-window slice count whose VMEM projection fits at
    the Bb=128 floor — the long-mode window cap for a capacity tier.
    Cm<=576 (every benched tier) stays above the 320-slice LONG_WINDOW,
    so only giant retry tiers (Cm>=1152 -> 176) shrink their windows.
    Floored at 32: tiers whose column blocks alone bust the budget
    (Cm>=1792 at a 128-lane batch) cannot fit any window and keep their
    pre-existing behavior."""
    budget = _VMEM_BUDGET_WORDS // 128
    k = 32
    while _per_lane_words(Cm, Nm, k + 16) <= budget:
        k += 16
    return k


def walk_moves(*args, K_in, W_cap=448, Bb=256):
    """jit-cached entry (one jit instance per shape signature — see the
    dispatch-fastpath note in core.engine_banded)."""
    import os

    import jax

    shapes = tuple(a.shape for a in args)
    # batch-block width: fewer blocks = fewer sequential grid steps, but
    # each block's lockstep loop runs to the max over more lanes
    # (GA_WALK_BB is the TPU A/B sweep knob)
    Bb = int(os.environ.get("GA_WALK_BB", Bb))
    Bb = pick_block_width(args[0].shape, args[1].shape[1], Bb)
    unroll = int(os.environ.get("GA_WALK_UNROLL", 1))
    key = (shapes, K_in, W_cap, Bb, unroll)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            functools.partial(
                walk_moves_kernel, K_in=K_in, W_cap=W_cap, Bb=Bb,
                unroll=unroll,
            )
        )
        _JIT_CACHE[key] = fn
    return fn(*args)


def walk_moves_kernel(
    cols_tab,  # [K+1, 7, Cm, B] int32 packed columns; entry 0 = the slice
    #            BELOW the window (cols_prev of the first walked slice;
    #            zero pad when the window starts at the table bottom)
    band_tab,  # [K+1, Nm, B] int32 band node ids (EMPTY pad)
    lens_tab,  # [K+1, Nm, B] int32 per-slot node lengths
    pred_tab,  # [K+1, Nm, B] int32 packed preds (slot|valid<<5)<<6k
    pred_prev_tab,  # [K+1, Nm, B] int32 packed PREVIOUS-band pred slots
    #                 (prev_slot|in_prev<<5)<<6k — the boundary diagonal
    #                 (row 0) reads preds out of the previous slice even
    #                 when they fell out of the current band
    codes8,  # [K+1, 64, B] uint8 read codes (match masks expand on device)
    bits_lut,  # [R] int32 read-code -> 5-bit match mask lut
    seq_len,  # [1, B] int32 (getValueOrMax default)
    seed_node,  # [1, B] int32 (synthetic slice-0 band)
    win_base,  # [1, B] int32 window base a: this call walks GLOBAL table
    #            slices (a, a+K]; lane state sk counts global slices
    init_state,  # [16, B] int32 lane state (see _init; host builds the
    #              first window's state from the walk starts, later
    #              windows pass the previous window's state_out through)
    *,
    K_in: int,
    W_cap: int = 448,
    Bb: int = 256,
    unroll: int = 1,
):
    """Returns (moves [T_w, B], fail [1, B], state_out [16, B],
    used [1, B] = each block's final lockstep step count, so the host
    can fetch only the written moves prefix) where
    T_w = ceil((K*112+512)/8); nibble t of the flattened stream is
    lockstep step t's move. Long reads walk window by window (state_out
    of window w feeds init_state of window w-1); a single window with
    win_base 0 and a zero leading pad slice is the whole-table walk."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K1, _, Cm, B = cols_tab.shape
    K = K1 - 1  # walked slices (entry 0 is the below-window neighbor)
    Nm = band_tab.shape[1]
    assert B % Bb == 0 and K_in <= 4
    T_total = K * 112 + 512
    T_w = (T_total + 7) // 8
    nb = B // Bb

    def kernel(
        cols_cur,
        cols_prev,
        band_cur,
        band_prev,
        lens_cur,
        lens_prev,
        pred_cur,
        pprev_cur,
        mtab_cur,
        sl_ref,
        seed_ref,
        base_ref,
        init_ref,
        moves_ref,
        fail_ref,
        stout_ref,
        used_ref,  # [1, Bb] int32: the block's final lockstep step count
        st_ref,  # scratch [16, Bb] int32 lane state
        word_ref,  # scratch [1, Bb] int32 move-pack word
        ctr_ref,  # scratch SMEM [1] int32 lockstep step counter
    ):
        s = pl.program_id(1)
        base_v = base_ref[0, :]  # [Bb] window base (same value per lane)
        q = base_v + (K - s)  # GLOBAL table slice processed this grid step
        iota_nm = jax.lax.broadcasted_iota(jnp.int32, (Nm, Bb), 0)
        iota_cm = jax.lax.broadcasted_iota(jnp.int32, (Cm, Bb), 0)
        iota_64 = jax.lax.broadcasted_iota(jnp.int32, (64, Bb), 0)
        u32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)

        @pl.when(s == 0)
        def _init():
            # lane state rows: 0 sk (global table slice the lane is in),
            # 1 row_in, 2 slot, 3 off, 4 here, 5 done, 6 fail,
            # 7 needs_col, 8-12 col cache, 13-15 spare
            st_ref[:] = init_ref[:]
            word_ref[0, :] = jnp.zeros(Bb, jnp.int32)
            ctr_ref[0] = 0
            moves_ref[:] = jnp.zeros((T_w, Bb), jnp.int32)
            fail_ref[0, :] = jnp.zeros(Bb, jnp.int32)

        def excl_cumsum_nm(x):
            # exclusive prefix sum along the Nm axis (no cumsum in Mosaic)
            acc = x
            k = 1
            while k < Nm:
                acc = acc + jnp.where(
                    iota_nm >= k, pltpu.roll(acc, k, 0), 0
                )
                k *= 2
            return acc - x

        # per-slice derived tables
        lens_c = lens_cur[0]
        offs_c = excl_cumsum_nm(lens_c)  # [Nm, Bb]
        lens_p = lens_prev[0]
        offs_p = excl_cumsum_nm(lens_p)
        band_c = band_cur[0]
        band_p = band_prev[0]
        pred_c = pred_cur[0]
        pprev_c = pprev_cur[0]
        mt = mtab_cur[0]  # [64, Bb]
        seq_len_v = sl_ref[0, :]
        seed_v = seed_ref[0, :]

        def oh_read_nm(tab, slot):
            oh = iota_nm == slot[None, :]
            return jnp.sum(jnp.where(oh, tab, 0), axis=0)

        def oh_read_64(tab, r):
            oh = iota_64 == r[None, :]
            return jnp.sum(jnp.where(oh, tab, 0), axis=0)

        # walk column layout (packed by the wrapper): fields 0-3 are the
        # vp/vn words, field 4 = sbs | (e << 24) — one [Cm, Bb] masked
        # sum fewer per read than the engine's 7-field layout — and
        # field 5 = send, read only from the PREVIOUS slice by
        # prev_value.
        def read_col(cols_blk, cell):
            oh = iota_cm == cell[None, :]
            packed = [
                jnp.sum(jnp.where(oh, cols_blk[0, f], 0), axis=0)
                for f in range(5)
            ]
            return unpack7(packed)

        def unpack7(p5):
            return [
                p5[0], p5[1], p5[2], p5[3],
                p5[4] & 0xFFFFFF,
                jnp.zeros(Bb, jnp.int32),
                jax.lax.shift_right_logical(p5[4], 24),
            ]

        def pack5(col7):
            return [
                col7[0], col7[1], col7[2], col7[3],
                (col7[4] & 0xFFFFFF) | (col7[6] << 24),
            ]

        def col_value(col, r):
            """Score at row r (masked popcount, WordSlice::getValue)."""
            r = jnp.clip(r, 0, 63)
            n_lo = jnp.minimum(r + 1, 32).astype(jnp.uint32)
            n_hi = jnp.clip(r + 1 - 32, 0, 32).astype(jnp.uint32)
            m_lo = jnp.where(
                n_lo >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << n_lo) - 1
            )
            m_hi = jnp.where(
                n_hi >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << n_hi) - 1
            )
            pc = lambda x: jax.lax.population_count(x).astype(jnp.int32)
            return (
                col[4]
                + pc(u32(col[0]) & m_lo)
                + pc(u32(col[1]) & m_hi)
                - pc(u32(col[2]) & m_lo)
                - pc(u32(col[3]) & m_hi)
            )

        def prev_value(node_id, off, default):
            """Score at (slice q-1, node, off, row 63): the previous
            slice's last row, or the synthetic initial slice when q==1.
            Reads ONLY field 5 (send) of the previous slice's columns."""
            eqp = (band_p == node_id[None, :]) & (band_p < np.int32(2**31 - 1))
            found = jnp.any(eqp, axis=0)
            # band ids are unique per slice: one-hot sum replaces argmax
            # (integer argmax is unimplemented in Mosaic)
            pslot = jnp.sum(jnp.where(eqp, iota_nm, 0), axis=0)
            cell = oh_read_nm(offs_p, pslot) + off
            oh = iota_cm == jnp.clip(cell, 0, Cm - 1)[None, :]
            send5 = jnp.sum(jnp.where(oh, cols_prev[0, 5], 0), axis=0)
            v = jnp.where(found, send5, default)  # row-63 score == send
            init_v = jnp.where(node_id == seed_v, 0, default)
            return jnp.where(q == 1, init_v, v)

        def prev_slot_of(node_id):
            eqp = (band_p == node_id[None, :]) & (band_p < np.int32(2**31 - 1))
            return jnp.sum(jnp.where(eqp, iota_nm, 0), axis=0)

        def loop_body(state):
            it, _ = state
            sk = st_ref[0, :]
            row_in = st_ref[1, :]
            slot = st_ref[2, :]
            off = st_ref[3, :]
            here = st_ref[4, :]
            done = st_ref[5, :] == 1
            fail = st_ref[6, :] == 1
            needs_col = st_ref[7, :] == 1
            active = (sk == q) & ~done & ~fail

            cell = oh_read_nm(offs_c, slot) + off
            # a fresh column read is only needed on slice-entry steps
            # (needs_col is set by the slice transition); scalar-gate it
            any_fresh = jnp.any(active & needs_col)
            fresh = jax.lax.cond(
                any_fresh,
                lambda c: read_col(cols_cur, c),
                lambda c: [jnp.zeros(Bb, jnp.int32)] * 7,
                jnp.clip(cell, 0, Cm - 1),
            )
            cached = unpack7([st_ref[8 + f, :] for f in range(5)])
            col = [
                jnp.where(active & needs_col, fresh[f], cached[f])
                for f in range(7)
            ]

            node_id = oh_read_nm(band_c, slot)
            len_s = oh_read_nm(lens_c, slot)
            is_start = off == 0
            grow = (q - 1) * 64 + row_in  # global row
            code = (col[6] >> 1) & 7
            matched = ((oh_read_64(mt, row_in) >> code) & 1) == 1
            default = seq_len_v

            # row-0 free-start stop
            spec = (
                active
                & (grow == 0)
                & (node_id == seed_v)
                & (here >= 0)
                & (here <= 1)
            )

            decided = spec | ~active
            move = jnp.where(spec, 1, 0)
            n_slot = slot
            n_off = off
            n_row = jnp.where(spec, row_in - 1, row_in)
            n_here = here
            n_col = col
            predw = oh_read_nm(pred_c, slot)
            predprevw = oh_read_nm(pprev_c, slot)
            pslots = [(predw >> (6 * k)) & 31 for k in range(K_in)]
            pslots_prev = [(predprevw >> (6 * k)) & 31 for k in range(K_in)]
            pprev_valids = [
                ((predprevw >> (6 * k + 5)) & 1) == 1 for k in range(K_in)
            ]
            u_offs = [
                jnp.where(is_start, oh_read_nm(lens_c, pslots[k]) - 1, off - 1)
                for k in range(K_in)
            ]
            # boundary (row 0) values from the previous slice: needed only
            # when some lane sits at row 0 (~1 in 64 lockstep steps since
            # lanes descend roughly together), so ONE scalar cond gates
            # all the [Cm, Bb] reads (a per-read cond was tried in
            # round 1 and lost; the fused gate skips them at once).
            # Pred values read by PREV-BAND SLOT (pslots_prev), so the
            # boundary diagonal sees preds that fell out of the current
            # band (pickBacktracePredecessor reads the previous slice via
            # getValueOrMax regardless of current-band membership); the
            # same-cell vertical value still resolves by node id.
            any_bd = jnp.any(active & (row_in == 0))

            def bd_read(args):
                nid, off_ = args
                # within-node diagonal value (same node, off-1) for
                # ~is_start lanes — k==0's only D candidate there
                wn_d = prev_value(nid, off_ - 1, default)
                vals = []
                offs_po = []
                for k in range(K_in):
                    off_pk = oh_read_nm(lens_p, pslots_prev[k]) - 1
                    cell = oh_read_nm(offs_p, pslots_prev[k]) + off_pk
                    ohc = iota_cm == jnp.clip(cell, 0, Cm - 1)[None, :]
                    send5 = jnp.sum(
                        jnp.where(ohc, cols_prev[0, 5], 0), axis=0
                    )
                    # q==1: the synthetic initial band holds only the
                    # seed node at score 0, so membership implies value 0
                    v = jnp.where(q == 1, 0, send5)
                    sv = jnp.where(pprev_valids[k], v, default)
                    vals.append(jnp.where(is_start, sv, wn_d))
                    offs_po.append(off_pk)
                vals.append(prev_value(nid, off_, default))
                return jnp.stack(vals + offs_po, axis=0)

            bd_st = jax.lax.cond(
                any_bd,
                bd_read,
                lambda args: jnp.broadcast_to(
                    default[None, :], (2 * K_in + 1, Bb)
                ).astype(jnp.int32)
                * jnp.ones((2 * K_in + 1, Bb), jnp.int32),
                (node_id, off),
            )
            bd = [bd_st[k] for k in range(K_in + 1)]
            po_offs = [bd_st[K_in + 1 + k] for k in range(K_in)]
            # k>=1 predecessor columns only exist at node-start cells
            # (~1 in 12 steps); a SCALAR any() gates those block reads
            any_start = jnp.any(active & is_start)
            po_any = jnp.zeros(Bb, bool)
            po_slot = jnp.zeros(Bb, jnp.int32)
            po_off = jnp.zeros(Bb, jnp.int32)
            for k in range(K_in):
                pslot_k = pslots[k]
                pvalid_k = ((predw >> (6 * k + 5)) & 1) == 1
                u_slot = jnp.where(is_start, pslot_k, slot)
                u_off = u_offs[k]
                if k == 0:
                    uv = active & (pvalid_k | ~is_start)
                else:
                    uv = active & is_start & pvalid_k
                u_cell = oh_read_nm(offs_c, u_slot) + u_off
                if k == 0:
                    u_col = read_col(cols_cur, jnp.clip(u_cell, 0, Cm - 1))
                else:
                    u_col = jax.lax.cond(
                        any_start,
                        lambda c: read_col(cols_cur, c),
                        lambda c: [jnp.zeros(Bb, jnp.int32)] * 7,
                        jnp.clip(u_cell, 0, Cm - 1),
                    )
                horizontal = jnp.where(uv, col_value(u_col, row_in), INF)
                take_h = uv & (horizontal == here - 1) & ~decided
                diag_in = col_value(u_col, row_in - 1)
                diag_bd = bd[k]
                diag = jnp.where(row_in == 0, diag_bd, diag_in)
                d_ok = (matched & (diag == here)) | (
                    ~matched & (diag == here - 1)
                )
                # the boundary diagonal (row 0) additionally admits preds
                # present only in the PREVIOUS band (the reference reads
                # the previous slice via getValueOrMax regardless of
                # current-band membership); bd[k] already carries their
                # values via pslots_prev
                prev_only_k = (
                    active & is_start & (row_in == 0)
                    & ~pvalid_k & pprev_valids[k]
                )
                take_d = (uv | prev_only_k) & d_ok & ~decided & ~take_h
                take = take_h | take_d
                move = jnp.where(
                    take_h, jnp.where(is_start, 8 + k, 3), move
                )
                move = jnp.where(
                    take_d, jnp.where(is_start, 12 + k, 4), move
                )
                n_slot = jnp.where(take, u_slot, n_slot)
                n_off = jnp.where(take, u_off, n_off)
                n_row = jnp.where(take_d, row_in - 1, n_row)
                n_here = jnp.where(
                    take_h | (take_d & ~matched), here - 1, n_here
                )
                n_col = [jnp.where(take, u_col[f], c) for f, c in enumerate(n_col)]
                # a prev-only D lands directly in slice q-1 at the pred's
                # end cell: remember its PREV-band slot/off — the generic
                # transition below re-expresses via the current band and
                # would resolve a junk slot for these lanes
                po_fire = take_d & prev_only_k
                po_any = po_any | po_fire
                po_slot = jnp.where(po_fire, pslots_prev[k], po_slot)
                po_off = jnp.where(po_fire, po_offs[k], po_off)
                decided = decided | take
            vert_in = col_value(col, row_in - 1)
            vert = jnp.where(row_in == 0, bd[K_in], vert_in)
            take_v = active & (vert == here - 1) & ~decided
            move = jnp.where(take_v, 2, move)
            n_row = jnp.where(take_v, row_in - 1, n_row)
            n_here = jnp.where(take_v, here - 1, n_here)
            decided = decided | take_v

            new_fail = active & ~decided
            moved_down = decided & ~spec & (n_row < row_in) & (row_in == 0)
            # slice transition: re-express (slot, off) in slice q-1's layout
            cur_node2 = oh_read_nm(band_c, n_slot)
            t_slot = prev_slot_of(cur_node2)
            # prev-only D destinations already carry their PREV-band slot
            t_slot = jnp.where(po_any, po_slot, t_slot)
            n_off = jnp.where(po_any, po_off, n_off)
            n_sk = jnp.where(moved_down, sk - 1, sk)
            n_slot = jnp.where(moved_down, t_slot, n_slot)
            n_row2 = jnp.where(moved_down, 63, n_row)
            needs2 = (active & moved_down) | (~active & (st_ref[7, :] == 1))
            new_done = spec | (done) | ((q == 1) & moved_down)
            # q==1 downward move means row hit -1: done (the -1 row entry is
            # implicit; the decoder appends and pops it like the host walk)

            st_ref[0, :] = n_sk
            st_ref[1, :] = n_row2
            st_ref[2, :] = n_slot
            st_ref[3, :] = n_off
            st_ref[4, :] = n_here
            st_ref[5, :] = new_done.astype(jnp.int32)
            st_ref[6, :] = (fail | new_fail).astype(jnp.int32)
            st_ref[7, :] = needs2.astype(jnp.int32)
            ncp = pack5(n_col)
            ccp = pack5(col)
            for f in range(5):
                st_ref[8 + f, :] = jnp.where(active, ncp[f], ccp[f])

            move = jnp.where(active, move, 0)
            t = ctr_ref[0]
            w = word_ref[0, :] | (move << (4 * (t % 8)))
            last_nibble = (t % 8) == 7
            widx = jnp.minimum(t // 8, T_w - 1)

            @pl.when(last_nibble)
            def _flush():
                moves_ref[widx, :] = w
                word_ref[0, :] = jnp.zeros(Bb, jnp.int32)

            @pl.when(jnp.logical_not(last_nibble))
            def _keep():
                word_ref[0, :] = w

            ctr_ref[0] = t + 1
            still = jnp.any(
                (st_ref[0, :] == q)
                & (st_ref[5, :] == 0)
                & (st_ref[6, :] == 0)
            )
            return (it + 1, still)

        def loop_cond(state):
            it, still = state
            # entry ctr + unroll - 1 must stay <= T_total - 1 so every
            # nibble write's widx is in range (no clamp collisions);
            # unroll=1 reproduces the original ctr < T_total - 1 bound
            return still & (it < W_cap) & (ctr_ref[0] < T_total - unroll)

        init_still = jnp.any(
            (st_ref[0, :] == q) & (st_ref[5, :] == 0) & (st_ref[6, :] == 0)
        )
        # GA_WALK_UNROLL: run the lockstep body `unroll` times per
        # while_loop iteration (amortizes Mosaic's per-iteration loop
        # overhead). Safe by construction: a body application after all
        # lanes finished emits one all-PAD nibble round, which the
        # decoder skips per lane like any idle step; and since the cond
        # admits only ctr <= T_total-2, the k extra bodies write at
        # t <= T_total-1 — every widx stays in range, no clamping.
        body = loop_body
        for _ in range(unroll - 1):
            body = (lambda inner: (lambda st: inner(loop_body(st))))(body)
        jax.lax.while_loop(loop_cond, body, (jnp.int32(0), init_still))

        @pl.when(s == K - 1)
        def _finish():
            t = ctr_ref[0]
            widx = jnp.minimum(t // 8, T_w - 1)
            moves_ref[widx, :] = word_ref[0, :]
            # actual rows used = t//8 + 1: lets the host fetch only the
            # written prefix of the moves array (the budget T_w is the
            # worst case; real paths use ~60-75% of it)
            used_ref[0, :] = jnp.zeros(Bb, jnp.int32) + t
            # a lane still INSIDE this window (sk > base) that is not
            # done got stuck -> fail; lanes with sk <= base continue in
            # the next (earlier) window via state_out
            fail_ref[0, :] = (
                (st_ref[6, :] == 1)
                | ((st_ref[5, :] == 0) & (st_ref[0, :] > base_v))
            ).astype(jnp.int32)
            stout_ref[:] = st_ref[:]

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # arrays carry K+1 slices (entry 0 = below-window neighbor), so the
    # "previous" block index never clamps
    def im_cur(b, s):
        return (K - s, 0, 0, b)

    def im_prev(b, s):
        return (K - s - 1, 0, 0, b)

    def im_cur3(b, s):
        return (K - s, 0, b)

    def im_prev3(b, s):
        return (K - s - 1, 0, b)

    def im_b(b, s):
        return (0, b)

    def im_st(b, s):
        return (0, b)

    # expand read codes to per-row match masks ON DEVICE: shipping the
    # int32 mask table over the remote link cost ~4x the bytes of the
    # uint8 codes (one-hot over the static R=15 read codes; Mosaic needs
    # int32 inputs, XLA fuses this into one pass)
    R = bits_lut.shape[0]
    c32 = codes8.astype(jnp.int32)
    mtab = jnp.zeros(codes8.shape, jnp.int32)
    for r in range(R):
        mtab = jnp.where(c32 == r, bits_lut[r], mtab)

    # pack the engine's 7-field columns into the 6-field walk layout
    # (field 4 = sbs | e<<24, field 5 = send): one field fewer to
    # masked-sum per in-kernel column read
    cols6 = jnp.concatenate(
        [
            cols_tab[:, :4],
            (cols_tab[:, 4:5] & 0xFFFFFF) | (cols_tab[:, 6:7] << 24),
            cols_tab[:, 5:6],
        ],
        axis=1,
    )

    moves, fail, state_out, used = pl.pallas_call(
        kernel,
        grid=(nb, K),
        interpret=(jax.default_backend() == "cpu"),
        in_specs=[
            pl.BlockSpec((1, 6, Cm, Bb), im_cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, Cm, Bb), im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nm, Bb), im_cur3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nm, Bb), im_prev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nm, Bb), im_cur3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nm, Bb), im_prev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nm, Bb), im_cur3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nm, Bb), im_cur3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, Bb), im_cur3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb), im_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb), im_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb), im_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((16, Bb), im_st, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T_w, Bb), lambda b, s: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb), lambda b, s: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, Bb), lambda b, s: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb), lambda b, s: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_w, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((16, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        # both grid dims execute sequentially and the lane-state scratch
        # must persist across the slice dimension
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        scratch_shapes=[
            pltpu.VMEM((16, Bb), jnp.int32),
            pltpu.VMEM((1, Bb), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(
        cols6,
        cols6,  # same array, "previous slice" block view
        band_tab,
        band_tab,
        lens_tab,
        lens_tab,
        pred_tab,
        pred_prev_tab,
        mtab,
        seq_len,
        seed_node,
        win_base,
        init_state,
    )
    return moves, fail, state_out, used
