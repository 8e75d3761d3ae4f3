"""Pallas TPU kernel for the banded slice cell loop.

One invocation advances every band cell of one 64-row DP slice for a
block of batch lanes: the Myers block advance along node chains
(reference getNextSlice, GraphAligner.h:1349-1427), the fused uniform
boundary/pseudo/source column, and the differenceMasks merges at node
joins (WordSlice.h:361-421) — the same bit algebra as the XLA path in
core.engine_banded, but with the whole sequential cell loop fused into
a single kernel so the ~600 vector ops per cell run register-resident
instead of as separate XLA HLOs.

Lane layout (round 5): the batch dimension is carried as TWO minor
dims (G, L) with L = min(B, 128) lanes and G = Bb // L sublane groups,
so every per-lane value is a (G, L) tile — for Bb = 1024 exactly one
full (8, 128) vreg — instead of a 1-sublane (1, Bb) strip, and every
one-hot table read reduces over the UNTILED Nm axis (Nm plain vreg
adds) instead of across sublanes (log-tree rotates). This halved the
measured per-cell cost at Bb = 512 and is what makes wider blocks pay.

Inputs keep their external [.., B] shapes; the wrapper reshapes to
[.., G, L] (a free row-major split of the minor dim) around the
pallas_call.
"""

from __future__ import annotations

import functools

import numpy as np

INF = np.int32(1 << 20)


def cell_unroll() -> int:
    """GA_CELL_UNROLL (cells per fori_loop iteration). Read through this
    helper so core.engine_banded can fold it into the scan's jit-cache
    key — an in-trace env read would be baked into whichever trace
    compiled first and silently ignored afterwards."""
    import os

    return int(os.environ.get("GA_CELL_UNROLL", 1))


def banded_cell_kernel(
    meta1,  # [Cm, B] int32: slot|st<<8|en<<9|vc<<10|inprev<<11|code<<12|srcnp<<15|srcsm<<16
    meta2,  # [Cm, B] int32: per-pred (slot | valid<<5) << 6k
    old_end,  # [Cm, B] int32
    pseudo,  # [Cm, B] int32
    eq_lo,  # [5, B] int32 (bitcast uint32)
    eq_hi,  # [5, B] int32
    seq_len,  # [1, B] int32
    buf_init,  # [7, Nm, B] int32
    *,
    K_in: int,
    Bb: int = 256,
):
    """Returns (cols [7, Cm, B], buf [7, Nm, B], nmin [Nm, B])."""
    import os

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .. import wordops

    Cm, B = meta1.shape
    Nm = buf_init.shape[1]
    assert B % Bb == 0, (B, Bb)
    unroll = cell_unroll()
    if unroll < 1 or Cm % unroll:
        unroll = 1
    L = min(B, 128)
    G = Bb // L  # sublane groups per block
    nG = B // L  # total groups
    nb = B // Bb

    def kernel(m1_ref, m2_ref, oe_ref, ps_ref, eqlo_ref, eqhi_ref, sl_ref,
               binit_ref, cols_ref, buf_ref, nmin_ref):
        ONES = jnp.uint32(0xFFFFFFFF)
        u32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)
        i32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        iota_nm = jax.lax.broadcasted_iota(jnp.int32, (Nm, G, L), 0)

        buf_ref[:] = binit_ref[:]
        nmin_ref[:] = jnp.full((Nm, G, L), INF, jnp.int32)
        seq_len_v = sl_ref[0]  # (G, L)
        eqlo_all = eqlo_ref[:]  # [5, G, L]
        eqhi_all = eqhi_ref[:]

        def inf_col():
            z = jnp.zeros((G, L), jnp.uint32)
            return (
                jnp.full((G, L), ONES, jnp.uint32),
                jnp.full((G, L), ONES, jnp.uint32),
                z,
                z,
                jnp.full((G, L), INF, jnp.int32),
                jnp.full((G, L), INF + 64, jnp.int32),
                jnp.zeros((G, L), jnp.int32),
            )

        def body(c, col):
            vp_lo, vp_hi, vn_lo, vn_hi, sbs, send, e_prev = col
            meta = m1_ref[c]  # (G, L)
            slot = meta & 0xFF
            st = ((meta >> 8) & 1) == 1
            en = ((meta >> 9) & 1) == 1
            vc = ((meta >> 10) & 1) == 1
            inprev = ((meta >> 11) & 1) == 1
            code = (meta >> 12) & 7
            srcnp = ((meta >> 15) & 1) == 1
            srcsm = ((meta >> 16) & 1) == 1
            oe = oe_ref[c]
            pseudo_o = ps_ref[c]
            eq_lo_c32 = jnp.zeros((G, L), jnp.int32)
            eq_hi_c32 = jnp.zeros((G, L), jnp.int32)
            for g in range(5):
                sel = code == g
                eq_lo_c32 = jnp.where(sel, eqlo_all[g], eq_lo_c32)
                eq_hi_c32 = jnp.where(sel, eqhi_all[g], eq_hi_c32)
            eq_lo_v = u32(eq_lo_c32)
            eq_hi_v = u32(eq_hi_c32)

            # within-node chain advance
            r_chain = jnp.minimum(oe, sbs + 1)
            hin = r_chain - sbs
            eq_lo_g = jnp.where(
                (e_prev & 1) == 1, eq_lo_v, eq_lo_v & ~jnp.uint32(1)
            )
            c_vp_lo, c_vp_hi, c_vn_lo, c_vn_hi, c_send = wordops.myers_advance(
                eq_lo_g, eq_hi_v, vp_lo, vp_hi, vn_lo, vn_hi, send, hin
            )

            # fused uniform column (boundary / pseudo / band-source)
            match0 = (eq_lo_v & 1).astype(jnp.int32)
            sm0 = jnp.where(srcsm, 1 - match0, 1)
            sbs_b = jnp.where(inprev, oe, INF)
            a_b = jnp.where(inprev, oe + sm0, INF + 1)
            has_ps = pseudo_o < INF
            sbs_p = jnp.where(has_ps, pseudo_o + 1, INF)
            a_p = jnp.where(has_ps, pseudo_o + 1 - match0, INF + 1)
            sbs_s = jnp.where(srcnp, seq_len_v + 1, INF)
            a_s = jnp.where(srcnp, seq_len_v + 2, INF + 1)
            sbs_f = jnp.minimum(jnp.minimum(sbs_b, sbs_p), sbs_s)
            a_f = jnp.minimum(jnp.minimum(a_b, a_p), a_s)
            delta = a_f - sbs_f
            merged = (
                (ONES & ~jnp.uint32(1)) | (delta == 1).astype(jnp.uint32),
                jnp.full((G, L), ONES, jnp.uint32),
                (delta == -1).astype(jnp.uint32),
                jnp.zeros((G, L), jnp.uint32),
                sbs_f,
                a_f + 63,
                jnp.zeros((G, L), jnp.int32),
            )

            meta2v = m2_ref[c]
            for k in range(K_in):
                pslot_k = (meta2v >> (6 * k)) & 31
                pvalid_k = (((meta2v >> (6 * k + 5)) & 1) == 1) & st
                # one-hot over the UNTILED Nm axis: Nm plain vreg adds
                oh_p = iota_nm == jnp.where(pvalid_k, pslot_k, -1)[None]
                g = [
                    jnp.sum(jnp.where(oh_p, buf_ref[f], 0), axis=0)
                    for f in range(7)
                ]
                eq_lo_k = jnp.where(
                    (g[6] & 1) == 1, eq_lo_v, eq_lo_v & ~jnp.uint32(1)
                )
                a_vp_lo, a_vp_hi, a_vn_lo, a_vn_hi, a_send = (
                    wordops.myers_advance(
                        eq_lo_k,
                        eq_hi_v,
                        u32(g[0]),
                        u32(g[1]),
                        u32(g[2]),
                        u32(g[3]),
                        g[5],
                        jnp.ones((G, L), jnp.int32),
                    )
                )
                adv = (a_vp_lo, a_vp_hi, a_vn_lo, a_vn_hi, g[4] + 1, a_send, g[6])
                cand = wordops.merge_slices(merged, adv)
                merged = tuple(
                    jnp.where(pvalid_k, cc, mm) for cc, mm in zip(cand, merged)
                )
            s_vp_lo, s_vp_hi, s_vn_lo, s_vn_hi, s_sbs, s_send, _ = merged

            ic = inf_col()
            n_vp_lo = jnp.where(vc, jnp.where(st, s_vp_lo, c_vp_lo), ic[0])
            n_vp_hi = jnp.where(vc, jnp.where(st, s_vp_hi, c_vp_hi), ic[1])
            n_vn_lo = jnp.where(vc, jnp.where(st, s_vn_lo, c_vn_lo), ic[2])
            n_vn_hi = jnp.where(vc, jnp.where(st, s_vn_hi, c_vn_hi), ic[3])
            n_sbs = jnp.where(vc, jnp.where(st, s_sbs, r_chain), INF)
            n_send = jnp.where(vc, jnp.where(st, s_send, c_send), INF + 64)
            n_e = (inprev & (n_sbs == oe) & vc).astype(jnp.int32) | (code << 1)

            fields = jnp.stack(
                [
                    i32(n_vp_lo),
                    i32(n_vp_hi),
                    i32(n_vn_lo),
                    i32(n_vn_hi),
                    n_sbs,
                    n_send,
                    n_e,
                ],
                axis=0,
            )  # [7, G, L]
            cols_ref[:, c] = fields
            oh = iota_nm == slot[None]
            end_oh = oh & (en & vc)[None]
            buf_ref[:] = jnp.where(
                end_oh[None], fields[:, None], buf_ref[:]
            )
            min_oh = oh & vc[None]
            nmin_ref[:] = jnp.where(
                min_oh, jnp.minimum(nmin_ref[:], n_send[None]), nmin_ref[:]
            )
            return (n_vp_lo, n_vp_hi, n_vn_lo, n_vn_hi, n_sbs, n_send, n_e)

        # GA_CELL_UNROLL cells per fori_loop iteration: amortizes the
        # per-iteration loop mechanics (dynamic-index loads/stores,
        # bounds bookkeeping) across several cells. Requires
        # unroll | Cm (the wrapper guarantees it).
        if unroll > 1:
            def body_u(i, col):
                for j in range(unroll):
                    col = body(i * unroll + j, col)
                return col

            jax.lax.fori_loop(0, Cm // unroll, body_u, inf_col())
        else:
            jax.lax.fori_loop(0, Cm, body, inf_col())

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # free row-major split of the minor batch dim into (group, lane)
    def gsplit(a):
        return a.reshape(a.shape[:-1] + (nG, L))

    # batch blocks split at the XLA level (one pallas_call per block,
    # block shapes == full array dims): Mosaic's grid blocking requires
    # the second-minor block dim be a multiple of 8, which a (G, L)
    # lane layout can't honor for G < 8 — per-call slicing has no such
    # constraint and the calls were sequential on the grid anyway
    call = pl.pallas_call(
        kernel,
        # interpreter mode lets the CPU suite cover the PRODUCTION kernel
        # + the layout_parallel metadata path (otherwise TPU-goldens-only)
        interpret=(jax.default_backend() == "cpu"),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((7, Cm, G, L), jnp.int32),
            jax.ShapeDtypeStruct((7, Nm, G, L), jnp.int32),
            jax.ShapeDtypeStruct((Nm, G, L), jnp.int32),
        ],
    )
    ins = [
        gsplit(meta1), gsplit(meta2), gsplit(old_end), gsplit(pseudo),
        gsplit(eq_lo), gsplit(eq_hi), gsplit(seq_len), gsplit(buf_init),
    ]
    outs = []
    for b in range(nb):
        sl = slice(b * G, (b + 1) * G)
        outs.append(call(*[a[..., sl, :] for a in ins]))
    if nb == 1:
        cols, buf, nmin = outs[0]
    else:
        cols = jnp.concatenate([o[0] for o in outs], axis=2)
        buf = jnp.concatenate([o[1] for o in outs], axis=2)
        nmin = jnp.concatenate([o[2] for o in outs], axis=1)
    return (
        cols.reshape(7, Cm, B),
        buf.reshape(7, Nm, B),
        nmin.reshape(Nm, B),
    )
