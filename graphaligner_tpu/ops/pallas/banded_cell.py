"""Pallas TPU kernel for the banded slice cell loop.

One invocation advances every band cell of one 64-row DP slice for a
block of batch lanes: the Myers block advance along node chains
(reference getNextSlice, GraphAligner.h:1349-1427), the fused uniform
boundary/pseudo/source column, and the differenceMasks merges at node
joins (WordSlice.h:361-421) — the same bit algebra as the XLA path in
core.engine_banded, but with the whole sequential cell loop fused into
a single kernel so the ~600 vector ops per cell run register-resident
instead of as separate XLA HLOs (the XLA scan spends ~45us/cell on
launch/memory overheads; this kernel runs the loop at VPU speed).

Inputs are the per-cell metadata words produced by the engine's light
layout scan (slot/flags/code packed into meta1, predecessor slots into
meta2) plus the per-slot state tables; the batch is blocked over the
grid with everything VMEM-resident.
"""

from __future__ import annotations

import functools

import numpy as np

INF = np.int32(1 << 20)


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
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .. import wordops

    Cm, B = meta1.shape
    Nm = buf_init.shape[1]
    assert B % Bb == 0, (B, Bb)

    def kernel(m1_ref, m2_ref, oe_ref, ps_ref, eqlo_ref, eqhi_ref, sl_ref,
               binit_ref, cols_ref, buf_ref, nmin_ref):
        ONES = jnp.uint32(0xFFFFFFFF)
        u32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)
        i32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        iota_nm = jax.lax.broadcasted_iota(jnp.int32, (Nm, Bb), 0)

        buf_ref[:] = binit_ref[:]
        nmin_ref[:] = jnp.full((Nm, Bb), INF, jnp.int32)
        seq_len_v = sl_ref[0, :]
        eqlo_all = eqlo_ref[:]  # [5, Bb]
        eqhi_all = eqhi_ref[:]

        def inf_col():
            z = jnp.zeros(Bb, jnp.uint32)
            return (
                jnp.full(Bb, ONES, jnp.uint32),
                jnp.full(Bb, ONES, jnp.uint32),
                z,
                z,
                jnp.full(Bb, INF, jnp.int32),
                jnp.full(Bb, INF + 64, jnp.int32),
                jnp.zeros(Bb, jnp.int32),
            )

        def body(c, col):
            vp_lo, vp_hi, vn_lo, vn_hi, sbs, send, e_prev = col
            meta = m1_ref[c, :]
            slot = meta & 0xFF
            st = ((meta >> 8) & 1) == 1
            en = ((meta >> 9) & 1) == 1
            vc = ((meta >> 10) & 1) == 1
            inprev = ((meta >> 11) & 1) == 1
            code = (meta >> 12) & 7
            srcnp = ((meta >> 15) & 1) == 1
            srcsm = ((meta >> 16) & 1) == 1
            oe = oe_ref[c, :]
            pseudo_o = ps_ref[c, :]
            eq_lo_c32 = jnp.zeros(Bb, jnp.int32)
            eq_hi_c32 = jnp.zeros(Bb, jnp.int32)
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
                jnp.full(Bb, ONES, jnp.uint32),
                (delta == -1).astype(jnp.uint32),
                jnp.zeros(Bb, jnp.uint32),
                sbs_f,
                a_f + 63,
                jnp.zeros(Bb, jnp.int32),
            )

            meta2v = m2_ref[c, :]
            for k in range(K_in):
                pslot_k = (meta2v >> (6 * k)) & 31
                pvalid_k = (((meta2v >> (6 * k + 5)) & 1) == 1) & st
                oh_p = iota_nm == jnp.where(pvalid_k, pslot_k, -1)[None, :]
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
                        jnp.ones(Bb, jnp.int32),
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
            )  # [7, Bb]
            cols_ref[:, c, :] = fields
            oh = iota_nm == slot[None, :]
            end_oh = oh & (en & vc)[None, :]
            buf_ref[:] = jnp.where(
                end_oh[None, :, :], fields[:, None, :], buf_ref[:]
            )
            min_oh = oh & vc[None, :]
            nmin_ref[:] = jnp.where(
                min_oh, jnp.minimum(nmin_ref[:], n_send[None, :]), nmin_ref[:]
            )
            return (n_vp_lo, n_vp_hi, n_vn_lo, n_vn_hi, n_sbs, n_send, n_e)

        jax.lax.fori_loop(0, Cm, body, inf_col())

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = B // Bb
    cols, buf, nmin = pl.pallas_call(
        kernel,
        grid=(nb,),
        # interpreter mode lets the CPU suite cover the PRODUCTION kernel
        # + the layout_parallel metadata path (otherwise TPU-goldens-only)
        interpret=(jax.default_backend() == "cpu"),
        in_specs=[
            pl.BlockSpec((Cm, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cm, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cm, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cm, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (7, Nm, Bb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (7, Cm, Bb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (7, Nm, Bb), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((Nm, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((7, Cm, B), jnp.int32),
            jax.ShapeDtypeStruct((7, Nm, B), jnp.int32),
            jax.ShapeDtypeStruct((Nm, B), jnp.int32),
        ],
    )(meta1, meta2, old_end, pseudo, eq_lo, eq_hi, seq_len, buf_init)
    return cols, buf, nmin
