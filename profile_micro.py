"""Micro-profiles: cell kernel standalone; projection I_proj slope.

Usage: python profile_micro.py kernel|proj
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench(fn, *args, reps=20):
    out = fn(*args)
    jax_block(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.time() - t0) / reps


def jax_block(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main_kernel():
    import jax.numpy as jnp

    from graphaligner_tpu.ops.pallas.banded_cell import banded_cell_kernel

    Cm, B, Nm, K_in = 448, 256, 32, 2
    rng = np.random.default_rng(0)
    # synthetic band: 32 nodes x 14 cells
    meta1 = np.zeros((Cm, B), np.int32)
    meta2 = np.zeros((Cm, B), np.int32)
    L = 14
    for c in range(Cm):
        slot = min(c // L, Nm - 1)
        off = c - slot * L
        st = off == 0
        en = off == L - 1
        vc = c < Nm * L
        code = rng.integers(0, 4)
        meta1[c] = (slot | (st << 8) | (en << 9) | (vc << 10) | (1 << 11)
                    | (code << 12))
        if st and slot > 0:
            meta2[c] = ((slot - 1) | (1 << 5))
    old_end = rng.integers(0, 100, (Cm, B)).astype(np.int32)
    pseudo = np.full((Cm, B), 1 << 20, np.int32)
    eq_lo = rng.integers(-(2**31), 2**31 - 1, (5, B)).astype(np.int32)
    eq_hi = rng.integers(-(2**31), 2**31 - 1, (5, B)).astype(np.int32)
    seq_len = np.full((1, B), 10048, np.int32)
    buf_init = np.zeros((7, Nm, B), np.int32)

    import functools
    import jax

    for Bb in (128, 256):
        fn = jax.jit(functools.partial(banded_cell_kernel, K_in=K_in, Bb=Bb))
        dt = bench(fn, meta1, meta2, old_end, pseudo, eq_lo, eq_hi, seq_len,
                   buf_init)
        print(f"kernel Cm={Cm} B={B} Bb={Bb}: {dt*1000:.3f} ms", flush=True)
    # wider batch + block: per-cell cost should stay ~flat while lanes
    # per iteration quadruple (tile occupancy 2/8 -> 8/8 sublanes)
    B2 = 1024
    reps = B2 // B
    args2 = [np.tile(a, (1,) * (a.ndim - 1) + (reps,)) for a in
             (meta1, meta2, old_end, pseudo, eq_lo, eq_hi, seq_len)]
    buf2 = np.tile(buf_init, (1, 1, reps))
    for Bb in (256, 512):
        fn = jax.jit(functools.partial(banded_cell_kernel, K_in=K_in, Bb=Bb))
        dt = bench(fn, *args2, buf2)
        print(f"kernel Cm={Cm} B={B2} Bb={Bb}: {dt*1000:.3f} ms", flush=True)


def main_proj():
    # measure full scan at different I_proj to get slope + needed iters
    from profile_scan_common import setup

    aligner, base_problems = setup()
    import graphaligner_tpu.core.engine_banded as eb
    import graphaligner_tpu.core.batch_align as ba

    orig = eb.banded_scan
    B = 256
    problems = (base_problems * ((B // len(base_problems)) + 1))[:B]
    for iproj in (32, 16, 8):
        def patched(*a, **kw):
            kw["I_proj"] = iproj
            return orig(*a, **kw)
        ba.banded_scan = patched
        tok = aligner._start_run(problems)
        out = tok[-1][0]
        jax_block(dict(out))
        times = []
        for _ in range(3):
            t0 = time.time()
            tok = aligner._start_run(problems)
            out = tok[-1][0]
            jax_block(dict(out))
            times.append(time.time() - t0)
        ov = np.asarray(out["overflow"]).sum()
        print(f"I_proj={iproj}: {min(times)*1000:.0f} ms  overflow_slices={ov}",
              flush=True)
    ba.banded_scan = orig


if __name__ == "__main__":
    if sys.argv[1] == "kernel":
        main_kernel()
    else:
        main_proj()
