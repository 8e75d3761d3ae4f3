"""Property tests for the uint32-pair bit-parallel word operations.

Strategy mirrors the reference's EXTRABITVECTORASSERTIONS: every bit
operation is checked cell-by-cell against explicit score columns
(mergeTwoSlicesCellByCell / getWordSliceCellByCell analogues).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from graphaligner_tpu.ops import wordops
from graphaligner_tpu.ops.packing import unpack_deltas_np


def random_column(rng, sbs):
    """A random valid column: 64 deltas in {-1,0,1} from sbs."""
    deltas = rng.integers(-1, 2, size=64)
    scores = sbs + np.cumsum(deltas)
    vp = deltas > 0
    vn = deltas < 0
    bits = 1 << np.arange(32, dtype=np.uint64)
    return {
        "vp_lo": np.uint32((vp[:32] * bits).sum()),
        "vp_hi": np.uint32((vp[32:] * bits).sum()),
        "vn_lo": np.uint32((vn[:32] * bits).sum()),
        "vn_hi": np.uint32((vn[32:] * bits).sum()),
        "sbs": np.int32(sbs),
        "send": np.int32(scores[-1]),
        "scores": scores,
    }


def to_tuple(c, e=0):
    return (
        jnp.asarray(c["vp_lo"]).reshape(1),
        jnp.asarray(c["vp_hi"]).reshape(1),
        jnp.asarray(c["vn_lo"]).reshape(1),
        jnp.asarray(c["vn_hi"]).reshape(1),
        jnp.asarray(c["sbs"]).reshape(1).astype(jnp.int32),
        jnp.asarray(c["send"]).reshape(1).astype(jnp.int32),
        jnp.asarray(np.int32(e)).reshape(1),
    )


def expand(vp_lo, vp_hi, vn_lo, vn_hi, sbs):
    return unpack_deltas_np(
        np.asarray(vp_lo), np.asarray(vp_hi), np.asarray(vn_lo),
        np.asarray(vn_hi), np.asarray(sbs),
    )[0]


@pytest.mark.parametrize("seed", range(8))
def test_merge_slices_is_elementwise_min(seed):
    rng = np.random.default_rng(seed)
    for trial in range(200):
        sbs_a = int(rng.integers(0, 40))
        sbs_b = int(rng.integers(0, 40))
        a = random_column(rng, sbs_a)
        b = random_column(rng, sbs_b)
        out = wordops.merge_slices(to_tuple(a), to_tuple(b))
        got = expand(out[0], out[1], out[2], out[3], out[4])
        want = np.minimum(a["scores"], b["scores"])
        assert int(np.asarray(out[4])[0]) == min(sbs_a, sbs_b)
        assert (got == want).all(), (
            f"trial {trial}: sbs {sbs_a}/{sbs_b}\n{a['scores']}\n{b['scores']}"
            f"\ngot  {got}\nwant {want}"
        )
        assert int(np.asarray(out[5])[0]) == want[-1]


def test_merge_with_uniform_column():
    rng = np.random.default_rng(99)
    for trial in range(100):
        sbs_a = int(rng.integers(0, 30))
        a = random_column(rng, sbs_a)
        c = int(rng.integers(0, 30))
        u = wordops.uniform_column(jnp.asarray(np.int32(c)).reshape(1))
        ut = u + (jnp.asarray(np.int32(1)).reshape(1),)
        out = wordops.merge_slices(to_tuple(a), ut)
        got = expand(out[0], out[1], out[2], out[3], out[4])
        want = np.minimum(a["scores"], c + 1 + np.arange(64))
        assert (got == want).all(), f"trial {trial}"


def test_myers_advance_matches_scalar():
    """The SWAR advance must equal the scalar recurrence
    (reference getNextSlice vs getWordSliceCellByCell)."""
    rng = np.random.default_rng(7)
    for trial in range(300):
        sbs_p = int(rng.integers(0, 30))
        p = random_column(rng, sbs_p)
        hin = int(rng.integers(-1, 2))
        sbs_n = sbs_p + hin
        eq_bits = rng.integers(0, 2, size=64).astype(bool)
        bits = 1 << np.arange(32, dtype=np.uint64)
        eq_lo = np.uint32((eq_bits[:32] * bits).sum())
        eq_hi = np.uint32((eq_bits[32:] * bits).sum())
        out = wordops.myers_advance(
            jnp.asarray(eq_lo).reshape(1),
            jnp.asarray(eq_hi).reshape(1),
            jnp.asarray(p["vp_lo"]).reshape(1),
            jnp.asarray(p["vp_hi"]).reshape(1),
            jnp.asarray(p["vn_lo"]).reshape(1),
            jnp.asarray(p["vn_hi"]).reshape(1),
            jnp.asarray(p["send"]).reshape(1).astype(jnp.int32),
            jnp.asarray(np.int32(hin)).reshape(1),
        )
        got = expand(out[0], out[1], out[2], out[3], np.array([sbs_n]))
        # scalar recurrence: cur[r] = min(p[r]+1, diag + cost, cur[r-1]+1)
        want = np.zeros(64, dtype=np.int64)
        prev_scores = p["scores"]
        for r in range(64):
            diag = prev_scores[r - 1] if r > 0 else sbs_p
            up = want[r - 1] if r > 0 else sbs_n
            want[r] = min(prev_scores[r] + 1, diag + (0 if eq_bits[r] else 1), up + 1)
        assert (got == want).all(), (
            f"trial {trial} hin={hin}\np={prev_scores}\ngot ={got}\nwant={want}"
        )
        assert int(np.asarray(out[4])[0]) == want[-1]
