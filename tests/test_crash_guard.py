"""Native crash guard: SIGSEGV inside a guarded native entry must name
the current read context and return the entry's error value instead of
killing the process (reference ThreadReadAssertion.cpp:8-14 +
AlignerMain.cpp:12-16 — except the reference still dies after printing;
here the per-lane/per-read isolation recovers the run)."""

import ctypes
import subprocess
import sys
from pathlib import Path

import pytest

from graphaligner_tpu.io import native

SCRIPT = r"""
import ctypes, sys
sys.path.insert(0, {repo!r})
from graphaligner_tpu.io import native
lib = native.get_lib()
if lib is None:
    print("NOLIB")
    sys.exit(0)
native.set_read("read_xyz_42")
# null pointers -> SIGSEGV inside the guarded ga_decode_moves entry
n = lib.ga_decode_moves(None, 4, 0, 63, None, None, None, None, 1, 8,
                        None, None)
print("SURVIVED", n)
"""


def test_sigsegv_in_native_entry_names_read_and_recovers(tmp_path):
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    repo = str(Path(__file__).resolve().parent.parent)
    # a subprocess so a guard regression (real SIGSEGV) cannot kill the
    # test runner
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-500:])
    assert "SURVIVED -2" in proc.stdout, proc.stdout
    # the crash report names the read set via set_read
    assert "read_xyz_42" in proc.stderr, proc.stderr[-500:]


def test_crash_guard_does_not_perturb_normal_calls():
    """A guarded entry still returns correct results on valid input."""
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    import numpy as np

    # trivial stream: decode 0 moves from position 5 row 63
    node_start = np.array([0, 10], dtype=np.int64)
    node_end = np.array([10, 20], dtype=np.int64)
    pos_to_node = np.zeros(20, dtype=np.int32)
    in_nbrs = np.full((2, 1), -1, dtype=np.int32)
    arr = native.decode_moves(
        np.zeros(1, np.uint32), 5, 63, node_start, node_end, pos_to_node,
        in_nbrs, 8,
    )
    assert arr.shape == (1, 2) and arr[0, 0] == 5 and arr[0, 1] == 63
