"""graphaligner_tpu — a TPU-native sequence-to-graph alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the bit-parallel sequence-to-graph
aligner (reference: TankMermaid/GraphAligner, an early GraphAligner fork).

Layer map (mirrors the reference's five layers, re-architected TPU-first):

  io/        serialization & I/O — GFA, vg protobuf wire codec, GAM streams,
             FASTQ/FASTA (reference L0: stream.hpp, vg.pb, fastqloader,
             GfaGraph, CommonUtils)
  graph/     graph preprocessing — bigraph→digraph doubling, the device-array
             AlignmentGraph index, SCC condensation (reference L1:
             BigraphToDigraph, AlignmentGraph)
  ops/       the compute kernels — emulated 64-bit word ops, Myers
             block-advance, WordSlice merge; jnp reference impls and Pallas
             TPU kernels (reference L2 inner loops: WordSlice.h,
             GraphAligner.h getNextSlice/mergeTwoSlices)
  core/      the alignment engine — batched slice DP, banding, correctness
             HMM, backtrace, seed-and-extend orchestration (reference L2:
             GraphAligner.h)
  parallel/  device mesh / multi-host sharding (no reference counterpart —
             the reference is single-process pthreads)
  runtime/   driver + CLI (reference L3: Aligner.cpp, AlignerMain.cpp)
  tools/     ecosystem tools (reference L4: SimulateReads, CompareAlignments,
             PickSeedHits, Bluntify, VisualizeAlignment, ...)

The key architectural translation: the reference packs 64 DP cells per CPU
word (Myers bit-parallelism). Here each 64-row word is a pair of uint32
lanes, and every word op is vectorized across a *batch* of alignment
problems on the TPU VPU — 64×batch cells per vector op.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """Best-effort persistent XLA compilation cache: the engine compiles
    one executable per (batch, slice-count, band) shape bucket, each
    20-40s on the TPU backend; caching makes them one-time per machine.
    Honors JAX_COMPILATION_CACHE_DIR; off if jax is configured already."""
    import os

    try:
        import jax

        # CPU only: the remote-TPU backend cannot serialize executables,
        # and the attempt adds ~50s to every compile
        if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
            return
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/graphaligner_tpu_xla"),
        )
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - jax absent or too old
        pass


_enable_persistent_compile_cache()
