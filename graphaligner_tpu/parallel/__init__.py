"""Device-mesh / multi-host parallelism (no reference counterpart — the
reference is single-process pthreads over a shared read queue,
Aligner.cpp:107-117, 285-298)."""

from .mesh import make_mesh, shard_reads_aligner  # noqa: F401
