"""Ecosystem CLI tools (reference L4: 15 standalone binaries).

Each module exposes main(argv) and is runnable as
`python -m graphaligner_tpu.tools.<name> args...` with the reference's
positional argument conventions.
"""
