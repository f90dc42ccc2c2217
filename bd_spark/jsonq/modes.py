"""Engine-wide conformance-mode flags.

BYTE_SLICES: the reference indexes strings by BYTE for both `length`
(json.rs:632) and slices (json.rs:830-832). `length` always matches
(octet_length); slices default to CHARACTER indexing — the friendlier
semantics for multi-byte text, documented in SURVEY §2.2 — and flip to
byte indexing under this flag for bit-exact reference parity. Both the
Catalyst compiler and the pure-Python interpreter honor it, so the
differential battery pins the two engines to each other in either mode.

The flag is read at query-compile time; set it before compile_query /
interp.run (tests use the `byte_slices` context manager).
"""

from __future__ import annotations

from contextlib import contextmanager

BYTE_SLICES = False


@contextmanager
def byte_slices(enabled: bool = True):
    global BYTE_SLICES
    prev = BYTE_SLICES
    BYTE_SLICES = enabled
    try:
        yield
    finally:
        BYTE_SLICES = prev
