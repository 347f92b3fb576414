"""Composite multi-part term composition.

Reference: ``MiruTermComposer.compose`` builds a composite field's term
by concatenating its parts with all-but-the-last length-prefixed
(``miru-plugin/.../index/MiruTermComposer.java:35-63``), which makes the
sorted term dict group by leading parts so a parts-prefix query is one
contiguous range scan (``prefixLowerInclusive`` /
``prefixUpperExclusive``, ``MiruTermComposer.java:176-240``).

Here terms are strings, so instead of length prefixes the parts join on
a RESERVED separator — ``PART_SEP`` (0x1f, the ASCII unit separator),
which sorts below every printable character and therefore preserves the
same group-by-leading-parts ordering.  The deviation is enforced, not
assumed: a part value containing the separator is rejected loudly at
both build and compose time.
"""
from __future__ import annotations

import numpy as np

#: reserved part separator: 0x1f sorts below space, so "a" < "a\x1fb"
#: < "ab" — composite terms sharing leading parts are contiguous in the
#: sorted term dict exactly like the reference's length-prefixed bytes
PART_SEP = "\x1f"


def check_part(part: str) -> str:
    """Reject part values that would corrupt the composed encoding."""
    if PART_SEP in part:
        raise ValueError(
            f"composite part value contains the reserved separator "
            f"0x1f: {part!r}")
    return part


def compose_parts(parts: "list[str] | tuple[str, ...]") -> str:
    """All parts of a composite value → its term string
    (``MiruTermComposer.compose:35-63``)."""
    return PART_SEP.join(check_part(str(p)) for p in parts)


def compose_part_prefix(parts: "list[str] | tuple[str, ...]") -> str:
    """A strict PREFIX of the parts → the term-dict prefix whose range
    covers every composite term with those leading parts
    (``prefixLowerInclusive``: head parts composed, then the range is
    [head, head-upper-exclusive) — here the trailing separator bounds
    the scan to whole leading parts: 'user' must not match
    'userx\\x1f...')."""
    return compose_parts(parts) + PART_SEP


def decompose_value(value: str) -> list[str]:
    """Composite term value → its parts
    (``MiruTermComposer.decompose:87-110``)."""
    return value.split(PART_SEP)


def compose_arrays(part_cols: "list[np.ndarray]") -> np.ndarray:
    """Vectorized compose over parallel object arrays of part values
    (the build-time path).  Raises on reserved-separator violations."""
    out = None
    for col in part_cols:
        bad = np.char.find(col.astype(str), PART_SEP) >= 0
        if bad.any():
            raise ValueError(
                "composite part values contain the reserved separator "
                f"0x1f: {col[bad][:3]!r}")
        piece = col.astype(object)
        out = piece if out is None \
            else out + np.array([PART_SEP], object) + piece
    return out
