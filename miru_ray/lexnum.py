"""Order-preserving lexicographic encoding for numeric terms.

The reference indexes numeric fields as fixed-width lexicographically
ordered bytes — ``UtilLexMarshaller.intToLex/longToLex`` (sign-bit-flipped
big-endian) written by ``MiruTermComposer.writePrefixBytes``
(``miru-plugin/.../index/MiruTermComposer.java:130-141``) — so a numeric
range query becomes a contiguous term-dictionary range scan
(``MiruTermComposer.prefixLowerInclusive/prefixUpperExclusive:176-240``).

Our term dictionary holds sorted UTF-8 strings, so the equivalent encoding
is the biased value (``v + 2^63`` mod ``2^64``) as 16 lowercase hex digits:
fixed width and ``0-9 < a-f`` in ASCII ⇒ string order == numeric order over
the full int64 range, negatives included.
"""

from __future__ import annotations

import binascii

import numpy as np

_BIAS = 1 << 63
_MOD = 1 << 64


def lex_encode(v: int) -> str:
    """int64 → 16-hex-digit string whose lexicographic order is numeric."""
    return format((int(v) + _BIAS) % _MOD, "016x")


def lex_decode(s: str) -> int:
    return int(s, 16) - _BIAS


def lex_encode_array(vals: np.ndarray) -> np.ndarray:
    """Vectorized :func:`lex_encode` over an int64 array (no Python loop:
    bias → big-endian bytes → hexlify the whole buffer → fixed-width S16
    view)."""
    v = np.ascontiguousarray(np.asarray(vals, dtype=np.int64))
    biased = (v.view(np.uint64) + np.uint64(_BIAS)).astype(">u8")
    h = binascii.hexlify(biased.tobytes())
    return np.char.decode(np.frombuffer(h, dtype="S16"), "ascii")
