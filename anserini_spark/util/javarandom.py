"""Exact ``java.util.Random`` — the 48-bit LCG the JDK documents
(seed scramble 0x5DEECE66D, multiplier 0x5DEECE66D, increment 0xB;
``next(bits)`` returns the top bits of the new state). The reference's
seeded axiom pool draws docids with ``new Random(seed).nextInt(n)``
(`rerank/lib/AxiomReranker.java:329-338`), so replicating the pool
requires replicating this generator bit-for-bit — the algorithm is
fully specified in the JDK javadoc, making it the rare RNG whose
cross-language parity is a published contract.
"""

from __future__ import annotations

_MULT = 0x5DEECE66D
_INC = 0xB
_MASK = (1 << 48) - 1


class JavaRandom:
    """java.util.Random with the subset of methods the pool needs."""

    def __init__(self, seed: int):
        self.seed = (seed ^ _MULT) & _MASK

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * _MULT + _INC) & _MASK
        return self.seed >> (48 - bits)

    def next_int(self, bound: int | None = None) -> int:
        if bound is None:
            v = self._next(32)
            return v - (1 << 32) if v >= (1 << 31) else v
        if bound <= 0:
            raise ValueError("bound must be positive")
        if bound & (bound - 1) == 0:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            # Java's overflow-rejection test: bits - val + (bound-1)
            # must not exceed Integer.MAX_VALUE
            if bits - val + (bound - 1) < (1 << 31):
                return val
