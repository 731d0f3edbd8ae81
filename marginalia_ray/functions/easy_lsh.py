"""EasyLSH: the reference's 64-bit locality-sensitive hash for token
collections (libraries/easy-lsh/src/main/java/nu/marginalia/lsh/
EasyLSH.java) — the ``dataHash`` stored per document and compared by
hamming distance in the search-service's UrlDeduplicator.

Faithful to the Java bit-for-bit, including int32 overflow semantics:
  * each added hash votes +1/-1 (``1 - (hashCode & 2)``) on one of 64
    signed-int32 counters picked by folding the hash's entropy
    (one SIGNED >> 2 then four unsigned shifts, & 63);
  * ``add_ordered`` first XOR-shingles the hash with the previous one
    (SHINGLING = 2 ring buffer), making the LSH order-sensitive;
  * ``get`` packs the 64 counter SIGN bits into a long (counter 0 ends
    at bit 63);
  * ``hamming_distance`` on two packed longs is a popcount of the XOR.

``java_string_hash`` reproduces ``String.hashCode`` so string tokens
hash identically to the reference.
"""

from __future__ import annotations

SHINGLING = 2  # power of 2; ring size of the ordered-mode shingle


def _i32(x: int) -> int:
    """Wrap to Java signed int32."""
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def _ushr32(x: int, n: int) -> int:
    """Java >>> on an int32 value."""
    return (x & 0xFFFFFFFF) >> n


def java_string_hash(s: str) -> int:
    """String.hashCode: s[0]*31^(n-1) + ... + s[n-1], int32 wrap."""
    h = 0
    for ch in s:
        h = _i32(31 * h + ord(ch))
    return h


class EasyLSH:
    def __init__(self) -> None:
        self.fields = [0] * 64
        self._prev = [0] * SHINGLING
        self._prev_idx = 0

    def add_unordered(self, token) -> None:
        self.add_hash_unordered(
            java_string_hash(token) if isinstance(token, str) else _i32(token)
        )

    def add_ordered(self, token) -> None:
        self.add_hash_ordered(
            java_string_hash(token) if isinstance(token, str) else _i32(token)
        )

    def add_hash_ordered(self, hash_code: int) -> None:
        self.add_hash_unordered(self._shingle(hash_code))

    def add_hash_unordered(self, hash_code: int) -> None:
        value = 1 - (hash_code & 2)
        field = (
            (hash_code >> 2)  # SIGNED shift (Java >>)
            ^ _ushr32(hash_code, 8)
            ^ _ushr32(hash_code, 14)
            ^ _ushr32(hash_code, 20)
            ^ _ushr32(hash_code, 26)
        )
        i = field & 63
        self.fields[i] = _i32(self.fields[i] + value)

    def _shingle(self, next_hash: int) -> int:
        self._prev[self._prev_idx & (SHINGLING - 1)] = next_hash
        self._prev_idx += 1
        ret = 0
        for part in self._prev:
            ret ^= part
        return ret

    def get(self) -> int:
        """Pack counter sign bits; returned as unsigned 0..2^64-1."""
        val = 0
        for f in self.fields:
            val = ((val << 1) | _ushr32(f, 31)) & 0xFFFFFFFFFFFFFFFF
        return val

    @staticmethod
    def hamming_distance(a: int, b: int) -> int:
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    @staticmethod
    def hamming_distance_lsh(a: "EasyLSH", b: "EasyLSH") -> int:
        return sum(
            _ushr32(_i32(fa ^ fb), 31) for fa, fb in zip(a.fields, b.fields)
        )
