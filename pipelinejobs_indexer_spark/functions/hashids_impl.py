"""Pure-Python Hashids encoder (the public scheme from hashids.org).

The reference pins the ``hashids`` package (requirements-dev.txt:9) for
its short non-sequential id tokens (exemplars: tests/data/index01.json:12).
This is an original implementation of the PUBLIC algorithm as documented
at hashids.org (salt-keyed Fisher-Yates-style alphabet reordering, base-N
digit encoding, separator/guard injection); it is validated against the
canonical test vectors from the published documentation
(tests/test_udfs.py::test_hashids_known_vectors).

Only what the engine needs is implemented: non-negative integer encode
(single or multiple values) with optional min_length padding. Decode is
the inverse walk and is provided for round-trip testing.
"""

from __future__ import annotations

import math

DEFAULT_ALPHABET = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ1234567890"
_SEPS = "cfhistuCFHISTU"  # curse-word-avoiding separators, per the spec
_RATIO_SEPS = 3.5
_RATIO_GUARDS = 12


def _reorder(alphabet: str, salt: str) -> str:
    """Salt-keyed deterministic shuffle (the spec's consistent shuffle)."""
    if not salt:
        return alphabet
    chars = list(alphabet)
    p = 0
    for i in range(len(chars) - 1, 0, -1):
        v = (len(chars) - 1 - i) % len(salt)
        a = ord(salt[v])
        p += a
        j = (a + v + p) % i
        chars[i], chars[j] = chars[j], chars[i]
    return "".join(chars)


def _hash(number: int, alphabet: str) -> str:
    """Base-len(alphabet) digits of *number*, most significant first."""
    hashed = ""
    while True:
        hashed = alphabet[number % len(alphabet)] + hashed
        number //= len(alphabet)
        if not number:
            return hashed


def _unhash(hashed: str, alphabet: str) -> int:
    number = 0
    for c in hashed:
        number = number * len(alphabet) + alphabet.index(c)
    return number


class Hashids:
    def __init__(
        self,
        salt: str = "",
        min_length: int = 0,
        alphabet: str = DEFAULT_ALPHABET,
    ) -> None:
        self._salt = salt
        self._min_length = max(0, int(min_length))
        alphabet = "".join(dict.fromkeys(alphabet))  # dedupe, keep order
        seps = "".join(c for c in _SEPS if c in alphabet)
        alphabet = "".join(c for c in alphabet if c not in seps)
        if len(alphabet) + len(seps) < 16:
            raise ValueError("alphabet must contain >= 16 unique characters")
        if " " in alphabet:
            raise ValueError("alphabet may not contain spaces")
        seps = _reorder(seps, salt)
        if not seps or len(alphabet) / len(seps) > _RATIO_SEPS:
            need = int(math.ceil(len(alphabet) / _RATIO_SEPS))
            if need == 1:  # the published algorithm clamps a lone separator to 2
                need = 2
            if need > len(seps):
                diff = need - len(seps)
                seps += alphabet[:diff]
                alphabet = alphabet[diff:]
        alphabet = _reorder(alphabet, salt)
        num_guards = int(math.ceil(len(alphabet) / _RATIO_GUARDS))
        if len(alphabet) < 3:
            self._guards = seps[:num_guards]
            seps = seps[num_guards:]
        else:
            self._guards = alphabet[:num_guards]
            alphabet = alphabet[num_guards:]
        self._alphabet = alphabet
        self._seps = seps

    # ------------------------------------------------------------ encode
    def encode(self, *values: int) -> str:
        # bools pass through as 1/0 (bool is an int subclass), matching
        # the published hashids-python behavior exactly.
        if not values or any(not isinstance(v, int) or v < 0 for v in values):
            return ""
        alphabet = self._alphabet
        values_hash = sum(v % (i + 100) for i, v in enumerate(values))
        lottery = alphabet[values_hash % len(alphabet)]
        encoded = lottery
        for i, value in enumerate(values):
            alphabet_salt = (lottery + self._salt + alphabet)[: len(alphabet)]
            alphabet = _reorder(alphabet, alphabet_salt)
            last = _hash(value, alphabet)
            encoded += last
            value %= ord(last[0]) + i
            encoded += self._seps[value % len(self._seps)]
        encoded = encoded[:-1]  # the loop appends one trailing separator
        if len(encoded) < self._min_length:
            encoded = self._ensure_length(encoded, values_hash, alphabet)
        return encoded

    def _ensure_length(self, encoded: str, values_hash: int, alphabet: str) -> str:
        guards = self._guards
        guard_index = (values_hash + ord(encoded[0])) % len(guards)
        encoded = guards[guard_index] + encoded
        if len(encoded) < self._min_length:
            guard_index = (values_hash + ord(encoded[2])) % len(guards)
            encoded += guards[guard_index]
        split_at = len(alphabet) // 2
        while len(encoded) < self._min_length:
            alphabet = _reorder(alphabet, alphabet)
            encoded = alphabet[split_at:] + encoded + alphabet[:split_at]
            excess = len(encoded) - self._min_length
            if excess > 0:
                from_index = excess // 2
                encoded = encoded[from_index : from_index + self._min_length]
        return encoded

    # ------------------------------------------------------------ decode
    def decode(self, encoded: str) -> tuple[int, ...]:
        original = encoded
        if not encoded:
            return ()
        for g in self._guards:
            encoded = encoded.replace(g, " ")
        parts = encoded.split(" ")
        encoded = parts[1] if len(parts) in (2, 3) else parts[0]
        if not encoded:
            return ()
        lottery, encoded = encoded[0], encoded[1:]
        for s in self._seps:
            encoded = encoded.replace(s, " ")
        alphabet = self._alphabet
        values = []
        try:
            for chunk in encoded.split(" "):
                alphabet_salt = (lottery + self._salt + alphabet)[: len(alphabet)]
                alphabet = _reorder(alphabet, alphabet_salt)
                values.append(_unhash(chunk, alphabet))
        except ValueError:  # character outside the shuffled alphabet
            return ()
        out = tuple(values)
        # round-trip guard, per the published semantics: a token minted
        # under a different salt (or corrupted) decodes to garbage whose
        # re-encode differs — return () instead of the garbage
        return out if self.encode(*out) == original else ()
