"""rANS 4x8 codec (io/rans.py): round-trips for order 0 and order 1 over
the payload shapes CRAM blocks carry (quality strings, base runs, names),
plus CRAM blocks declared with compression method 4."""

import io
import numpy as np
import pytest

from rufus_tpu.io import cram, rans

RNG = np.random.default_rng(20260821)


CASES = [
    b"",
    b"A",
    b"IIIIIIIIIIIIIIIIIIIIIIII",                 # constant (degenerate)
    bytes(RNG.integers(33, 74, 5000).astype(np.uint8)),   # qual-like
    bytes(RNG.choice(list(b"ACGTN"), 10001)),             # base-like, odd len
    b"read1\tread2\tread3\t" * 200,
    bytes(RNG.integers(0, 256, 3000).astype(np.uint8)),   # full byte range
    bytes([0, 1, 2, 3] * 1000),                           # consecutive syms
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_order0_roundtrip(i):
    data = CASES[i]
    if not data:
        return
    enc = rans.compress_o0(data)
    assert rans.uncompress(enc) == data


@pytest.mark.parametrize("i", range(len(CASES)))
def test_order1_roundtrip(i):
    data = CASES[i]
    if len(data) < 4:
        return
    enc = rans.compress_o1(data)
    assert enc[0] == 1
    assert rans.uncompress(enc) == data


def test_cram_block_method4():
    """A CRAM block written with method 4 decodes through _read_block."""
    payload = bytes(RNG.integers(33, 74, 4096).astype(np.uint8))
    enc = rans.compress_o1(payload)
    body = (bytes([4]) + cram.write_itf8(cram.CT_EXTERNAL)
            + cram.write_itf8(7) + cram.write_itf8(len(enc))
            + cram.write_itf8(len(payload)) + enc)
    import struct, zlib

    blk = body + struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF)
    ctype, cid, data = cram._read_block(io.BytesIO(blk))
    assert (ctype, cid) == (cram.CT_EXTERNAL, 7)
    assert data == payload
