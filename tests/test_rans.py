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
    bytes(RNG.integers(33, 74, 4099).astype(np.uint8)),   # len % 4 == 3
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


# ---------------------------------------------------------------------------
# htslib format compatibility: the frequency-table RLE byte goes right
# after the second consecutive symbol byte, BEFORE that symbol's freq
# (htslib rans_compress_O0); same scheme for order-1 context ids.
# ---------------------------------------------------------------------------


def test_freq_table_layout_htslib_example():
    # htslib-format table for {A:10, B:20, C:30}: sym 65, f=10, sym 66,
    # rle=1 (one more follows), f=20, f=30, terminator.
    table = bytes([65, 10, 66, 1, 20, 30, 0])
    freqs, pos = rans._read_freqs(table, 0)
    assert freqs == {65: 10, 66: 20, 67: 30}
    assert pos == len(table)
    out = bytearray()
    rans._write_freqs(out, freqs)
    assert bytes(out) == table


def test_freq_table_layout_runs_and_two_byte_freqs():
    freqs = {40: 300, 41: 5, 42: 7, 43: 9, 100: 2}
    out = bytearray()
    rans._write_freqs(out, freqs)
    expect = bytes([40, 0x80 | (300 >> 8), 300 & 0xFF,  # 40 alone so far
                    41, 2,                               # run: 2 more follow
                    5, 7, 9,                             # f41 f42 f43
                    100, 2, 0])
    assert bytes(out) == expect
    got, pos = rans._read_freqs(bytes(out), 0)
    assert got == freqs
    assert pos == len(out)


def _enc_put_c(state, ptr, freq, cum):
    """RansEncPutSymbol transcribed from htslib rANS_static.c (renorm
    then encode); ptr is a list collecting bytes in reverse order."""
    x_max = ((rans.RANS_BYTE_L >> rans.TF_SHIFT) << 8) * freq
    while state >= x_max:
        ptr.append(state & 0xFF)
        state >>= 8
    return ((state // freq) << rans.TF_SHIFT) + (state % freq) + cum


def _htslib_o0_encode(data: bytes) -> bytes:
    """Independent transcription of htslib rans_compress_O0 (table write
    loop and the 3/2/1/0 state interleave), for cross-validation against
    rans.uncompress. Shares only _normalize with the module under test."""
    import struct

    F = [0] * 256
    for b in data:
        F[b] += 1
    norm = rans._normalize({s: c for s, c in enumerate(F) if c})
    freqs = [norm.get(s, 0) for s in range(256)]
    cum = [0] * 257
    for s in range(256):
        cum[s + 1] = cum[s] + freqs[s]
    # table: the htslib write loop, verbatim control flow
    cp = bytearray()
    rle = 0
    for j in range(256):
        if not freqs[j]:
            continue
        if rle:
            rle -= 1
        else:
            cp.append(j)
            if j and freqs[j - 1]:
                rle = j + 1
                while rle < 256 and freqs[rle]:
                    rle += 1
                rle -= j + 1
                cp.append(rle)
        if freqs[j] >= 128:
            cp.append(0x80 | (freqs[j] >> 8))
            cp.append(freqs[j] & 0xFF)
        else:
            cp.append(freqs[j])
    cp.append(0)
    # payload: remainder first (reverse encode), then groups of 4 with
    # states 3,2,1,0; flush writes state0..3 LE32 at the stream front
    states = [rans.RANS_BYTE_L] * 4
    ptr: list[int] = []
    n = len(data)
    rem = n & 3
    if rem >= 3:
        s = data[n - 1]
        states[2] = _enc_put_c(states[2], ptr, freqs[s], cum[s])
    if rem >= 2:
        s = data[n - rem + 1]
        states[1] = _enc_put_c(states[1], ptr, freqs[s], cum[s])
    if rem >= 1:
        s = data[n - rem]
        states[0] = _enc_put_c(states[0], ptr, freqs[s], cum[s])
    for i in range(n & ~3, 0, -4):
        for j, off in ((3, 1), (2, 2), (1, 3), (0, 4)):
            s = data[i - off]
            states[j] = _enc_put_c(states[j], ptr, freqs[s], cum[s])
    head = b"".join(struct.pack("<I", states[j]) for j in range(4))
    payload = bytes(cp) + head + bytes(reversed(ptr))
    return (bytes([0]) + struct.pack("<I", len(payload))
            + struct.pack("<I", n) + payload)


def _htslib_o1_encode(data: bytes) -> bytes:
    """Independent transcription of htslib rans_compress_O1: quarter
    split, context-0 seeds, remainder on state 3 first, per-iteration
    3/2/1/0 interleave, context tables with the ctx-RLE byte before the
    inner table."""
    import struct

    n = len(data)
    isz4 = n >> 2
    F = [[0] * 256 for _ in range(256)]
    T = [0] * 256
    for i in range(1, n):
        F[data[i - 1]][data[i]] += 1
        T[data[i - 1]] += 1
    for j in range(4):
        s = data[j * isz4] if j else data[0]
        F[0][s] += 1
        T[0] += 1
    norm = {}
    cums = {}
    for c in range(256):
        if not T[c]:
            continue
        norm[c] = rans._normalize(
            {s: f for s, f in enumerate(F[c]) if f})
        cums[c] = rans._cum(norm[c])
    cp = bytearray()
    rle_i = 0
    for i in range(256):
        if not T[i]:
            continue
        if rle_i:
            rle_i -= 1
        else:
            cp.append(i)
            if i and T[i - 1]:
                rle_i = i + 1
                while rle_i < 256 and T[rle_i]:
                    rle_i += 1
                rle_i -= i + 1
                cp.append(rle_i)
        rans._write_freqs(cp, norm[i])
    cp.append(0)

    def put(j, ctx, s, states, ptr):
        f = norm[ctx][s]
        states[j] = _enc_put_c(states[j], ptr, f, cums[ctx][s])

    states = [rans.RANS_BYTE_L] * 4
    ptr: list[int] = []
    iN = [1 * isz4 - 2, 2 * isz4 - 2, 3 * isz4 - 2, n - 2]
    lN = [data[iN[j] + 1] for j in range(4)]
    # remainder of the last quarter (encoded first; reverse order)
    i3 = n - 2
    while i3 > 4 * isz4 - 2 and i3 >= 0:
        put(3, data[i3], lN[3], states, ptr)
        lN[3] = data[i3]
        i3 -= 1
    iN[3] = i3
    while iN[0] >= 0:
        for j in (3, 2, 1, 0):
            c = data[iN[j]]
            put(j, c, lN[j], states, ptr)
            lN[j] = c
            iN[j] -= 1
    # first byte of each quarter: context 0
    for j in (3, 2, 1, 0):
        put(j, 0, lN[j], states, ptr)
    head = b"".join(struct.pack("<I", states[j]) for j in range(4))
    payload = bytes(cp) + head + bytes(reversed(ptr))
    return (bytes([1]) + struct.pack("<I", len(payload))
            + struct.pack("<I", n) + payload)


@pytest.mark.parametrize("i", range(len(CASES)))
def test_htslib_o0_stream_decodes(i):
    data = CASES[i]
    if not data:
        return
    enc = _htslib_o0_encode(data)
    assert rans.uncompress(enc) == data
    # identical normalization => byte-identical streams; any layout or
    # interleave drift in either implementation breaks this
    assert enc == rans.compress_o0(data)


@pytest.mark.parametrize("i", range(len(CASES)))
def test_htslib_o1_stream_decodes(i):
    data = CASES[i]
    if len(data) < 8:
        return
    enc = _htslib_o1_encode(data)
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
