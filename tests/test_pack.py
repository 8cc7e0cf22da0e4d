"""Transport packing round-trip exactness (ops/pack.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from rufus_tpu.ops import pack


def test_pack_roundtrip_reads():
    rng = np.random.default_rng(0)
    for L in (152, 150, 7, 1, 64):
        reads = rng.choice(np.frombuffer(b"ACGTNacgtX", np.uint8),
                           size=(33, L)).astype(np.uint8)
        packed, nmask = pack.pack_reads(reads)
        assert packed.shape[1] == -(-L // 4)
        got = np.asarray(jax.jit(
            lambda p, m: pack.unpack_reads_device(p, m, L))(
                jnp.asarray(packed), jnp.asarray(nmask)))
        want = reads.copy()
        up = np.char.upper(want.view("S1")).view(np.uint8).reshape(want.shape)
        want = np.where(np.isin(up, np.frombuffer(b"ACGT", np.uint8)),
                        up, ord("N"))
        np.testing.assert_array_equal(got, want)


def test_pack_qual_threshold_exact():
    rng = np.random.default_rng(1)
    L, minq = 151, 15
    quals = rng.integers(33, 33 + 42, size=(17, L)).astype(np.uint8)
    okm = pack.pack_qual_ok(quals, minq)
    got = np.asarray(jax.jit(
        lambda m: pack.unpack_qual_device(m, L))(jnp.asarray(okm)))
    # thresholding the reconstructed plane == thresholding the original
    np.testing.assert_array_equal(got >= 33 + minq, quals >= 33 + minq)


def test_packed_count_equals_text_count():
    """The count chain over device-unpacked reads equals the chain over
    the original ASCII batch (the transport substitution is invisible)."""
    from rufus_tpu.ops import count

    rng = np.random.default_rng(2)
    reads = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(64, 80))
    reads[rng.random(reads.shape) < 0.02] = ord("N")
    reads = reads.astype(np.uint8)
    packed, nmask = pack.pack_reads(reads)
    dev_reads = jax.jit(lambda p, m: pack.unpack_reads_device(p, m, 80))(
        jnp.asarray(packed), jnp.asarray(nmask))
    k = 13
    a = count.count_reads_batch(jnp.asarray(reads), k)
    b = count.count_reads_batch(dev_reads, k)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
