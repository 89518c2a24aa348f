"""Fixed-point IDCT golden-model checks against an independent float IDCT."""
import numpy as np

from tiny_mp2v_dec_tpu.golden.idct import float_idct_blocks, idct_blocks


def _fdct(res):
    k = np.arange(8)
    c = np.where(k == 0, 1 / np.sqrt(2), 1.0)
    B = 0.5 * c[None, :] * np.cos((2 * k[:, None] + 1) * k[None, :] * np.pi / 16)
    return np.einsum("yv,...yx,xu->...vu", B, res, B)


def test_dc_only():
    # exact fixed-point trace: 512 -> (512*185364)>>16 = 1448 ->
    # (1448*185364)>>16 = 4095 -> >>6 = 63 (true value 64, truncation -1)
    F = np.zeros((1, 64), np.int16)
    F[0, 0] = 512
    out = idct_blocks(F)
    assert (out == 63).all()


def test_single_basis_accuracy():
    # every stored position excites exactly one basis function; fixed point
    # must track the float IDCT within ~1.5 LSB
    for idx in range(64):
        F = np.zeros((1, 64), np.int16)
        F[0, idx] = 1000
        err = np.abs(idct_blocks(F).astype(np.float64) - float_idct_blocks(F))
        assert err.max() < 2.0, idx


def test_realistic_blocks_accuracy():
    rng = np.random.default_rng(1729)
    res = rng.integers(-255, 256, (512, 8, 8)).astype(np.float64)
    F = np.round(_fdct(res)).astype(np.int16)
    Fstore = np.swapaxes(F, -1, -2).reshape(512, 64)
    err = np.abs(idct_blocks(Fstore).astype(np.float64) - float_idct_blocks(Fstore))
    # the SSE2-exact arithmetic (truncating mulhi + two-term multiplies)
    # drifts a few LSB from the ideal float IDCT on dense random blocks;
    # bit-exactness vs the reference binary is enforced separately by
    # tests/test_reference_bitexact.py
    assert err.max() < 6.0
    assert err.mean() < 1.0


def test_int16_wraparound_determinism():
    # adversarial full-range blocks overflow int16 like the reference's
    # fixed-point kernel; the requirement is determinism, not accuracy
    rng = np.random.default_rng(7)
    F = rng.integers(-2048, 2048, (64, 64)).astype(np.int16)
    a = idct_blocks(F)
    b = idct_blocks(F.copy())
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.int16
