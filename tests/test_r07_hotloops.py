"""Round-7 second pass: focused regressions for the hot-loop rewrites.

The JPEG whole-scan coders, the AES CBC word cores and the int-keyed
LZW encoders are all bit-for-bit reimplementations of slower forms.
These tests pin the edges the rewrites made newly interesting:
MCU-scaled restart intervals (blocks-per-MCU > 1), CBC chaining vs the
reference block cipher at every key size, and LZW at sub-byte code
sizes.
"""

import numpy as np
import pytest

from vietnamese_ocr_spark.functions.jpeg import jpeg_decode, jpeg_encode


def _rgb(h, w, seed=3):
    g = np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)
    return np.stack([g, 255 - g, g // 2 + 9], axis=-1)


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("ri", [1, 2, 5])
def test_restart_interval_interleaved_rgb(subsample, ri):
    """Baseline restart segments count MCUs, not blocks; the whole-scan
    decoder walks a flattened block sequence, so a 4:2:0 MCU (6 blocks)
    exercises the interval scaling. Decoded pixels must equal the
    restart-free stream's (predictors reset exactly at segment starts)."""
    rgb = _rgb(48, 64)
    with_rst = jpeg_encode(rgb, 85, subsample=subsample, restart_interval=ri)
    without = jpeg_encode(rgb, 85, subsample=subsample)
    assert any(bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8))
    assert np.array_equal(jpeg_decode(with_rst), jpeg_decode(without))


def test_restart_interval_gray_tail_segment():
    """A unit count not divisible by the interval leaves a short final
    segment — the flattened walk must resync there too."""
    g = np.random.RandomState(5).randint(0, 256, (24, 56), dtype=np.uint8)
    # 3x7 = 21 MCUs, interval 4 -> 6 segments, last one of length 1
    enc = jpeg_encode(g, 90, restart_interval=4)
    assert np.array_equal(jpeg_decode(enc), jpeg_decode(jpeg_encode(g, 90)))


@pytest.mark.parametrize("ksz", [16, 24, 32])
def test_cbc_cores_match_reference_block_cipher(ksz):
    """The inlined CBC word cores must chain exactly like CBC built from
    the slow reference block cipher (_encrypt_block, FIPS-197 literal
    form) — checked block by block over a multi-block stream."""
    from vietnamese_ocr_spark.functions.aes import (
        _encrypt_block,
        _expand_key,
        aes_cbc_decrypt_nopad,
        aes_cbc_encrypt_nopad,
    )

    rng = np.random.RandomState(ksz)
    key = bytes(rng.randint(0, 256, ksz, dtype=np.uint8))
    iv = bytes(rng.randint(0, 256, 16, dtype=np.uint8))
    data = bytes(rng.randint(0, 256, 16 * 9, dtype=np.uint8))
    got = aes_cbc_encrypt_nopad(data, key, iv)
    rk = _expand_key(key)
    prev = iv
    ref = bytearray()
    for i in range(0, len(data), 16):
        prev = _encrypt_block(
            bytes(a ^ b for a, b in zip(data[i : i + 16], prev)), rk
        )
        ref += prev
    assert got == bytes(ref)
    assert aes_cbc_decrypt_nopad(got, key, iv) == data


def test_gif_lzw_subbyte_code_size_roundtrip():
    """Int-keyed LZW with min_code_size < 8 (small local palette):
    single codes sit below the clear code, so the implicit code==byte
    singles must still round-trip through the real decoder."""
    from vietnamese_ocr_spark.functions.gifbmp import gif_decode, gif_encode

    idx = (np.arange(31 * 37).reshape(31, 37) % 7).astype(np.uint8)
    palette = np.stack(
        [np.arange(8) * 36, np.arange(8) * 17, 255 - np.arange(8) * 25],
        axis=-1,
    ).astype(np.uint8)
    enc = gif_encode(idx, palette=palette, local_palette=True)
    decoded = gif_decode(enc)
    assert np.array_equal(decoded, palette[idx])


def test_tiff_lzw_encoder_matches_decoder_past_reset():
    """Table reset at 4094 with the int-keyed encoder: a high-entropy
    stream forces thousands of defines and at least one ClearCode."""
    from vietnamese_ocr_spark.functions.tiff import _lzw_decode, _lzw_encode

    rng = np.random.RandomState(11)
    data = bytes(rng.randint(0, 256, 40_000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(data)) == data
