"""TIFF-variant LZW (sources/tiff_lzw.py) + its geotiff.py wiring.

The bitstream tests are writer-independent: codes are packed by a
separate MSB-first packer implemented inline here, so an encoder bug
cannot hide a matching decoder bug.
"""

import numpy as np
import pytest

from spapy_spark.sources import geotiff, tiff_lzw


def _pack(codes_with_widths):
    """Independent MSB-first bit packer for expected-stream fixtures."""
    acc, bits, out = 0, 0, bytearray()
    for code, width in codes_with_widths:
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def test_known_vector_encode_decode():
    # input 7,7,7,8: CLEAR, 7, <258 = "77">, 8, EOI (all 9-bit)
    data = bytes([7, 7, 7, 8])
    expected = _pack([(256, 9), (7, 9), (258, 9), (8, 9), (257, 9)])
    assert tiff_lzw.lzw_encode(data) == expected
    assert tiff_lzw.lzw_decode(expected) == data


def test_kwkwk_case():
    # "ababab..." forces the code==len(table) branch immediately
    data = b"ababababab"
    assert tiff_lzw.lzw_decode(tiff_lzw.lzw_encode(data)) == data


def test_width_switch_position_is_early():
    # Input crafted so EVERY adjacent pair is novel: each LZW step
    # emits a literal byte code and adds exactly one table entry, so
    # the expected code stream is computable here without a string
    # table — only the TIFF early-change width rule (switch when
    # next_code == 2^width - 1, one entry before the table fills) is
    # modeled, independently of the encoder.
    data = bytes(
        [b for k in range(1, 128) for b in (0, k)]  # (0,k),(k,0) pairs
        + [b for k in range(2, 22) for b in (1, k)]  # 10-bit tail
    )
    codes = [(256, 9)]  # CLEAR
    next_code, width = 258, 9
    for prev in data[:-1]:
        codes.append((prev, width))
        next_code += 1
        if next_code == (1 << width) - 1:  # TIFF early change
            width += 1
    codes.append((data[-1], width))
    codes.append((257, width))  # EOI
    assert width == 10  # the fixture really crosses the boundary
    expected = _pack(codes)
    enc = tiff_lzw.lzw_encode(data)
    assert enc == expected  # byte-exact, pins the switch position
    assert tiff_lzw.lzw_decode(enc) == data


def test_width_switch_big_input_pinned_length():
    # regression pin for the larger structured input: length + stream
    # digest recorded from the libtiff-verified encoder (r4 manual
    # interop check), so a mirrored encoder+decoder drift cannot pass
    import hashlib

    parts = []
    for i in range(256):
        parts.append(bytes([i, (i * 7 + 3) % 256]))
    data = b"".join(parts)
    enc = tiff_lzw.lzw_encode(data)
    assert len(enc) == 611
    assert hashlib.md5(enc).hexdigest() == "43b66fdf339812b60d2a8d39fd741906"
    assert tiff_lzw.lzw_decode(enc) == data


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_random_and_structured(seed):
    rng = np.random.default_rng(seed)
    blobs = [
        rng.integers(0, 256, 8000, dtype=np.uint8).tobytes(),
        rng.integers(0, 3, 60000, dtype=np.uint8).tobytes(),  # resets
        bytes(12000),  # all zero: maximal run compression
    ]
    for b in blobs:
        assert tiff_lzw.lzw_decode(tiff_lzw.lzw_encode(b)) == b


def test_decode_requires_leading_clear():
    with pytest.raises(ValueError, match="ClearCode"):
        tiff_lzw.lzw_decode(_pack([(7, 9), (257, 9)]))


def test_geotiff_lzw_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 4000, (130, 90), dtype=np.uint16)
    p = str(tmp_path / "lzw.tif")
    geotiff.write_geotiff(p, arr, geotransform=(0, 1, 0, 0, 0, -1),
                          compress="lzw", dtype="native")
    info = geotiff.read_info(p)
    assert info.compression == 5
    with open(p, "rb") as f:
        out = geotiff._rows_bytes(info, f, 0, 130)
    np.testing.assert_array_equal(out, arr)


def test_geotiff_lzw_predictor2_roundtrip(tmp_path):
    # LZW + horizontal differencing (GDAL's compressed-DEM default)
    grad = (
        np.arange(100)[:, None] * 3 + np.arange(80)[None, :]
    ).astype(np.int32)
    p = str(tmp_path / "lzw_pred.tif")
    geotiff.write_geotiff(p, grad, geotransform=(0, 1, 0, 0, 0, -1),
                          compress="lzw", dtype="native", predictor=2)
    info = geotiff.read_info(p)
    assert info.compression == 5 and info.predictor == 2
    with open(p, "rb") as f:
        out = geotiff._rows_bytes(info, f, 0, 100)
    np.testing.assert_array_equal(out, grad)
    # smooth data + predictor must beat raw LZW on size
    p2 = str(tmp_path / "lzw_nopred.tif")
    geotiff.write_geotiff(p2, grad, geotransform=(0, 1, 0, 0, 0, -1),
                          compress="lzw", dtype="native")
    import os

    assert os.path.getsize(p) < os.path.getsize(p2)


def test_geotiff_lzw_partial_row_reads(tmp_path):
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 255, (200, 64), dtype=np.uint8)
    p = str(tmp_path / "lzw_rows.tif")
    geotiff.write_geotiff(p, arr, geotransform=(0, 1, 0, 0, 0, -1),
                          compress="lzw")
    info = geotiff.read_info(p)
    with open(p, "rb") as f:
        # windows crossing the 64-row strip boundaries
        for r0, r1 in [(0, 10), (60, 70), (63, 65), (120, 200)]:
            np.testing.assert_array_equal(
                geotiff._rows_bytes(info, f, r0, r1), arr[r0:r1]
            )


# ---------------------------------------------------------------------------
# PackBits (sources/packbits.py, Compression=32773)
# ---------------------------------------------------------------------------


def test_packbits_known_vectors():
    from spapy_spark.sources import packbits as pb

    # the classic TIFF §9 example stream
    enc = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80,
         0x00, 0x2A, 0x22, 0xF7, 0xAA]
    )
    dec = pb.packbits_decode(enc)
    exp = (
        b"\xaa\xaa\xaa\x80\x00\x2a\xaa\xaa\xaa\xaa\x80\x00\x2a\x22"
        + b"\xaa" * 10
    )
    assert dec == exp
    # our encoder must roundtrip the same payload
    assert pb.packbits_decode(pb.packbits_encode(exp)) == exp


def test_packbits_roundtrip_edges():
    from spapy_spark.sources import packbits as pb

    rng = np.random.default_rng(3)
    cases = [
        b"", b"\x00", b"\x00" * 500, bytes(range(256)),
        rng.integers(0, 2, 4096, dtype=np.uint8).tobytes(),
        b"\x01" * 127 + b"\x02" + b"\x03" * 130,
    ]
    for c in cases:
        assert pb.packbits_decode(pb.packbits_encode(c)) == c
        assert pb.packbits_decode(pb.packbits_encode(c, row_bytes=64)) == c


def test_packbits_truncated_streams_raise():
    from spapy_spark.sources import packbits as pb

    # literal control byte promising 5 bytes, only 2 present
    with pytest.raises(ValueError, match="truncated PackBits literal"):
        pb.packbits_decode(bytes([0x04, 0x11, 0x22]))
    # repeat control byte with no payload byte
    with pytest.raises(ValueError, match="truncated PackBits repeat"):
        pb.packbits_decode(bytes([0xFE]))
    # exact-length literal still fine
    assert pb.packbits_decode(bytes([0x01, 0x11, 0x22])) == b"\x11\x22"


def test_geotiff_packbits_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    # blocky data (runs) + noise — exercises both packet kinds
    arr = np.where(
        rng.integers(0, 2, (150, 70)) > 0,
        np.uint8(200),
        rng.integers(0, 255, (150, 70)),
    ).astype(np.uint8)
    p = str(tmp_path / "pb.tif")
    geotiff.write_geotiff(p, arr, geotransform=(0, 1, 0, 0, 0, -1),
                          compress="packbits")
    info = geotiff.read_info(p)
    assert info.compression == 32773
    with open(p, "rb") as f:
        for r0, r1 in [(0, 150), (63, 65), (100, 140)]:
            np.testing.assert_array_equal(
                geotiff._rows_bytes(info, f, r0, r1), arr[r0:r1]
            )
