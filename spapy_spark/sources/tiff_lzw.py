"""TIFF-variant LZW codec (TIFF 6.0 §13) — stdlib-only.

This is NOT the GIF flavor (sources/gif.py): TIFF packs codes
MSB-first, starts at 9 bits with ClearCode=256 / EOI=257, and uses
the "early change" width rule — the code width bumps when the NEXT
table index reaches 2^width - 1, one entry earlier than the natural
rule (libtiff/GDAL default; files written the other way are the
long-documented "old-style LZW" incompatibility).

Used by sources/geotiff.py for Compression=5 strips/tiles; the
encoder exists so the reader is tested against real multi-width
streams (and so the writer can emit GDAL-readable LZW).
"""

from __future__ import annotations

_CLEAR = 256
_EOI = 257
_MAX_BITS = 12


def lzw_decode(data: bytes) -> bytes:
    """Decode a TIFF §13 LZW byte stream (MSB-first, early change)."""
    out = bytearray()
    nbits = len(data) * 8
    bitpos = 0
    code_size = 9
    table: list[bytes] = []
    prev = b""

    def read_code(size: int) -> int:
        nonlocal bitpos
        if bitpos + size > nbits:
            return _EOI
        byte0 = bitpos >> 3
        byte1 = (bitpos + size - 1) >> 3
        chunk = int.from_bytes(data[byte0 : byte1 + 1], "big")
        shift = (byte1 + 1) * 8 - (bitpos + size)
        bitpos += size
        return (chunk >> shift) & ((1 << size) - 1)

    while True:
        code = read_code(code_size)
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            code_size = 9
            prev = b""
            continue
        if not table:
            raise ValueError("LZW stream must start with ClearCode")
        if prev == b"":
            if code >= len(table):
                raise ValueError("bad first code after Clear")
            entry = table[code]
            out += entry
            prev = entry
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("LZW code out of range")
            out += entry
            table.append(prev + entry[:1])
            prev = entry
        # early change (libtiff convention): the decoder's table lags
        # the encoder's by one entry, so the mirrored switch point is
        # 2^width - 2 here vs 2^width - 1 in the encoder — both sides
        # then change width at the same stream position
        if len(table) == (1 << code_size) - 2 and code_size < _MAX_BITS:
            code_size += 1
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """Encode bytes as TIFF §13 LZW (MSB-first, early change, table
    reset before the 12-bit space fills — the exact mirror of
    lzw_decode, which tests assert by roundtrip and known vectors)."""
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << size) | code
        acc_bits += size
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(256)}, 258, 9

    emit(_CLEAR, 9)
    table, next_code, code_size = fresh()
    w = b""
    for i in range(len(data)):
        ch = data[i : i + 1]
        wc = w + ch
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << code_size) - 1 and code_size < _MAX_BITS:
            code_size += 1
        elif next_code == (1 << _MAX_BITS) - 2:
            # table nearly full: reset (decoder mirrors via ClearCode)
            emit(_CLEAR, code_size)
            table, next_code, code_size = fresh()
        w = ch
    if w:
        emit(table[w], code_size)
    emit(_EOI, code_size)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)
