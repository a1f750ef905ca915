"""PackBits RLE (TIFF 6.0 §9 / Compression=32773) — stdlib-only.

Control byte n: 0..127 → copy n+1 literal bytes; 129..255 (-1..-127)
→ repeat the next byte 257-n times; 128 → no-op.  The encoder emits
runs ≥3 as repeats and restarts packets at caller-chosen boundaries
(TIFF requires each pixel row compressed separately — the writer
passes row_bytes so no packet spans a row).
"""

from __future__ import annotations


def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:
            lit = data[i : i + c + 1]
            if len(lit) < c + 1:
                raise ValueError("truncated PackBits literal")
            out += lit
            i += c + 1
        elif c > 128:
            if i >= n:
                raise ValueError("truncated PackBits repeat")
            out += data[i : i + 1] * (257 - c)
            i += 1
        # 128: no-op
    return bytes(out)


def packbits_encode(data: bytes, row_bytes: int | None = None) -> bytes:
    """Encode; with ``row_bytes`` set, packets restart at every row
    boundary (the TIFF §9 rule)."""
    if row_bytes is None:
        rows = [data]
    else:
        rows = [data[i : i + row_bytes] for i in range(0, len(data),
                                                      row_bytes)]
    out = bytearray()
    for row in rows:
        i = 0
        n = len(row)
        while i < n:
            # find run length at i
            j = i + 1
            while j < n and j - i < 128 and row[j] == row[i]:
                j += 1
            if j - i >= 3:
                out.append(257 - (j - i))
                out.append(row[i])
                i = j
                continue
            # literal stretch: until a ≥3 run starts (or 128 bytes)
            lit0 = i
            while i < n and i - lit0 < 128:
                j = i + 1
                while j < n and j - i < 128 and row[j] == row[i]:
                    j += 1
                if j - i >= 3:
                    break
                i = j
            out.append(i - lit0 - 1)
            out += row[lit0:i]
    return bytes(out)
