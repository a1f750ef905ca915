"""From-scratch RIFF/WAVE PCM codec (no soundfile/scipy.io) — the
audio half of the multimodal mandate, same pattern as sources/png.py
and sources/jpeg.py: stdlib struct + numpy, real bytes in, arrays out.

Scope: canonical RIFF little-endian WAVE with a PCM (format 1) or
IEEE-float (format 3) ``fmt `` chunk; 8-bit unsigned, 16/24/32-bit
signed, float32/float64 samples; any channel count; unknown chunks
(LIST, fact, cue…) skipped by their declared size, as a real-world
file requires.  24-bit samples are sign-extended manually (numpy has
no 3-byte dtype).

The reference itself has no audio path (SpaPy is geospatial); this
exists for the driver's multimodal-pipeline mandate and mirrors what
`scipy.io.wavfile.read` would return: (sample_rate, samples[n, ch]).
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1
_FMT_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples shaped (n, channels), sample_rate).

    Sample dtype is preserved: u1 for 8-bit, i2/i4 for 16/32-bit,
    i4 (sign-extended) for 24-bit, f4/f8 for IEEE float."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload ({payload[:4]!r})")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from(
        "<I", payload, 4)[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (csz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            (afmt, nch, rate, _br, _ba, bits) = struct.unpack_from(
                "<HHIIHH", body, 0)
            if afmt == _FMT_EXTENSIBLE and csz >= 40:
                # WAVE_FORMAT_EXTENSIBLE: real format id leads the GUID
                (afmt,) = struct.unpack_from("<H", body, 24)
            fmt = (afmt, nch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    afmt, nch, rate, bits = fmt
    if afmt == _FMT_PCM:
        if bits == 8:
            a = np.frombuffer(data, dtype=np.uint8)
        elif bits == 16:
            a = np.frombuffer(data, dtype="<i2")
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3).astype(np.uint32)
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            a = v.astype(np.int32)
            a[a >= 1 << 23] -= 1 << 24  # sign-extend
        elif bits == 32:
            a = np.frombuffer(data, dtype="<i4")
        else:
            raise NotImplementedError(f"PCM bits={bits}")
    elif afmt == _FMT_FLOAT:
        if bits == 32:
            a = np.frombuffer(data, dtype="<f4")
        elif bits == 64:
            a = np.frombuffer(data, dtype="<f8")
        else:
            raise NotImplementedError(f"float bits={bits}")
    else:
        raise NotImplementedError(f"WAV audio format {afmt}")
    n = len(a) // nch
    return a[: n * nch].reshape(n, nch), int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) or (n,) array → canonical WAV bytes.  uint8 →
    8-bit PCM, int16/int32 → PCM, float32/float64 → IEEE float."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    nch = a.shape[1]
    kind, size = a.dtype.kind, a.dtype.itemsize
    if kind == "u" and size == 1:
        afmt, bits = _FMT_PCM, 8
    elif kind == "i" and size in (2, 4):
        afmt, bits = _FMT_PCM, size * 8
    elif kind == "f" and size in (4, 8):
        afmt, bits = _FMT_FLOAT, size * 8
    else:
        raise ValueError(f"unsupported sample dtype {a.dtype}")
    a = a.astype(a.dtype.newbyteorder("<"))
    data = np.ascontiguousarray(a).tobytes()
    ba = nch * bits // 8
    fmt = struct.pack("<HHIIHH", afmt, nch, sample_rate,
                      sample_rate * ba, ba, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body
