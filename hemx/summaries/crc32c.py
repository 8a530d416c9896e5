"""CRC-32C (Castagnoli) with TFRecord masking.

Needed for tfevents/TFRecord framing (the reference relied on TF's C++
writers; hemx writes the format directly so TensorBoard keeps working
without a TensorFlow dependency).
"""

from __future__ import annotations

_POLY = 0x82F63B78
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _TABLE.append(_c)


def _py_crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


_native_crc = None


def _load_native():
    global _native_crc
    if _native_crc is None:
        try:
            from hemx import native
            mod = native.load()
            _native_crc = mod.crc32c if mod is not None else _py_crc32c
        except Exception:
            _native_crc = _py_crc32c
    return _native_crc


def crc32c(data: bytes, crc: int = 0) -> int:
    if crc == 0:
        return int(_load_native()(data))
    return _py_crc32c(data, crc)


def masked_crc32c(data: bytes) -> int:
    """TFRecord-masked crc: rotate right 15 and add magic."""
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF
