"""TFRecord file IO without TensorFlow.

The reference delegated to TF's C++ TFRecordDataset/TFRecordWriter
(data.py:34-60, hem/data/DataPlugin.py). hemx reads/writes the format
directly: records framed as

    uint64 length | uint32 masked_crc(length) | bytes data | uint32 masked_crc(data)

CRCs are written correctly; on read they are skipped by default (TF's
default behavior) unless ``verify=True``.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

from hemx.summaries.crc32c import masked_crc32c


def _native():
    """Optional C++ fast path (hemx/native, built on demand); None if the
    toolchain is unavailable — every caller has a pure-python fallback."""
    from hemx import native
    return native.load()


class TFRecordWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "wb")

    def write(self, record: bytes) -> None:
        header = struct.pack("<Q", len(record))
        self._f.write(header)
        self._f.write(struct.pack("<I", masked_crc32c(header)))
        self._f.write(record)
        self._f.write(struct.pack("<I", masked_crc32c(record)))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def tfrecord_iterator(path: str, verify: bool = False) -> Iterator[bytes]:
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            hcrc = f.read(4)
            record = f.read(length)
            dcrc = f.read(4)
            if len(hcrc) < 4 or len(record) < length or len(dcrc) < 4:
                # mid-record EOF = truncated (partially written) file, not
                # a clean end; silence here would train on a silently
                # shortened dataset
                raise IOError(
                    f"truncated tfrecord file {path}: record of {length} "
                    f"bytes cut off at EOF")
            if verify:
                if struct.unpack("<I", hcrc)[0] != masked_crc32c(header):
                    raise IOError(f"corrupt header crc in {path}")
                if struct.unpack("<I", dcrc)[0] != masked_crc32c(record):
                    raise IOError(f"corrupt record crc in {path}")
            yield record


def read_all_records(path: str, verify: bool = False) -> list[bytes]:
    native = _native()
    if native is not None:
        return native.read_all_records(path, verify)
    return list(tfrecord_iterator(path, verify))


def count_records(path: str) -> int:
    """Record count by scan (reference counted by full dataset iteration,
    hem/util/data.py:72 / data.py:56); here we only walk the framing, and the
    result is cached next to the file."""
    cache = path + ".count"
    try:
        if os.path.getmtime(cache) >= os.path.getmtime(path):
            with open(cache) as f:
                return int(f.read().strip())
    except (OSError, ValueError):
        pass
    native = _native()
    if native is not None:
        n = int(native.count_records(path))
        try:
            with open(cache, "w") as f:
                f.write(str(n))
        except OSError:
            pass
        return n
    n = 0
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            end = f.tell() + length + 8
            if end > size:
                raise IOError(
                    f"truncated tfrecord file {path}: record of {length} "
                    f"bytes cut off at EOF")
            f.seek(end)
            n += 1
    try:
        with open(cache, "w") as f:
            f.write(str(n))
    except OSError:
        pass
    return n
