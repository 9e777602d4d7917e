"""Minimal dependency-free TensorBoard scalar writer.

Writes standard `events.out.tfevents.*` files that `tensorboard --logdir`
renders, replacing the reference's Lightning/tensorboardX scalar logging
(/root/reference/requirements.txt tensorboardX; exp `self.log` calls) without
paying tensorboardX's ~30 s import on this host. The Event protobuf messages
are hand-encoded (only double/varint/string/float fields are needed) and
framed as TFRecords with masked CRC32C checksums.

Format verified against tensorboardX's own output in
tests/test_train_optim.py (parse-back with tensorboardX.proto.event_pb2).
"""
from __future__ import annotations

import os
import socket
import struct
import time

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78  # CRC32C (Castagnoli), reflected
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
            table.append(crc)
        _CRC_TABLE = table
    return _CRC_TABLE


def _crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _double_field(field: int, value: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", value)


def _varint_field(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value)


def _bytes_field(field: int, data: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(data)) + data


def _float_field(field: int, value: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", value)


def _event(wall_time: float, step: int, *, file_version: str | None = None,
           scalars: dict[str, float] | None = None) -> bytes:
    # Event: 1=wall_time double, 2=step int64, 3=file_version string,
    # 5=summary Summary; Summary: 1=value repeated Value;
    # Value: 1=tag string, 2=simple_value float.
    msg = _double_field(1, wall_time) + _varint_field(2, step)
    if file_version is not None:
        msg += _bytes_field(3, file_version.encode())
    if scalars:
        summary = b"".join(
            _bytes_field(1, _bytes_field(1, tag.encode())
                         + _float_field(2, float(value)))
            for tag, value in scalars.items())
        msg += _bytes_field(5, summary)
    return msg


def _record(event: bytes) -> bytes:
    header = struct.pack("<Q", len(event))
    return (header + struct.pack("<I", _masked_crc(header)) + event
            + struct.pack("<I", _masked_crc(event)))


class ScalarWriter:
    """Append-only scalar event file under `logdir`."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        host = socket.gethostname()
        path = os.path.join(
            logdir, f"events.out.tfevents.{int(time.time())}.{host}")
        self._f = open(path, "ab")
        self.path = path
        self._f.write(_record(_event(time.time(), 0,
                                     file_version="brain.Event:2")))
        self._f.flush()

    def add_scalars(self, step: int, scalars: dict[str, float]) -> None:
        self._f.write(_record(_event(time.time(), int(step),
                                     scalars=scalars)))
        # flush per event (a few hundred bytes/step): a crash must not eat
        # the buffered tail, and live `tensorboard --logdir` reads mid-run
        self._f.flush()

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()
