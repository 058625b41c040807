"""K5: TensorBoard scalar-summary event files, dependency-free.

Reference parity: NeuroNER's train loop writes TensorBoard summaries
per epoch (``src/train.py`` summary writer usage).  The sandbox has no
tensorflow/tensorboard package, but the FORMATS are public and tiny:

- TFRecord framing (tensorflow/core/lib/io/record_writer.cc):
  ``uint64 length (LE) | uint32 masked_crc32c(length) | data |
  uint32 masked_crc32c(data)`` with
  ``masked = ((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff``.
- Event protobuf (tensorflow/core/util/event.proto): field 1
  wall_time (double), field 2 step (int64), field 3 file_version
  (string, first record = "brain.Event:2"), field 5 summary.
- Summary/Value (summary.proto): repeated Value (field 1) with tag
  (field 1, string) and simple_value (field 2, float).

Everything is hand-encoded here (varint + fixed-width protobuf wire
format, table-driven CRC32C), so any stock TensorBoard can load the
training curves this engine writes — no TF import anywhere.

``read_tb_events`` parses the files back WITH CRC verification, which
is also how the round-trip test proves the writer's framing correct.
"""

from __future__ import annotations

import os
import struct

# --- CRC32C (Castagnoli, reflected poly 0x82F63B78) --------------------
_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- minimal protobuf wire encoding ------------------------------------
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


def _len_delim(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _scalar_summary(tag: str, value: float) -> bytes:
    val = _len_delim(1, tag.encode()) + struct.pack("<Bf", (2 << 3) | 5, value)
    return _len_delim(1, val)  # Summary.value (repeated field 1)


def _event(wall_time: float, step: int | None = None, summary: bytes | None = None, file_version: str | None = None) -> bytes:
    msg = struct.pack("<Bd", (1 << 3) | 1, wall_time)  # field 1: wall_time
    if step is not None:
        msg += _varint((2 << 3) | 0) + _varint(step)  # field 2: step
    if file_version is not None:
        msg += _len_delim(3, file_version.encode())
    if summary is not None:
        msg += _len_delim(5, summary)
    return msg


def _record(data: bytes) -> bytes:
    length = struct.pack("<Q", len(data))
    return (
        length
        + struct.pack("<I", _masked_crc(length))
        + data
        + struct.pack("<I", _masked_crc(data))
    )


def write_tb_events(
    logdir: str,
    scalars: list[tuple[int, str, float]],
    wall_time: float = 0.0,
    filename: str | None = None,
) -> str:
    """Write scalar summaries to one TensorBoard event file.

    scalars: [(step, tag, value)] — e.g. per-epoch
    ``(epoch, "train/loss", loss)``.  ``wall_time`` is explicit (not
    sampled) so runs are byte-deterministic and resumable tests stay
    stable; pass time.time() for live dashboards.  Returns the file
    path (``events.out.tfevents.<wall_time>.neuroner`` by default,
    the stock TensorBoard discovery pattern)."""
    os.makedirs(logdir, exist_ok=True)
    name = filename or f"events.out.tfevents.{int(wall_time)}.neuroner"
    path = os.path.join(logdir, name)
    with open(path, "wb") as f:
        f.write(_record(_event(wall_time, file_version="brain.Event:2")))
        for step, tag, value in scalars:
            ev = _event(wall_time, step=step, summary=_scalar_summary(tag, float(value)))
            f.write(_record(ev))
    return path


# --- reader (CRC-verified) ---------------------------------------------
def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _parse_event(buf: bytes) -> dict:
    out: dict = {"scalars": {}}
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 1:  # fixed64
            (v,) = struct.unpack_from("<d", buf, i)
            i += 8
            if field == 1:
                out["wall_time"] = v
        elif wire == 0:  # varint
            v, i = _read_varint(buf, i)
            if field == 2:
                out["step"] = v
        elif wire == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            payload = buf[i : i + ln]
            i += ln
            if field == 3:
                out["file_version"] = payload.decode()
            elif field == 5:  # Summary: repeated Value
                j = 0
                while j < len(payload):
                    vkey, j = _read_varint(payload, j)
                    vln, j = _read_varint(payload, j)
                    value_msg = payload[j : j + vln]
                    j += vln
                    if vkey >> 3 != 1:
                        continue
                    k = 0
                    tag, val = None, None
                    while k < len(value_msg):
                        fkey, k = _read_varint(value_msg, k)
                        ff, fw = fkey >> 3, fkey & 7
                        if fw == 2:
                            fl, k = _read_varint(value_msg, k)
                            if ff == 1:
                                tag = value_msg[k : k + fl].decode()
                            k += fl
                        elif fw == 5:
                            if ff == 2:
                                (val,) = struct.unpack_from("<f", value_msg, k)
                            k += 4
                        elif fw == 0:
                            _, k = _read_varint(value_msg, k)
                        elif fw == 1:
                            k += 8
                    if tag is not None and val is not None:
                        out["scalars"][tag] = val
        elif wire == 5:
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return out


def read_tb_events(path: str) -> list[dict]:
    """Parse an event file back (framing CRCs verified — raises on a
    corrupt record).  Returns one dict per event:
    {'wall_time', 'step'?, 'file_version'?, 'scalars': {tag: value}}."""
    events = []
    with open(path, "rb") as f:
        blob = f.read()
    i = 0
    while i < len(blob):
        length_bytes = blob[i : i + 8]
        (length,) = struct.unpack("<Q", length_bytes)
        (len_crc,) = struct.unpack("<I", blob[i + 8 : i + 12])
        if len_crc != _masked_crc(length_bytes):
            raise ValueError(f"length CRC mismatch at offset {i}")
        data = blob[i + 12 : i + 12 + length]
        (data_crc,) = struct.unpack("<I", blob[i + 12 + length : i + 16 + length])
        if data_crc != _masked_crc(data):
            raise ValueError(f"data CRC mismatch at offset {i}")
        events.append(_parse_event(data))
        i += 16 + length
    return events


def write_training_summaries(history: list[dict], logdir: str, wall_time: float = 0.0) -> str:
    """K5 sink: render a ``train_full_network`` history (list of
    per-epoch dicts with 'epoch', 'loss', optional 'valid_f1') into
    TensorBoard scalars."""
    scalars: list[tuple[int, str, float]] = []
    for h in history:
        step = int(h["epoch"])
        if h.get("loss") is not None:
            scalars.append((step, "train/loss", float(h["loss"])))
        if h.get("valid_f1") is not None:
            scalars.append((step, "valid/f1", float(h["valid_f1"])))
    return write_tb_events(logdir, scalars, wall_time=wall_time)
