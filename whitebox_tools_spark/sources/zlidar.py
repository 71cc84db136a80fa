"""zLidar (.zlidar) codec — WhiteboxTools' compressed LiDAR format.

Transcribed from the reference's decode rules (semantics, not code):
- container: whitebox-lidar/src/las.rs:1421-2520 (read_zlidar_data) —
  LAS-shaped header with "ZLDR" signature, VLR block, then point-data
  blocks of [num_fields u8][compression u8][major u8][minor u8] followed
  by per-field headers ([code u8][abs offset u64][nbytes u64], with a
  second [offset u64][nbytes u64] for the two-stream fields 4/5/6/10/12)
  and DEFLATE payloads (zlidar_compression.rs; Brotli unsupported here —
  no brotli lib in this container, method byte 0 = Deflate).
- field codings (las.rs case arms):
  0  change byte: bit0 scanner-channel change, bit1 gps change,
     bits2-3 return-number code, bit4 num-returns change, bit5
     classification change, bit6 scan-angle change, bit7 intensity
     stored wide
  1  scanner channel: 2-bit packed news
  2/3 return number / num returns: 4-bit packed news, per-channel prevs
  4/5/6 x/y/z: nibble tag stream (0-12 => delta-of-delta + tag-6;
     13/14/15 => i8/i16/i32 extra) + value stream; double-delta over
     per-(channel, context) previous indices, context = (this return
     class) * 4 + (previous point's return class) with classes
     only/last/intermediate/first (las.rs:6570-6594)
  7  intensity: first u16 then u8-or-u16 per change bit7
  8  flags: one byte per point (synthetic/keypoint/withheld/overlap,
     bit4 scan direction, bit5 edge of flightline)
  9  classification: first byte + news per change bit5
  11 scan angle: i16 stream, news per change bit6
  13 gps time: f64 stream, first absolute then per-channel deltas

Parity status: the encoder inverts these rules exactly and the decoder
follows them literally; round-trip is bit-exact and pytest-gated. The
reference binary is not runnable in this sandbox, so cross-decoding the
reference's own files is untested (documented limitation).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_ONLY, _LAST, _INTER, _FIRST = 0, 1, 2, 3


def _ret_class(ret: int, nret: int) -> int:
    if nret == 1:
        return _ONLY
    if ret == nret:
        return _LAST
    if 1 < ret < nret:
        return _INTER
    return _FIRST


def _contexts(rets: np.ndarray, nrets: np.ndarray) -> np.ndarray:
    cls = np.empty(len(rets), dtype=np.int64)
    for i in range(len(rets)):
        cls[i] = _ret_class(int(rets[i]), int(nrets[i]))
    prev = np.roll(cls, 1)
    prev[0] = 0  # i == 0 -> class 0 (las.rs:6582 treats it as only)
    return cls * 4 + prev


class _NibbleWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.bits = 0

    def push(self, nibble: int, width: int = 4):
        if self.bits == 0:
            self.bytes.append(nibble & ((1 << width) - 1))
            self.bits = width
        else:
            self.bytes[-1] |= (nibble & ((1 << width) - 1)) << self.bits
            self.bits += width
            if self.bits >= 8:
                self.bits = 0

    def data(self) -> bytes:
        return bytes(self.bytes)


class _NibbleReader:
    def __init__(self, data: bytes, width: int = 4):
        self.data = data
        self.pos = 0
        self.bits = 0
        self.width = width

    def read(self) -> int:
        v = (self.data[self.pos] >> self.bits) & ((1 << self.width) - 1)
        self.bits += self.width
        if self.bits >= 8 and self.pos < len(self.data) - 1:
            self.pos += 1
            self.bits = 0
        elif self.bits >= 8:
            self.bits = 8  # stay on last byte (las.rs guard)
        return v


def _encode_coord(vals: np.ndarray, chans: np.ndarray,
                  ctxs: np.ndarray) -> tuple[bytes, bytes]:
    """Inverse of the x/y/z decode: (tag nibble stream, value stream)."""
    n = len(vals)
    tags = _NibbleWriter()
    out = bytearray()
    tags.push(15)
    out += struct.pack("<i", int(vals[0]))
    delta_values = [int(vals[0])]
    prev_vals = [int(vals[0])] * 4
    prev_index = [[0] * 16 for _ in range(4)]
    for j in range(1, n):
        ch = int(chans[j])
        cx = int(ctxs[j])
        delta_j = int(vals[j]) - prev_vals[ch]
        v2 = delta_j - delta_values[prev_index[ch][cx]]
        if -6 <= v2 <= 6:
            tags.push(v2 + 6)
        elif -128 <= v2 <= 127:
            tags.push(13)
            out += struct.pack("<b", v2)
        elif -32768 <= v2 <= 32767:
            tags.push(14)
            out += struct.pack("<h", v2)
        else:
            tags.push(15)
            out += struct.pack("<i", v2)
        delta_values.append(delta_j)
        prev_index[ch][cx] = j
        prev_vals[ch] = int(vals[j])
    return tags.data(), bytes(out)


def _decode_coord(tag_stream: bytes, val_stream: bytes, n: int,
                  chans: np.ndarray, ctxs: np.ndarray) -> np.ndarray:
    rd = _NibbleReader(tag_stream)
    pos = [0]

    def take(fmt, size):
        v = struct.unpack_from(fmt, val_stream, pos[0])[0]
        pos[0] += size
        return v

    out = np.empty(n, dtype=np.int64)
    tag = rd.read()
    assert tag == 15, "first coordinate must be tag 15"
    v0 = take("<i", 4)
    out[0] = v0
    delta_values = [v0]
    prev_vals = [v0] * 4
    prev_index = [[0] * 16 for _ in range(4)]
    for j in range(1, n):
        tag = rd.read()
        if tag < 13:
            v2 = tag - 6
        elif tag == 13:
            v2 = take("<b", 1)
        elif tag == 14:
            v2 = take("<h", 2)
        else:
            v2 = take("<i", 4)
        ch = int(chans[j])
        cx = int(ctxs[j])
        delta_j = v2 + delta_values[prev_index[ch][cx]]
        delta_values.append(delta_j)
        out[j] = prev_vals[ch] + delta_j
        prev_vals[ch] = int(out[j])
        prev_index[ch][cx] = j
    return out


def write_zlidar(points: list[dict], path: str, fmt: int = 1,
                 scale=(0.01, 0.01, 0.01), offset=(0.0, 0.0, 0.0),
                 level: int = 6) -> None:
    """Write a .zlidar file (single point block, Deflate)."""
    n = len(points)
    xs = np.array([round((p["x"] - offset[0]) / scale[0]) for p in points],
                  dtype=np.int64)
    ys = np.array([round((p["y"] - offset[1]) / scale[1]) for p in points],
                  dtype=np.int64)
    zs = np.array([round((p["value"] - offset[2]) / scale[2]) for p in points],
                  dtype=np.int64)
    rets = np.array([p.get("return_number", 1) for p in points], dtype=np.int64)
    nrets = np.array([p.get("num_returns", 1) for p in points], dtype=np.int64)
    chans = np.zeros(n, dtype=np.int64)  # scanner channel not modeled
    intens = np.minimum(np.array([p.get("intensity", 0) for p in points],
                             dtype=np.int64), 65535)  # u16 clamp
    cls = np.array([p.get("classification", 0) for p in points], dtype=np.int64)
    sang = np.array([p.get("scan_angle", 0) for p in points], dtype=np.int64)
    sdir = np.array([p.get("scan_direction", 0) for p in points], dtype=np.int64)
    edge = np.array([p.get("edge_flag", 0) for p in points], dtype=np.int64)
    gps = np.array([p.get("gps_time", 0.0) for p in points], dtype=np.float64)
    ctxs = _contexts(rets, nrets)

    # ---- change bytes + per-field payload streams ----
    change = bytearray(n)
    ret_stream = _NibbleWriter()
    ret_stream.push(int(rets[0]))
    nret_stream = _NibbleWriter()
    nret_stream.push(int(nrets[0]))
    cls_stream = bytearray([int(cls[0])])
    sang_stream = bytearray(struct.pack("<h", int(sang[0])))
    gps_stream = bytearray(struct.pack("<d", float(gps[0])))
    inten_stream = bytearray(struct.pack("<H", int(intens[0])))
    prev_ret = [int(rets[0])] * 4
    prev_nret = [int(nrets[0])] * 4
    prev_cls = [int(cls[0])] * 4
    prev_sang = [int(sang[0])] * 4
    prev_gps = [float(gps[0])] * 4
    for j in range(1, n):
        ch = 0
        b = 0
        # return number code (bits 2-3)
        if rets[j] == prev_ret[ch]:
            code = 0
        elif rets[j] == prev_ret[ch] + 1:
            code = 1
            prev_ret[ch] += 1
        elif rets[j] == prev_ret[ch] - 1:
            code = 2
            prev_ret[ch] -= 1
        else:
            code = 3
            ret_stream.push(int(rets[j]))
            prev_ret[ch] = int(rets[j])
        b |= code << 2
        if nrets[j] != prev_nret[ch]:
            b |= 1 << 4
            nret_stream.push(int(nrets[j]))
            prev_nret[ch] = int(nrets[j])
        if cls[j] != prev_cls[ch]:
            b |= 1 << 5
            cls_stream.append(int(cls[j]))
            prev_cls[ch] = int(cls[j])
        if sang[j] != prev_sang[ch]:
            b |= 1 << 6
            sang_stream += struct.pack("<h", int(sang[j]))
            prev_sang[ch] = int(sang[j])
        if intens[j] > 255:
            b |= 1 << 7
            inten_stream += struct.pack("<H", int(intens[j]))
        else:
            inten_stream.append(int(intens[j]))
        if fmt == 1 and gps[j] != prev_gps[ch]:
            b |= 1 << 1
            gps_stream += struct.pack("<d", float(gps[j]) - prev_gps[ch])
            prev_gps[ch] = float(gps[j])
        change[j] = b
    chan_stream = bytes([0])  # channel 0 everywhere, no change bits set
    # one flag byte per point: cast to uint8 BEFORE bytes() — bytes() over an
    # int64 array would serialize the raw 8-byte buffer per element, corrupting
    # scan_direction/edge_flag for every point after the first on decode.
    flags_stream = bytes((((sdir & 1) << 4) | ((edge & 1) << 5)).astype(np.uint8))
    xt, xv = _encode_coord(xs, chans, ctxs)
    yt, yv = _encode_coord(ys, chans, ctxs)
    zt, zv = _encode_coord(zs, chans, ctxs)

    def C(b: bytes) -> bytes:
        return zlib.compress(bytes(b), level)

    # (code, stream1, stream2-or-None)
    fields = [
        (0, C(change), None),
        (1, C(chan_stream), None),
        (2, C(ret_stream.data()), None),
        (3, C(nret_stream.data()), None),
        (4, C(xt), C(xv)),
        (5, C(yt), C(yv)),
        (6, C(zt), C(zv)),
        (7, C(inten_stream), None),
        (8, C(flags_stream), None),
        (9, C(cls_stream), None),
        (11, C(sang_stream), None),
    ]
    if fmt == 1:
        fields.append((13, C(gps_stream), None))

    header_size = 375
    offset_to_points = header_size
    # block = [4-byte block header][field headers][payloads]
    hdr_len = sum(17 + (16 if s2 is not None else 0) for _c, _s1, s2 in fields)
    payload_base = offset_to_points + 4 + hdr_len
    fhdr = bytearray()
    payload = bytearray()
    for code, s1, s2 in fields:
        fhdr.append(code)
        fhdr += struct.pack("<QQ", payload_base + len(payload), len(s1))
        payload += s1
        if s2 is not None:
            fhdr += struct.pack("<QQ", payload_base + len(payload), len(s2))
            payload += s2

    header = bytearray(header_size)
    header[0:4] = b"ZLDR"
    header[24] = 1   # version major
    header[25] = 2   # version minor
    struct.pack_into("<H", header, 94, header_size)
    struct.pack_into("<I", header, 96, offset_to_points)
    struct.pack_into("<I", header, 100, 0)       # number of VLRs
    header[104] = fmt
    struct.pack_into("<H", header, 105, 28 if fmt == 1 else 20)
    struct.pack_into("<I", header, 107, n)       # number_of_points_old
    struct.pack_into("<6d", header, 131, *scale, *offset)
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(bytes([len(fields), 0 | (level << 3), 1, 1]))  # Deflate v1.1
        f.write(bytes(fhdr))
        f.write(bytes(payload))


def decode_zlidar(buf: bytes) -> "pd.DataFrame":
    """Decode a .zlidar byte buffer to the points table layout of
    formats._decode_las (same columns)."""
    import pandas as pd

    if buf[0:4] != b"ZLDR":
        raise ValueError("not a zlidar file (bad signature)")
    fmt = buf[104]
    n = struct.unpack_from("<I", buf, 107)[0]
    offset_to_points = struct.unpack_from("<I", buf, 96)[0]
    sx, sy, sz, ox, oy, oz = struct.unpack_from("<6d", buf, 131)

    pos = offset_to_points
    num_fields, comp_byte, major, minor = buf[pos:pos + 4]
    if comp_byte & 0b111 != 0:
        raise ValueError("unsupported zlidar compression (only Deflate)")
    if (major, minor) != (1, 1):
        raise ValueError(f"unsupported zlidar version {major}.{minor}")
    pos += 4

    chans = np.zeros(n, dtype=np.int64)
    rets = np.ones(n, dtype=np.int64)
    nrets = np.ones(n, dtype=np.int64)
    xs = np.zeros(n, dtype=np.int64)
    ys = np.zeros(n, dtype=np.int64)
    zs = np.zeros(n, dtype=np.int64)
    intens = np.zeros(n, dtype=np.int64)
    cls = np.zeros(n, dtype=np.int64)
    sang = np.zeros(n, dtype=np.int64)
    sdir = np.zeros(n, dtype=np.int64)
    edge = np.zeros(n, dtype=np.int64)
    gps = np.full(n, np.nan)
    change = b""
    ctxs = None

    for _ in range(num_fields):
        code = buf[pos]
        off1, len1 = struct.unpack_from("<QQ", buf, pos + 1)
        pos += 17
        s1 = zlib.decompress(buf[off1:off1 + len1])
        s2 = None
        if code in (4, 5, 6, 10, 12):
            off2, len2 = struct.unpack_from("<QQ", buf, pos)
            pos += 16
            s2 = zlib.decompress(buf[off2:off2 + len2])
        if code == 0:
            change = s1
        elif code == 1:
            rd = _NibbleReader(s1, width=2)
            prev = rd.read()
            chans[0] = prev
            for j in range(1, n):
                if change[j] & 1:
                    prev = rd.read()
                chans[j] = prev
        elif code == 2:
            rd = _NibbleReader(s1)
            v = rd.read()
            rets[0] = v
            prev = [v] * 4
            for j in range(1, n):
                ch = int(chans[j])
                c = (change[j] >> 2) & 0b11
                if c == 0:
                    rets[j] = prev[ch]
                elif c == 1:
                    prev[ch] += 1
                    rets[j] = prev[ch]
                elif c == 2:
                    prev[ch] -= 1
                    rets[j] = prev[ch]
                else:
                    v = rd.read()
                    rets[j] = v
                    prev[ch] = v
        elif code == 3:
            rd = _NibbleReader(s1)
            v = rd.read()
            nrets[0] = v
            prev = [v] * 4
            for j in range(1, n):
                ch = int(chans[j])
                if (change[j] >> 4) & 1:
                    v = rd.read()
                    prev[ch] = v
                nrets[j] = prev[ch]
            ctxs = _contexts(rets, nrets)
        elif code in (4, 5, 6):
            if ctxs is None:
                ctxs = _contexts(rets, nrets)
            vals = _decode_coord(s1, s2, n, chans, ctxs)
            (xs if code == 4 else ys if code == 5 else zs)[:] = vals
        elif code == 7:
            p = [2]
            intens[0] = struct.unpack_from("<H", s1, 0)[0]
            for j in range(1, n):
                if (change[j] >> 7) & 1:
                    intens[j] = struct.unpack_from("<H", s1, p[0])[0]
                    p[0] += 2
                else:
                    intens[j] = s1[p[0]]
                    p[0] += 1
        elif code == 8:
            arr = np.frombuffer(s1, dtype=np.uint8, count=n)
            sdir[:] = (arr >> 4) & 1
            edge[:] = (arr >> 5) & 1
        elif code == 9:
            cls[0] = s1[0]
            prev = [s1[0]] * 4
            k = 0
            for j in range(1, n):
                ch = int(chans[j])
                if (change[j] >> 5) & 1:
                    k += 1
                    prev[ch] = s1[k]
                cls[j] = prev[ch]
        elif code == 11:
            p = 0
            v = struct.unpack_from("<h", s1, p)[0]
            p += 2
            sang[0] = v
            prev = [v] * 4
            for j in range(1, n):
                ch = int(chans[j])
                if (change[j] >> 6) & 1:
                    v = struct.unpack_from("<h", s1, p)[0]
                    p += 2
                    prev[ch] = v
                sang[j] = prev[ch]
        elif code == 13:
            p = 8
            v = struct.unpack_from("<d", s1, 0)[0]
            gps[0] = v
            prev = [v] * 4
            for j in range(1, n):
                ch = int(chans[j])
                if (change[j] >> 1) & 1:
                    dv = struct.unpack_from("<d", s1, p)[0]
                    p += 8
                    prev[ch] = dv + prev[ch]
                gps[j] = prev[ch]
        # other field codes (10, 12, colour) are skipped

    return pd.DataFrame({
        "point_id": np.arange(n, dtype=np.int64),
        "x": xs.astype(np.float64) * sx + ox,
        "y": ys.astype(np.float64) * sy + oy,
        "z": zs.astype(np.float64) * sz + oz,
        "intensity": intens.astype(np.int32),
        "return_number": rets.astype(np.int32),
        "num_returns": nrets.astype(np.int32),
        "classification": cls.astype(np.int32),
        "scan_angle": sang.astype(np.int32),
        "scan_direction": sdir.astype(np.int32),
        "edge_flag": edge.astype(np.int32),
        "gps_time": gps if fmt == 1 else np.full(n, np.nan),
    })
