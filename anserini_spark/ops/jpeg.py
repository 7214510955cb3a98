"""Baseline JPEG codec in pure stdlib + numpy — closes the last
compressed-format gap in the multimodal pipeline (`multimodal.py`
decoded PPM and PNG for real; JPEG used to raise).

Scope mirrors what a training-data pipeline actually meets:

* decoder: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
  arbitrary DQT/DHT tables read from the stream, sampling factors up
  to 2x2 (4:4:4 / 4:2:2 / 4:2:0), DRI/RSTn restart intervals, APPn/COM
  skipped. Progressive (SOF2), arithmetic coding, and 12-bit raise
  ``NotImplementedError`` loudly.
* encoder: the synthesis/round-trip counterpart — ITU T.81 Annex K
  quantization tables with libjpeg-style quality scaling, per-image
  canonical huffman tables (DHT is self-describing, so the decoder —
  ours or anyone's — reads them from the file), optional 4:2:0
  subsampling, greyscale or YCbCr.

This is a correctness codec, not a throughput one: entropy coding is
per-symbol Python (the DCT/quantize/color stages are vectorized
numpy). It runs inside Arrow-batched ``mapInPandas`` workers where the
per-image cost is the unit of work; swap in a native codec binding on
a real cluster for volume decoding.

Reference parity note: the reference engine treats binary payloads as
opaque (it has no image pipeline); this module exists for the
LLM-data-pipeline operator set, not §2 parity.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# shared tables


def _zigzag_order() -> np.ndarray:
    """jpeg natural order: zz[i] = raster index of the i-th zigzag
    coefficient (generated, not memorized)."""
    idx = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        if s % 2 == 0:
            rows = reversed(list(rows))
        idx.extend(r * 8 + (s - r) for r in rows)
    return np.array(idx, dtype=np.int64)


_ZZ = _zigzag_order()

# orthonormal 8-point DCT-II matrix: forward F = D @ f @ D.T
_DCT = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else 0.5)
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# ITU T.81 Annex K.1/K.2 quantization tables (raster order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 = Annex K verbatim, 100 = all-ones
    (near-lossless: only DCT rounding remains)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


# ---------------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self._out.append(0x00)

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self._out)


class _BitReader:
    """Reads the (already unstuffed) entropy bytes of one restart
    segment MSB-first."""

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, nbits: int) -> int:
        while self._nbits < nbits:
            byte = self._d[self._pos] if self._pos < len(self._d) else 0
            self._pos += 1
            self._acc = (self._acc << 8) | byte
            self._nbits += 8
        self._nbits -= nbits
        return (self._acc >> self._nbits) & ((1 << nbits) - 1)

    def read_bit(self) -> int:
        return self.read(1)


# ---------------------------------------------------------------------------
# huffman


def _build_decode_table(bits: List[int], vals: bytes) -> dict:
    """Canonical mincode/maxcode/valptr decoder state (T.81 F.2.2.3)."""
    mincode, maxcode, valptr = {}, {}, {}
    code, k = 0, 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            mincode[length] = code
            valptr[length] = k
            code += n
            k += n
            maxcode[length] = code - 1
        else:
            maxcode[length] = -1
        code <<= 1
    return {"mincode": mincode, "maxcode": maxcode, "valptr": valptr,
            "vals": vals}


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        mx = table["maxcode"].get(length, -1)
        if mx >= 0 and code <= mx:
            return table["vals"][
                table["valptr"][length] + code - table["mincode"][length]]
    raise ValueError("invalid huffman code in entropy stream")


def _canonical_codes(symbols: List[int]) -> Tuple[List[int], bytes, Dict[int, Tuple[int, int]]]:
    """All used symbols at one canonical length L with 2**L > n, so the
    all-ones codeword stays unused (T.81 reserves it for padding).
    Returns (bits[16], huffval, symbol -> (code, length))."""
    syms = sorted(set(symbols))
    n = len(syms)
    if n == 0:
        syms = [0]
        n = 1
    length = max(2, (n + 1 - 1).bit_length())
    while (1 << length) - 1 < n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    enc = {s: (i, length) for i, s in enumerate(syms)}
    return bits, bytes(syms), enc


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits_val: int, cat: int) -> int:
    """T.81 EXTEND: map cat-bit magnitude to signed coefficient."""
    if cat == 0:
        return 0
    if bits_val < (1 << (cat - 1)):
        return bits_val - (1 << cat) + 1
    return bits_val


# ---------------------------------------------------------------------------
# encoder


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H/8 * W/8, 8, 8) row-major blocks of an edge-padded plane."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _encode_plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """DCT + quantize every 8x8 block -> (nblocks, 64) zigzag ints."""
    blocks = _blocks_of(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    q = np.round(coef.reshape(-1, 64) / qt[None, :].astype(np.float64))
    return q.astype(np.int64)[:, _ZZ]  # raster -> zigzag order


def _rle_symbols(zz: np.ndarray, prev_dc: int) -> Tuple[List, List, int]:
    """One block's (dc_sym, [bits]), [(ac_sym, [bits])...] streams."""
    diff = int(zz[0]) - prev_dc
    dc_cat = _category(diff)
    dc = (dc_cat, diff if diff >= 0 else diff + (1 << dc_cat) - 1)
    acs = []
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))  # ZRL
            run -= 16
        cat = _category(v)
        acs.append(((run << 4) | cat, cat,
                    v if v >= 0 else v + (1 << cat) - 1))
        run = 0
    if run:  # trailing zeros -> EOB (ZRLs are only emitted mid-block)
        acs.append((0x00, 0, 0))
    return dc, acs, int(zz[0])


def encode_jpeg(pixels: np.ndarray, quality: int = 95,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF bytes for an (H, W) grey or (H, W, 3) RGB uint8
    array. ``subsample=True`` emits 4:2:0 (2x2 Y sampling, 2x2-mean
    chroma); default is 4:4:4. ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that many MCUs (DC predictors
    reset at each boundary)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    grey = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if grey:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2
                            ).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2
                            ).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    qts = [_scaled_qt(_QT_LUMA, quality)]
    if not grey:
        qts.append(_scaled_qt(_QT_CHROMA, quality))
    qt_of = [0] + [1] * (len(planes) - 1)

    # quantized zigzag blocks per component
    comp_blocks = [
        _encode_plane_blocks(np.clip(p, 0, 255), qts[qt_of[ci]])
        for ci, p in enumerate(planes)
    ]

    # MCU traversal order (interleaved scan, T.81 A.2.3)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    per_comp_bw = [  # blocks per row in each component's padded plane
        -(-planes[ci].shape[1] // 8) for ci in range(len(planes))
    ]

    def _block_index(ci: int, mcu_y: int, mcu_x: int, by: int, bx: int) -> int:
        sh, sv = samp[ci]
        row = mcu_y * sv + by
        col = mcu_x * sh + bx
        bw = per_comp_bw[ci]
        bh = comp_blocks[ci].shape[0] // bw
        row = min(row, bh - 1)
        col = min(col, bw - 1)
        return row * bw + col

    # pass 1: collect symbols for per-image canonical tables, grouped
    # per MCU so restart boundaries (DC predictor resets) line up
    dc_syms: List[List[int]] = [[], []]
    ac_syms: List[List[int]] = [[], []]
    tbl_of = qt_of  # same luma/chroma split for huffman tables
    prev_dc = [0] * len(planes)
    mcu_stream = []  # per MCU: [(ci, dc, acs), ...]
    mcu_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                prev_dc = [0] * len(planes)
            mcu = []
            for ci in range(len(planes)):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_blocks[ci][_block_index(ci, my, mx, by, bx)]
                        dc, acs, prev = _rle_symbols(zz, prev_dc[ci])
                        prev_dc[ci] = prev
                        dc_syms[tbl_of[ci]].append(dc[0])
                        ac_syms[tbl_of[ci]].extend(s for s, _, _ in acs)
                        mcu.append((ci, dc, acs))
            mcu_stream.append(mcu)
            mcu_idx += 1
    n_tbl = 1 if grey else 2
    dc_tables = [_canonical_codes(dc_syms[t]) for t in range(n_tbl)]
    ac_tables = [_canonical_codes(ac_syms[t]) for t in range(n_tbl)]

    # pass 2: entropy-code (RSTn markers between restart segments)
    parts = []
    bw_ = _BitWriter()
    for mi, mcu in enumerate(mcu_stream):
        if restart_interval and mi and mi % restart_interval == 0:
            parts.append(bw_.flush())
            parts.append(bytes(
                [0xFF, 0xD0 + ((mi // restart_interval - 1) % 8)]))
            bw_ = _BitWriter()
        for ci, (dc_cat, dc_bits), acs in mcu:
            t = tbl_of[ci]
            code, ln = dc_tables[t][2][dc_cat]
            bw_.write(code, ln)
            bw_.write(dc_bits, dc_cat)
            for sym, cat, bits_v in acs:
                code, ln = ac_tables[t][2][sym]
                bw_.write(code, ln)
                bw_.write(bits_v, cat)
    parts.append(bw_.flush())
    entropy = b"".join(parts)

    # assemble segments
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qi, qt in enumerate(qts):
        seg(0xDB, bytes([qi]) + bytes(int(qt[z]) for z in _ZZ))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in range(len(planes)):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qt_of[ci]])
    seg(0xC0, sof)
    for t in range(n_tbl):
        for cls, (bits, vals, _enc) in ((0, dc_tables[t]), (1, ac_tables[t])):
            seg(0xC4, bytes([(cls << 4) | t]) + bytes(bits) + vals)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (tbl_of[ci] << 4) | tbl_of[ci]])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(entropy)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline-JPEG bytes to an (H, W) or (H, W, 3) uint8
    array. Reads DQT/DHT from the stream (works on any baseline
    encoder's output, not just ours); raises NotImplementedError on
    progressive/arithmetic/12-bit."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            bpos = 0
            while bpos < len(body):
                prec, tid = body[bpos] >> 4, body[bpos] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit DQT")
                zz = np.frombuffer(body[bpos + 1:bpos + 65], dtype=np.uint8)
                qt = np.zeros(64, dtype=np.int64)
                qt[_ZZ] = zz
                qts[tid] = qt
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                cls, tid = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1:bpos + 17])
                n = sum(bits)
                vals = body[bpos + 17:bpos + 17 + n]
                huff[(cls, tid)] = _build_decode_table(bits, vals)
                bpos += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            depth, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise NotImplementedError(f"{depth}-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, sf, qid = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF,
                              "qt": qid})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for si in range(ns):
                cid, tids = body[1 + 2 * si], body[2 + 2 * si]
                scan.append({"id": cid, "dc": tids >> 4, "ac": tids & 0xF})
            # find entropy span: up to next non-RST marker
            start = pos
            p = start
            while p + 1 < len(payload):
                if payload[p] == 0xFF and payload[p + 1] not in (0x00,):
                    if 0xD0 <= payload[p + 1] <= 0xD7:
                        p += 2
                        continue
                    break
                p += 1
            entropy_raw = payload[start:p]
            pos = p
            break
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG without SOF/SOS")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["id"]]
        c["dc_t"], c["ac_t"] = s["dc"], s["ac"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors > 2")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component coefficient planes (in padded block units)
    for c in comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)

    # split entropy bytes at RST markers, unstuff each segment
    segments = []
    cur = bytearray()
    i = 0
    while i < len(entropy_raw):
        byte = entropy_raw[i]
        if byte == 0xFF and i + 1 < len(entropy_raw):
            nxt = entropy_raw[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(byte)
        i += 1
    segments.append(bytes(cur))

    reader = _BitReader(segments[0])
    seg_i = 0
    prev_dc = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                seg_i += 1
                reader = _BitReader(segments[seg_i])
                prev_dc = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_tbl = huff[(0, c["dc_t"])]
                ac_tbl = huff[(1, c["ac_t"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        cat = _huff_decode(reader, dc_tbl)
                        diff = _extend(reader.read(cat), cat)
                        prev_dc[c["id"]] += diff
                        zz[0] = prev_dc[c["id"]]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read(sym & 0xF),
                                            sym & 0xF)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = zz
            mcu_count += 1

    # dequantize + IDCT per component (vectorized over all blocks)
    planes = []
    for c in comps:
        qt = qts[c["qt"]]
        raster = np.zeros_like(c["coef"], dtype=np.float64)
        raster[:, _ZZ] = c["coef"]  # de-zigzag
        raster *= qt[None, :].astype(np.float64)
        blocks = raster.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT) + 128.0
        plane = (pix.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["bh"] * 8, c["bw"] * 8))
        # upsample to full resolution (replicate — nearest-neighbor)
        if c["h"] < hmax:
            plane = np.repeat(plane, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
