"""Baseline JPEG codec — stdlib + numpy, no media library.

A real ITU-T T.81 baseline sequential implementation covering the
common interchange subset:

- **Decoder**: marker/segment parse (SOI, APP*, COM, DQT, SOF0, DHT,
  SOS, EOI, fill bytes, parameterless TEM/RST), canonical Huffman
  tables built from the stream's own BITS/HUFFVAL (per spec Annex C —
  nothing is hardcoded), entropy decode with 0xFF00 byte-unstuffing,
  DC prediction, dequantize, inverse zigzag, 8×8 IDCT (orthonormal
  DCT-III via a numpy matrix, exactly the T.81 transform), level shift
  + clamp, generalized MCU interleave for sampling factors 1-2 —
  **4:4:4, 4:2:0 (the common real-world layout), 4:2:2** — with chroma
  upsampling, YCbCr→RGB (JFIF matrix) or grayscale, edge-padding crop.
- **Encoder**: the inverse pipeline (level shift, FDCT, quantize,
  zigzag, DC-diff + AC run-length Huffman coding, byte stuffing). It
  emits its OWN DHT tables (12 four-bit DC codes, 162 eight-bit AC
  codes — a valid canonical code per Annex C since the Kraft sums stay
  under 1 and the all-ones pattern is never assigned), so the decoder's
  table handling is exercised for real rather than against a single
  memorized constant table.

Restart intervals (DRI/RSTn — camera JPEGs use them) are handled on
both sides: the encoder can emit them, the decoder byte-aligns,
consumes the marker, and resets DC prediction at each interval.

Out of scope (raise, honestly): progressive/arithmetic/hierarchical
modes, sampling factors above 2, 12-bit precision. Quality: with an all-ones quantization table the only loss
is DCT rounding (±2 per sample); standard-style tables trade that for
size like any encoder.

Reference parity: the reference treats media as opaque bytes end to end
(no media operators exist in gmall-flink-parent); this module extends
the LLM-training-data surface the brief adds on top. Used by
``functions/multimodal.py::decode_media`` for ``image/jpeg`` payloads.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Orthonormal 8x8 DCT-II matrix: coefs = T @ block @ T.T is exactly the
# T.81 FDCT of the level-shifted block; the IDCT is the transpose pair.
_T = np.zeros((8, 8))
_T[0, :] = 1.0 / np.sqrt(8.0)
for _i in range(1, 8):
    for _j in range(8):
        _T[_i, _j] = 0.5 * np.cos((2 * _j + 1) * _i * np.pi / 16.0)

FLAT_QUANT = np.ones(64, dtype=np.int64)
# A standard-shape luminance table (coarser at high frequency), written
# here in NATURAL row-major order for readability and converted below to
# the zigzag order the codec (and the DQT segment) uses — passing the
# natural-order array straight through would scramble the effective
# matrix (low-frequency coefficients quantized by high-frequency steps).
_LOSSY_QUANT_NATURAL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
LOSSY_QUANT = _LOSSY_QUANT_NATURAL[ZIGZAG]

# Our canonical tables: every DC size symbol (0..11) at code length 4,
# every AC (run,size) symbol at code length 8. Valid per Annex C:
# 12/2^4 < 1 and 162/2^8 < 1, and canonical assignment never reaches
# the all-ones code. Written to DHT and read back by the decoder.
DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_VALS = (
    [0x00]
    + [r << 4 | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
)
AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code generation: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)

    def restart_marker(self, idx: int) -> None:
        """Pad to the byte boundary and emit RSTn (markers are written
        raw — byte stuffing applies only to entropy data)."""
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (idx & 7)])


class _BitReader:
    """Reads entropy-coded bits, undoing 0xFF00 stuffing. RSTn markers
    (the only markers legal mid-scan in baseline) are consumed by
    ``restart()``; any other marker mid-stream is an error."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker: drop the pad bits to the byte
        boundary, expect 0xFF 0xD0-0xD7, resume clean (T.81 E.1.4)."""
        self._acc = 0
        self._n = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RSTn marker at restart interval")
        self.pos += 2


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _decode_amplitude(raw: int, s: int) -> int:
    if s == 0:
        return 0
    return raw if raw >= (1 << (s - 1)) else raw - (1 << s) + 1


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = px[..., 0], px[..., 1] - 128.0, px[..., 2] - 128.0
    return np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    qmat: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: list[int],
    c: int,
) -> None:
    """FDCT + quantize + zigzag + Huffman-code one 8×8 block."""
    coefs = np.rint((_T @ (block - 128.0) @ _T.T) / qmat).astype(np.int64)
    zz = coefs.flatten()[ZIGZAG]
    diff = int(zz[0]) - pred[c]
    pred[c] = int(zz[0])
    s = _size_cat(diff)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(_amplitude(diff, s), s)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            w.put(code, ln)
            run -= 16
        s = _size_cat(v)
        code, ln = ac_codes[run << 4 | s]
        w.put(code, ln)
        w.put(_amplitude(v, s), s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        w.put(code, ln)


def encode_jpeg(
    pixel_bytes: bytes,
    width: int,
    height: int,
    *,
    channels: int = 3,
    quant: np.ndarray | None = None,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """A spec-valid baseline JFIF file: grayscale, 4:4:4 RGB, or
    chroma-subsampled RGB — ``subsample="420"`` (or ``True``; chroma
    averaged over 2×2 pixel groups: the layout most real-world JPEGs
    use) / ``subsample="422"`` (chroma averaged over horizontal pairs:
    the broadcast-video layout). 8-bit, own canonical Huffman tables,
    ``quant`` in zigzag order (default all-ones — near-lossless on
    luma; subsampled chroma loss is structural)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    samp_mode = {False: None, True: "420", "420": "420", "422": "422"}.get(subsample, -1)
    if samp_mode == -1:
        raise ValueError("subsample must be False, True, '420', or '422'")
    if samp_mode and channels != 3:
        raise ValueError("subsampling applies to 3-channel RGB only")
    q = FLAT_QUANT if quant is None else np.asarray(quant, dtype=np.int64)
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 64 values in [1, 255] (zigzag order)")
    px = (
        np.frombuffer(pixel_bytes, dtype=np.uint8)
        .reshape(height, width, channels)
        .astype(np.float64)
    )
    planes = px[..., 0:1] if channels == 1 else _rgb_to_ycbcr(px)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    qmat = np.empty(64)
    qmat[ZIGZAG] = q
    qmat = qmat.reshape(8, 8)
    w = _BitWriter()
    pred = [0] * channels
    mcu_done = 0
    rst_idx = 0

    def after_mcu(total: int) -> None:
        """T.81 restart cadence: every ``restart_interval`` MCUs, pad to
        the byte boundary, emit RSTn (cycling 0-7), reset DC predictors
        — except after the final MCU."""
        nonlocal mcu_done, rst_idx
        mcu_done += 1
        if restart_interval and mcu_done % restart_interval == 0 and mcu_done < total:
            w.restart_marker(rst_idx)
            rst_idx += 1
            pred[:] = [0] * channels

    if samp_mode is None:
        # 1x1 sampling: MCU = one block per component
        ph = (height + 7) // 8 * 8
        pw = (width + 7) // 8 * 8
        p = np.pad(planes, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge")
        total = (ph // 8) * (pw // 8)
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for c in range(channels):
                    _encode_block(
                        w, p[by : by + 8, bx : bx + 8, c], qmat, dc_codes, ac_codes, pred, c
                    )
                after_mcu(total)
        samp = [0x11] * channels
    elif samp_mode == "420":
        # 4:2:0: MCU = 16×16 px — 4 luma blocks + 1 Cb + 1 Cr at half res
        ph = (height + 15) // 16 * 16
        pw = (width + 15) // 16 * 16
        p = np.pad(planes, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge")
        luma = p[..., 0]
        # chroma: mean over each 2×2 pixel group
        chroma = p[..., 1:].reshape(ph // 2, 2, pw // 2, 2, 2).mean(axis=(1, 3))
        total = (ph // 16) * (pw // 16)
        for my in range(0, ph, 16):
            for mx in range(0, pw, 16):
                for v in range(2):  # spec block order: left→right, top→bottom
                    for hh in range(2):
                        _encode_block(
                            w,
                            luma[my + 8 * v : my + 8 * v + 8, mx + 8 * hh : mx + 8 * hh + 8],
                            qmat, dc_codes, ac_codes, pred, 0,
                        )
                for c in (0, 1):
                    _encode_block(
                        w,
                        chroma[my // 2 : my // 2 + 8, mx // 2 : mx // 2 + 8, c],
                        qmat, dc_codes, ac_codes, pred, c + 1,
                    )
                after_mcu(total)
        samp = [0x22, 0x11, 0x11]
    else:
        # 4:2:2: MCU = 16×8 px — 2 luma blocks + 1 Cb + 1 Cr at half
        # HORIZONTAL resolution (full vertical)
        ph = (height + 7) // 8 * 8
        pw = (width + 15) // 16 * 16
        p = np.pad(planes, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge")
        luma = p[..., 0]
        # chroma: mean over each horizontal 1×2 pixel pair
        chroma = p[..., 1:].reshape(ph, pw // 2, 2, 2).mean(axis=2)
        total = (ph // 8) * (pw // 16)
        for my in range(0, ph, 8):
            for mx in range(0, pw, 16):
                for hh in range(2):
                    _encode_block(
                        w,
                        luma[my : my + 8, mx + 8 * hh : mx + 8 * hh + 8],
                        qmat, dc_codes, ac_codes, pred, 0,
                    )
                for c in (0, 1):
                    _encode_block(
                        w,
                        chroma[my : my + 8, mx // 2 : mx // 2 + 8, c],
                        qmat, dc_codes, ac_codes, pred, c + 1,
                    )
                after_mcu(total)
        samp = [0x21, 0x11, 0x11]
    scan = w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(v) for v in q))  # DQT id 0
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for c in range(channels):
        sof += bytes([c + 1, samp[c], 0])  # comp id, sampling, quant table 0
    out += _seg(0xC0, sof)  # SOF0 baseline
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))  # DC table 0
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))  # AC table 0
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels]) + b"".join(
        bytes([c + 1, 0x00]) for c in range(channels)
    ) + bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _Huff:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lookup = {
            (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()
        }

    def decode(self, r: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | r.bit()
            sym = self.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse + entropy-decode a baseline JPEG; returns (width, height,
    channels, pixel_bytes) — interleaved RGB or grayscale, cropped to
    the declared geometry. Handles 4:4:4 / 4:2:0 / 4:2:2 sampling and
    restart intervals; raises on progressive/12-bit streams (the
    documented seam)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    sof = None
    restart_interval = 0
    comp_spec: list[tuple[int, int, int, int]] = []  # (id, h, v, qtab)
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes; TEM (0x01) and RSTn (0xD0-0xD7) carry no length.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        ln = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int64)
                b += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential (SOF0) JPEG")
        elif marker == 0xC0:
            prec, h, w0, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            if nc not in (1, 3):
                raise NotImplementedError("only gray or 3-component JPEG")
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                sh, sv = samp >> 4, samp & 0xF
                if sh not in (1, 2) or sv not in (1, 2):
                    raise NotImplementedError(
                        "only sampling factors 1 and 2 (4:4:4 / 4:2:0 / 4:2:2)"
                    )
                comp_spec.append((cid, sh, sv, tq))
            sof = (w0, h, nc)
        elif marker == 0xC4:  # DHT — possibly several tables
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                huff[(tc, th)] = _Huff(bits, vals)
                b += 17 + n
        elif marker == 0xDD:  # DRI — restart every N MCUs
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_tabs = {}
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_tabs[cid] = (tabs >> 4, tabs & 0xF)
            width, height, nc = sof
            # The decode loop below assumes one fully interleaved scan
            # whose components appear in SOF order. Anything else —
            # multi-scan baseline (ns < nc) or a single-component scan
            # whose SOF declares sampling > 1 (non-interleaved per T.81
            # A.2: MCU = one data unit) — needs a different MCU loop:
            # refuse loudly instead of mis-decoding.
            if ns != nc:
                raise NotImplementedError(
                    "only single fully-interleaved scans (SOS covers all "
                    f"SOF components): scan has {ns} of {nc} components"
                )
            sos_order = [body[1 + 2 * c] for c in range(ns)]
            sof_order = [cid for cid, _, _, _ in comp_spec]
            if sos_order != sof_order:
                raise ValueError(
                    "JPEG scan component order differs from frame header "
                    f"(SOS {sos_order} vs SOF {sof_order}; T.81 B.2.3 "
                    "requires frame order)"
                )
            if nc == 1 and (comp_spec[0][1] != 1 or comp_spec[0][2] != 1):
                raise NotImplementedError(
                    "single-component scan with sampling factors > 1 is "
                    "non-interleaved (T.81 A.2: MCU = one data unit); "
                    "only 1x1 single-component scans are supported"
                )
            # Malformed-but-parseable streams referencing undeclared
            # tables get the uniform ValueError contract, not a bare
            # KeyError leaking out of decode_media.
            for cid, _, _, tq in comp_spec:
                dct, act = scan_tabs[cid]
                if (0, dct) not in huff:
                    raise ValueError(
                        f"JPEG scan references undefined DC Huffman table {dct}"
                    )
                if (1, act) not in huff:
                    raise ValueError(
                        f"JPEG scan references undefined AC Huffman table {act}"
                    )
                if tq not in quant:
                    raise ValueError(
                        f"JPEG component references undefined quant table {tq}"
                    )
            hmax = max(sh for _, sh, _, _ in comp_spec)
            vmax = max(sv for _, _, sv, _ in comp_spec)
            mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
            # one sub-resolution plane per component, padded to its own
            # whole-MCU grid (comp plane gets 8*sh × 8*sv px per MCU)
            comp_planes = [
                np.zeros((mcus_y * 8 * sv, mcus_x * 8 * sh))
                for _, sh, sv, _ in comp_spec
            ]
            r = _BitReader(payload, pos + 2 + ln)
            pred = [0] * nc
            mcu_done = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if (
                        restart_interval
                        and mcu_done
                        and mcu_done % restart_interval == 0
                    ):
                        r.restart()  # byte-align + consume RSTn
                        pred = [0] * nc
                    mcu_done += 1
                    for c in range(nc):
                        cid, sh, sv, tq = comp_spec[c]
                        dct, act = scan_tabs[cid]
                        qz = quant[tq]
                        for v in range(sv):  # spec order: left→right, top→bottom
                            for hh in range(sh):
                                zz = np.zeros(64, dtype=np.int64)
                                s = huff[(0, dct)].decode(r)
                                pred[c] += _decode_amplitude(r.bits(s), s)
                                zz[0] = pred[c]
                                i = 1
                                while i < 64:
                                    sym = huff[(1, act)].decode(r)
                                    if sym == 0x00:  # EOB
                                        break
                                    if sym == 0xF0:  # ZRL
                                        i += 16
                                        continue
                                    run, size = sym >> 4, sym & 0xF
                                    i += run
                                    if i > 63:
                                        raise ValueError("AC coefficient index overflow")
                                    zz[i] = _decode_amplitude(r.bits(size), size)
                                    i += 1
                                coefs = np.zeros(64)
                                coefs[ZIGZAG] = zz * qz
                                block = _T.T @ coefs.reshape(8, 8) @ _T
                                by = (my * sv + v) * 8
                                bx = (mx * sh + hh) * 8
                                comp_planes[c][by : by + 8, bx : bx + 8] = block + 128.0
            # upsample each component to full resolution (pixel
            # replication — the common JFIF reconstruction) and crop
            full = np.zeros((height, width, nc))
            for c in range(nc):
                _, sh, sv, _ = comp_spec[c]
                up = np.repeat(
                    np.repeat(comp_planes[c], vmax // sv, axis=0), hmax // sh, axis=1
                )
                full[..., c] = up[:height, :width]
            if nc == 3:
                full = _ycbcr_to_rgb(full)
            px = np.clip(np.rint(full), 0, 255).astype(np.uint8)
            return width, height, nc, px.tobytes()
        pos += 2 + ln
    raise ValueError("no SOS scan in JPEG")
