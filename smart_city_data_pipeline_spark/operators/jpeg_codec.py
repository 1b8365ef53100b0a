"""Pure struct/numpy JPEG codec — the last compressed-frame format
the reference's cameras ship (``data-simulators/camera-analytics/
camera_simulator.py`` sends JPEG frames over Kafka) that previously
sat behind the gated cv2 seam.

Scope: ITU-T T.81 baseline (gray, 4:4:4 and 4:2:0 YCbCr color,
restart markers) AND progressive (SOF2) with BOTH spectral selection
and successive approximation (multi-scan encode incl. the libjpeg-
style two-level script; decode handles any scan script, general EOBn
runs, and DC/AC refinement with correction-bit semantics). The
DECODERS are driven entirely by the bitstream (they build their
Huffman/quant tables, scan scripts, and MCU geometry from the file's
DHT/DQT/SOF/SOS segments), so they decode conforming streams, not
just this encoder's output. The ENCODERS exist to
synthesize test/bench payloads; they use the standard Annex K
luminance quant table and a deliberately simple — but perfectly valid —
canonical Huffman geometry (all 12 DC categories at 4 bits, all 162 AC
symbols at 8 bits; Kraft sums 12/16 and 162/256, all-ones codes
unassigned), trading compression ratio for zero spec-table surface.

Exactness contract used by the analytic oracle: for a block-constant
image whose values satisfy ``(v - 128) % 2 == 0``, every AC
coefficient quantizes to exactly 0 (float residue ~1e-13 ≪ 0.5) and
the DC path is ``round((v-128)/2)·16`` — integer-exact because the
quant step 16 divides ``8·(v-128)``. Decode therefore reproduces the
source bit-for-bit, which `frames_features_jpeg` exploits to carry a
closed-form SQL oracle THROUGH a real entropy-coded JPEG round trip.
"""

from __future__ import annotations

import struct

# Standard Annex K luminance quantization table (natural row order).
QTABLE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def _zigzag_order() -> list[int]:
    """Natural index (8r + c) for each zigzag position, generated from
    the anti-diagonal walk (even diagonals run up-right, odd down-left)
    instead of a hand-typed table."""
    out = []
    for s in range(15):
        rng = range(s, -1, -1) if s % 2 == 0 else range(s + 1)
        for r in rng:
            c = s - r
            if r < 8 and c < 8:
                out.append(8 * r + c)
    return out


ZIGZAG = _zigzag_order()  # zigzag position -> natural index

# Huffman geometry (see module docstring). huffval order IS the
# canonical code order.
_DC_BITS = [0] * 16
_DC_BITS[3] = 12  # 12 categories, all 4-bit codes (bits index = len-1)
_DC_VALS = list(range(12))
_AC_BITS = [0] * 16
_AC_BITS[7] = 162  # all 8-bit codes
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG assignment."""
    out, code = {}, 0
    k = 0
    for i, n in enumerate(bits):
        length = i + 1
        for _ in range(n):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


def _dct_matrix():
    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / 2.0 ** 0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * _cos((2 * x + 1) * u)
    return m


def _cos(k: int) -> float:
    import math

    return math.cos(k * math.pi / 16.0)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill final byte
        return bytes(self.buf)


def _category(v: int) -> int:
    n = 0
    a = abs(v)
    while a:
        a >>= 1
        n += 1
    return n


def _amplitude(v: int, n: int) -> int:
    return v if v >= 0 else v + (1 << n) - 1


def _encode_block(bits: "_BitWriter", f, m, q, prev_dc: int) -> int:
    """DCT → quantize → entropy-code one level-shifted 8×8 block;
    returns the new DC predictor."""
    import numpy as np

    coef = m @ f @ m.T
    sq = np.round(coef / q).astype(np.int64)
    zz = [int(sq.flat[ZIGZAG[k]]) for k in range(64)]
    diff = zz[0] - prev_dc
    n = _category(diff)
    c, ln = _DC_ENC[n]
    bits.write(c, ln)
    if n:
        bits.write(_amplitude(diff, n), n)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_ENC[0xF0]
            bits.write(c, ln)
            run -= 16
        n = _category(zz[k])
        c, ln = _AC_ENC[(run << 4) | n]
        bits.write(c, ln)
        bits.write(_amplitude(zz[k], n), n)
        run = 0
    if last_nz < 63:
        c, ln = _AC_ENC[0x00]
        bits.write(c, ln)
    return zz[0]


def _pad_to(a, h: int, w: int, th: int, tw: int):
    """Edge-replicate an (h, w) plane to (th, tw), float64."""
    import numpy as np

    padded = np.empty((th, tw), dtype=np.float64)
    padded[:h, :w] = a
    padded[h:, :w] = padded[h - 1 : h, :w]
    padded[:, w:] = padded[:, w - 1 : w]
    return padded


def _pad_plane(a, h: int, w: int):
    """Edge-replicate to 8-multiples, float64."""
    return _pad_to(a, h, w, -(-h // 8) * 8, -(-w // 8) * 8)


def encode_jpeg_gray(arr, restart_interval: int = 0) -> bytes:
    """8-bit grayscale array → baseline sequential JPEG bytes.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (byte-aligned, DC predictor reset) — the error-resilience
    structure real camera firmware produces.
    """
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    return _assemble_jpeg([_pad_plane(a, h, w)], [(1, 1)], h, w, restart_interval)


def encode_jpeg_color(arr, restart_interval: int = 0, subsample: bool = False) -> bytes:
    """(h, w, 3) RGB uint8 array → baseline YCbCr JPEG bytes (BT.601
    full-range JFIF transform; all components share the quant/Huffman
    tables — legal and simple). ``subsample=True`` produces 4:2:0 (the
    dominant real-world layout: Y at 2×2 sampling, chroma 2×2-mean
    downsampled, MCU = 4 Y + Cb + Cr blocks); default is 4:4:4."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8).astype(np.float64)
    h, w = a.shape[:2]
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if not subsample:
        planes = [_pad_plane(p, h, w) for p in (y, cb, cr)]
        return _assemble_jpeg(planes, [(1, 1)] * 3, h, w, restart_interval)
    my, mx = -(-h // 16), -(-w // 16)
    ypad = _pad_to(y, h, w, my * 16, mx * 16)
    planes = [ypad]
    for p in (cb, cr):
        fullp = _pad_to(p, h, w, my * 16, mx * 16)
        planes.append(fullp.reshape(my * 8, 2, mx * 8, 2).mean(axis=(1, 3)))
    return _assemble_jpeg(
        planes, [(2, 2), (1, 1), (1, 1)], h, w, restart_interval
    )


def _assemble_jpeg(planes, samps, h: int, w: int, restart_interval: int) -> bytes:
    """Entropy-code padded float planes (gray, 4:4:4, or 4:2:0 per
    ``samps`` sampling factors) and wrap them in
    SOI/DQT/[DRI]/SOF0/DHT/SOS/EOI. ``planes[i]`` must measure
    (mcus_y·8·vs, mcus_x·8·hs)."""
    import numpy as np

    m = _dct_matrix()
    q = np.array(QTABLE, dtype=np.float64).reshape(8, 8)
    hmax = max(hs for hs, _ in samps)
    vmax = max(vs for _, vs in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    bits = _BitWriter()
    prev = [0] * len(planes)
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align (1-fill), emit RSTn, reset DC predictors
                if bits.n:
                    pad = 8 - bits.n
                    bits.write((1 << pad) - 1, pad)
                bits.buf += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) & 7
                prev = [0] * len(planes)
            mcu += 1
            for ci, (plane, (hs, vs)) in enumerate(zip(planes, samps)):
                for v in range(vs):
                    for u in range(hs):
                        py = (my * vs + v) * 8
                        px = (mx * hs + u) * 8
                        f = plane[py : py + 8, px : px + 8] - 128.0
                        prev[ci] = _encode_block(bits, f, m, q, prev[ci])
    scan = bits.flush()

    nf = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (stored in zigzag order per the spec)
    zz_q = bytes(QTABLE[ZIGZAG[k]] for k in range(64))
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + zz_q
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOF0: 8-bit, nf components with their sampling factors
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for cid in range(1, nf + 1):
        hs, vs = samps[cid - 1]
        out += struct.pack(">BBB", cid, (hs << 4) | vs, 0)
    # DHT: DC table 0, AC table 0 (shared by all components)
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(_DC_VALS), 0x00)
    out += bytes(_DC_BITS) + bytes(_DC_VALS)
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(_AC_VALS), 0x10)
    out += bytes(_AC_BITS) + bytes(_AC_VALS)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    for cid in range(1, nf + 1):
        out += struct.pack(">BB", cid, 0x00)
    out += struct.pack(">BBB", 0, 63, 0)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.buf):
                raise EOFError("scan truncated")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.buf[self.pos] if self.pos < len(self.buf) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise EOFError("marker inside scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> bool:
        """Consume a byte-aligned RSTn marker; False if absent."""
        self.acc = 0
        self.n = 0  # discard pad bits to the byte boundary
        if (
            self.pos + 1 < len(self.buf)
            and self.buf[self.pos] == 0xFF
            and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return True
        return False


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for i, n in enumerate(bits):
        for _ in range(n):
            out[(i + 1, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(rd: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | rd.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, n: int) -> int:
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_block(rd, dc_tab, ac_tab, prev_dc: int):
    """One 8×8 block of zigzag coefficients; returns (zz, new_dc)."""
    zz = [0] * 64
    n = _read_symbol(rd, dc_tab)
    diff = _extend(rd.read_bits(n), n) if n else 0
    prev_dc += diff
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = _read_symbol(rd, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63:
            raise ValueError("AC index overrun")
        zz[k] = _extend(rd.read_bits(size), size)
        k += 1
    return zz, prev_dc


# Shared segment parsers for the two marker walks (baseline walk in
# :func:`decode_jpeg_gray`, multi-scan walk in :func:`_decode_progressive`
# — the WALKS differ in control flow, the SEGMENTS do not).


def _parse_dqt(seg: bytes, qtables: dict) -> bool:
    """DQT segment (possibly several tables) → natural-order tables.
    False = 16-bit precision table (unsupported, cv2 seam)."""
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 0xF
        if pq != 0:
            return False
        zz = seg[i + 1 : i + 65]
        nat = [0] * 64
        for k in range(64):
            nat[ZIGZAG[k]] = zz[k]
        qtables[tq] = nat
        i += 65
    return True


def _parse_sof_comps(seg: bytes):
    """SOF frame header → (h, w, comps) with comps = [(component id,
    quant table id, h-sampling, v-sampling)]; None when the frame is
    outside the supported envelope (8-bit, 1 or 3 components,
    sampling factors 1-2)."""
    precision, h, w, nf = struct.unpack_from(">BHHB", seg, 0)
    if precision != 8 or nf not in (1, 3):
        return None
    comps = []
    for ci in range(nf):
        cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
        hs, vs = samp >> 4, samp & 0xF
        if hs not in (1, 2) or vs not in (1, 2):
            return None
        comps.append((cid, tq, hs, vs))
    return h, w, comps


def _parse_dht(seg: bytes, htables: dict) -> None:
    """DHT segment (possibly several tables) → decode tables."""
    i = 0
    while i < len(seg):
        tc_th = seg[i]
        bits = list(seg[i + 1 : i + 17])
        n = sum(bits)
        vals = list(seg[i + 17 : i + 17 + n])
        htables[tc_th] = _decode_table(bits, vals)
        i += 17 + n


def _dequant_idct_block(zz, qn, m):
    """Zigzag coefficient vector → spatial 8×8 block (+128 level
    shift): dequantize in natural order, 2-D IDCT via the separable
    DCT matrix."""
    import numpy as np

    coef = np.zeros(64)
    for k in range(64):
        coef[ZIGZAG[k]] = zz[k]
    coef = coef.reshape(8, 8) * qn
    return m.T @ coef @ m + 128.0


def _planes_to_gray(planes, h: int, w: int):
    """Decoded component planes → uint8 gray: single component clips
    directly; three components are YCbCr → BT.601 full-range RGB →
    channel-mean gray (the 24-bit BMP path's gray convention)."""
    import numpy as np

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:h, :w]
    y, cb, cr = (p[:h, :w] for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([np.clip(np.round(c), 0, 255) for c in (r, g, b)], axis=2)
    return rgb.mean(axis=2).astype(np.uint8)


def decode_jpeg_gray(buf: bytes):
    """JPEG bytes → 2-D uint8 GRAY array, or None when ``buf`` is not
    a JPEG this decoder handles. Supported: single-component and
    3-component interleaved baseline (YCbCr → BT.601 RGB → channel
    mean, matching the 24-bit BMP path's gray convention), 2×
    chroma subsampling, restart markers (DRI/RSTn), and PROGRESSIVE
    (SOF2) streams with spectral selection AND successive
    approximation (dispatched to :func:`_decode_progressive`).
    Unsupported (→ None, cv2 seam): other frame types
    (lossless/arithmetic/12-bit), 16-bit quant tables. Tables come
    from the bitstream, not from this module's encoder constants."""
    import numpy as np

    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, list[int]] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_tabs: dict[int, tuple[int, int]] = {}  # comp id -> (dc, ac)
    scan_order: list[int] = []
    restart_interval = 0
    pos = 2
    try:
        while pos + 4 <= len(buf):
            if buf[pos] != 0xFF:
                return None
            marker = buf[pos + 1]
            if marker == 0xD9:  # EOI without SOS
                return None
            seglen = struct.unpack_from(">H", buf, pos + 2)[0]
            seg = buf[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                if not _parse_dqt(seg, qtables):
                    return None  # 16-bit tables unsupported
            elif marker == 0xC0:  # SOF0 baseline
                sof = _parse_sof_comps(seg)
                if sof is None:
                    return None
                h, w, comps = sof
            elif marker == 0xC2:  # progressive — dedicated scan-script path
                return _decode_progressive(buf)
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
                return None  # other non-baseline frame types
            elif marker == 0xC4:  # DHT
                _parse_dht(seg, htables)
            elif marker == 0xDD:  # DRI restart interval
                restart_interval = struct.unpack_from(">H", seg, 0)[0]
            elif marker == 0xDA:  # SOS → entropy-coded data follows
                ns = seg[0]
                if ns != len(comps):
                    return None
                for ci in range(ns):
                    cid, td_ta = seg[1 + 2 * ci], seg[2 + 2 * ci]
                    scan_tabs[cid] = (td_ta >> 4, td_ta & 0xF)
                    scan_order.append(cid)
                pos = pos + 2 + seglen
                break
            pos = pos + 2 + seglen
        else:
            return None
        if not h or not w or not comps:
            return None
        spec_by_id = {cid: (tq, hs, vs) for cid, tq, hs, vs in comps}
        hmax = max(hs for _, _, hs, _ in comps)
        vmax = max(vs for _, _, _, vs in comps)
        plan = []  # per scan component: (q, dc_tab, ac_tab, hs, vs)
        for cid in scan_order:
            if cid not in spec_by_id or spec_by_id[cid][0] not in qtables:
                return None
            tq, hs, vs = spec_by_id[cid]
            dc_id, ac_id = scan_tabs[cid]
            dc_tab = htables.get(0x00 | dc_id)
            ac_tab = htables.get(0x10 | ac_id)
            if dc_tab is None or ac_tab is None:
                return None
            plan.append(
                (
                    np.array(qtables[tq], dtype=np.float64).reshape(8, 8),
                    dc_tab,
                    ac_tab,
                    hs,
                    vs,
                )
            )

        m = _dct_matrix()
        # MCU grid: each MCU covers (8·hmax × 8·vmax) image pixels and
        # carries hs·vs blocks per component.
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        planes = [
            np.empty((mcus_y * 8 * vs, mcus_x * 8 * hs))
            for (_, _, _, hs, vs) in plan
        ]
        rd = _BitReader(buf, pos)
        prev = [0] * len(plan)
        mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    if not rd.sync_restart():
                        return None
                    prev = [0] * len(plan)
                mcu += 1
                for ci, (q, dc_tab, ac_tab, hs, vs) in enumerate(plan):
                    for v in range(vs):
                        for u in range(hs):
                            zz, prev[ci] = _decode_block(
                                rd, dc_tab, ac_tab, prev[ci]
                            )
                            py = (my * vs + v) * 8
                            px = (mx * hs + u) * 8
                            planes[ci][py : py + 8, px : px + 8] = (
                                _dequant_idct_block(zz, q, m)
                            )
        # Upsample subsampled components to full resolution (nearest,
        # the block-replication inverse of the encoder's 2×2 mean).
        full = []
        for p, (_, _, _, hs, vs) in zip(planes, plan):
            if hs != hmax:
                p = np.repeat(p, hmax // hs, axis=1)
            if vs != vmax:
                p = np.repeat(p, vmax // vs, axis=0)
            full.append(p[: mcus_y * 8 * vmax, : mcus_x * 8 * hmax])
        return _planes_to_gray(full, h, w)
    except (EOFError, ValueError, IndexError, struct.error):
        return None


# ------------------------------------------------------------------
# Progressive (SOF2), spectral-selection mode.


def _emit_dc_scan(out: bytearray, comps: list, ah: int, al: int) -> None:
    """Interleaved DC scan over all components. ``ah == 0``: first
    pass — Huffman-coded diffs of the point-transformed (arithmetic
    ``>> al``) DC values. ``ah > 0``: successive-approximation
    refinement — one raw bit (bit ``al`` of the signed DC) per block."""
    nf = len(comps)
    bits = _BitWriter()
    bh0, bw0 = len(comps[0]), len(comps[0][0])
    if ah == 0:
        prev = [0] * nf
        for byi in range(bh0):
            for bxi in range(bw0):
                for ci in range(nf):
                    dc = comps[ci][byi][bxi][0] >> al
                    diff = dc - prev[ci]
                    prev[ci] = dc
                    n = _category(diff)
                    c, ln = _DC_ENC[n]
                    bits.write(c, ln)
                    if n:
                        bits.write(_amplitude(diff, n), n)
    else:
        for byi in range(bh0):
            for bxi in range(bw0):
                for ci in range(nf):
                    bits.write((comps[ci][byi][bxi][0] >> al) & 1, 1)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    for cid in range(1, nf + 1):
        out += struct.pack(">BB", cid, 0x00)
    out += struct.pack(">BBB", 0, 0, (ah << 4) | al)
    out += bits.flush()


def _emit_ac_first_scan(out: bytearray, blocks: list, cid: int, al: int) -> None:
    """Single-component AC first scan (Ss=1, Se=63, Ah=0): baseline
    run/size coding of the point-transformed magnitudes
    ``sign·(|coef| >> al)``; every block ends with an immediate EOB
    (EOBRUN = 1), so the Annex-K-shaped AC table — which has no EOBn>1
    symbols — suffices. The DECODER still handles general EOB runs."""
    bits = _BitWriter()
    for row in blocks:
        for zz in row:
            vals = [
                (abs(zz[k]) >> al) * (1 if zz[k] > 0 else -1)
                for k in range(64)
            ]
            run = 0
            last_nz = max((k for k in range(1, 64) if vals[k]), default=0)
            for k in range(1, last_nz + 1):
                if vals[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = _AC_ENC[0xF0]
                    bits.write(c, ln)
                    run -= 16
                n = _category(vals[k])
                c, ln = _AC_ENC[(run << 4) | n]
                bits.write(c, ln)
                bits.write(_amplitude(vals[k], n), n)
                run = 0
            if last_nz < 63:
                c, ln = _AC_ENC[0x00]
                bits.write(c, ln)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2, 1)
    out += struct.pack(">BB", cid, 0x00)
    out += struct.pack(">BBB", 1, 63, al)
    out += bits.flush()


def _emit_ac_refine_scan(
    out: bytearray, blocks: list, cid: int, ah: int, al: int
) -> None:
    """Single-component AC successive-approximation refinement scan
    (T.81 G.1.2.3): newly-nonzero coefficients (zero at precision
    ``ah``, nonzero at ``al``) are coded as (run, 1) symbols plus a
    sign bit, where the run counts only STILL-ZERO positions;
    already-nonzero coefficients contribute one correction bit (bit
    ``al`` of the magnitude) each, BUFFERED and appended after the
    next emitted symbol — mirroring the decoder, which consumes them
    while advancing between symbols. A trailing EOB (followed by the
    remaining buffered correction bits) closes each block."""
    bits = _BitWriter()
    for row in blocks:
        for zz in row:
            run = 0
            pending: list[int] = []
            for k in range(1, 64):
                mag = abs(zz[k])
                if (mag >> al) == 0:
                    run += 1
                    continue
                # The ZRL flush must happen at EVERY nonzero coefficient
                # — before the newly/already branch — so every buffered
                # correction bit precedes the 16 zeros each ZRL skips
                # (the decoder consumes corrections interleaved while
                # advancing; flushing only at newly-nonzero positions
                # would emit a later coefficient's correction under an
                # earlier ZRL and desync the stream).
                while run > 15:
                    c, ln = _AC_ENC[0xF0]
                    bits.write(c, ln)
                    for b in pending:
                        bits.write(b, 1)
                    pending = []
                    run -= 16
                if (mag >> ah) == 0:  # newly nonzero at this precision
                    c, ln = _AC_ENC[(run << 4) | 1]
                    bits.write(c, ln)
                    bits.write(1 if zz[k] > 0 else 0, 1)
                    for b in pending:
                        bits.write(b, 1)
                    pending = []
                    run = 0
                else:  # already nonzero: correction bit
                    pending.append((mag >> al) & 1)
            if run > 0 or pending:
                c, ln = _AC_ENC[0x00]
                bits.write(c, ln)
                for b in pending:
                    bits.write(b, 1)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2, 1)
    out += struct.pack(">BB", cid, 0x00)
    out += struct.pack(">BBB", 1, 63, (ah << 4) | al)
    out += bits.flush()


def encode_jpeg_progressive(arr, successive: bool = False) -> bytes:
    """8-bit gray (h, w) or RGB (h, w, 3) array → PROGRESSIVE JPEG
    bytes (SOF2). Default scan script is pure spectral selection: one
    interleaved DC scan (Ss=Se=0) followed by one full-band AC scan
    per component (Ss=1, Se=63), Ah=Al=0 throughout.
    ``successive=True`` adds SUCCESSIVE APPROXIMATION — the libjpeg-
    style two-level script: DC first at Al=1, AC first per component
    at Al=1, DC refinement (Ah=1), AC refinement per component (Ah=1,
    Al=0) — a real four-stage progressive bitstream whose refinement
    scans reassemble the exact quantized coefficients. No subsampling
    (gray / 4:4:4).
    """
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        planes = [_pad_plane(a.astype(np.float64), h, w)]
    else:
        h, w = a.shape[:2]
        af = a.astype(np.float64)
        r, g, b = af[:, :, 0], af[:, :, 1], af[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [_pad_plane(p, h, w) for p in (y, cb, cr)]
    m = _dct_matrix()
    q = np.array(QTABLE, dtype=np.float64).reshape(8, 8)
    # Quantized zigzag coefficients per component block grid.
    comps = []
    for plane in planes:
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        rows = []
        for byi in range(bh):
            row = []
            for bxi in range(bw):
                f = plane[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8] - 128.0
                sq = np.round((m @ f @ m.T) / q).astype(np.int64)
                row.append([int(sq.flat[ZIGZAG[k]]) for k in range(64)])
            rows.append(row)
        comps.append(rows)
    nf = len(comps)

    out = bytearray(b"\xff\xd8")
    zz_q = bytes(QTABLE[ZIGZAG[k]] for k in range(64))
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + zz_q
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for cid in range(1, nf + 1):
        out += struct.pack(">BBB", cid, 0x11, 0)
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(_DC_VALS), 0x00)
    out += bytes(_DC_BITS) + bytes(_DC_VALS)
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(_AC_VALS), 0x10)
    out += bytes(_AC_BITS) + bytes(_AC_VALS)

    if not successive:
        # Spectral selection only: DC scan, then full AC band per comp.
        _emit_dc_scan(out, comps, 0, 0)
        for ci in range(nf):
            _emit_ac_first_scan(out, comps[ci], ci + 1, 0)
    else:
        # Two-level successive approximation: coarse first passes at
        # Al=1, then the refinement scans that restore bit 0.
        _emit_dc_scan(out, comps, 0, 1)
        for ci in range(nf):
            _emit_ac_first_scan(out, comps[ci], ci + 1, 1)
        _emit_dc_scan(out, comps, 1, 0)
        for ci in range(nf):
            _emit_ac_refine_scan(out, comps[ci], ci + 1, 1, 0)

    out += b"\xff\xd9"
    return bytes(out)


def _decode_prog_scan(
    rd, coefs, comps, sel, htables, ss, se, ah, al, h, w, restart_interval
):
    """Decode one progressive scan's entropy data into the zigzag
    coefficient store. Returns False on any unsupported/invalid
    geometry. Supported: DC scans (interleaved or single-component,
    first pass Ah=0 and refinement Ah>0), AC FIRST scans (Ah=0,
    single-component per T.81, general EOBn runs, ZRL), AC
    successive-approximation REFINEMENT scans (Ah>0: (run, 1) symbols
    counting still-zero positions, interleaved correction bits,
    EOB-run correction sweeps), and restart markers."""
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    if ss == 0:
        if se != 0:
            return False
        dc_tabs = []
        if ah == 0:
            for _, td, _ in sel:
                t = htables.get(0x00 | td)
                if t is None:
                    return False
                dc_tabs.append(t)
        prev = [0] * len(sel)
        if len(sel) > 1:
            # interleaved MCU order over all scan components
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            unit = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and unit and unit % restart_interval == 0:
                        if not rd.sync_restart():
                            return False
                        prev = [0] * len(sel)
                    unit += 1
                    for si, (idx, _, _) in enumerate(sel):
                        _, _, hs, vs = comps[idx]
                        for v in range(vs):
                            for u in range(hs):
                                byi, bxi = my * vs + v, mx * hs + u
                                if ah == 0:
                                    n = _read_symbol(rd, dc_tabs[si])
                                    diff = _extend(rd.read_bits(n), n) if n else 0
                                    prev[si] += diff
                                    coefs[idx][byi, bxi, 0] = prev[si] << al
                                elif rd.read_bit():
                                    coefs[idx][byi, bxi, 0] |= 1 << al
        else:
            idx = sel[0][0]
            _, _, hs, vs = comps[idx]
            bw = -(-(w * hs) // (8 * hmax))
            bh = -(-(h * vs) // (8 * vmax))
            unit = 0
            for byi in range(bh):
                for bxi in range(bw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        if not rd.sync_restart():
                            return False
                        prev = [0]
                    unit += 1
                    if ah == 0:
                        n = _read_symbol(rd, dc_tabs[0])
                        diff = _extend(rd.read_bits(n), n) if n else 0
                        prev[0] += diff
                        coefs[idx][byi, bxi, 0] = prev[0] << al
                    elif rd.read_bit():
                        coefs[idx][byi, bxi, 0] |= 1 << al
        return True
    # AC scan: single component per T.81.
    if len(sel) != 1 or se < ss or se > 63:
        return False
    idx, _, ta = sel[0]
    ac_tab = htables.get(0x10 | ta)
    if ac_tab is None:
        return False
    _, _, hs, vs = comps[idx]
    bw = -(-(w * hs) // (8 * hmax))
    bh = -(-(h * vs) // (8 * vmax))
    eobrun = 0
    unit = 0
    if ah == 0:
        # First pass: run/size coding of point-transformed magnitudes.
        for byi in range(bh):
            for bxi in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    if not rd.sync_restart():
                        return False
                    eobrun = 0
                unit += 1
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_symbol(rd, ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL: 16 zero coefficients
                            continue
                        # EOBn: run of 2^r + (r extra bits) all-zero
                        # bands, INCLUDING this block
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.read_bits(r)
                        break
                    k += r
                    if k > se:
                        return False
                    coefs[idx][byi, bxi, k] = _extend(rd.read_bits(s), s) << al
                    k += 1
        return True
    # Successive-approximation refinement (T.81 G.2): newly-nonzero
    # coefficients arrive as (run, 1) symbols + sign, where the run
    # counts only STILL-ZERO positions; every already-nonzero
    # coefficient passed over consumes one correction bit. Blocks
    # inside an EOB run (and the band remainder after an EOB symbol)
    # still consume correction bits for their nonzero coefficients.
    p1 = 1 << al

    def refine_nz(cf, k):
        if rd.read_bit() and not (int(cf[k]) & p1):
            cf[k] += p1 if cf[k] > 0 else -p1

    for byi in range(bh):
        for bxi in range(bw):
            if restart_interval and unit and unit % restart_interval == 0:
                if not rd.sync_restart():
                    return False
                eobrun = 0
            unit += 1
            cf = coefs[idx][byi, bxi]
            if eobrun:
                eobrun -= 1
                for k in range(ss, se + 1):
                    if cf[k]:
                        refine_nz(cf, k)
                continue
            k = ss
            hit_eob = False
            while k <= se:
                rs = _read_symbol(rd, ac_tab)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.read_bits(r)
                        hit_eob = True
                        break
                    # r == 15: ZRL — skip 16 still-zero positions
                else:
                    if s != 1:
                        return False
                    val = p1 if rd.read_bit() else -p1
                while k <= se:
                    if cf[k]:
                        refine_nz(cf, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    cf[k] = val
                k += 1
            if hit_eob:
                while k <= se:
                    if cf[k]:
                        refine_nz(cf, k)
                    k += 1
    return True


def _decode_progressive(buf: bytes):
    """Progressive (SOF2) JPEG bytes → 2-D uint8 GRAY array, or None
    when unsupported. Driven entirely by the bitstream: scan script,
    spectral bands, Huffman/quant tables, and MCU geometry all come
    from the file. Supported: spectral selection with any script,
    successive approximation (DC and AC refinement), general EOB
    runs, restart markers, gray / 4:4:4 / 2×-subsampled color.
    Unsupported (→ None, the cv2 seam): 16-bit quant tables."""
    import numpy as np

    qtables: dict[int, list[int]] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int, int, int]] = []
    coefs = None
    restart_interval = 0
    pos = 2
    try:
        while pos + 2 <= len(buf):
            if buf[pos] != 0xFF:
                return None
            marker = buf[pos + 1]
            if marker == 0xD9:  # EOI
                break
            if pos + 4 > len(buf):
                return None
            seglen = struct.unpack_from(">H", buf, pos + 2)[0]
            seg = buf[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:
                if not _parse_dqt(seg, qtables):
                    return None
            elif marker == 0xC2:
                sof = _parse_sof_comps(seg)
                if sof is None:
                    return None
                h, w, comps = sof
                hmax = max(c[2] for c in comps)
                vmax = max(c[3] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                coefs = [
                    np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
                    for (_, _, hs, vs) in comps
                ]
            elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
                return None  # not a (single-frame) progressive stream
            elif marker == 0xC4:
                _parse_dht(seg, htables)
            elif marker == 0xDD:
                restart_interval = struct.unpack_from(">H", seg, 0)[0]
            elif marker == 0xDA:
                if coefs is None:
                    return None
                ns = seg[0]
                sel = []
                for i in range(ns):
                    cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                    idx = next(
                        (j for j, c in enumerate(comps) if c[0] == cid), None
                    )
                    if idx is None:
                        return None
                    sel.append((idx, tt >> 4, tt & 0xF))
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                rd = _BitReader(buf, pos + 2 + seglen)
                ok = _decode_prog_scan(
                    rd, coefs, comps, sel, htables,
                    ss, se, ahal >> 4, ahal & 0xF, h, w, restart_interval,
                )
                if not ok:
                    return None
                # skip to the next true marker (stuffed 0xFF00 and RSTn
                # bytes belong to the scan)
                p = rd.pos
                while p + 1 < len(buf):
                    if (
                        buf[p] == 0xFF
                        and buf[p + 1] != 0x00
                        and not (0xD0 <= buf[p + 1] <= 0xD7)
                    ):
                        break
                    p += 1
                pos = p
                continue
            pos += 2 + seglen
        if coefs is None or not h or not w:
            return None
        m = _dct_matrix()
        hmax = max(c[2] for c in comps)
        vmax = max(c[3] for c in comps)
        planes = []
        for (cid, tq, hs, vs), cf in zip(comps, coefs):
            if tq not in qtables:
                return None
            qn = np.array(qtables[tq], dtype=np.float64).reshape(8, 8)
            bh, bw = cf.shape[0], cf.shape[1]
            plane = np.empty((bh * 8, bw * 8))
            for byi in range(bh):
                for bxi in range(bw):
                    plane[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8] = (
                        _dequant_idct_block(cf[byi, bxi], qn, m)
                    )
            if hs != hmax:
                plane = np.repeat(plane, hmax // hs, axis=1)
            if vs != vmax:
                plane = np.repeat(plane, vmax // vs, axis=0)
            planes.append(plane)
        return _planes_to_gray(planes, h, w)
    except (EOFError, ValueError, IndexError, struct.error):
        return None
