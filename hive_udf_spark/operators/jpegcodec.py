"""Vendored pure-Python baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The second COMPRESSED vendored image format (after PNG, r6): a real
marker-segment parse (SOI/APP/DQT/SOF0/DHT/SOS/DRI/RST/EOI), canonical
Huffman entropy decode with byte-unstuffing, dequantize → de-zigzag →
8×8 IDCT (orthonormal DCT-III as a numpy matrix product), and a
multi-component MCU walk with per-component sampling factors (4:4:4 and
2×2-luma 4:2:0). Output is the 8-bit LUMA plane — JPEG's Y channel IS
BT.601 luma, the same convention every other decoder in this package
uses for gray, so chroma components are entropy-decoded (the bitstream
must be walked to stay in sync) but not color-converted.

``encode_jpeg`` is the fixture twin: grayscale or 4:4:4 YCbCr baseline
JFIF with IJG-style quality scaling of the Annex-K quantization tables
and self-built canonical Huffman tables (fixed-length code assignment —
valid per the DHT grammar, deliberately simple rather than transcribed
from Annex K, so the decoder's table construction is exercised on
tables it has never seen). At ``quality=100`` both quant tables are
all-ones; an image whose 8×8 blocks are each CONSTANT then round-trips
bit-exactly (a flat block has only a DC coefficient, DC = 8·(c−128) is
divisible by q=1, and the DC-only IDCT is c−128 to within 1e-13 before
the final integer rounding) — which is what lets a SQL oracle predict
the decoded pixel statistics of a lossy format exactly
(``multimodal_jpeg_decode``).

Scope: baseline sequential DCT (SOF0) and — r8 — progressive DCT (SOF2)
with spectral selection + successive approximation: DC-first/DC-refine,
AC-first/AC-refine scans, EOBn run decoding, non-interleaved AC scans
on the component block grid, restart markers inside every scan type,
and between-scan DHT redefinition.  8-bit precision, Huffman entropy
coding.  Arithmetic coding, 12-bit, lossless, and hierarchical modes
raise ``ValueError`` explicitly — never a silent wrong decode.

``encode_jpeg_progressive`` is the progressive fixture twin: a
four-phase scan script (interleaved DC first at Al=1 → per-component
AC first → DC refine → per-component AC refine) that exercises all
four scan decoders; with full refinement down to Al=0 it transmits
exactly the baseline-quantized coefficients, so progressive and
baseline decodes of the same image are BIT-IDENTICAL — the
self-consistency property the tests pin.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated multimodal-columns extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = ["decode_jpeg_gray", "decode_jpeg_rgb", "encode_jpeg",
           "encode_jpeg_progressive"]


def _zigzag() -> np.ndarray:
    """Standard JPEG zigzag scan order: position k → raster index r*8+c.
    Generated, not transcribed (a transposition typo in a 64-entry
    literal is invisible until the wrong image decodes plausibly)."""
    out = []
    r = c = 0
    for _ in range(64):
        out.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag()

# Annex K example quantization tables (the de-facto standard every
# encoder scales); raster order.
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100; quality=100 → all-ones (lossless DCT
    quantization for flat blocks — the oracle-exactness regime)."""
    if not 1 <= quality <= 100:
        raise ValueError("JPEG quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: F = A·B·Aᵀ, B = Aᵀ·F·A."""
    x = np.arange(8, dtype=np.float64)
    A = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    A[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return A


_DCT_A = _dct_matrix()


# ---------------------------------------------------------------------------
# Canonical Huffman tables (JPEG BITS/HUFFVAL representation)
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol, canonical assignment per T.81 C.2."""
    if len(vals) != sum(bits):
        raise ValueError("DHT: value count disagrees with BITS")
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("DHT: oversubscribed Huffman code space")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _fixed_length_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A valid (BITS, HUFFVAL) assigning every symbol the same code
    length L = ⌈log2(n+1)⌉ — the +1 keeps the all-ones code of length L
    unassigned (T.81 reserves it so 1-bits padding can never form a
    valid code). Deliberately simple fixture tables."""
    n = len(symbols)
    length = max(2, int(np.ceil(np.log2(n + 1))))
    bits = [0] * 16
    bits[length - 1] = n
    return bits, list(symbols)


_DC_SYMBOLS = list(range(12))  # DC difference categories 0..11
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]  # EOB, ZRL, (run,size)

_DC_BITS, _DC_VALS = _fixed_length_table(_DC_SYMBOLS)
_AC_BITS, _AC_VALS = _fixed_length_table(_AC_SYMBOLS)


def _encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code_length, code), inverse of _build_decode_table."""
    return {sym: lc for lc, sym in _build_decode_table(bits, vals).items()}


# ---------------------------------------------------------------------------
# Bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops AT markers (the
    caller handles RST/EOI)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf
        if self.pos >= len(b):
            raise ValueError("JPEG entropy stream truncated")
        byte = b[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(b):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            nxt = b[self.pos + 1]
            if nxt == 0x00:  # stuffed
                self.pos += 2
            else:  # a real marker: caller must consume it
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy segment"
                )
        else:
            self.pos += 1
        # only ever called at nbits == 0 (read_bit refills on empty), so
        # the old accumulator bits are dead — assigning instead of
        # shifting keeps acc bounded (the shift form grew acc by 8 bits
        # per byte for the whole segment: O(n²) big-int work)
        self.acc = byte
        self.nbits = 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG entropy stream")

    def align_to_marker(self) -> None:
        """Drop pad bits and position at the next 0xFF marker byte."""
        self.acc = 0
        self.nbits = 0
        while self.pos < len(self.buf) and self.buf[self.pos] != 0xFF:
            raise ValueError("garbage bytes before JPEG marker")
        # pos now at 0xFF


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` received bits to the signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


@untrusted_decoder
def decode_jpeg_gray(b: bytes) -> np.ndarray:
    """Decode a baseline JFIF/JPEG stream to its (h, w) uint8 LUMA plane.

    Raises ``ValueError`` for anything outside baseline sequential
    Huffman 8-bit (progressive, arithmetic, 12-bit, unsupported sampling
    factors) and for malformed streams (truncation, bad Huffman codes,
    marker desync, dimension overrun).
    """
    return _decode_jpeg(b, rgb=False)


@untrusted_decoder
def decode_jpeg_rgb(b: bytes) -> np.ndarray:
    """Decode a baseline JFIF/JPEG stream to (h, w, 3) uint8 RGB (r11,
    verdict item 3 — the chroma components were already entropy-decoded
    to keep the bitstream in sync; this materializes them): per-
    component dequant + IDCT, nearest upsample of subsampled chroma to
    the frame grid (the same index mapping the luma path uses), then
    the JFIF YCbCr→RGB transform.  Grayscale JPEGs replicate the luma.
    Progressive color is not vendored (gray tier only) and raises."""
    return _decode_jpeg(b, rgb=True)


def _decode_jpeg(b: bytes, rgb: bool = False) -> np.ndarray:
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) ; comps = [(cid, hi, vi, tq)]
    progressive = False
    restart_interval = 0
    while True:
        if pos + 4 > len(b):
            raise ValueError("JPEG stream truncated before SOS")
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before any scan
            raise ValueError("JPEG stream has no scan (EOI before SOS)")
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF 0x{marker:02X} not sequential/progressive Huffman "
                "(extended/arithmetic/lossless/hierarchical not vendored)"
            )
        (seglen,) = struct.unpack_from(">H", b, pos)
        seg_end = pos + seglen
        if seglen < 2 or seg_end > len(b):
            raise ValueError(f"JPEG segment 0x{marker:02X} truncated")
        body = pos + 2
        if marker == 0xDB:  # DQT
            p = body
            while p < seg_end:
                pq, tq = b[p] >> 4, b[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables not vendored")
                qtables[tq] = np.frombuffer(
                    b, dtype=np.uint8, count=64, offset=p + 1
                ).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = body
            while p < seg_end:
                tc, th = b[p] >> 4, b[p] & 0x0F
                bits = list(b[p + 1 : p + 17])
                n = sum(bits)
                vals = list(b[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", b, body)
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG not vendored")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", b, body + 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", b, body)
        elif marker == 0xDA:  # SOS
            break
        # APPn / COM / anything else: skip
        pos = seg_end
    if frame is None:
        raise ValueError("JPEG SOS before SOF")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("JPEG zero dimension")
    if progressive:
        if rgb:
            raise ValueError(
                "progressive JPEG color decode not vendored (gray tier only)"
            )
        return _decode_progressive(
            b, pos, frame, qtables, htables, restart_interval
        )
    ns = b[pos + 2]
    scan: list[tuple[int, int, int]] = []  # (comp_index, dc_id, ac_id)
    for i in range(ns):
        cs, tda = struct.unpack_from(">BB", b, pos + 3 + 2 * i)
        ci = next((j for j, c in enumerate(comps) if c[0] == cs), None)
        if ci is None:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        scan.append((ci, tda >> 4, tda & 0x0F))
    if len(scan) != len(comps):
        raise ValueError("multi-scan (non-interleaved) JPEG not vendored")
    data_start = pos + 3 + 2 * ns + 3  # skip Ss/Se/AhAl

    hs = [c[1] for c in comps]
    vs = [c[2] for c in comps]
    hmax, vmax = max(hs), max(vs)
    if any(hi not in (1, 2) or vi not in (1, 2) for hi, vi in zip(hs, vs)):
        raise ValueError("JPEG sampling factors beyond 1-2 not vendored")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for _, _, _, tq in comps:
        if tq not in qtables:
            raise ValueError(f"JPEG quant table {tq} never defined")

    reader = _BitReader(b, data_start)
    pred = [0] * len(comps)
    A = _DCT_A
    n_mcu = mcux * mcuy
    # Two-phase decode: the entropy walk is inherently sequential (each
    # Huffman code's length depends on the bits before it), but the
    # dequantize→de-zigzag→IDCT of every block is not — blocks are
    # collected as plain int lists and transformed in ONE vectorized
    # einsum per component at the end.  The gray path stores LUMA only
    # (chroma is entropy-decoded purely to keep the bitstream in sync);
    # the rgb path (r11) stores every component to materialize color.
    # ~2× over per-block matmuls at fixture image sizes.
    want = range(len(comps)) if rgb else (0,)
    comp_zz: dict[int, list[list[int]]] = {ci: [] for ci in want}
    comp_pos: dict[int, list[tuple[int, int]]] = {ci: [] for ci in want}
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_to_marker()
            if reader.buf[reader.pos : reader.pos + 1] != b"\xff" or not (
                0xD0 <= reader.buf[reader.pos + 1] <= 0xD7
            ):
                raise ValueError("expected RST marker at restart interval")
            reader.pos += 2
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, dc_id, ac_id in scan:
            _, hi, vi, tq = comps[ci]
            dct = htables.get((0, dc_id))
            act = htables.get((1, ac_id))
            if dct is None or act is None:
                raise ValueError("JPEG scan uses an undefined Huffman table")
            for by in range(vi):
                for bx in range(hi):
                    zz = [0] * 64
                    size = reader.decode_symbol(dct)
                    if size > 11:
                        raise ValueError("JPEG DC category out of range")
                    diff = _extend(reader.receive(size), size)
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(reader.receive(s), s)
                        k += 1
                    if ci in comp_zz:
                        comp_zz[ci].append(zz)
                        comp_pos[ci].append(
                            ((my * vi + by) * 8, (mx * hi + bx) * 8)
                        )

    def _component_plane(ci: int) -> np.ndarray:
        """Batched dequant + de-zigzag + IDCT of one component's blocks,
        cropped to its own dims and nearest-upsampled to (h, w)."""
        _, hi, vi, tq = comps[ci]
        plane = np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        q = qtables[tq]
        zz_list = comp_zz[ci]
        Z = np.asarray(zz_list, dtype=np.float64) * q[ZIGZAG].astype(np.float64)
        coeffs = np.zeros((len(zz_list), 64), dtype=np.float64)
        coeffs[:, ZIGZAG] = Z
        blocks = np.einsum("ij,njk,kl->nil", A.T, coeffs.reshape(-1, 8, 8), A)
        for (y0, x0), blk in zip(comp_pos[ci], blocks):
            plane[y0 : y0 + 8, x0 : x0 + 8] = blk
        # component plane may be subsampled relative to the frame grid
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        plane = plane[:ch, :cw]
        if (vi, hi) != (vmax, hmax):
            ys = (np.arange(h, dtype=np.int64) * ch // h).clip(0, ch - 1)
            xs = (np.arange(w, dtype=np.int64) * cw // w).clip(0, cw - 1)
            return plane[np.ix_(ys, xs)]
        return plane[:h, :w]

    if not rgb:
        # JPEG Y IS BT.601 luma — chroma was entropy-decoded above
        # purely to keep the bitstream in sync.
        luma = _component_plane(0)
        return np.clip(np.round(luma + 128.0), 0, 255).astype(np.uint8)
    y = _component_plane(0) + 128.0
    if len(comps) == 1:
        gray = np.clip(np.round(y), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component JPEG color not vendored")
    cb = _component_plane(1)  # already centered on 0 (128 offset is in Y only)
    cr = _component_plane(2)
    # JFIF YCbCr → RGB
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    out = np.stack([r, g, bl], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decoder (SOF2: spectral selection + successive approximation)
# ---------------------------------------------------------------------------


def _ac_first(reader, act, coef, ss, se, al, eobrun):
    """T.81 G.1.2.2: first AC scan of a band — run/size symbols with
    EOBn run-length codes; values enter at magnitude << Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eb = (1 << r) - 1
            if r:
                eb += reader.receive(r)
            return eb
        k += r
        if k > se:
            raise ValueError("JPEG AC run past spectral band")
        coef[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _refine_nonzero(reader, coef, k, p1):
    """Correction bit for an already-nonzero coefficient (G.1.2.3)."""
    if reader.read_bit() and (int(coef[k]) & p1) == 0:
        coef[k] += p1 if coef[k] > 0 else -p1


def _ac_refine(reader, act, coef, ss, se, al, eobrun):
    """T.81 G.1.2.3: AC refinement — newly-significant coefficients
    arrive as ±1<<Al after runs counted over ZERO-history positions;
    already-nonzero coefficients passed over receive correction bits;
    EOBn covers whole blocks whose nonzero coefficients still receive
    correction bits."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:  # EOBn: run includes THIS block
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement magnitude must be 1")
                val = p1 if reader.read_bit() else -p1
            while k <= se:
                if coef[k] != 0:
                    _refine_nonzero(reader, coef, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0:
                if k > se:
                    raise ValueError("JPEG AC refine run past band")
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                _refine_nonzero(reader, coef, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker_after_scan(b: bytes, p: int) -> int:
    """Position of the marker terminating a scan's entropy data; the
    only legal filler is a stuffed 0xFF00 from 1-bit padding."""
    while p + 1 < len(b) and b[p] == 0xFF and b[p + 1] == 0x00:
        p += 2
    if p + 1 >= len(b) or b[p] != 0xFF:
        raise ValueError("expected marker after progressive scan data")
    return p


def _decode_progressive(b, pos, frame, qtables, htables, restart_interval):
    """Multi-scan progressive decode loop: accumulate DCT coefficients
    for every component across DC-first/DC-refine/AC-first/AC-refine
    scans (with between-scan DHT/DQT/DRI), then IDCT the luma plane
    once at EOI — the same vectorized path the baseline decoder uses.
    ``pos`` points at the first SOS segment's length field."""
    h, w, comps = frame
    hs = [c[1] for c in comps]
    vs = [c[2] for c in comps]
    hmax, vmax = max(hs), max(vs)
    if any(hi not in (1, 2) or vi not in (1, 2) for hi, vi in zip(hs, vs)):
        raise ValueError("JPEG sampling factors beyond 1-2 not vendored")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for _, _, _, tq in comps:
        if tq not in qtables:
            raise ValueError(f"JPEG quant table {tq} never defined")
    # MCU-padded coefficient grids (interleaved scans) — non-interleaved
    # scans address the top-left component-sized block subgrid.
    coefs = [
        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
        for hi, vi in zip(hs, vs)
    ]
    # Non-interleaved scans cover ceil(component_dim / 8) blocks — the
    # component dims, NOT the MCU-padded grid (T.81 A.2.2).
    nonint_b = []
    for hi, vi in zip(hs, vs):
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        nonint_b.append((-(-ch // 8), -(-cw // 8)))
    got_dc = [False] * len(comps)

    while True:
        # --- scan header at pos (length field) ---
        (seglen,) = struct.unpack_from(">H", b, pos)
        if pos + seglen > len(b):
            raise ValueError("JPEG SOS segment truncated")
        ns = b[pos + 2]
        if seglen != 6 + 2 * ns:
            raise ValueError("JPEG SOS segment length mismatch")
        scan = []
        for i in range(ns):
            cs, tda = struct.unpack_from(">BB", b, pos + 3 + 2 * i)
            ci = next((j for j, c in enumerate(comps) if c[0] == cs), None)
            if ci is None:
                raise ValueError(f"JPEG scan references unknown component {cs}")
            scan.append((ci, tda >> 4, tda & 0x0F))
        ss, se, ahal = struct.unpack_from(">BBB", b, pos + 3 + 2 * ns)
        ah, al = ahal >> 4, ahal & 0x0F
        if not (0 <= ss <= se <= 63) or al > 13 or ah > 13:
            raise ValueError("JPEG progressive scan parameters out of range")
        is_dc = ss == 0
        if is_dc and se != 0:
            raise ValueError("JPEG progressive DC scan must have Se=0")
        if not is_dc:
            if ns != 1:
                raise ValueError("JPEG progressive AC scan must be single-component")
            if not got_dc[scan[0][0]]:
                raise ValueError("JPEG AC scan before the component's DC scan")
        reader = _BitReader(b, pos + seglen)
        eobrun = 0
        pred = [0] * len(comps)
        tdc = {ci: t for ci, t, _ in scan}
        tac = {ci: t for ci, _, t in scan}

        if ns > 1:
            mcu_units = []
            for ci, _, _ in scan:
                hi, vi = hs[ci], vs[ci]
                mcu_units.append((ci, hi, vi))
            n_mcu = mcux * mcuy
        else:
            ci0 = scan[0][0]
            nby, nbx = nonint_b[ci0]
            n_mcu = nby * nbx

        for m in range(n_mcu):
            if restart_interval and m and m % restart_interval == 0:
                p = _next_marker_after_scan(b, reader.pos)
                if not 0xD0 <= b[p + 1] <= 0xD7:
                    raise ValueError("expected RST marker at restart interval")
                reader = _BitReader(b, p + 2)
                pred = [0] * len(comps)
                eobrun = 0
            if ns > 1:
                my, mx = divmod(m, mcux)
                units = [
                    (ci, my * vi + by, mx * hi + bx)
                    for ci, hi, vi in mcu_units
                    for by in range(vi)
                    for bx in range(hi)
                ]
            else:
                units = [(ci0, m // nbx, m % nbx)]
            for ci, by, bx in units:
                coef = coefs[ci][by, bx]
                if is_dc:
                    if ah == 0:
                        dct = htables.get((0, tdc[ci]))
                        if dct is None:
                            raise ValueError("JPEG scan uses an undefined DC table")
                        size = reader.decode_symbol(dct)
                        if size > 11:
                            raise ValueError("JPEG DC category out of range")
                        diff = _extend(reader.receive(size), size)
                        pred[ci] += diff
                        coef[0] = pred[ci] << al
                    else:
                        if reader.read_bit():
                            coef[0] = int(coef[0]) | (1 << al)
                else:
                    act = htables.get((1, tac[ci]))
                    if act is None:
                        raise ValueError("JPEG scan uses an undefined AC table")
                    if ah == 0:
                        eobrun = _ac_first(reader, act, coef, ss, se, al, eobrun)
                    else:
                        eobrun = _ac_refine(reader, act, coef, ss, se, al, eobrun)
        if is_dc:
            for ci, _, _ in scan:
                got_dc[ci] = True

        # --- segments after the scan: DHT/DQT/DRI/APP/COM, SOS, EOI ---
        pos = _next_marker_after_scan(b, reader.pos)
        next_sos = None
        while next_sos is None:
            if b[pos] != 0xFF:
                raise ValueError(f"expected marker at byte {pos}")
            marker = b[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI — reconstruct
                if not got_dc[0]:
                    raise ValueError("JPEG EOI before any luma DC scan")
                return _idct_luma_plane(
                    coefs[0], qtables[comps[0][3]], h, w, hs, vs, hmax, vmax,
                    mcux, mcuy,
                )
            (seglen,) = struct.unpack_from(">H", b, pos)
            seg_end = pos + seglen
            if seglen < 2 or seg_end > len(b):
                raise ValueError(f"JPEG segment 0x{marker:02X} truncated")
            body = pos + 2
            if marker == 0xDA:
                next_sos = pos - 2
            elif marker == 0xC4:  # DHT (tables may change between scans)
                p = body
                while p < seg_end:
                    tc, th = b[p] >> 4, b[p] & 0x0F
                    bits = list(b[p + 1 : p + 17])
                    n = sum(bits)
                    vals = list(b[p + 17 : p + 17 + n])
                    htables[(tc, th)] = _build_decode_table(bits, vals)
                    p += 17 + n
            elif marker == 0xDB:  # DQT
                p = body
                while p < seg_end:
                    pq, tq = b[p] >> 4, b[p] & 0x0F
                    if pq != 0:
                        raise ValueError("16-bit JPEG quant tables not vendored")
                    qtables[tq] = np.frombuffer(
                        b, dtype=np.uint8, count=64, offset=p + 1
                    ).astype(np.int64)
                    p += 65
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", b, body)
            elif marker in (0xC0, 0xC2):
                raise ValueError("second SOF in progressive stream")
            if next_sos is None:
                pos = seg_end
        pos = next_sos + 2  # at the SOS length field


def _idct_luma_plane(c0, q0, h, w, hs, vs, hmax, vmax, mcux, mcuy):
    """Dequantize + de-zigzag + batched IDCT of the luma coefficient
    grid, then the same crop/upsample discipline as the baseline path."""
    nby, nbx, _ = c0.shape
    A = _DCT_A
    Z = c0.reshape(-1, 64).astype(np.float64) * q0[ZIGZAG].astype(np.float64)
    coeffs = np.zeros_like(Z)
    coeffs[:, ZIGZAG] = Z
    blocks = np.einsum("ij,njk,kl->nil", A.T, coeffs.reshape(-1, 8, 8), A)
    plane = (
        blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    )
    ch = -(-h * vs[0] // vmax)
    cw = -(-w * hs[0] // hmax)
    luma = plane[:ch, :cw]
    if (vs[0], hs[0]) != (vmax, hmax):
        ys = (np.arange(h, dtype=np.int64) * ch // h).clip(0, ch - 1)
        xs = (np.arange(w, dtype=np.int64) * cw // w).clip(0, cw - 1)
        luma = luma[np.ix_(ys, xs)]
    else:
        luma = luma[:h, :w]
    return np.clip(np.round(luma + 128.0), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (fixture twin)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range RGB→YCbCr, float (h, w, 3)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    bl = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * bl
    cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _encode_plane(
    plane: np.ndarray,
    q: np.ndarray,
    writer: _BitWriter,
    dc_enc: dict[int, tuple[int, int]],
    ac_enc: dict[int, tuple[int, int]],
    pred: int,
    mcu_order: list[tuple[int, int]],
) -> int:
    A = _DCT_A
    for y0, x0 in mcu_order:
        block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
        coeffs = A @ block @ A.T
        zz = np.round(coeffs.reshape(64)[ZIGZAG] / q[ZIGZAG].astype(np.float64))
        zz = zz.astype(np.int64)
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        size = _category(diff)
        length, code = dc_enc[size]
        writer.write(code, length)
        if size:
            writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        # positions past last_nz only feed the EOB — stop there instead
        # of walking the zero tail (flat fixture blocks have NO AC, so
        # the old full 1..63 walk was 63 dead iterations per block)
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_enc[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            s = _category(v)
            length, code = ac_enc[(run << 4) | s]
            writer.write(code, length)
            writer.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            length, code = ac_enc[0x00]  # EOB
            writer.write(code, length)
    return pred


def _prep_planes(
    arr: np.ndarray, subsampling: str
) -> tuple[list[np.ndarray], list[tuple[int, int]], int, int]:
    """→ (block-padded per-component planes, per-component (hi, vi)
    sampling factors, h, w).  '420' box-filters chroma 2×2 and gives
    luma factors (2, 2); gray and '444' are all-(1,1)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
        samps = [(1, 1)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
        if subsampling == "420":
            # box-filter chroma 2x2 (pad to even by edge replication first)
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            sub = []
            for p in planes[1:]:
                pp = np.empty((eh, ew), dtype=np.float64)
                pp[:h, :w] = p
                pp[h:, :w] = p[h - 1 : h, :]
                pp[:, w:] = pp[:, w - 1 : w]
                sub.append(
                    pp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
                )
            planes = [planes[0]] + sub
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1)] * 3
    else:
        raise ValueError("encode_jpeg takes (h,w) gray or (h,w,3) RGB")
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (hi, vi) in zip(planes, samps):
        th, tw = mcuy * vi * 8, mcux * hi * 8
        pp = np.empty((th, tw), dtype=np.float64)
        sh, sw = p.shape
        pp[:sh, :sw] = p
        pp[sh:, :sw] = p[sh - 1 : sh, :]
        pp[:, sw:] = pp[:, sw - 1 : sw]
        padded.append(pp)
    return padded, samps, h, w


def _jpeg_headers(
    marker_sof: bytes,
    h: int,
    w: int,
    nc: int,
    samps: list[tuple[int, int]],
    qluma: np.ndarray,
    qchroma: np.ndarray,
    restart_interval: int,
) -> bytearray:
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def seg(marker: bytes, body: bytes) -> bytes:
        return marker + struct.pack(">H", len(body) + 2) + body

    out += seg(b"\xff\xdb", b"\x00" + qluma.astype(np.uint8).tobytes())
    if nc == 3:
        out += seg(b"\xff\xdb", b"\x01" + qchroma.astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        hi, vi = samps[i]
        sof += struct.pack(">BBB", i + 1, (hi << 4) | vi, 0 if i == 0 else 1)
    out += seg(marker_sof, sof)
    dht = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht += bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    out += seg(b"\xff\xc4", dht)
    if restart_interval:
        out += seg(b"\xff\xdd", struct.pack(">H", restart_interval))
    return out


def encode_jpeg(
    img: np.ndarray,
    quality: int = 100,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → baseline JFIF JPEG (4:4:4 or
    — ``subsampling='420'`` — 2×2-subsampled chroma, the layout real
    camera/web JPEGs actually use: 16×16 MCUs of four luma blocks plus
    one Cb and one Cr). quality=100 scales both Annex-K tables to
    all-ones — the regime where constant 8×8 blocks round-trip exactly.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (the error-resilience machinery real camera streams
    carry; lets the decoder's restart path be exercised deliberately)."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    padded, samps, h, w = _prep_planes(arr, subsampling)
    nc = len(padded)
    qluma = _scaled_quant(_QUANT_LUMA, quality)
    qchroma = _scaled_quant(_QUANT_CHROMA, quality)

    out = _jpeg_headers(
        b"\xff\xc0", h, w, nc, samps, qluma, qchroma, restart_interval
    )

    def seg(marker: bytes, body: bytes) -> bytes:
        return marker + struct.pack(">H", len(body) + 2) + body

    sos = bytes([nc]) + b"".join(
        struct.pack(">BB", i + 1, 0x00) for i in range(nc)
    ) + b"\x00\x3f\x00"
    out += seg(b"\xff\xda", sos)

    dc_enc = _encode_table(_DC_BITS, _DC_VALS)
    ac_enc = _encode_table(_AC_BITS, _AC_VALS)
    writer = _BitWriter()
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    preds = [0] * nc
    m = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and m and m % restart_interval == 0:
                writer.byte_align()
                writer.out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
                preds = [0] * nc
            for ci in range(nc):
                hi, vi = samps[ci]
                blocks = [
                    ((my * vi + by) * 8, (mx * hi + bx) * 8)
                    for by in range(vi)
                    for bx in range(hi)
                ]
                preds[ci] = _encode_plane(
                    padded[ci],
                    qluma if ci == 0 else qchroma,
                    writer,
                    dc_enc,
                    ac_enc,
                    preds[ci],
                    blocks,
                )
            m += 1
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (fixture twin)
# ---------------------------------------------------------------------------


def _quant_block_coefs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(ph, pw) float plane → (nby, nbx, 64) int64 quantized zigzag
    coefficients.  Deliberately the BYTE-IDENTICAL per-block expression
    ``A @ block @ A.T`` the baseline ``_encode_plane`` uses — a batched
    einsum sums in a different order, and a 1-ulp difference at a .5
    rounding boundary would break the progressive==baseline decode
    guarantee the tests pin."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    A = _DCT_A
    qz = q[ZIGZAG].astype(np.float64)
    out = np.empty((nby, nbx, 64), dtype=np.int64)
    for by in range(nby):
        for bx in range(nbx):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coeffs = A @ block @ A.T
            out[by, bx] = np.round(coeffs.reshape(64)[ZIGZAG] / qz).astype(np.int64)
    return out


def _trunc_shift(v: int, al: int) -> int:
    """JPEG point transform for AC: divide by 2^Al truncating toward 0."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _emit_rst(writer: _BitWriter, n: int) -> None:
    writer.byte_align()
    writer.out += bytes([0xFF, 0xD0 + (n % 8)])


def _mcu_blocks(samps, mcux, m):
    """Block coordinates per component for interleaved MCU ``m``."""
    my, mx = divmod(m, mcux)
    return [
        [(my * vi + by, mx * hi + bx) for by in range(vi) for bx in range(hi)]
        for hi, vi in samps
    ]


def _prog_dc_first_scan(zzs, dc_enc, al, restart_interval, samps, mcux, mcuy) -> bytes:
    writer = _BitWriter()
    preds = [0] * len(zzs)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            _emit_rst(writer, m // restart_interval - 1)
            preds = [0] * len(zzs)
        for ci, blocks in enumerate(_mcu_blocks(samps, mcux, m)):
            for by, bx in blocks:
                v = int(zzs[ci][by, bx, 0]) >> al  # arithmetic shift, G.1.2.1
                diff = v - preds[ci]
                preds[ci] = v
                size = _category(diff)
                length, code = dc_enc[size]
                writer.write(code, length)
                if size:
                    writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    return writer.flush()


def _prog_dc_refine_scan(zzs, al, restart_interval, samps, mcux, mcuy) -> bytes:
    writer = _BitWriter()
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            _emit_rst(writer, m // restart_interval - 1)
        for ci, blocks in enumerate(_mcu_blocks(samps, mcux, m)):
            for by, bx in blocks:
                writer.write((int(zzs[ci][by, bx, 0]) >> al) & 1, 1)
    return writer.flush()


def _prog_ac_first_scan(zz, ac_enc, ss, se, al, restart_interval, nby, nbx) -> bytes:
    """Non-interleaved scan: iterates the COMPONENT block grid (which
    may be smaller than the MCU-padded coefficient grid, T.81 A.2.2)."""
    writer = _BitWriter()
    # vectorized band prep: the per-element _trunc_shift/int() listcomp
    # was >half the progressive encode cost (flat fixture blocks have
    # no AC at all).  _trunc_shift(v) == v>>al for v>=0, -((-v)>>al)
    # for v<0 — same truncation toward zero, element-exact.
    band = zz[:, :, ss : se + 1]
    tr = np.where(band >= 0, band >> al, -((-band) >> al))
    m = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and m and m % restart_interval == 0:
                _emit_rst(writer, m // restart_interval - 1)
            blk = tr[by, bx]
            nzidx = np.flatnonzero(blk)
            if nzidx.size == 0:
                # all-zero band: the scan loop is empty and the
                # last_nz < se-ss test below always holds — EOB0 only
                length, code = ac_enc[0x00]
                writer.write(code, length)
                m += 1
                continue
            last_nz = int(nzidx[-1])
            vals = blk[: last_nz + 1].tolist()
            run = 0
            for i in range(last_nz + 1):
                v = vals[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = ac_enc[0xF0]
                    writer.write(code, length)
                    run -= 16
                s = _category(v)
                length, code = ac_enc[(run << 4) | s]
                writer.write(code, length)
                writer.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < se - ss:  # trailing zeros -> EOB0
                length, code = ac_enc[0x00]
                writer.write(code, length)
            m += 1
    return writer.flush()


def _prog_ac_refine_scan(zz, ac_enc, ss, se, al, restart_interval, nby, nbx) -> bytes:
    """G.1.2.3 encode side: newly-significant coefficients (magnitude 1
    at this precision) as (run,1) symbols over zero-history positions,
    correction bits for already-nonzero coefficients buffered and
    appended after the next symbol, EOB0 flushing the remainder.
    Non-interleaved: iterates the COMPONENT block grid."""
    writer = _BitWriter()
    # vectorized band prep (same reasoning as _prog_ac_first_scan)
    band = zz[:, :, ss : se + 1]
    mags_grid = np.abs(band) >> al
    m = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and m and m % restart_interval == 0:
                _emit_rst(writer, m // restart_interval - 1)
            mags = mags_grid[by, bx]
            if not mags.any():
                # no history (mags>1) and no newly-significant (mags==1)
                # coefficients: the loop is empty, rest is empty, and the
                # eob+1 <= len-1 test holds — EOB0 with no correction bits
                length, code = ac_enc[0x00]
                writer.write(code, length)
                m += 1
                continue
            vals = band[by, bx].tolist()
            mags = mags.tolist()
            eob = -1  # last newly-significant index
            for i, t in enumerate(mags):
                if t == 1:
                    eob = i
            run = 0
            buffered: list[int] = []
            for i in range(eob + 1):
                t = mags[i]
                if t == 0:
                    run += 1
                    continue
                # ZRL must flush at ANY nonzero coefficient (history or
                # new): the decoder consumes buffered correction bits
                # span-by-span while walking each ZRL's 16 zero-history
                # positions, so bits may never pile up across spans.
                while run > 15:
                    length, code = ac_enc[0xF0]
                    writer.write(code, length)
                    for bit in buffered:
                        writer.write(bit, 1)
                    buffered = []
                    run -= 16
                if t > 1:  # history coefficient: buffer its correction bit
                    buffered.append(t & 1)
                    continue
                length, code = ac_enc[(run << 4) | 1]
                writer.write(code, length)
                writer.write(1 if vals[i] > 0 else 0, 1)
                for bit in buffered:
                    writer.write(bit, 1)
                buffered = []
                run = 0
            # remainder: correction bits live under an EOB
            rest = [mags[i] & 1 for i in range(eob + 1, len(mags)) if mags[i] > 1]
            if eob + 1 <= len(mags) - 1 or buffered:
                length, code = ac_enc[0x00]
                writer.write(code, length)
                for bit in buffered + rest:
                    writer.write(bit, 1)
            m += 1
    return writer.flush()


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 100,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → PROGRESSIVE JFIF JPEG (SOF2;
    4:4:4 or — ``subsampling='420'`` — 2×2-subsampled chroma, what real
    crawled progressive JPEGs overwhelmingly are) with a four-phase scan
    script — interleaved DC first (Al=1), per-component AC first
    (Ss=1..63, Al=1), DC refine (Ah=1→Al=0), per-component AC refine —
    exercising all four scan decoders; with 4:2:0 the AC scans run on
    each component's own (smaller-than-MCU-padded) block grid, T.81
    A.2.2.  Full refinement to Al=0 transmits exactly the
    baseline-quantized coefficients, so decode(progressive(img)) ==
    decode(baseline(img, same subsampling)) bit-for-bit at any
    quality."""
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    padded, samps, h, w = _prep_planes(arr, subsampling)
    nc = len(padded)
    qluma = _scaled_quant(_QUANT_LUMA, quality)
    qchroma = _scaled_quant(_QUANT_CHROMA, quality)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    zzs = [
        _quant_block_coefs(pp, qluma if ci == 0 else qchroma)
        for ci, pp in enumerate(padded)
    ]
    # non-interleaved (AC-scan) block grids: component dims, not MCU pad
    nonint = []
    for hi, vi in samps:
        cw = -(-w * hi // hmax)
        chh = -(-h * vi // vmax)
        nonint.append((-(-chh // 8), -(-cw // 8)))

    out = _jpeg_headers(
        b"\xff\xc2", h, w, nc, samps, qluma, qchroma, restart_interval
    )

    def seg(marker: bytes, body: bytes) -> bytes:
        return marker + struct.pack(">H", len(body) + 2) + body

    dc_enc = _encode_table(_DC_BITS, _DC_VALS)
    ac_enc = _encode_table(_AC_BITS, _AC_VALS)

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += struct.pack(">BB", cid, 0x00)
        body += bytes([ss, se, (ah << 4) | al])
        return seg(b"\xff\xda", body)

    all_ids = [i + 1 for i in range(nc)]
    # 1) DC first, interleaved, Al=1
    out += sos(all_ids, 0, 0, 0, 1)
    out += _prog_dc_first_scan(zzs, dc_enc, 1, restart_interval, samps, mcux, mcuy)
    # 2) AC first per component, band 1..63, Al=1
    for ci in range(nc):
        nby, nbx = nonint[ci]
        out += sos([ci + 1], 1, 63, 0, 1)
        out += _prog_ac_first_scan(zzs[ci], ac_enc, 1, 63, 1, restart_interval, nby, nbx)
    # 3) DC refine to Al=0
    out += sos(all_ids, 0, 0, 1, 0)
    out += _prog_dc_refine_scan(zzs, 0, restart_interval, samps, mcux, mcuy)
    # 4) AC refine per component to Al=0
    for ci in range(nc):
        nby, nbx = nonint[ci]
        out += sos([ci + 1], 1, 63, 1, 0)
        out += _prog_ac_refine_scan(zzs[ci], ac_enc, 1, 63, 0, restart_interval, nby, nbx)
    out += b"\xff\xd9"
    return bytes(out)
