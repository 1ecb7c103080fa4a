"""Structural media probes: Ogg (Opus/Vorbis), ID3v2/MPEG audio, EBML/WebM.

The ffprobe-class operation a crawl pipeline runs on every media blob
BEFORE deciding whether to decode it: container walk + codec
identification + duration/geometry + embedded tags, without touching
the entropy-coded payload.  At 100 TB this is the triage pass — probes
are O(header) per blob, run map-side over binary columns, and their
tiny metadata rows are all that leaves the scan stage; full decode (the
expensive path) is then dispatched only to the formats/tiers that need
it.  Complements the decode tier (wav/flac/mp4/avi already have full
vendored decoders) by covering the three big container families that
remain: Ogg streams, MP3/ID3 files, and Matroska/WebM.

Spec-level notes (all public formats):

* Ogg (RFC 3533): CRC-verified page walk (the Ogg CRC-32 is the
  UNREFLECTED 0x04C11DB7 variant with zero init/xorout), packet
  reassembly across pages per logical stream, BOS identification
  headers for Opus (RFC 7845 ``OpusHead``/``OpusTags``) and Vorbis
  (Vorbis I identification + comment headers), and duration from the
  final granule position — exact integer math (Opus granules run at
  48 kHz minus pre-skip; Vorbis granules at the stream rate).
* ID3v2.3/2.4 (informal spec) + MPEG-1/2 audio frame headers: syncsafe
  sizes, text-frame encodings (latin-1 / UTF-16 BOM / UTF-16BE /
  UTF-8), and the first audio frame's bitrate/sample-rate/mode with a
  CBR duration estimate.
* EBML/Matroska/WebM (RFC 8794 + Matroska spec): vint parsing, DocType,
  Segment→Info (TimecodeScale/Duration/apps) and Segment→Tracks
  (numbers, types, CodecIDs, video geometry, audio rate/channels).

Every probe is ``untrusted_decoder``-wrapped (malformed → ValueError →
quarantine) and byte-flip fuzzed; each has an encoder twin that builds
spec-valid fixtures inside registry queries, so the probes are held to
hash-exact oracles like the rest of the codec tier.

Reference parity: the reference repo ships no media handling; this is
the mandated multimodal extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

import struct

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = [
    "ogg_probe",
    "ogg_packets",
    "opus_packet_samples",
    "encode_ogg_opus",
    "encode_ogg_vorbis",
    "id3_probe",
    "encode_mp3_id3",
    "webm_probe",
    "encode_webm",
]

# ---------------------------------------------------------------------------
# Ogg container (RFC 3533)
# ---------------------------------------------------------------------------

_OGG_CRC_TABLE: list[int] = []


def _ogg_crc(data: bytes) -> int:
    """Ogg's CRC-32: polynomial 0x04C11DB7, NOT reflected, init 0,
    xorout 0 — deliberately different from zlib's CRC."""
    if not _OGG_CRC_TABLE:
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if (r & 0x80000000) else (r << 1)
            _OGG_CRC_TABLE.append(r & 0xFFFFFFFF)
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _ogg_pages(b: bytes):
    """Yield ``(header_type, granule, serial, seq, packets_data,
    lacing)`` per page, CRC-verified."""
    pos = 0
    while pos < len(b):
        if b[pos : pos + 4] != b"OggS":
            raise ValueError(f"ogg: bad capture pattern at byte {pos}")
        if pos + 27 > len(b):
            raise ValueError("ogg: truncated page header")
        version = b[pos + 4]
        if version != 0:
            raise ValueError(f"ogg: unsupported stream structure version {version}")
        header_type = b[pos + 5]
        granule = struct.unpack_from("<q", b, pos + 6)[0]
        serial, seq, crc = struct.unpack_from("<3I", b, pos + 14)
        n_segs = b[pos + 26]
        lace_end = pos + 27 + n_segs
        if lace_end > len(b):
            raise ValueError("ogg: truncated segment table")
        lacing = list(b[pos + 27 : lace_end])
        body_len = sum(lacing)
        page_end = lace_end + body_len
        if page_end > len(b):
            raise ValueError("ogg: truncated page body")
        page = bytearray(b[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError(f"ogg: page CRC mismatch at byte {pos}")
        yield header_type, granule, serial, seq, b[lace_end:page_end], lacing
        pos = page_end


def _parse_tags(payload: bytes, what: str):
    """The shared Vorbis-comment structure (used verbatim by OpusTags):
    vendor string + N ``KEY=value`` comments."""
    if len(payload) < 8:
        raise ValueError(f"{what}: truncated comment header")
    vlen = struct.unpack_from("<I", payload, 0)[0]
    pos = 4 + vlen
    if pos + 4 > len(payload):
        raise ValueError(f"{what}: truncated vendor string")
    vendor = payload[4:pos].decode("utf-8")
    count = struct.unpack_from("<I", payload, pos)[0]
    pos += 4
    if count > 4096:
        raise ValueError(f"{what}: implausible comment count {count}")
    tags: dict[str, str] = {}
    for _ in range(count):
        if pos + 4 > len(payload):
            raise ValueError(f"{what}: truncated comment length")
        clen = struct.unpack_from("<I", payload, pos)[0]
        pos += 4
        if pos + clen > len(payload):
            raise ValueError(f"{what}: truncated comment body")
        item = payload[pos : pos + clen].decode("utf-8")
        pos += clen
        if "=" not in item:
            raise ValueError(f"{what}: comment without '='")
        k, _, v = item.partition("=")
        tags[k.upper()] = v
    return vendor, tags


@untrusted_decoder
def ogg_packets(b: bytes) -> dict[int, list[bytes]]:
    """Ogg stream → ``{serial: [complete packets in order]}`` via the
    same CRC-verified page walk as ``ogg_probe`` — the packet feed the
    native Opus/Vorbis decode dispatch (r14) consumes.  A packet left
    open at end of stream raises (truncation, not a clean stream)."""
    packets: dict[int, list[bytes]] = {}
    buffers: dict[int, bytearray] = {}
    saw_page = False
    for header_type, granule, serial, seq, body, lacing in _ogg_pages(b):
        saw_page = True
        buf = buffers.setdefault(serial, bytearray())
        packets.setdefault(serial, [])
        pos = 0
        for lace in lacing:
            buf += body[pos:pos + lace]
            pos += lace
            if lace < 255:  # packet boundary
                packets[serial].append(bytes(buf))
                buf.clear()
    if not saw_page:
        raise ValueError("ogg: no pages")
    for serial, buf in buffers.items():
        if buf:
            raise ValueError(
                f"ogg: stream {serial} ends mid-packet (truncated)"
            )
    return packets


# RFC 6716 §3.1: TOC config → frame duration in microseconds.  SILK
# configs 0-11 are 10/20/40/60 ms across NB/MB/WB, hybrid 12-15 are
# 10/20 ms, CELT 16-31 are 2.5/5/10/20 ms across the four bandwidths.
_OPUS_FRAME_US = tuple(
    [10_000, 20_000, 40_000, 60_000] * 3
    + [10_000, 20_000] * 2
    + [2_500, 5_000, 10_000, 20_000] * 4
)


@untrusted_decoder
def opus_packet_samples(packet: bytes, rate: int = 48000) -> int:
    """Per-packet PCM sample count (per channel) from the TOC byte
    alone — RFC 6716 §3 structural math, no decoder needed; the native
    dispatch cross-checks libopus against this."""
    if not packet:
        raise ValueError("opus: empty packet")
    toc = packet[0]
    frame_us = _OPUS_FRAME_US[toc >> 3]
    code = toc & 3
    if code == 0:
        n_frames = 1
    elif code in (1, 2):
        n_frames = 2
    else:
        if len(packet) < 2:
            raise ValueError("opus: code-3 packet without frame count")
        n_frames = packet[1] & 0x3F
        if n_frames == 0:
            raise ValueError("opus: code-3 packet with zero frames")
    total_us = frame_us * n_frames
    if total_us > 120_000:
        raise ValueError("opus: packet exceeds the 120 ms limit")
    return total_us * rate // 1_000_000


@untrusted_decoder
def ogg_probe(b: bytes) -> list[dict]:
    """Probe an Ogg stream → one dict per logical stream:
    ``{serial, codec, channels, sample_rate, pre_skip, last_granule,
    duration_ms, vendor, tags}``.  Codecs beyond Opus/Vorbis raise
    (probe gap surfaced as quarantine, never a wrong row)."""
    b = bytes(b)
    streams: dict[int, dict] = {}
    buffers: dict[int, bytearray] = {}
    packets: dict[int, list[bytes]] = {}
    saw_page = False
    for header_type, granule, serial, seq, body, lacing in _ogg_pages(b):
        saw_page = True
        if serial not in streams:
            if not header_type & 0x02:
                raise ValueError("ogg: first page of stream lacks BOS flag")
            streams[serial] = {"serial": serial, "last_granule": 0}
            buffers[serial] = bytearray()
            packets[serial] = []
        if granule >= 0:
            st = streams[serial]
            st["last_granule"] = max(st["last_granule"], granule)
        buf = buffers[serial]
        pos = 0
        for lace in lacing:
            buf += body[pos : pos + lace]
            pos += lace
            if lace < 255:  # packet boundary
                packets[serial].append(bytes(buf))
                buf.clear()
    if not saw_page:
        raise ValueError("ogg: no pages")
    out = []
    for serial, st in streams.items():
        pk = packets[serial]
        if not pk:
            raise ValueError("ogg: stream with no complete packets")
        ident = pk[0]
        if ident.startswith(b"OpusHead"):
            if len(ident) < 19:
                raise ValueError("ogg: truncated OpusHead")
            ver = ident[8]
            if ver >> 4 != 0:  # RFC 7845: major version must be 0
                raise ValueError(f"ogg: unsupported Opus version {ver}")
            st["codec"] = "opus"
            st["channels"] = ident[9]
            st["pre_skip"] = struct.unpack_from("<H", ident, 10)[0]
            st["sample_rate"] = struct.unpack_from("<I", ident, 12)[0]
            if len(pk) < 2 or not pk[1].startswith(b"OpusTags"):
                raise ValueError("ogg: missing OpusTags")
            st["vendor"], st["tags"] = _parse_tags(pk[1][8:], "OpusTags")
            # Opus granules always run at 48 kHz, minus the pre-skip
            samples = max(st["last_granule"] - st["pre_skip"], 0)
            st["duration_ms"] = samples * 1000 // 48000
        elif ident.startswith(b"\x01vorbis"):
            if len(ident) < 30:
                raise ValueError("ogg: truncated Vorbis identification")
            if struct.unpack_from("<I", ident, 7)[0] != 0:
                raise ValueError("ogg: unsupported Vorbis version")
            st["codec"] = "vorbis"
            st["channels"] = ident[11]
            st["sample_rate"] = struct.unpack_from("<I", ident, 12)[0]
            if st["sample_rate"] == 0:
                raise ValueError("ogg: zero Vorbis sample rate")
            st["pre_skip"] = 0
            if len(pk) < 2 or not pk[1].startswith(b"\x03vorbis"):
                raise ValueError("ogg: missing Vorbis comment header")
            st["vendor"], st["tags"] = _parse_tags(pk[1][7:], "vorbis comment")
            st["duration_ms"] = st["last_granule"] * 1000 // st["sample_rate"]
        else:
            raise ValueError(
                f"ogg: unsupported codec (ident starts {ident[:8]!r})")
        out.append(st)
    return out


def _ogg_page(serial: int, seq: int, granule: int, header_type: int,
              packets: list[bytes]) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        n = len(p)
        while True:
            take = min(n, 255)
            lacing.append(take)
            n -= take
            if take < 255:
                break
            if n == 0:  # exact multiple of 255 needs a 0 terminator
                lacing.append(0)
                break
        body += p
    head = bytearray(b"OggS\x00")
    head.append(header_type)
    head += struct.pack("<q", granule)
    head += struct.pack("<3I", serial, seq, 0)
    head.append(len(lacing))
    head += lacing
    page = bytes(head) + bytes(body)
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def _tags_blob(vendor: str, tags: dict[str, str]) -> bytes:
    out = bytearray(struct.pack("<I", len(vendor.encode()))) + vendor.encode()
    out += struct.pack("<I", len(tags))
    for k, v in tags.items():
        item = f"{k}={v}".encode("utf-8")
        out += struct.pack("<I", len(item)) + item
    return bytes(out)


def encode_ogg_opus(duration_ms: int, channels: int = 2,
                    input_rate: int = 48000, pre_skip: int = 312,
                    tags: dict[str, str] | None = None,
                    serial: int = 0x1234) -> bytes:
    """Fixture twin: a spec-valid Ogg Opus stream with real page CRCs
    whose probe yields exactly the requested metadata.  Audio packets
    are opaque placeholder bytes — the probe never reads them."""
    head = (b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIHB", pre_skip, input_rate, 0, 0))
    tagpk = b"OpusTags" + _tags_blob("graft-twin", tags or {})
    total = duration_ms * 48000 // 1000 + pre_skip
    pages = [
        _ogg_page(serial, 0, 0, 0x02, [head]),
        _ogg_page(serial, 1, 0, 0x00, [tagpk]),
        _ogg_page(serial, 2, total // 2, 0x00, [b"\xfcOPQ" * 20]),
        _ogg_page(serial, 3, total, 0x04, [b"\xfcRST" * 20]),
    ]
    return b"".join(pages)


def encode_ogg_vorbis(duration_ms: int, channels: int = 2,
                      sample_rate: int = 44100,
                      tags: dict[str, str] | None = None,
                      serial: int = 0x5678) -> bytes:
    """Fixture twin: Ogg Vorbis — identification + comment + (dummy)
    setup header packets, then placeholder audio pages."""
    ident = (b"\x01vorbis" + struct.pack("<IB I iii", 0, channels,
                                         sample_rate, 0, 128000, 0)
             + bytes([0xB8, 0x01]))
    comment = b"\x03vorbis" + _tags_blob("graft-twin", tags or {}) + b"\x01"
    setup = b"\x05vorbis" + b"\x00" * 16 + b"\x01"  # placeholder; unparsed
    total = duration_ms * sample_rate // 1000
    pages = [
        _ogg_page(serial, 0, 0, 0x02, [ident]),
        _ogg_page(serial, 1, 0, 0x00, [comment, setup]),
        _ogg_page(serial, 2, total // 2, 0x00, [b"\xa7VWX" * 20]),
        _ogg_page(serial, 3, total, 0x04, [b"\xa7YZa" * 20]),
    ]
    return b"".join(pages)


# ---------------------------------------------------------------------------
# ID3v2 + MPEG audio frame header
# ---------------------------------------------------------------------------

# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free, 15 = bad
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)  # MPEG-1 sample-rate index 0..2


def _syncsafe(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def _read_syncsafe(b: bytes, pos: int) -> int:
    if any(x & 0x80 for x in b[pos : pos + 4]):
        raise ValueError("id3: non-syncsafe size byte")
    return (b[pos] << 21) | (b[pos + 1] << 14) | (b[pos + 2] << 7) | b[pos + 3]


def _decode_text_frame(body: bytes) -> str:
    if not body:
        raise ValueError("id3: empty text frame")
    enc, payload = body[0], body[1:]
    if enc == 0:
        s = payload.decode("latin-1")
    elif enc == 1:
        s = payload.decode("utf-16")  # BOM-led
    elif enc == 2:
        s = payload.decode("utf-16-be")
    elif enc == 3:
        s = payload.decode("utf-8")
    else:
        raise ValueError(f"id3: unknown text encoding {enc}")
    return s.rstrip("\x00")


@untrusted_decoder
def id3_probe(b: bytes) -> dict:
    """Probe an MP3 file: ID3v2.3/2.4 text frames + the first MPEG
    audio frame header.  Returns ``{id3_version, tags, bitrate_kbps,
    sample_rate, channels, n_frames, duration_ms}``; the duration is
    the exact frame count × samples-per-frame (1152 for Layer III)."""
    b = bytes(b)
    tags: dict[str, str] = {}
    version = None
    pos = 0
    if b[:3] == b"ID3":
        if len(b) < 10:
            raise ValueError("id3: truncated header")
        major, rev, flags = b[3], b[4], b[5]
        if major not in (3, 4):
            raise ValueError(f"id3: unsupported ID3v2.{major}")
        if flags & 0x40:
            raise ValueError("id3: extended header not supported")
        version = f"2.{major}.{rev}"
        size = _read_syncsafe(b, 6)
        end = 10 + size
        if end > len(b):
            raise ValueError("id3: declared tag size past EOF")
        fp = 10
        while fp + 10 <= end:
            fid = b[fp : fp + 4]
            if fid == b"\x00\x00\x00\x00":
                break  # padding
            if major == 4:
                fsize = _read_syncsafe(b, fp + 4)
            else:
                fsize = struct.unpack_from(">I", b, fp + 4)[0]
            if fp + 10 + fsize > end:
                raise ValueError("id3: frame overruns tag")
            body = b[fp + 10 : fp + 10 + fsize]
            fid_s = fid.decode("latin-1")
            if fid_s.startswith("T") and fid_s != "TXXX":
                tags[fid_s] = _decode_text_frame(body)
            fp += 10 + fsize
        pos = end
    # first MPEG audio frame header + frame walk for an exact count
    n_frames = 0
    bitrate = rate = channels = None
    while pos + 4 <= len(b):
        h = struct.unpack_from(">I", b, pos)[0]
        if (h >> 21) != 0x7FF:
            raise ValueError(f"id3: lost sync at byte {pos}")
        ver_id = (h >> 19) & 3
        layer = (h >> 17) & 3
        if ver_id != 3 or layer != 1:
            raise ValueError("id3: only MPEG-1 Layer III frames supported")
        bi = (h >> 12) & 0xF
        ri = (h >> 10) & 3
        if bi in (0, 15) or ri == 3:
            raise ValueError("id3: invalid bitrate/sample-rate index")
        padding = (h >> 9) & 1
        mode = (h >> 6) & 3
        fb = _MP3_BITRATES[bi]
        fr = _MP3_RATES[ri]
        if bitrate is None:
            bitrate, rate, channels = fb, fr, (1 if mode == 3 else 2)
        frame_len = 144 * fb * 1000 // fr + padding
        if pos + frame_len > len(b):
            raise ValueError("id3: truncated final MPEG frame")
        n_frames += 1
        pos += frame_len
    if bitrate is None:
        raise ValueError("id3: no MPEG audio frames")
    return {
        "id3_version": version,
        "tags": tags,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1152 * 1000 // rate,
    }


# Cyclic payload source for the CBR frame bodies: byte j of a slice
# starting at offset s is (s + j) & 0xFF.  Sized past the largest
# MPEG-1 Layer III frame (144*320k/32kHz = 1440 B) plus a full cycle.
_MP3_FILL = bytes(range(256)) * 8


def encode_mp3_id3(n_frames: int, tags: dict[str, str] | None = None,
                   bitrate_kbps: int = 128, sample_rate: int = 44100,
                   mono: bool = False, id3_major: int = 3) -> bytes:
    """Fixture twin: an ID3v2.3/2.4 tag (text frames, rotating through
    the latin-1/UTF-16/UTF-8 encodings) followed by ``n_frames`` valid
    MPEG-1 Layer III CBR frames with placeholder payloads."""
    frames = bytearray()
    for i, (k, v) in enumerate((tags or {}).items()):
        enc = (0, 1, 3)[i % 3]
        if enc == 0 and all(ord(c) < 256 for c in v):
            body = bytes([0]) + v.encode("latin-1")
        elif enc == 1:
            body = bytes([1]) + v.encode("utf-16")
        else:
            body = bytes([3]) + v.encode("utf-8")
        size = _syncsafe(len(body)) if id3_major == 4 else struct.pack(
            ">I", len(body))
        frames += k.encode("latin-1") + size + b"\x00\x00" + body
    tag = (b"ID3" + bytes([id3_major, 0, 0]) + _syncsafe(len(frames))
           + bytes(frames))
    bi = _MP3_BITRATES.index(bitrate_kbps)
    ri = _MP3_RATES.index(sample_rate)
    mode = 3 if mono else 1
    out = bytearray(tag)
    padding = 0
    # protection bit SET = no CRC16 follows (the common real shape)
    h = struct.pack(">I", (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
                    | (bi << 12) | (ri << 10) | (padding << 9) | (mode << 6))
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate + padding
    body_len = frame_len - 4
    for i in range(n_frames):
        out += h
        if body_len <= 0:
            continue
        # payload byte j of frame i is (i + j) & 0xFF — a slice of the
        # precomputed 256-cycle starting at i & 0xFF
        start = i & 0xFF
        if start + body_len <= len(_MP3_FILL):
            out += _MP3_FILL[start:start + body_len]
        else:
            out += bytes((i + j) & 0xFF for j in range(body_len))
    return bytes(out)


# ---------------------------------------------------------------------------
# EBML / Matroska / WebM
# ---------------------------------------------------------------------------

_EBML_MAGIC = 0x1A45DFA3


def _read_vint(b: bytes, pos: int, keep_marker: bool):
    """EBML variable-length integer.  Element IDs keep their length
    marker (they are compared as stored); sizes strip it."""
    if pos >= len(b):
        raise ValueError("ebml: vint past EOF")
    first = b[pos]
    if first == 0:
        raise ValueError("ebml: invalid vint (zero lead byte)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(b):
        raise ValueError("ebml: truncated vint")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | b[pos + i]
    return val, pos + length


def _walk_ebml(b: bytes, start: int, end: int):
    pos = start
    while pos < end:
        eid, pos = _read_vint(b, pos, keep_marker=True)
        size, pos = _read_vint(b, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError(f"ebml: element 0x{eid:X} overruns parent")
        yield eid, b[pos : pos + size], pos
        pos += size


def _ebml_uint(payload: bytes) -> int:
    if len(payload) > 8:
        raise ValueError("ebml: oversized uint")
    return int.from_bytes(payload, "big")


def _ebml_float(payload: bytes) -> float:
    if len(payload) == 4:
        return struct.unpack(">f", payload)[0]
    if len(payload) == 8:
        return struct.unpack(">d", payload)[0]
    raise ValueError(f"ebml: float of width {len(payload)}")


@untrusted_decoder
def webm_probe(b: bytes) -> dict:
    """Probe a Matroska/WebM file: ``{doctype, timecode_scale,
    duration_ms, muxing_app, writing_app, tracks}`` where each track is
    ``{number, type, codec, width, height, sample_rate, channels}``.
    Only the structural layer is read — clusters are skipped."""
    b = bytes(b)
    top = _walk_ebml(b, 0, len(b))
    eid, head, _ = next(top, (None, None, None))
    if eid != _EBML_MAGIC:
        raise ValueError("ebml: missing EBML header")
    doctype = None
    for hid, hpay, _ in _walk_ebml(head, 0, len(head)):
        if hid == 0x4282:
            doctype = hpay.decode("utf-8")
    out: dict = {"doctype": doctype, "timecode_scale": 1_000_000,
                 "duration_ms": None, "muxing_app": None,
                 "writing_app": None, "tracks": []}
    duration_raw = None
    for eid, pay, _ in top:
        if eid != 0x18538067:  # Segment
            continue
        for sid, spay, _ in _walk_ebml(pay, 0, len(pay)):
            if sid == 0x1549A966:  # Info
                for iid, ipay, _ in _walk_ebml(spay, 0, len(spay)):
                    if iid == 0x2AD7B1:
                        out["timecode_scale"] = _ebml_uint(ipay)
                    elif iid == 0x4489:
                        duration_raw = _ebml_float(ipay)
                    elif iid == 0x4D80:
                        out["muxing_app"] = ipay.decode("utf-8")
                    elif iid == 0x5741:
                        out["writing_app"] = ipay.decode("utf-8")
            elif sid == 0x1654AE6B:  # Tracks
                for tid, tpay, _ in _walk_ebml(spay, 0, len(spay)):
                    if tid != 0xAE:  # TrackEntry
                        continue
                    tr = {"number": None, "type": None, "codec": None,
                          "width": None, "height": None,
                          "sample_rate": None, "channels": None}
                    for fid, fpay, _ in _walk_ebml(tpay, 0, len(tpay)):
                        if fid == 0xD7:
                            tr["number"] = _ebml_uint(fpay)
                        elif fid == 0x83:
                            tr["type"] = _ebml_uint(fpay)
                        elif fid == 0x86:
                            tr["codec"] = fpay.decode("utf-8")
                        elif fid == 0xE0:  # Video
                            for vid, vpay, _ in _walk_ebml(fpay, 0, len(fpay)):
                                if vid == 0xB0:
                                    tr["width"] = _ebml_uint(vpay)
                                elif vid == 0xBA:
                                    tr["height"] = _ebml_uint(vpay)
                        elif fid == 0xE1:  # Audio
                            for aid, apay, _ in _walk_ebml(fpay, 0, len(fpay)):
                                if aid == 0xB5:
                                    tr["sample_rate"] = int(_ebml_float(apay))
                                elif aid == 0x9F:
                                    tr["channels"] = _ebml_uint(apay)
                    out["tracks"].append(tr)
    if duration_raw is not None:
        # Duration is in timecode-scale units (a float, but our twin and
        # real muxers write integral values at ms scale)
        out["duration_ms"] = int(duration_raw * out["timecode_scale"]) // 1_000_000
    return out


@untrusted_decoder
def split_webm_frames(b: bytes) -> list[bytes]:
    """Demux a WebM/Matroska blob into its VIDEO track's frame payloads
    (r11): the EBML walk descends Segment → Tracks to find the first
    video TrackEntry, then Segment → Cluster → SimpleBlock / BlockGroup
    → Block, filtering on the track number and refusing laced blocks
    (lacing carries multiple frames per block — rare for video — and
    mis-splitting would hand the decoder garbage).

    Codec posture mirrors MP4: ``V_AV1`` payloads are temporal units
    for the system libdav1d (the AV1-in-Matroska mapping stores OBUs in
    the low-overhead format, usually WITHOUT a temporal-delimiter OBU —
    one is prepended when absent, which the spec permits, so the magic
    dispatch recognizes the stream); ``V_MPEGH/ISO/HEVC`` blocks are
    MP4-style length-prefixed NALs with the hvcC record in CodecPrivate
    — they re-frame to Annex-B exactly like the MP4 demuxer and route
    to libde265; VP8/VP9/H.264 tracks demux fine but their payloads
    raise at decode time (no decoder ships), exactly like the MP4
    sample-entry rule."""
    b = bytes(b)
    top = _walk_ebml(b, 0, len(b))
    eid, _, _ = next(top, (None, None, None))
    if eid != _EBML_MAGIC:
        raise ValueError("ebml: missing EBML header")
    frames: list[bytes] = []
    video_track = None
    video_codec = None
    codec_private = None
    for eid, pay, _ in top:
        if eid != 0x18538067:  # Segment
            continue
        for sid, spay, _ in _walk_ebml(pay, 0, len(pay)):
            if sid == 0x1654AE6B:  # Tracks
                for tid, tpay, _ in _walk_ebml(spay, 0, len(spay)):
                    if tid != 0xAE:
                        continue
                    num = ttype = codec = None
                    private = None
                    for fid, fpay, _ in _walk_ebml(tpay, 0, len(tpay)):
                        if fid == 0xD7:
                            num = _ebml_uint(fpay)
                        elif fid == 0x83:
                            ttype = _ebml_uint(fpay)
                        elif fid == 0x86:
                            codec = fpay.decode("utf-8")
                        elif fid == 0x63A2:  # CodecPrivate
                            private = fpay
                    if ttype == 1 and video_track is None:
                        video_track, video_codec = num, codec
                        codec_private = private
            elif sid == 0x1F43B675:  # Cluster
                if video_track is None:
                    raise ValueError("webm: cluster before any video track")
                for cid, cpay, _ in _walk_ebml(spay, 0, len(spay)):
                    if cid == 0xA3:  # SimpleBlock
                        blocks = [cpay]
                    elif cid == 0xA0:  # BlockGroup
                        blocks = [gpay for gid, gpay, _ in
                                  _walk_ebml(cpay, 0, len(cpay)) if gid == 0xA1]
                    else:
                        continue
                    for blk in blocks:
                        tnum, p = _read_vint(blk, 0, keep_marker=False)
                        if tnum != video_track:
                            continue
                        if p + 3 > len(blk):
                            raise ValueError("webm: block header truncated")
                        flags = blk[p + 2]
                        if flags & 0x06:
                            raise ValueError(
                                "webm: laced blocks not vendored (lacing "
                                "packs multiple frames per block)"
                            )
                        payload = blk[p + 3 :]
                        if video_codec == "V_AV1" and not (
                            len(payload) >= 2
                            and payload[0] == 0x12 and payload[1] == 0x00
                        ):
                            payload = b"\x12\x00" + payload
                        elif video_codec == "V_MPEGH/ISO/HEVC":
                            from hive_udf_spark.operators.mp4codec import (
                                _hvcc_config,
                                hevc_sample_to_annexb,
                            )

                            if codec_private is None:
                                raise ValueError(
                                    "webm: HEVC track without CodecPrivate"
                                )
                            ls, psets = _hvcc_config(codec_private)
                            payload = hevc_sample_to_annexb(payload, ls, psets)
                        frames.append(payload)
    if video_track is None:
        raise ValueError("webm: no video track")
    if not frames:
        raise ValueError("webm: video track has no blocks")
    return frames


@untrusted_decoder
def extract_webm_subtitles(b: bytes) -> list[tuple[int, int, str]]:
    """Subtitle cues [(start_ms, duration_ms, text)] from a WebM/
    Matroska blob's first ``S_TEXT/UTF8`` track (r11) — embedded
    subtitles are one of the larger aligned-text corpora hiding inside
    video containers.  Subtitle blocks ride in BlockGroups (they need
    BlockDuration, which SimpleBlock cannot carry); start = cluster
    Timecode + block timecode, scaled by the segment's TimecodeScale.
    Styled codecs (S_TEXT/ASS, S_VOBSUB …) raise — extracting their
    payloads as plain text would corrupt the corpus."""
    b = bytes(b)
    top = _walk_ebml(b, 0, len(b))
    eid, _, _ = next(top, (None, None, None))
    if eid != _EBML_MAGIC:
        raise ValueError("ebml: missing EBML header")
    cues: list[tuple[int, int, str]] = []
    sub_track = None
    tc_scale = 1_000_000  # ns per timecode unit (the spec default: 1 ms)
    for eid, pay, _ in top:
        if eid != 0x18538067:  # Segment
            continue
        # pass 1 — resolve Info/Tracks BEFORE touching any Cluster: a
        # legal Matroska may interleave Clusters ahead of Tracks, and a
        # one-pass walk would silently drop their cues
        for sid, spay, _ in _walk_ebml(pay, 0, len(pay)):
            if sid == 0x1549A966:  # Info
                for iid, ipay, _ in _walk_ebml(spay, 0, len(spay)):
                    if iid == 0x2AD7B1:
                        tc_scale = _ebml_uint(ipay)
                        if not 1 <= tc_scale <= 1_000_000_000:
                            raise ValueError("webm: TimecodeScale out of range")
            elif sid == 0x1654AE6B:  # Tracks
                for tid, tpay, _ in _walk_ebml(spay, 0, len(spay)):
                    if tid != 0xAE:
                        continue
                    num = ttype = codec = None
                    for fid, fpay, _ in _walk_ebml(tpay, 0, len(tpay)):
                        if fid == 0xD7:
                            num = _ebml_uint(fpay)
                        elif fid == 0x83:
                            ttype = _ebml_uint(fpay)
                        elif fid == 0x86:
                            codec = fpay.decode("utf-8")
                    if ttype == 0x11 and sub_track is None:
                        if codec != "S_TEXT/UTF8":
                            raise ValueError(
                                f"webm: subtitle codec {codec!r} not vendored "
                                "(plain-text extraction would corrupt styled "
                                "formats)"
                            )
                        sub_track = num
        # pass 2 — cue extraction, now that the subtitle track is known
        for sid, spay, _ in _walk_ebml(pay, 0, len(pay)):
            if sid == 0x1F43B675:  # Cluster
                if sub_track is None:
                    continue  # subtitle-less video: fine, cues stay empty
                cluster_tc = 0
                for cid, cpay, _ in _walk_ebml(spay, 0, len(spay)):
                    if cid == 0xE7:
                        cluster_tc = _ebml_uint(cpay)
                    elif cid == 0xA0:  # BlockGroup
                        block = None
                        duration = 0
                        for gid, gpay, _ in _walk_ebml(cpay, 0, len(cpay)):
                            if gid == 0xA1:
                                block = gpay
                            elif gid == 0x9B:
                                duration = _ebml_uint(gpay)
                        if block is None:
                            continue
                        tnum, p = _read_vint(block, 0, keep_marker=False)
                        if tnum != sub_track:
                            continue
                        if p + 3 > len(block):
                            raise ValueError("webm: block header truncated")
                        rel = struct.unpack_from(">h", block, p)[0]
                        if block[p + 2] & 0x06:
                            raise ValueError("webm: laced subtitle block")
                        text = block[p + 3 :].decode("utf-8")
                        start_ms = (cluster_tc + rel) * tc_scale // 1_000_000
                        dur_ms = duration * tc_scale // 1_000_000
                        cues.append((start_ms, dur_ms, text))
    if sub_track is None:
        raise ValueError("webm: no S_TEXT subtitle track")
    return cues


def encode_webm_subtitles(
    cues: list[tuple[int, int, str]], width: int = 64, height: int = 48
) -> bytes:
    """Fixture twin (r11): a spec-valid Matroska with a video TrackEntry
    plus an ``S_TEXT/UTF8`` subtitle track whose cues ride in
    BlockGroups with BlockDuration — the layout real muxers emit."""
    if not cues:
        raise ValueError("at least one cue required")
    shell = encode_webm(
        duration_ms=max(s + d for s, d, _ in cues),
        width=width, height=height, v_codec="V_AV1",
        writing_app="graft-twin-subs",
    )
    sub_entry = _ebml_elem(0xAE, b"".join([
        _ebml_elem(0xD7, b"\x03"),
        _ebml_elem(0x83, b"\x11"),  # subtitle
        _ebml_elem(0x86, b"S_TEXT/UTF8"),
    ]))
    groups = bytearray(_ebml_elem(0xE7, b"\x00"))  # cluster Timecode 0
    for start_ms, dur_ms, text in cues:
        if not 0 <= start_ms < 1 << 15:
            raise ValueError("subtitle twin: start must fit a block timecode")
        block = b"\x83" + struct.pack(">h", start_ms) + b"\x00" \
            + text.encode("utf-8")
        groups += _ebml_elem(0xA0, _ebml_elem(0xA1, block)
                             + _ebml_elem(0x9B, _ebml_uint_payload(dur_ms)))
    cluster = _ebml_elem(0x1F43B675, bytes(groups))
    top = list(_walk_ebml(shell, 0, len(shell)))
    head_end = top[0][2] + len(top[0][1])
    seg_payload = top[1][1]
    # splice the subtitle TrackEntry into the Tracks element, then the
    # cluster after it
    new_seg = bytearray()
    for sid, spay, _ in _walk_ebml(seg_payload, 0, len(seg_payload)):
        if sid == 0x1654AE6B:  # Tracks: append the subtitle entry
            new_seg += _ebml_elem(0x1654AE6B, spay + sub_entry)
        else:
            new_seg += _ebml_elem(sid, spay)
    new_seg += cluster
    return shell[:head_end] + _ebml_elem(0x18538067, bytes(new_seg))


WEBM_SUBTITLES_SCHEMA = (
    "doc_id bigint, cue_idx int, start_ms bigint, duration_ms bigint, "
    "text string"
)


def extract_subtitles(b: bytes) -> list[tuple[int, int, str]]:
    """Magic-dispatched timed-text extraction: ISO-BMFF/MP4 (tx3g,
    operators/mp4codec.extract_mp4_subtitles) or WebM/Matroska
    (S_TEXT/UTF8)."""
    if len(b) >= 12 and b[4:8] == b"ftyp":
        from hive_udf_spark.operators.mp4codec import extract_mp4_subtitles

        return extract_mp4_subtitles(b)
    return extract_webm_subtitles(b)


def subtitles_table(blobs):
    """(doc_id, blob) → one row per subtitle cue via mapInPandas —
    map-side only; containers never cross a shuffle, the extracted text
    feeds the ordinary text-analysis tier.  Blobs dispatch by magic
    (MP4 tx3g or Matroska S_TEXT)."""
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "cue_idx", "start_ms", "duration_ms", "text")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                for i, (s, d, t) in enumerate(extract_subtitles(bytes(blob))):
                    rows["doc_id"].append(int(doc_id))
                    rows["cue_idx"].append(i)
                    rows["start_ms"].append(s)
                    rows["duration_ms"].append(d)
                    rows["text"].append(t)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(extract, schema=WEBM_SUBTITLES_SCHEMA)


# back-compat alias (the Matroska-only name predates the MP4 tier)
webm_subtitles_table = subtitles_table


def _ebml_elem(eid: int, payload: bytes) -> bytes:
    head = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(payload)
    # size as a vint sized to fit with marker
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            size = (1 << (7 * length)) | n
            return head + size.to_bytes(length, "big") + payload
    raise ValueError("ebml twin: payload too large")


def _ebml_uint_payload(v: int) -> bytes:
    return v.to_bytes(max((v.bit_length() + 7) // 8, 1), "big")


def encode_webm(duration_ms: int, width: int, height: int,
                v_codec: str = "V_VP9", a_codec: str = "A_OPUS",
                sample_rate: int = 48000, channels: int = 2,
                writing_app: str = "graft-twin",
                codec_private: bytes | None = None) -> bytes:
    """Fixture twin: a minimal spec-valid WebM — EBML header, Segment
    with Info (TimecodeScale 1 ms, float64 Duration) and two TrackEntry
    elements (video geometry + audio rate/channels), no clusters."""
    ebml_head = _ebml_elem(_EBML_MAGIC, b"".join([
        _ebml_elem(0x4286, b"\x01"),          # EBMLVersion
        _ebml_elem(0x42F7, b"\x01"),          # EBMLReadVersion
        _ebml_elem(0x42F2, b"\x04"),          # EBMLMaxIDLength
        _ebml_elem(0x42F3, b"\x08"),          # EBMLMaxSizeLength
        _ebml_elem(0x4282, b"webm"),          # DocType
        _ebml_elem(0x4287, b"\x04"),          # DocTypeVersion
        _ebml_elem(0x4285, b"\x02"),          # DocTypeReadVersion
    ]))
    info = _ebml_elem(0x1549A966, b"".join([
        _ebml_elem(0x2AD7B1, _ebml_uint_payload(1_000_000)),
        _ebml_elem(0x4489, struct.pack(">d", float(duration_ms))),
        _ebml_elem(0x4D80, b"graft-mux"),
        _ebml_elem(0x5741, writing_app.encode("utf-8")),
    ]))
    video_entry = _ebml_elem(0xAE, b"".join([
        _ebml_elem(0xD7, b"\x01"),
        _ebml_elem(0x83, b"\x01"),  # video
        _ebml_elem(0x86, v_codec.encode()),
    ] + ([_ebml_elem(0x63A2, codec_private)] if codec_private else []) + [
        _ebml_elem(0xE0, _ebml_elem(0xB0, _ebml_uint_payload(width))
                   + _ebml_elem(0xBA, _ebml_uint_payload(height))),
    ]))
    audio_entry = _ebml_elem(0xAE, b"".join([
        _ebml_elem(0xD7, b"\x02"),
        _ebml_elem(0x83, b"\x02"),  # audio
        _ebml_elem(0x86, a_codec.encode()),
        _ebml_elem(0xE1, _ebml_elem(0xB5, struct.pack(">d", float(sample_rate)))
                   + _ebml_elem(0x9F, _ebml_uint_payload(channels))),
    ]))
    tracks = _ebml_elem(0x1654AE6B, video_entry + audio_entry)
    segment = _ebml_elem(0x18538067, info + tracks)
    return ebml_head + segment


def encode_webm_av1(
    tus: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Fixture twin with CLUSTERS (r11): a spec-valid WebM whose video
    track is ``V_AV1`` and whose Cluster carries one keyframe
    SimpleBlock per temporal unit — the real-web AV1 delivery shape.
    Block payloads are stored WITHOUT the temporal-delimiter OBU, as
    the AV1-in-Matroska mapping prescribes (the demuxer re-adds it)."""
    if not tus:
        raise ValueError("at least one temporal unit required")
    shell = encode_webm(
        duration_ms=1000 * len(tus) // fps, width=width, height=height,
        v_codec="V_AV1", writing_app="graft-twin-av1",
    )
    payloads = [tu[2:] if tu[:2] == b"\x12\x00" else tu for tu in tus]
    return _splice_cluster(shell, payloads, fps)


def _splice_cluster(shell: bytes, payloads: list[bytes], fps: int) -> bytes:
    """Rebuild the Segment from the shell's Info+Tracks payload plus a
    Cluster of keyframe SimpleBlocks (track 1, one block per payload)."""
    blocks = bytearray(_ebml_elem(0xE7, b"\x00"))  # cluster Timecode 0
    for i, payload in enumerate(payloads):
        blk = b"\x81" + struct.pack(">h", 1000 * i // fps) + b"\x80" + payload
        blocks += _ebml_elem(0xA3, blk)
    cluster = _ebml_elem(0x1F43B675, bytes(blocks))
    top = list(_walk_ebml(shell, 0, len(shell)))
    head_end = top[0][2] + len(top[0][1])  # end of the EBML header
    seg_payload = top[1][1]
    return shell[:head_end] + _ebml_elem(0x18538067, seg_payload + cluster)


def encode_webm_hevc(
    samples: list[bytes], hvcc: bytes, width: int, height: int,
    fps: int = 10,
) -> bytes:
    """Fixture twin (r11): a spec-valid Matroska whose video track is
    ``V_MPEGH/ISO/HEVC`` — block payloads are MP4-style length-prefixed
    NALs, the hvcC record rides in CodecPrivate, exactly the layout
    real MKV muxers emit for HEVC."""
    if not samples:
        raise ValueError("at least one sample required")
    shell = encode_webm(
        duration_ms=1000 * len(samples) // fps, width=width, height=height,
        v_codec="V_MPEGH/ISO/HEVC", writing_app="graft-twin-hevc",
        codec_private=hvcc,
    )
    return _splice_cluster(shell, samples, fps)


# ---------------------------------------------------------------------------
# Spark operators — map-side Arrow-batched probe tables.  Blobs never
# cross a shuffle; the probe rows that leave the scan stage are tiny.
# ---------------------------------------------------------------------------

OGG_PROBE_SCHEMA = (
    "doc_id bigint, serial bigint, codec string, channels int, "
    "sample_rate int, pre_skip int, duration_ms bigint, "
    "title string, lang_tag string, src_tag string"
)


def ogg_probe_table(blobs):
    """(doc_id, blob) → one row per logical Ogg stream with codec
    identity, geometry, exact granule-derived duration, and the three
    fixture comment tags (TITLE / LANG / SRC)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                for st in ogg_probe(bytes(blob)):
                    tags = st["tags"]
                    rows.append((int(did), st["serial"], st["codec"],
                                 st["channels"], st["sample_rate"],
                                 st["pre_skip"], st["duration_ms"],
                                 tags.get("TITLE"), tags.get("LANG"),
                                 tags.get("SRC")))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "serial", "codec", "channels", "sample_rate",
                "pre_skip", "duration_ms", "title", "lang_tag", "src_tag"])

    return blobs.mapInPandas(run, OGG_PROBE_SCHEMA)


ID3_PROBE_SCHEMA = (
    "doc_id bigint, id3_version string, bitrate_kbps int, "
    "sample_rate int, channels int, n_frames int, duration_ms bigint, "
    "title string, artist string, album string"
)


def id3_probe_table(blobs):
    """(doc_id, blob) → ID3 tag fields + first-MPEG-frame facts + the
    exact frame-walk duration."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                p = id3_probe(bytes(blob))
                t = p["tags"]
                rows.append((int(did), p["id3_version"], p["bitrate_kbps"],
                             p["sample_rate"], p["channels"], p["n_frames"],
                             p["duration_ms"], t.get("TIT2"), t.get("TPE1"),
                             t.get("TALB")))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "id3_version", "bitrate_kbps", "sample_rate",
                "channels", "n_frames", "duration_ms", "title", "artist",
                "album"])

    return blobs.mapInPandas(run, ID3_PROBE_SCHEMA)


WEBM_PROBE_SCHEMA = (
    "doc_id bigint, doctype string, duration_ms bigint, "
    "writing_app string, track_number int, track_type int, codec string, "
    "width int, height int, sample_rate int, channels int"
)


def webm_probe_table(blobs):
    """(doc_id, blob) → one row per Matroska/WebM track, with the
    container-level fields repeated per row."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                w = webm_probe(bytes(blob))
                for tr in w["tracks"]:
                    rows.append((int(did), w["doctype"], w["duration_ms"],
                                 w["writing_app"], tr["number"], tr["type"],
                                 tr["codec"], tr["width"], tr["height"],
                                 tr["sample_rate"], tr["channels"]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "doctype", "duration_ms", "writing_app",
                "track_number", "track_type", "codec", "width", "height",
                "sample_rate", "channels"])

    return blobs.mapInPandas(run, WEBM_PROBE_SCHEMA)
