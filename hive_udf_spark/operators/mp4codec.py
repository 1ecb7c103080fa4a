"""Vendored MP4 / ISO Base Media File Format (ISO 14496-12) reader.

The last of the "real corpora arrive as JPEG/PNG/MP4" trio: a genuine
box walk — nested size/fourcc boxes (64-bit ``largesize`` and
to-end-of-file sizes included), ``moov → trak → mdia → minf → stbl``
descent selecting the first VIDEO track by its ``hdlr`` handler, and
frame extents reconstructed the way real demuxers do it: ``stsc``
(sample-to-chunk runs) × ``stco``/``co64`` (chunk offsets) × ``stsz``
(sample sizes) resolve every sample to an absolute byte range in
``mdat``. No offset guessing; every table inconsistency raises.

Codec model: samples are returned as opaque per-frame blobs. Under the
Motion-JPEG-in-MP4 convention (``jpeg`` sample entry) each sample is an
independent baseline JPEG decodable by ``jpegcodec.decode_jpeg_gray``
via the standard magic dispatch — the same composition as MJPEG-in-AVI.
AV1 (``av01``) samples (r11, verdict item 1) are temporal units the
magic dispatch routes to the system libdav1d
(``native.dav1d_decode_obus_gray``), quarantining when the library is
absent.  HEVC (``hvc1``/``hev1``) samples (r11) are re-framed to
self-contained Annex-B access units — hvcC parameter sets prepended,
length prefixes replaced by start codes, the standard demuxer → decoder
hand-off — and routed to the system libde265
(``native.hevc_decode_annexb_gray``).  H.264 (``avc1``) samples get the
same avcC → Annex-B re-framing and route to the vendored I_PCM-subset
decoder (``operators/avccodec.py``): raw macroblocks decode exactly,
entropy-coded slices — i.e. all real-web H.264, since no system decoder
ships in this container — raise at decode time, not at demux time (the
box walk is codec agnostic, like a real demuxer).

``encode_mp4_mjpeg`` / ``encode_mp4_av1`` are the fixture twins: a
minimal-but-valid ISO-BMFF file (ftyp / mdat / moov with full sample
tables, one chunk) that stdlib-free tools and this parser agree on;
the AV1 variant carries the spec-required av1C configuration and its
samples are the LOSSLESS AV1 streams libheif/libaom encode, so the
pixel-identity oracle applies to real AV1 entropy-coded video.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated multimodal-columns extension surface.
"""

from __future__ import annotations

import struct

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = [
    "fragment_mp4",
    "split_mp4_frames",
    "encode_mp4_mjpeg",
    "encode_mp4_av1",
    "encode_mp4_avc",
    "encode_mp4_hevc",
    "hvcc_from_heic",
    "hevc_sample_to_annexb",
    "heif_item_payload",
    "heif_exif_payload",
    "heif_probe",
    "encode_heif",
    "heif_probe_table",
]


def _boxes_full(b: bytes, pos: int, end: int):
    """Yield (fourcc, box_start, payload_start, payload_end) for boxes
    in [pos, end) — box_start is the first byte of the size field (the
    anchor ``default-base-is-moof`` fragment offsets are relative to)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        fourcc = b[pos + 4 : pos + 8]
        payload = pos + 8
        if size == 1:  # 64-bit largesize
            if payload + 8 > end:
                raise ValueError(f"MP4 box {fourcc!r}: truncated largesize")
            (size,) = struct.unpack_from(">Q", b, payload)
            payload += 8
            box_end = pos + size
        elif size == 0:  # to end of enclosing scope
            box_end = end
        else:
            box_end = pos + size
        if box_end < payload or box_end > end:
            raise ValueError(f"MP4 box {fourcc!r}: size {size} exceeds extent")
        yield fourcc, pos, payload, box_end
        pos = box_end


def _boxes(b: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for boxes in [pos, end)."""
    for fourcc, _, payload, box_end in _boxes_full(b, pos, end):
        yield fourcc, payload, box_end


def _find(b: bytes, pos: int, end: int, fourcc: bytes):
    for fc, p, e in _boxes(b, pos, end):
        if fc == fourcc:
            return p, e
    return None


def _parse_stbl(b: bytes, pos: int, end: int) -> tuple[bytes, list[int], list[int], list[tuple[int, int]], bytes]:
    """Returns (sample_entry_fourcc, sample_sizes, chunk_offsets,
    stsc runs [(first_chunk, samples_per_chunk)], sample_entry_payload —
    the first stsd entry's box payload, so codec-config children like
    ``hvcC`` are reachable)."""
    entry_fourcc = None
    entry_payload = b""
    sizes: list[int] | None = None
    offsets: list[int] | None = None
    stsc: list[tuple[int, int]] | None = None
    for fc, p, e in _boxes(b, pos, end):
        if fc == b"stsd":
            (count,) = struct.unpack_from(">I", b, p + 4)
            if count < 1:
                raise ValueError("MP4 stsd: no sample entries")
            entry_fourcc = b[p + 12 : p + 16]
            for efc, ep, ee in _boxes(b, p + 8, e):
                entry_payload = b[ep:ee]
                break
        elif fc == b"stsz":
            sample_size, count = struct.unpack_from(">II", b, p + 4)
            if sample_size:
                sizes = [sample_size] * count
            else:
                if p + 12 + 4 * count > e:
                    raise ValueError("MP4 stsz: size table truncated")
                sizes = list(struct.unpack_from(f">{count}I", b, p + 12))
        elif fc in (b"stco", b"co64"):
            (count,) = struct.unpack_from(">I", b, p + 4)
            w, f = (4, "I") if fc == b"stco" else (8, "Q")
            if p + 8 + w * count > e:
                raise ValueError(f"MP4 {fc.decode()} table truncated")
            offsets = list(struct.unpack_from(f">{count}{f}", b, p + 8))
        elif fc == b"stsc":
            (count,) = struct.unpack_from(">I", b, p + 4)
            if p + 8 + 12 * count > e:
                raise ValueError("MP4 stsc table truncated")
            stsc = [
                struct.unpack_from(">II", b, p + 8 + 12 * i)  # drop desc index
                for i in range(count)
            ]
    if entry_fourcc is None or sizes is None or offsets is None or stsc is None:
        raise ValueError("MP4 stbl missing one of stsd/stsz/stco/stsc")
    return entry_fourcc, sizes, offsets, stsc, entry_payload


def _video_stbl(b: bytes, moov_p: int, moov_e: int):
    """First trak whose hdlr handler is 'vide' → (its stbl extents,
    its tkhd track_ID — the key fragment trafs address)."""
    for fc, p, e in _boxes(b, moov_p, moov_e):
        if fc != b"trak":
            continue
        mdia = _find(b, p, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(b, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or b[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(b, mdia[0], mdia[1], b"minf")
        if minf is None:
            raise ValueError("MP4 video trak missing minf")
        stbl = _find(b, minf[0], minf[1], b"stbl")
        if stbl is None:
            raise ValueError("MP4 video trak missing stbl")
        track_id = 0
        tkhd = _find(b, p, e, b"tkhd")
        if tkhd is not None:
            ver = b[tkhd[0]]
            at = tkhd[0] + (20 if ver == 1 else 12)
            if at + 4 <= tkhd[1]:
                (track_id,) = struct.unpack_from(">I", b, at)
        return stbl, track_id
    raise ValueError("MP4 has no video track (hdlr 'vide')")


def _trex_default_size(b: bytes, moov_p: int, moov_e: int,
                       track_id: int) -> int:
    """The mvex/trex default_sample_size for ``track_id`` (0 when the
    movie has no mvex or no matching trex)."""
    mvex = _find(b, moov_p, moov_e, b"mvex")
    if mvex is None:
        return 0
    for fc, p, e in _boxes(b, mvex[0], mvex[1]):
        if fc == b"trex" and p + 24 <= e:
            tid, _sdi, _dur, dsize = struct.unpack_from(">IIII", b, p + 4)
            if tid == track_id:
                return dsize
    return 0


_MAX_FRAGMENT_SAMPLES = 1 << 20  # untrusted-header guard


def _fragment_samples(b: bytes, track_id: int,
                      trex_size: int) -> list[tuple[int, int]]:
    """Resolve the video track's samples from movie FRAGMENTS
    (ISO 14496-12 §8.8: moof → traf → tfhd/trun) → [(offset, size)].

    Base-offset semantics implemented as the spec states them: an
    explicit tfhd ``base-data-offset`` wins; else the
    ``default-base-is-moof`` flag anchors at the moof's first byte;
    else the FIRST traf of a moof defaults to the moof start.  A
    second-or-later traf with no explicit base needs the preceding
    traf's data extent (inter-track offset chaining) — refuse loudly
    rather than guess.  Sample sizes come from the trun entries, the
    tfhd default, or the trex default, in that order; unresolvable
    sizes refuse.  Every extent is bounds-checked against the blob."""
    out: list[tuple[int, int]] = []
    for fc, moof_start, p, e in _boxes_full(b, 0, len(b)):
        if fc != b"moof":
            continue
        first_traf = True
        for tfc, tp, te in _boxes(b, p, e):
            if tfc != b"traf":
                continue
            was_first = first_traf
            first_traf = False
            tfhd = _find(b, tp, te, b"tfhd")
            if tfhd is None:
                raise ValueError("fMP4: traf missing tfhd")
            hp, he = tfhd
            if hp + 8 > he:
                raise ValueError("fMP4: tfhd truncated")
            (vf,) = struct.unpack_from(">I", b, hp)
            flags = vf & 0xFFFFFF
            (tid,) = struct.unpack_from(">I", b, hp + 4)
            cur = hp + 8
            bdo = None
            if flags & 0x1:
                if cur + 8 > he:
                    raise ValueError("fMP4: tfhd base-data-offset truncated")
                (bdo,) = struct.unpack_from(">Q", b, cur)
                cur += 8
            if flags & 0x2:
                cur += 4  # sample_description_index
            if flags & 0x8:
                cur += 4  # default_sample_duration
            default_size = None
            if flags & 0x10:
                if cur + 4 > he:
                    raise ValueError("fMP4: tfhd default-sample-size truncated")
                (default_size,) = struct.unpack_from(">I", b, cur)
                cur += 4
            if tid != track_id:
                continue
            if bdo is not None:
                base = bdo
            elif flags & 0x20000 or was_first:  # default-base-is-moof
                base = moof_start
            else:
                raise ValueError(
                    "fMP4: non-first traf without base-data-offset or "
                    "default-base-is-moof (inter-track offset chaining "
                    "not vendored)"
                )
            data_pos = base
            for rfc, rp, re_ in _boxes(b, tp, te):
                if rfc != b"trun":
                    continue
                if rp + 8 > re_:
                    raise ValueError("fMP4: trun truncated")
                (vf2,) = struct.unpack_from(">I", b, rp)
                tflags = vf2 & 0xFFFFFF
                (count,) = struct.unpack_from(">I", b, rp + 4)
                cur2 = rp + 8
                if tflags & 0x1:
                    (doff,) = struct.unpack_from(">i", b, cur2)
                    cur2 += 4
                    data_pos = base + doff
                if tflags & 0x4:
                    cur2 += 4  # first-sample-flags
                per = (4 * bool(tflags & 0x100) + 4 * bool(tflags & 0x200)
                       + 4 * bool(tflags & 0x400) + 4 * bool(tflags & 0x800))
                if count > _MAX_FRAGMENT_SAMPLES or cur2 + count * per > re_:
                    raise ValueError("fMP4: trun sample table out of bounds")
                size_at = cur2 + (4 if tflags & 0x100 else 0)
                for i in range(count):
                    if tflags & 0x200:
                        (ssize,) = struct.unpack_from(">I", b,
                                                      size_at + i * per)
                    else:
                        ssize = default_size if default_size is not None \
                            else trex_size
                        if not ssize:
                            raise ValueError(
                                "fMP4: sample size unresolvable (no trun "
                                "entry, tfhd default, or trex default)"
                            )
                    if ssize > len(b) or data_pos + ssize > len(b) \
                            or data_pos < 0:
                        raise ValueError("fMP4: sample extent outside the file")
                    if len(out) >= _MAX_FRAGMENT_SAMPLES:
                        raise ValueError("fMP4: sample count past the cap")
                    out.append((data_pos, ssize))
                    data_pos += ssize
    return out


@untrusted_decoder
def split_mp4_frames(b: bytes) -> list[bytes]:
    """Demux an ISO-BMFF/MP4 blob into its video samples (one blob per
    frame), resolved through the real sample tables. Samples are opaque
    — under Motion-JPEG-in-MP4 each is an independent JPEG for the
    magic dispatch.  hvc1/hev1 samples (r11) are emitted SELF-CONTAINED
    the way real demuxers hand them to decoders: the hvcC configuration
    record's parameter-set NALs are prepended and the length-prefixed
    sample NALs are re-framed as an Annex-B byte stream, which the
    magic dispatch routes to the system libde265."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 blob (missing ftyp)")
    moov = _find(b, 0, len(b), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")
    stbl, track_id = _video_stbl(b, moov[0], moov[1])
    entry, sizes, chunk_offsets, stsc, entry_payload = _parse_stbl(
        b, stbl[0], stbl[1]
    )
    frames = _resolve_samples(b, sizes, chunk_offsets, stsc)
    # FRAGMENTED MP4 (r12): streaming-era files (CMAF/DASH) keep the
    # moov sample tables empty and carry samples in moof/mdat pairs —
    # resolve those through tfhd/trun and append in fragment order
    frag = _fragment_samples(
        b, track_id, _trex_default_size(b, moov[0], moov[1], track_id)
    )
    frames += [b[o : o + s] for o, s in frag]
    if not frames:
        raise ValueError("MP4 video track has no samples")
    if entry == b"avc1":
        from hive_udf_spark.operators.avccodec import (
            avc_sample_to_annexb,
            avcc_config,
        )

        avcc = None
        if len(entry_payload) > 78:
            for fc, p, e in _boxes(entry_payload, 78, len(entry_payload)):
                if fc == b"avcC":
                    avcc = entry_payload[p:e]
                    break
        if avcc is None:
            raise ValueError("MP4 avc1 sample entry missing avcC")
        length_size, psets = avcc_config(avcc)
        return [avc_sample_to_annexb(f, length_size, psets) for f in frames]
    if entry in (b"hvc1", b"hev1"):
        # VisualSampleEntry: 6 reserved + 2 data_reference_index + 70
        # fixed bytes = 78, then child boxes (hvcC required by 14496-15)
        hvcc = None
        if len(entry_payload) > 78:
            for fc, p, e in _boxes(entry_payload, 78, len(entry_payload)):
                if fc == b"hvcC":
                    hvcc = entry_payload[p:e]
                    break
        if hvcc is None:
            raise ValueError("MP4 hvc1/hev1 sample entry missing hvcC")
        length_size, psets = _hvcc_config(hvcc)
        frames = [hevc_sample_to_annexb(f, length_size, psets) for f in frames]
    return frames


# ---------------------------------------------------------------------------
# Encoder (fixture twin)
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


def encode_mp4_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Assemble JPEG stills into a minimal valid Motion-JPEG MP4:
    ftyp / mdat (concatenated samples, one chunk) / moov with real
    mvhd/tkhd/mdhd/hdlr/vmhd/dinf/stbl sample tables."""
    sample_entry = (
        struct.pack(">I", 86)  # VisualSampleEntry size for 'jpeg'
        + b"jpeg"
        + b"\x00" * 6 + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)
    )
    return _mux_video(frames, width, height, fps, b"mjpeg", sample_entry)


def _mux_video(
    frames: list[bytes], width: int, height: int, fps: int,
    handler_name: bytes, sample_entry: bytes,
) -> bytes:
    """Shared single-track video muxer behind the MJPEG and AV1
    fixture twins (identical box layout; only the stsd sample entry
    and hdlr name differ)."""
    if not frames:
        raise ValueError("at least one frame required")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    first_sample_off = len(ftyp) + 8  # mdat header is 8 bytes

    n = len(frames)
    timescale = fps
    duration = n
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x10000, 0x0100)  # rate, volume
        + b"\x00" * 10 + matrix + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0) + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"vide" + b"\x00" * 12 + handler_name + b"\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def fragment_mp4(
    b: bytes, samples_per_fragment: int = 1, base_mode: str = "moof",
    size_mode: str = "trun",
) -> bytes:
    """Fixture twin (r12): rewrite a classic (moov-indexed) MP4 into a
    FRAGMENTED one — the CMAF/DASH shape streaming-era corpora carry.
    The moov keeps the original stsd codec configuration (avcC/hvcC/
    av1C ride along untouched) but its sample tables empty out and an
    mvex/trex appears; the samples move into per-fragment
    moof(mfhd, traf(tfhd, trun)) + mdat pairs.  ``base_mode`` picks the
    tfhd anchor the reader must honor: ``"moof"`` sets
    default-base-is-moof, ``"bdo"`` writes an explicit 64-bit
    base-data-offset (both are real-world shapes).  ``size_mode`` picks
    where sample sizes live: ``"trun"`` per-sample entries, ``"tfhd"``
    the fragment's default-sample-size (uniform sizes per fragment
    required), ``"trex"`` the movie-level default (uniform sizes across
    the whole track required) — the reader's full fallback chain."""
    if base_mode not in ("moof", "bdo"):
        raise ValueError("base_mode must be 'moof' or 'bdo'")
    if size_mode not in ("trun", "tfhd", "trex"):
        raise ValueError("size_mode must be 'trun', 'tfhd' or 'trex'")
    moov = _find(b, 0, len(b), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")
    stbl, _tid = _video_stbl(b, moov[0], moov[1])
    entry, sizes, chunk_offsets, stsc, entry_payload = _parse_stbl(
        b, stbl[0], stbl[1]
    )
    samples = _resolve_samples(b, sizes, chunk_offsets, stsc)
    if not samples:
        raise ValueError("fragment twin: source MP4 has no samples")
    n = len(samples)
    width = height = 0
    if len(entry_payload) >= 28:
        width, height = struct.unpack_from(">HH", entry_payload, 24)
    timescale, duration = 25, n
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x10000, 0x0100)
        + b"\x00" * 10 + matrix + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0) + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"vide" + b"\x00" * 12 + entry + b"\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(b"dinf", _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    ))
    sample_entry = struct.pack(">I", 8 + len(entry_payload)) + entry \
        + entry_payload
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    # empty tables: the fragmented contract
    stbl_out = _box(b"stbl", (
        stsd
        + _full(b"stts", 0, 0, struct.pack(">I", 0))
        + _full(b"stsc", 0, 0, struct.pack(">I", 0))
        + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
        + _full(b"stco", 0, 0, struct.pack(">I", 0))
    ))
    minf = _box(b"minf", vmhd + dinf + stbl_out)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    trex_size = 0
    if size_mode == "trex":
        if len({len(s) for s in samples}) != 1:
            raise ValueError(
                "fragment twin: size_mode='trex' needs uniform sample sizes"
            )
        trex_size = len(samples[0])
    mvex = _box(b"mvex", _full(
        b"trex", 0, 0, struct.pack(">IIIII", 1, 1, 1, trex_size, 0)
    ))
    moov_out = _box(b"moov", mvhd + trak + mvex)
    ftyp = _box(b"ftyp",
                b"iso5" + struct.pack(">I", 512) + b"iso5iso6cmfc")
    out = bytearray(ftyp + moov_out)
    seq = 0
    for at in range(0, n, samples_per_fragment):
        chunk = samples[at : at + samples_per_fragment]
        seq += 1
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))

        def _traf(doff: int, moof_start: int) -> bytes:
            tfhd_flags = 0x20000 if base_mode == "moof" else 0x1
            tfhd_payload = struct.pack(">I", 1)
            if base_mode == "bdo":
                tfhd_payload += struct.pack(">Q", moof_start)
            if size_mode == "tfhd":
                if len({len(s) for s in chunk}) != 1:
                    raise ValueError(
                        "fragment twin: size_mode='tfhd' needs uniform "
                        "sizes per fragment"
                    )
                tfhd_flags |= 0x10
                tfhd_payload += struct.pack(">I", len(chunk[0]))
            tfhd = _full(b"tfhd", 0, tfhd_flags, tfhd_payload)
            trun_flags = 0x1 | (0x200 if size_mode == "trun" else 0)
            trun_payload = struct.pack(">Ii", len(chunk), doff)
            if size_mode == "trun":
                trun_payload += b"".join(
                    struct.pack(">I", len(s)) for s in chunk
                )
            return _box(
                b"traf", tfhd + _full(b"trun", 0, trun_flags, trun_payload)
            )

        # two passes: the trun data-offset needs the finished moof size
        # (samples start right after the fragment's mdat header)
        moof = _box(b"moof", mfhd + _traf(0, len(out)))
        moof = _box(b"moof", mfhd + _traf(len(moof) + 8, len(out)))
        out += moof + _box(b"mdat", b"".join(chunk))
    return bytes(out)


# ---------------------------------------------------------------------------
# HEIF still images (AVIF / HEIC) — structural probe (r9).
#
# AVIF is a double-digit share of modern web images; HEIC dominates
# phone camera rolls.  Both are ISO-BMFF *item* files (meta-box driven,
# no moov): the probe walks meta → pitm/iinf/iprp(ipco+ipma) to the
# primary item's codec and spatial properties — the triage facts a
# pipeline needs (what is it, how big, which way up) without an AV1/HEVC
# decoder.  Payload decode stays an explicit gap: attempting it raises,
# so these blobs route to quarantine in the decode tier while the probe
# tier still yields full metadata rows.
# ---------------------------------------------------------------------------


@untrusted_decoder
def heif_probe(b: bytes) -> dict:
    """Probe an AVIF/HEIC blob → ``{brand, primary_item, codec, width,
    height, rotation, n_items}``.  ``rotation`` is the irot property's
    anticlockwise quarter-turns (0 when absent)."""
    b = bytes(b)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF blob (missing ftyp)")
    ftyp = _find(b, 0, len(b), b"ftyp")
    brand = b[ftyp[0] : ftyp[0] + 4].decode("latin-1")
    meta = _find(b, 0, len(b), b"meta")
    if meta is None:
        raise ValueError("HEIF: missing meta box")
    mp, me = meta[0] + 4, meta[1]  # meta is a FullBox
    hdlr = _find(b, mp, me, b"hdlr")
    if hdlr is None or b[hdlr[0] + 8 : hdlr[0] + 12] != b"pict":
        raise ValueError("HEIF: meta hdlr is not 'pict'")
    pitm = _find(b, mp, me, b"pitm")
    if pitm is None:
        raise ValueError("HEIF: missing pitm (primary item)")
    pv = b[pitm[0]]
    primary = (struct.unpack_from(">H", b, pitm[0] + 4)[0] if pv == 0
               else struct.unpack_from(">I", b, pitm[0] + 4)[0])
    # iinf → item_id -> item_type
    iinf = _find(b, mp, me, b"iinf")
    if iinf is None:
        raise ValueError("HEIF: missing iinf")
    iv = b[iinf[0]]
    pos = iinf[0] + 4
    n_items = (struct.unpack_from(">H", b, pos)[0] if iv == 0
               else struct.unpack_from(">I", b, pos)[0])
    pos += 2 if iv == 0 else 4
    item_types: dict[int, str] = {}
    for fc, p, e in _boxes(b, pos, iinf[1]):
        if fc != b"infe":
            continue
        ver = b[p]
        if ver < 2:
            raise ValueError(f"HEIF: infe version {ver} not supported")
        iid = (struct.unpack_from(">H", b, p + 4)[0] if ver == 2
               else struct.unpack_from(">I", b, p + 4)[0])
        off = p + 4 + (2 if ver == 2 else 4) + 2  # + protection_index
        item_types[iid] = b[off : off + 4].decode("latin-1")
    if len(item_types) != n_items:
        raise ValueError(
            f"HEIF: iinf declares {n_items} items, found {len(item_types)}")
    if primary not in item_types:
        raise ValueError("HEIF: primary item missing from iinf")
    # iprp → ipco (ordered property list) + ipma (item -> 1-based indices)
    iprp = _find(b, mp, me, b"iprp")
    if iprp is None:
        raise ValueError("HEIF: missing iprp")
    ipco = _find(b, iprp[0], iprp[1], b"ipco")
    ipma = _find(b, iprp[0], iprp[1], b"ipma")
    if ipco is None or ipma is None:
        raise ValueError("HEIF: missing ipco/ipma")
    props = list(_boxes(b, ipco[0], ipco[1]))  # 1-based indexing
    av = b[ipma[0]]
    aflags = int.from_bytes(b[ipma[0] + 1 : ipma[0] + 4], "big")
    pos = ipma[0] + 4
    (entry_count,) = struct.unpack_from(">I", b, pos)
    pos += 4
    assoc: dict[int, list[int]] = {}
    for _ in range(entry_count):
        iid = (struct.unpack_from(">H", b, pos)[0] if av == 0
               else struct.unpack_from(">I", b, pos)[0])
        pos += 2 if av == 0 else 4
        cnt = b[pos]
        pos += 1
        idxs = []
        for _ in range(cnt):
            if aflags & 1:
                (v,) = struct.unpack_from(">H", b, pos)
                pos += 2
                idxs.append(v & 0x7FFF)
            else:
                idxs.append(b[pos] & 0x7F)
                pos += 1
        assoc[iid] = idxs
    width = height = None
    rotation = 0
    for idx in assoc.get(primary, []):
        if not 1 <= idx <= len(props):
            raise ValueError("HEIF: ipma property index out of range")
        fc, p, e = props[idx - 1]
        if fc == b"ispe":  # FullBox: version/flags + width + height
            width, height = struct.unpack_from(">II", b, p + 4)
        elif fc == b"irot":  # plain box: low 2 bits = quarter turns ccw
            rotation = b[p] & 3
    if width is None:
        raise ValueError("HEIF: primary item has no ispe (spatial extents)")
    return {
        "brand": brand,
        "primary_item": primary,
        "codec": item_types[primary],
        "width": width,
        "height": height,
        "rotation": rotation,
        "n_items": n_items,
    }


@untrusted_decoder
def heif_item_payload(b: bytes, item_id: int | None = None) -> bytes:
    """Byte payload of a HEIF/AVIF item (default: the primary item),
    resolved through the REAL iloc box (versions 0–2, construction
    methods 0 = file offsets and 1 = idat-relative offsets, multi-extent
    concatenation) — this is how an AVIF's AV1 OBU stream or a HEIC's
    HEVC NAL payload is extracted for re-muxing or direct decode,
    without assuming single-mdat layouts.  Method 1 matters in
    practice: libheif itself writes small images into ``meta/idat``
    (r11 — the HEVC fixture twin produces exactly this layout)."""
    b = bytes(b)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF blob (missing ftyp)")
    meta = _find(b, 0, len(b), b"meta")
    if meta is None:
        raise ValueError("HEIF: missing meta box")
    mp, me = meta[0] + 4, meta[1]
    if item_id is None:
        pitm = _find(b, mp, me, b"pitm")
        if pitm is None:
            raise ValueError("HEIF: missing pitm (primary item)")
        pv = b[pitm[0]]
        item_id = (struct.unpack_from(">H", b, pitm[0] + 4)[0] if pv == 0
                   else struct.unpack_from(">I", b, pitm[0] + 4)[0])
    iloc = _find(b, mp, me, b"iloc")
    if iloc is None:
        raise ValueError("HEIF: missing iloc")
    ver = b[iloc[0]]
    if ver > 2:
        raise ValueError(f"HEIF: iloc version {ver} not supported")
    pos = iloc[0] + 4
    sizes = b[pos]
    offset_size, length_size = sizes >> 4, sizes & 0x0F
    base_offset_size = b[pos + 1] >> 4
    index_size = (b[pos + 1] & 0x0F) if ver in (1, 2) else 0
    pos += 2
    if ver < 2:
        (item_count,) = struct.unpack_from(">H", b, pos)
        pos += 2
    else:
        (item_count,) = struct.unpack_from(">I", b, pos)
        pos += 4

    def read_n(n: int, at: int) -> int:
        if n == 0:
            return 0
        return int.from_bytes(b[at : at + n], "big")

    for _ in range(item_count):
        if ver < 2:
            (iid,) = struct.unpack_from(">H", b, pos)
            pos += 2
        else:
            (iid,) = struct.unpack_from(">I", b, pos)
            pos += 4
        method = 0
        if ver in (1, 2):
            method = struct.unpack_from(">H", b, pos)[0] & 0x0F
            pos += 2
        pos += 2  # data_reference_index
        base = read_n(base_offset_size, pos)
        pos += base_offset_size
        (extent_count,) = struct.unpack_from(">H", b, pos)
        pos += 2
        extents = []
        for _ in range(extent_count):
            pos += index_size
            off = read_n(offset_size, pos)
            pos += offset_size
            ln = read_n(length_size, pos)
            pos += length_size
            extents.append((off, ln))
        if iid != item_id:
            continue
        if method == 0:
            src, sp, se = b, 0, len(b)
        elif method == 1:
            idat = _find(b, mp, me, b"idat")
            if idat is None:
                raise ValueError("HEIF: iloc method 1 but no idat box")
            src, sp, se = b, idat[0], idat[1]
        else:
            raise ValueError(
                f"HEIF: iloc construction method {method} not supported"
            )
        out = bytearray()
        for off, ln in extents:
            start = sp + base + off
            if start < sp or start + ln > se:
                raise ValueError("HEIF: iloc extent outside its container")
            out += src[start : start + ln]
        if not out:
            raise ValueError("HEIF: item has no extents")
        return bytes(out)
    raise ValueError(f"HEIF: item {item_id} missing from iloc")


def _resolve_samples(
    b: bytes, sizes: list[int], chunk_offsets: list[int],
    stsc: list[tuple[int, int]],
) -> list[bytes]:
    """stsc × stco × stsz → per-sample byte blobs (the demuxer core the
    video and subtitle walks share)."""
    n_chunks = len(chunk_offsets)
    spc = [0] * n_chunks
    for i, (first, per) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        if not 1 <= first <= n_chunks or last < first:
            raise ValueError("MP4 stsc: chunk run out of range")
        for c in range(first - 1, last):
            spc[c] = per
    if sum(spc) != len(sizes):
        raise ValueError(
            f"MP4 sample tables disagree: stsc maps {sum(spc)} samples, "
            f"stsz lists {len(sizes)}"
        )
    out: list[bytes] = []
    si = 0
    for c, off in enumerate(chunk_offsets):
        pos = off
        for _ in range(spc[c]):
            size = sizes[si]
            if pos + size > len(b):
                raise ValueError(f"MP4 sample {si} extends past end of file")
            out.append(b[pos : pos + size])
            pos += size
            si += 1
    return out


@untrusted_decoder
def extract_mp4_subtitles(b: bytes) -> list[tuple[int, int, str]]:
    """Subtitle cues [(start_ms, duration_ms, text)] from an MP4's
    first timed-text track (r11 — the tx3g/3GPP layout: handler
    ``text``/``sbtl``, each sample a 16-bit-BE length-prefixed UTF-8
    string; timing from stts runs at the track's mdhd timescale).
    Empty samples (the gap convention between cues) yield no cue."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 blob (missing ftyp)")
    moov = _find(b, 0, len(b), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")
    for fc, p, e in _boxes(b, moov[0], moov[1]):
        if fc != b"trak":
            continue
        mdia = _find(b, p, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(b, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or b[hdlr[0] + 8 : hdlr[0] + 12] not in (b"text", b"sbtl"):
            continue
        mdhd = _find(b, mdia[0], mdia[1], b"mdhd")
        if mdhd is None:
            raise ValueError("MP4 subtitle trak missing mdhd")
        timescale = struct.unpack_from(">I", b, mdhd[0] + 12)[0]
        if not timescale:
            raise ValueError("MP4 subtitle trak has timescale 0")
        minf = _find(b, mdia[0], mdia[1], b"minf")
        stbl = _find(b, minf[0], minf[1], b"stbl") if minf else None
        if stbl is None:
            raise ValueError("MP4 subtitle trak missing stbl")
        entry, sizes, chunk_offsets, stsc, _ = _parse_stbl(b, stbl[0], stbl[1])
        if entry not in (b"tx3g", b"wvtt"):
            raise ValueError(
                f"MP4 subtitle sample entry {entry!r} not vendored "
                "(tx3g/wvtt only)"
            )
        stts_box = _find(b, stbl[0], stbl[1], b"stts")
        if stts_box is None:
            raise ValueError("MP4 subtitle trak missing stts")
        (n_runs,) = struct.unpack_from(">I", b, stts_box[0] + 4)
        durations: list[int] = []
        pos = stts_box[0] + 8
        for _ in range(n_runs):
            if pos + 8 > stts_box[1]:
                raise ValueError("MP4 stts table truncated")
            count, delta = struct.unpack_from(">II", b, pos)
            pos += 8
            if len(durations) + count > len(sizes):
                raise ValueError("MP4 stts maps more samples than stsz")
            durations.extend([delta] * count)
        if len(durations) != len(sizes):
            raise ValueError("MP4 stts/stsz sample counts disagree")
        cues: list[tuple[int, int, str]] = []
        t = 0
        for sample, dur in zip(
            _resolve_samples(b, sizes, chunk_offsets, stsc), durations
        ):
            start_ms = t * 1000 // timescale
            dur_ms = dur * 1000 // timescale
            t += dur
            if entry == b"wvtt":
                # 14496-30: each sample is ISO boxes — vttc{payl} cues,
                # vtte for the empty stretches between them
                for sfc, sp, se in _boxes(sample, 0, len(sample)):
                    if sfc == b"vtte":
                        continue
                    if sfc != b"vttc":
                        raise ValueError(
                            f"MP4 wvtt sample box {sfc!r} not vendored"
                        )
                    payl = _find(sample, sp, se, b"payl")
                    if payl is None:
                        raise ValueError("MP4 wvtt cue without a payl box")
                    cues.append((
                        start_ms, dur_ms,
                        sample[payl[0] : payl[1]].decode("utf-8"),
                    ))
                continue
            if len(sample) < 2:
                raise ValueError("MP4 tx3g sample missing length prefix")
            ln = int.from_bytes(sample[:2], "big")
            if 2 + ln > len(sample):
                raise ValueError("MP4 tx3g text extends past the sample")
            if ln:
                cues.append((start_ms, dur_ms, sample[2 : 2 + ln].decode("utf-8")))
        return cues
    raise ValueError("MP4 has no timed-text track (hdlr 'text'/'sbtl')")


def _timed_text_samples(
    cues: list[tuple[int, int, str]], gap: bytes, wrap
) -> tuple[list[bytes], list[int]]:
    """Cue schedule → (samples, durations) with gap samples between
    cues; ``wrap`` serializes one cue text into a sample."""
    samples: list[bytes] = []
    durations: list[int] = []
    t = 0
    for start_ms, dur_ms, text in sorted(cues):
        if start_ms < t:
            raise ValueError("timed-text twin: overlapping cues")
        if start_ms > t:
            samples.append(gap)
            durations.append(start_ms - t)
        samples.append(wrap(text))
        durations.append(max(dur_ms, 1))
        t = start_ms + max(dur_ms, 1)
    return samples, durations


def encode_mp4_wvtt(cues: list[tuple[int, int, str]]) -> bytes:
    """Fixture twin (r11): timed-text cues → a minimal valid MP4 with
    one ``wvtt`` track (ISO 14496-30, the CMAF/WebVTT layout) —
    box-structured samples: ``vttc{payl}`` per cue, ``vtte`` for the
    empty stretches between them."""
    if not cues:
        raise ValueError("at least one cue required")
    samples, durations = _timed_text_samples(
        cues, _box(b"vtte", b""),
        lambda text: _box(b"vttc", _box(b"payl", text.encode("utf-8"))),
    )
    vttC = _box(b"vttC", b"WEBVTT\n")
    entry = (
        struct.pack(">I", 16 + len(vttC)) + b"wvtt"
        + b"\x00" * 6 + struct.pack(">H", 1)
        + vttC
    )
    return _mux_timed_text(samples, durations, entry)


def encode_mp4_tx3g(cues: list[tuple[int, int, str]]) -> bytes:
    """Fixture twin (r11): timed-text cues → a minimal valid MP4 with
    one tx3g track at a 1000 timescale — gaps between cues become the
    empty samples the 3GPP layout prescribes."""
    if not cues:
        raise ValueError("at least one cue required")
    samples, durations = _timed_text_samples(
        cues, b"\x00\x00",
        lambda text: len(text.encode("utf-8")).to_bytes(2, "big")
        + text.encode("utf-8"),
    )
    tx3g = (struct.pack(">I", 8 + 38) + b"tx3g"
            + b"\x00" * 6 + struct.pack(">H", 1)
            + struct.pack(">I", 0) + b"\x01\xff" + b"\x00" * 4
            + b"\x00" * 8 + b"\x00" * 12)
    return _mux_timed_text(samples, durations, tx3g)


def _mux_timed_text(
    samples: list[bytes], durations: list[int], sample_entry: bytes
) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    first_off = len(ftyp) + 8
    n = len(samples)
    duration = sum(durations)
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, 1000, duration)
                 + struct.pack(">iH", 0x10000, 0x0100)
                 + b"\x00" * 10 + matrix + b"\x00" * 24
                 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIIII", 0, 0, 1, 0, duration)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0) + matrix
                 + struct.pack(">II", 0, 0))
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIIIHH", 0, 0, 1000, duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"text" + b"\x00" * 12 + b"tx3g\x00")
    nmhd = _full(b"nmhd", 0, 0, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    # stts: run-length encode the duration list
    runs: list[tuple[int, int]] = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _full(b"stts", 0, 0, struct.pack(">I", len(runs))
                 + b"".join(struct.pack(">II", c, d) for c, d in runs))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0,
                 struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", nmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def heif_exif_payload(b: bytes) -> bytes:
    """The raw TIFF EXIF bytes of a HEIF/AVIF blob's ``Exif`` item
    (r11 — phone HEICs carry EXIF as a linked metadata item, not an
    APP1 segment): iinf is walked for the item of type ``Exif``, its
    payload resolves through the real iloc (idat included), and the
    HEIF ExifDataBlock framing (4-byte tiff-header offset, optional
    JPEG-style ``Exif\\0\\0`` prefix) is stripped."""
    b = bytes(b)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF blob (missing ftyp)")
    meta = _find(b, 0, len(b), b"meta")
    if meta is None:
        raise ValueError("HEIF: missing meta box")
    mp, me = meta[0] + 4, meta[1]
    iinf = _find(b, mp, me, b"iinf")
    if iinf is None:
        raise ValueError("HEIF: missing iinf")
    iv = b[iinf[0]]
    pos = iinf[0] + 4 + (2 if iv == 0 else 4)
    exif_id = None
    for fc, p, e in _boxes(b, pos, iinf[1]):
        if fc != b"infe":
            continue
        ver = b[p]
        if ver < 2:
            raise ValueError(f"HEIF: infe version {ver} not supported")
        iid = (struct.unpack_from(">H", b, p + 4)[0] if ver == 2
               else struct.unpack_from(">I", b, p + 4)[0])
        off = p + 4 + (2 if ver == 2 else 4) + 2
        if b[off : off + 4] == b"Exif":
            exif_id = iid
            break
    if exif_id is None:
        raise ValueError("HEIF: no Exif item")
    payload = heif_item_payload(b, item_id=exif_id)
    if len(payload) < 4:
        raise ValueError("HEIF: Exif item too short")
    (tiff_off,) = struct.unpack_from(">I", payload, 0)
    body = payload[4 + tiff_off :] if 4 + tiff_off <= len(payload) else b""
    if body[:6] == b"Exif\x00\x00":
        body = body[6:]
    if body[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("HEIF: Exif item carries no TIFF header")
    return body


def _extract_seq_header_obu(tu: bytes) -> bytes:
    """The sequence-header OBU (type 1) from a temporal unit — the
    AV1-ISOBMFF spec requires it in av1C's configOBUs."""
    pos = 0
    while pos < len(tu):
        hdr = tu[pos]
        if hdr & 0x81:
            raise ValueError("AV1: OBU with forbidden/extension bits")
        obu_type = (hdr >> 3) & 0x0F
        has_size = hdr & 0x02
        if not has_size:
            raise ValueError("AV1: OBU without size field")
        # uleb128 size
        size = 0
        shift = 0
        p = pos + 1
        while True:
            if p >= len(tu) or shift > 28:
                raise ValueError("AV1: OBU size varint truncated")
            byte = tu[p]
            size |= (byte & 0x7F) << shift
            p += 1
            if not byte & 0x80:
                break
            shift += 7
        end = p + size
        if end > len(tu):
            raise ValueError("AV1: OBU extends past the temporal unit")
        if obu_type == 1:
            return tu[pos:end]
        pos = end
    raise ValueError("AV1: temporal unit carries no sequence header OBU")


def encode_mp4_av1(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Assemble AV1 temporal units (raw OBU streams, e.g. extracted
    from lossless AVIF items) into a minimal valid AV1-in-MP4 file:
    the same real sample tables as the MJPEG twin, but an ``av01``
    VisualSampleEntry carrying the spec-required ``av1C``
    AV1CodecConfigurationBox (marker/version 0x81, profile/level from
    the stream's own sequence header, configOBUs = that sequence
    header)."""
    if not frames:
        raise ValueError("at least one frame required")
    seq = _extract_seq_header_obu(frames[0])
    # seq_profile: top 3 bits of the first PAYLOAD byte (the OBU is
    # 1 header byte + uleb128 size bytes + payload)
    p = 1
    while seq[p] & 0x80:
        p += 1
    p += 1
    if p >= len(seq):
        raise ValueError("AV1: sequence header OBU has no payload")
    seq_profile = (seq[p] >> 5) & 0x07
    av1c_body = bytes([
        0x81,                       # marker=1, version=1
        (seq_profile << 5) | 0x0D,  # seq_level_idx placeholder (3.1)
        0x00,                       # tier/bitdepth/mono/chroma flags (8-bit 420)
        0x00,                       # presentation delay absent
    ]) + seq
    av1c = _box(b"av1C", av1c_body)
    sample_entry = (
        struct.pack(">I", 86 + len(av1c))
        + b"av01"
        + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + av1c
    )
    return _mux_video(frames, width, height, fps, b"av01", sample_entry)


# ---------------------------------------------------------------------------
# HEVC-in-MP4 (r11 — the second half of verdict item 1).  ISO 14496-15
# stores HEVC as length-prefixed NAL units per sample with the
# parameter sets (VPS/SPS/PPS) out-of-band in the hvcC
# HEVCDecoderConfigurationRecord; decoders consume Annex-B byte
# streams, so the demuxer re-frames exactly the way real demuxers do.
# ---------------------------------------------------------------------------


def _hvcc_config(hvcc: bytes) -> tuple[int, list[bytes]]:
    """Parse an hvcC HEVCDecoderConfigurationRecord payload →
    (NAL length-prefix size in bytes, parameter-set NALs in array
    order — VPS(32)/SPS(33)/PPS(34) as real encoders emit them)."""
    if len(hvcc) < 23:
        raise ValueError("hvcC record truncated")
    if hvcc[0] != 1:
        raise ValueError(f"hvcC configurationVersion {hvcc[0]} unsupported")
    length_size = (hvcc[21] & 0x03) + 1
    n_arrays = hvcc[22]
    pos = 23
    nals: list[bytes] = []
    for _ in range(n_arrays):
        if pos + 3 > len(hvcc):
            raise ValueError("hvcC NAL array header truncated")
        pos += 1  # array_completeness(1) + reserved(1) + NAL_unit_type(6)
        (n_nalus,) = struct.unpack_from(">H", hvcc, pos)
        pos += 2
        for _ in range(n_nalus):
            if pos + 2 > len(hvcc):
                raise ValueError("hvcC NAL length truncated")
            (ln,) = struct.unpack_from(">H", hvcc, pos)
            pos += 2
            if pos + ln > len(hvcc):
                raise ValueError("hvcC NAL extends past the record")
            nals.append(hvcc[pos : pos + ln])
            pos += ln
    if not nals:
        raise ValueError("hvcC record carries no parameter sets")
    return length_size, nals


def hevc_sample_to_annexb(
    sample: bytes, length_size: int, param_sets: list[bytes]
) -> bytes:
    """Length-prefixed HEVC sample NALs → a self-contained Annex-B
    access unit: 4-byte start codes, parameter sets first."""
    out = bytearray()
    for n in param_sets:
        out += b"\x00\x00\x00\x01" + n
    pos = 0
    while pos < len(sample):
        if pos + length_size > len(sample):
            raise ValueError("HEVC sample: NAL length prefix truncated")
        ln = int.from_bytes(sample[pos : pos + length_size], "big")
        pos += length_size
        if ln == 0 or pos + ln > len(sample):
            raise ValueError("HEVC sample: NAL extends past the sample")
        out += b"\x00\x00\x00\x01" + sample[pos : pos + ln]
        pos += ln
    return bytes(out)


def encode_mp4_avc(
    samples: list[bytes], sps: bytes, pps: bytes, width: int, height: int,
    fps: int = 25,
) -> bytes:
    """Assemble H.264 samples (4-byte length-prefixed NALs per
    14496-15, e.g. from ``avccodec.encode_avc_ipcm``) into a minimal
    valid AVC-in-MP4 file: the shared sample tables plus an ``avc1``
    VisualSampleEntry carrying the avcC record built from the given
    parameter sets."""
    from hive_udf_spark.operators.avccodec import build_avcc

    if not samples:
        raise ValueError("at least one sample required")
    avcc_box = _box(b"avcC", build_avcc(sps, pps))
    sample_entry = (
        struct.pack(">I", 86 + len(avcc_box))
        + b"avc1"
        + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + avcc_box
    )
    return _mux_video(samples, width, height, fps, b"avc1", sample_entry)


def hvcc_from_heic(b: bytes) -> bytes:
    """The hvcC HEVCDecoderConfigurationRecord payload from a HEIC's
    property container (meta → iprp → ipco) — how the fixture twin
    lifts the parameter sets libx265 emitted, byte-identical."""
    b = bytes(b)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF blob (missing ftyp)")
    meta = _find(b, 0, len(b), b"meta")
    if meta is None:
        raise ValueError("HEIF: missing meta box")
    iprp = _find(b, meta[0] + 4, meta[1], b"iprp")
    if iprp is None:
        raise ValueError("HEIF: missing iprp")
    ipco = _find(b, iprp[0], iprp[1], b"ipco")
    if ipco is None:
        raise ValueError("HEIF: missing ipco")
    for fc, p, e in _boxes(b, ipco[0], ipco[1]):
        if fc == b"hvcC":
            return b[p:e]
    raise ValueError("HEIF: no hvcC property (not an HEVC-coded HEIC)")


def encode_mp4_hevc(
    samples: list[bytes], hvcc: bytes, width: int, height: int,
    fps: int = 25,
) -> bytes:
    """Assemble HEVC samples (length-prefixed NALs as 14496-15 stores
    them — e.g. HEIC item payloads, which already use 4-byte prefixes)
    into a minimal valid HEVC-in-MP4 file: the shared sample tables
    plus an ``hvc1`` VisualSampleEntry carrying the given hvcC record."""
    if not samples:
        raise ValueError("at least one sample required")
    length_size, psets = _hvcc_config(hvcc)  # validates the record
    if length_size != 4:
        raise ValueError("encode_mp4_hevc expects 4-byte NAL prefixes")
    hvcc_box = _box(b"hvcC", hvcc)
    sample_entry = (
        struct.pack(">I", 86 + len(hvcc_box))
        + b"hvc1"
        + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + hvcc_box
    )
    return _mux_video(samples, width, height, fps, b"hevc", sample_entry)


def encode_heif(width: int, height: int, brand: str = "avif",
                rotation: int = 0, alpha: bool = False) -> bytes:
    """Fixture twin: a minimal spec-valid AVIF/HEIC item structure —
    ftyp, meta(hdlr/pitm/iinf/iprp/iloc), mdat with a placeholder coded
    payload.  ``brand`` 'avif' → av01 items, 'heic' → hvc1.  ``alpha``
    adds a second (auxiliary) item so n_items varies."""
    if brand not in ("avif", "heic"):
        raise ValueError("brand must be avif or heic")
    codec = b"av01" if brand == "avif" else b"hvc1"
    # compatible brands: mif1 (the structural HEIF brand) + the major
    ftyp = _box(b"ftyp", brand.encode() + struct.pack(">I", 0) + b"mif1" + brand.encode())
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"pict" + b"\x00" * 12 + b"\x00")
    pitm = _full(b"pitm", 0, 0, struct.pack(">H", 1))
    items = [(1, codec)] + ([(2, codec)] if alpha else [])
    infes = b"".join(
        _full(b"infe", 2, 0, struct.pack(">HH", iid, 0) + ctype + b"\x00")
        for iid, ctype in items
    )
    iinf = _full(b"iinf", 0, 0, struct.pack(">H", len(items)) + infes)
    ispe = _full(b"ispe", 0, 0, struct.pack(">II", width, height))
    irot = _box(b"irot", bytes([rotation & 3]))
    ipco = _box(b"ipco", ispe + irot)
    entries = b"".join(
        struct.pack(">H", iid) + bytes([2, 1, 2]) for iid, _ in items
    )  # each item -> properties [1 (ispe), 2 (irot)], non-essential
    ipma = _full(b"ipma", 0, 0, struct.pack(">I", len(items)) + entries)
    iprp = _box(b"iprp", ipco + ipma)
    payload = bytes([(width + height + rotation) & 0xFF]) * 64
    # iloc version 0: offset_size=4 length_size=4 base_offset_size=0
    ilocs = b"".join(
        struct.pack(">HHH", iid, 0, 1) + struct.pack(">II", 0, len(payload))
        for iid, _ in items
    )
    iloc = _full(b"iloc", 0, 0, bytes([0x44, 0x00]) + struct.pack(">H", len(items)) + ilocs)
    meta = _full(b"meta", 0, 0, hdlr + pitm + iinf + iprp + iloc)
    mdat = _box(b"mdat", payload * (2 if alpha else 1))
    return ftyp + meta + mdat


HEIF_PROBE_SCHEMA = (
    "doc_id bigint, brand string, codec string, width int, height int, "
    "rotation int, n_items int"
)


def heif_probe_table(blobs):
    """(doc_id, blob) → HEIF probe rows, map-side Arrow batches."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                p = heif_probe(bytes(blob))
                rows.append((int(did), p["brand"], p["codec"], p["width"],
                             p["height"], p["rotation"], p["n_items"]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "brand", "codec", "width", "height", "rotation",
                "n_items"])

    return blobs.mapInPandas(run, HEIF_PROBE_SCHEMA)
