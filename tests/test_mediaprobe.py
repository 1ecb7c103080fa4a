"""Media probes (operators/mediaprobe.py): Ogg / ID3+MPEG / EBML-WebM.

Twin→probe round trips across the rotation space, spec-edge vectors
(packet spanning, exact-255 lacing, syncsafe sizes, UTF-16 tags, vint
widths), and the malformed-input contract (CRC flips, truncations,
unknown codecs → ValueError)."""

from __future__ import annotations

import struct

import pytest

from hive_udf_spark.operators.mediaprobe import (
    _ogg_crc,
    _ogg_page,
    encode_mp3_id3,
    encode_ogg_opus,
    encode_ogg_vorbis,
    encode_webm,
    id3_probe,
    ogg_probe,
    webm_probe,
)


# ---------------------------------------------------------------------------
# Ogg
# ---------------------------------------------------------------------------


def test_ogg_crc_is_the_unreflected_variant():
    # distinguishes from zlib crc32: the Ogg CRC of "123456789" is the
    # CRC-32/POSIX-family unreflected value with init 0 (0x89A1897F for
    # the classic check string under poly 0x04C11DB7, init 0, xorout 0)
    assert _ogg_crc(b"123456789") == 0x89A1897F
    import zlib

    assert _ogg_crc(b"123456789") != zlib.crc32(b"123456789")


@pytest.mark.parametrize("dur,ch,skip", [(0, 1, 0), (1, 2, 1), (123456, 2, 312),
                                         (999999, 1, 799)])
def test_ogg_opus_roundtrip(dur, ch, skip):
    st = ogg_probe(encode_ogg_opus(dur, channels=ch, pre_skip=skip,
                                   tags={"TITLE": "t", "X": "=a=b="}))[0]
    assert st["codec"] == "opus"
    assert st["channels"] == ch
    assert st["pre_skip"] == skip
    assert st["duration_ms"] == dur
    assert st["tags"]["X"] == "=a=b="  # value may contain '='


@pytest.mark.parametrize("rate", [8000, 22050, 44100, 48000])
def test_ogg_vorbis_roundtrip(rate):
    dur = 54321
    st = ogg_probe(encode_ogg_vorbis(dur, sample_rate=rate))[0]
    assert st["codec"] == "vorbis"
    assert st["sample_rate"] == rate
    assert st["duration_ms"] == (dur * rate // 1000) * 1000 // rate


def test_ogg_packet_spanning_and_exact_255_lacing():
    """A packet split across pages (continuation) and a packet whose
    length is an exact multiple of 255 (requires the 0 lace terminator)
    must both reassemble."""
    big = bytes(range(256)) * 3  # 768 bytes → laces 255,255,255,3... not exact
    exact = b"z" * 510  # exact multiple → 255,255,0
    head = b"OpusHead" + bytes([1, 2]) + struct.pack("<HIHB", 0, 48000, 0, 0)
    tags = (b"OpusTags" + struct.pack("<I", 1) + b"v"
            + struct.pack("<I", 1) + struct.pack("<I", 3) + b"A=b")
    pages = [
        _ogg_page(9, 0, 0, 0x02, [head]),
        _ogg_page(9, 1, 0, 0x00, [tags, exact]),
        _ogg_page(9, 2, 48000, 0x04, [big]),
    ]
    st = ogg_probe(b"".join(pages))[0]
    assert st["codec"] == "opus" and st["duration_ms"] == 1000
    assert st["tags"] == {"A": "b"}


def test_ogg_crc_flip_and_unknown_codec_raise():
    b = bytearray(encode_ogg_opus(5000))
    b[40] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        ogg_probe(bytes(b))
    theora = _ogg_page(7, 0, 0, 0x02, [b"\x80theora" + b"\x00" * 20])
    with pytest.raises(ValueError, match="unsupported codec"):
        ogg_probe(theora)


def test_ogg_truncations_raise():
    b = encode_ogg_opus(77777, tags={"TITLE": "x" * 100})
    for cut in range(1, len(b), 13):
        with pytest.raises(ValueError):
            ogg_probe(b[:cut])


# ---------------------------------------------------------------------------
# ID3 / MPEG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("major", [3, 4])
@pytest.mark.parametrize("kbps", [128, 192, 320])
def test_mp3_roundtrip(major, kbps):
    p = id3_probe(encode_mp3_id3(
        17, tags={"TIT2": "Tïtle", "TPE1": "Ärtist", "TALB": "アルバム"},
        bitrate_kbps=kbps, id3_major=major))
    assert p["id3_version"] == f"2.{major}.0"
    assert p["bitrate_kbps"] == kbps
    assert p["n_frames"] == 17
    assert p["duration_ms"] == 17 * 1152 * 1000 // 44100
    assert p["tags"]["TPE1"] == "Ärtist"
    assert p["tags"]["TALB"] == "アルバム"  # survives UTF-16/UTF-8 frames


def test_mp3_no_id3_tag_still_probes_frames():
    full = encode_mp3_id3(4, tags={"TIT2": "x"})
    bare = full[full.index(b"\xff\xfb"):]  # strip the ID3 tag
    p = id3_probe(bare)
    assert p["id3_version"] is None and p["n_frames"] == 4


def test_mp3_malformed_raises():
    good = encode_mp3_id3(3, tags={"TIT2": "q"})
    with pytest.raises(ValueError, match="truncated final MPEG frame"):
        id3_probe(good[:-10])
    b = bytearray(good)
    i = b.index(b"\xff\xfb")
    b[i] = 0x00  # break sync
    with pytest.raises(ValueError, match="lost sync"):
        id3_probe(bytes(b))
    with pytest.raises(ValueError, match="non-syncsafe"):
        id3_probe(b"ID3\x04\x00\x00\xff\xff\xff\xff")


# ---------------------------------------------------------------------------
# WebM / EBML
# ---------------------------------------------------------------------------


def test_webm_roundtrip():
    b = encode_webm(360360, 640, 360, v_codec="V_AV1", a_codec="A_VORBIS",
                    sample_rate=44100, channels=1, writing_app="wä")
    w = webm_probe(b)
    assert w["doctype"] == "webm"
    assert w["duration_ms"] == 360360
    assert w["writing_app"] == "wä"
    v, a = w["tracks"]
    assert (v["codec"], v["width"], v["height"]) == ("V_AV1", 640, 360)
    assert (a["codec"], a["sample_rate"], a["channels"]) == ("A_VORBIS", 44100, 1)


def test_webm_large_geometry_vint_widths():
    # multi-byte uints and a duration near 2^31 ms exercise wider vints
    b = encode_webm(2_000_000_000, 7680, 4320)
    w = webm_probe(b)
    assert w["duration_ms"] == 2_000_000_000
    assert w["tracks"][0]["width"] == 7680


def test_webm_malformed_raises():
    b = encode_webm(1000, 64, 64)
    with pytest.raises(ValueError):  # zero lead byte: invalid vint
        webm_probe(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="EBML header"):
        webm_probe(b"\x83\x81\x01")  # valid element, wrong id
    for cut in range(1, len(b), 7):
        try:
            webm_probe(b[:cut])
        except ValueError:
            continue
        # some prefixes are structurally complete (clusters are optional);
        # they must still carry the EBML header
        assert b[:cut][:4] == b"\x1aE\xdf\xa3"


# ---------------------------------------------------------------------------
# Matroska subtitle extraction (r11)
# ---------------------------------------------------------------------------


def test_webm_subtitles_roundtrip_and_unicode():
    from hive_udf_spark.operators.mediaprobe import (
        encode_webm_subtitles,
        extract_webm_subtitles,
        webm_probe,
    )

    cues = [(0, 1500, "Hello."), (1500, 2000, "äöü — 中文 🙂"), (3500, 0, "x")]
    mkv = encode_webm_subtitles(cues)
    assert extract_webm_subtitles(mkv) == cues
    types = [(t["type"], t["codec"]) for t in webm_probe(mkv)["tracks"]]
    assert (0x11, "S_TEXT/UTF8") in types


def test_webm_subtitles_styled_codec_refuses():
    import pytest

    from hive_udf_spark.operators.mediaprobe import (
        encode_webm_subtitles,
        extract_webm_subtitles,
    )

    mkv = bytearray(encode_webm_subtitles([(0, 100, "plain")]))
    at = mkv.index(b"S_TEXT/UTF8")
    mkv[at : at + 11] = b"S_TEXT/ASS\x00"
    with pytest.raises(ValueError, match="not vendored"):
        extract_webm_subtitles(bytes(mkv))


def test_webm_subtitles_absent_track_refuses():
    import pytest

    from hive_udf_spark.operators.mediaprobe import (
        encode_webm,
        extract_webm_subtitles,
    )

    with pytest.raises(ValueError, match="no S_TEXT"):
        extract_webm_subtitles(encode_webm(1000, 8, 8))


def test_webm_subtitles_fuzz_never_crashes():
    import numpy as np

    from hive_udf_spark.operators.mediaprobe import (
        encode_webm_subtitles,
        extract_webm_subtitles,
    )

    base = bytearray(encode_webm_subtitles([(0, 100, "abc"), (100, 50, "def")]))
    rng = np.random.RandomState(3)
    for _ in range(250):
        i = int(rng.randint(0, len(base)))
        orig = base[i]
        base[i] ^= 1 << int(rng.randint(0, 8))
        try:
            for s, d, t in extract_webm_subtitles(bytes(base)):
                assert isinstance(t, str)
        except ValueError:
            pass
        base[i] = orig


def test_subtitle_cue_roundtrip_property():
    """Hypothesis: arbitrary cue schedules (unicode text, 0-duration
    cues, arbitrary gaps) round-trip through both containers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hive_udf_spark.operators.mediaprobe import (
        encode_webm_subtitles,
        extract_webm_subtitles,
    )
    from hive_udf_spark.operators.mp4codec import (
        encode_mp4_tx3g,
        extract_mp4_subtitles,
    )

    texts = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=1, max_size=40,
    )

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 200), st.integers(1, 500), texts),
                    min_size=1, max_size=5))
    def prop(raw):
        t, cues = 0, []
        for gap, dur, text in raw:
            cues.append((t + gap, dur, text))
            t += gap + dur
        assert extract_webm_subtitles(encode_webm_subtitles(cues)) == cues
        assert extract_mp4_subtitles(encode_mp4_tx3g(cues)) == cues

    prop()


def test_webm_subtitles_cluster_before_tracks():
    """ADVICE r11: a legal Matroska may put Clusters ahead of Tracks;
    the extractor must two-pass the Segment rather than silently drop
    cues from early clusters."""
    from hive_udf_spark.operators.mediaprobe import (
        _ebml_elem,
        _walk_ebml,
        encode_webm_subtitles,
        extract_webm_subtitles,
    )

    cues = [(0, 700, "early"), (900, 300, "late")]
    mkv = encode_webm_subtitles(cues)
    top = list(_walk_ebml(mkv, 0, len(mkv)))
    header = _ebml_elem(top[0][0], top[0][1])
    seg_children = list(_walk_ebml(top[1][1], 0, len(top[1][1])))
    clusters = [(i, p) for i, p, _ in seg_children if i == 0x1F43B675]
    others = [(i, p) for i, p, _ in seg_children if i != 0x1F43B675]
    assert clusters, "fixture must carry clusters"
    reordered = b"".join(_ebml_elem(i, p) for i, p in clusters + others)
    mkv2 = header + _ebml_elem(0x18538067, reordered)
    assert extract_webm_subtitles(mkv2) == cues


# ---------------------------------------------------------------------------
# r14 verdict task 4: Ogg audio native dispatch (opus/vorbis)
# ---------------------------------------------------------------------------


def test_ogg_packets_extraction_and_truncation():
    from hive_udf_spark.operators.mediaprobe import (
        encode_ogg_opus,
        ogg_packets,
    )

    blob = encode_ogg_opus(1000, tags={"A": "b"})
    pk = ogg_packets(blob)
    assert list(pk) == [0x1234]
    assert pk[0x1234][0].startswith(b"OpusHead")
    assert pk[0x1234][1].startswith(b"OpusTags")
    assert len(pk[0x1234]) == 4  # 2 headers + 2 audio packets
    with pytest.raises(ValueError):
        ogg_packets(blob[:-3])  # torn final page
    with pytest.raises(ValueError, match="no pages"):
        ogg_packets(b"")


def test_opus_packet_samples_toc_math():
    """RFC 6716 §3.1: sample counts from the TOC byte alone."""
    from hive_udf_spark.operators.mediaprobe import opus_packet_samples

    # config 31 (CELT FB 20 ms), code 0 → one frame → 960 @ 48k
    assert opus_packet_samples(b"\xfc" + b"x" * 10) == 960
    # config 0 (SILK NB 10 ms), code 0 → 480
    assert opus_packet_samples(b"\x00" + b"x") == 480
    # config 3 (SILK NB 60 ms), code 1 → two frames → 5760
    assert opus_packet_samples(b"\x19" + b"x") == 5760
    # code 3 with explicit frame count: config 16 (CELT NB 2.5 ms),
    # M=4 → 480
    assert opus_packet_samples(bytes([0x83, 0x04]) + b"x") == 480
    # at 24 kHz decode rate the counts halve
    assert opus_packet_samples(b"\xfc" + b"x", rate=24000) == 480
    with pytest.raises(ValueError, match="empty"):
        opus_packet_samples(b"")
    with pytest.raises(ValueError, match="zero frames"):
        opus_packet_samples(bytes([0x83, 0x00]))
    with pytest.raises(ValueError, match="120 ms"):
        # config 3 (60 ms), code 3, M=3 → 180 ms, past the RFC limit
        opus_packet_samples(bytes([0x1b, 0x03]))


def test_ogg_native_dispatch_both_regimes():
    """Quarantine regime (this container): probe facts always present,
    status='quarantined', NULL pcm columns.  Decoded regime (a host
    with libopus): status='decoded' with the TOC-predicted count."""
    from hive_udf_spark.operators import native
    from hive_udf_spark.operators.mediaprobe import encode_ogg_opus
    from hive_udf_spark.operators.multimodal import ogg_native_feature_rows

    rows = ogg_native_feature_rows(
        encode_ogg_opus(1000, channels=2, tags={"T": "x"})
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["codec"] == "opus" and r["channels"] == 2
    assert r["n_packets"] == 2 and r["probe_samples"] == 1920
    if native.opus_native_available():
        assert r["status"] == "decoded" and r["n_samples"] == 1920
    else:
        assert r["status"] == "quarantined" and r["n_samples"] is None


def test_ogg_native_vorbis_fixture_always_quarantines():
    """The Vorbis fixture's setup header is a placeholder: a real
    libvorbisfile refuses it, so BOTH regimes quarantine — the decoded
    regime is reachable only with real corpus files."""
    from hive_udf_spark.operators.mediaprobe import encode_ogg_vorbis
    from hive_udf_spark.operators.multimodal import ogg_native_feature_rows

    rows = ogg_native_feature_rows(encode_ogg_vorbis(500))
    assert rows[0]["codec"] == "vorbis"
    assert rows[0]["status"] == "quarantined"
    assert rows[0]["probe_samples"] is None


def test_opus_native_decode_or_quarantine():
    """Dispatch contract, the mpg123 pattern: absent library raises
    the documented message; present library decodes placeholder CELT
    packets to exactly the TOC-predicted sample counts."""
    from hive_udf_spark.operators import native

    packets = [b"\xfcOPQ" * 20, b"\xfcRST" * 20]
    if not native.opus_native_available():
        with pytest.raises(ValueError, match="libopus"):
            native.opus_native_decode_packets(packets, 2)
        return
    pcm = native.opus_native_decode_packets(packets, 2)
    assert pcm.dtype.str == "<i2"
    assert len(pcm) == 2 * 960 * 2  # 2 packets x 960 samples x stereo


def test_vorbis_native_decode_or_quarantine():
    from hive_udf_spark.operators import native
    from hive_udf_spark.operators.mediaprobe import encode_ogg_vorbis

    blob = encode_ogg_vorbis(500)
    if not native.vorbis_native_available():
        with pytest.raises(ValueError, match="libvorbisfile"):
            native.vorbis_native_decode_pcm(blob)
        return
    # library present: the placeholder setup header must REFUSE, not
    # decode into garbage
    with pytest.raises(ValueError):
        native.vorbis_native_decode_pcm(blob)
