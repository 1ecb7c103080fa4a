"""Decoder-boundary fuzzing: every vendored decoder, fed arbitrary or
corrupted bytes, must either succeed or raise ValueError — never leak
struct.error / IndexError / zlib.error etc. These decoders run inside
executor tasks over untrusted corpus bytes at 100 TB; a mechanical
exception type would surface as an engine bug instead of a routable
bad-blob signal (operators/_codec_util.untrusted_decoder is the
boundary under test)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_udf_spark.operators.audiocodec import decode_audio, decode_wav, wav_info
from hive_udf_spark.operators.exif import parse_exif, strip_exif
from hive_udf_spark.operators.flaccodec import decode_flac, flac_info
from hive_udf_spark.operators.gifcodec import decode_gif_gray, split_gif_frames
from hive_udf_spark.operators.imagecodec import (
    decode_to_gray,
    split_container_frames,
)
from hive_udf_spark.operators.jpegcodec import decode_jpeg_gray
from hive_udf_spark.operators.mp4codec import heif_probe, split_mp4_frames
from hive_udf_spark.operators.pdfcodec import extract_pdf_pages
from hive_udf_spark.operators.tarcodec import split_tar_entries
from hive_udf_spark.operators.tiffcodec import decode_tiff_gray
from hive_udf_spark.operators.warc import http_response_body, split_warc_records
from hive_udf_spark.operators.webpcodec import decode_vp8l, decode_webp_gray
from hive_udf_spark.operators.zipcodec import split_zip_entries
from hive_udf_spark.operators.mediaprobe import id3_probe, ogg_probe, webm_probe
from hive_udf_spark.operators.zstdcodec import zstd_decompress
from hive_udf_spark.operators.tfrecordcodec import (
    decode_tf_example,
    decode_tfrecord_stream,
)

DECODERS = [
    zstd_decompress,
    decode_tfrecord_stream,
    decode_tf_example,
    ogg_probe,
    id3_probe,
    webm_probe,
    decode_to_gray,
    decode_webp_gray,
    decode_vp8l,
    decode_jpeg_gray,
    split_mp4_frames,
    heif_probe,
    decode_tiff_gray,
    decode_gif_gray,
    split_gif_frames,
    split_container_frames,
    wav_info,
    decode_wav,
    decode_audio,
    decode_flac,
    flac_info,
    split_zip_entries,
    split_warc_records,
    http_response_body,
    extract_pdf_pages,
    split_tar_entries,
    parse_exif,
    strip_exif,
]


def _seed_blobs() -> list[bytes]:
    """Valid blobs of every vendored format, used as mutation bases."""
    from hive_udf_spark.operators.audiocodec import (
        encode_wav_g711,
        encode_wav_ima_adpcm,
        encode_wav_pcm,
    )
    from hive_udf_spark.operators.gifcodec import encode_gif
    from hive_udf_spark.operators.imagecodec import (
        encode_avi,
        encode_bmp24,
        encode_pgm,
        encode_png,
    )
    from hive_udf_spark.operators.jpegcodec import encode_jpeg, encode_jpeg_progressive
    from hive_udf_spark.operators.mp4codec import encode_heif, encode_mp4_mjpeg
    from hive_udf_spark.operators.exif import add_exif
    from hive_udf_spark.operators.flaccodec import encode_flac
    from hive_udf_spark.operators.pdfcodec import encode_pdf_type0
    from hive_udf_spark.operators.tarcodec import encode_tar
    from hive_udf_spark.operators.tiffcodec import encode_tiff
    from hive_udf_spark.operators.webpcodec import encode_webp_lossless
    from hive_udf_spark.operators.warc import encode_http_response, encode_warc
    from hive_udf_spark.operators.mediaprobe import (
        encode_mp3_id3,
        encode_ogg_opus,
        encode_ogg_vorbis,
        encode_webm,
    )
    from hive_udf_spark.operators.zipcodec import encode_zip
    from hive_udf_spark.operators.zstdcodec import zstd_compress

    rng = np.random.default_rng(0)
    g = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    http = encode_http_response(b"<p>x</p>", chunked=True, chunk_size=3)
    return [
        encode_pgm(g),
        encode_bmp24(rgb),
        encode_png(g, filter_type=4),
        encode_jpeg(g, quality=90),
        encode_gif(g, interlace=True),
        encode_avi([encode_pgm(g)] * 2),
        encode_wav_pcm(rng.integers(-1000, 1000, 64), bits=16),
        encode_wav_g711(bytes(range(64)), "ulaw"),
        encode_wav_ima_adpcm(np.repeat(rng.integers(-99, 99, 8) * 50, 9), block_align=8),
        encode_zip([("a", b"xyz" * 40, 8), ("b", b"s", 0)]),
        encode_mp4_mjpeg([encode_jpeg(g, quality=90)] * 2, 8, 8),
        encode_tiff(g, big_endian=True, packbits=True, rows_per_strip=3),
        encode_tiff(g, lzw=True, predictor=2, rows_per_strip=3),
        encode_jpeg_progressive(g, quality=90, restart_interval=2),
        encode_warc([{"headers": {}, "payload": http}], gzip_records=True),
        encode_webp_lossless(g, mode="plain"),
        encode_webp_lossless(g % 64, mode="palette"),
        encode_pdf_type0(["fuzz pagé one", "ページ two"]),
        encode_flac((300 * np.sin(np.arange(256) / 7)).astype(np.int32)),
        encode_tar([("s1.txt", b"abc" * 30), ("s1.cls", b"3")], fmt="pax"),
        encode_tar([("x.txt", b"y")], fmt="gnu", gzip_wrap=True),
        add_exif(
            encode_jpeg(g, quality=90), "CamCo", "X100", 6,
            37_774_900, -122_419_400,
        ),
        zstd_compress(b"fuzz me gently, fuzz me " * 12, shape="full"),
        zstd_compress(b"ab" * 10 + b"~" * 40 + bytes(range(64)), shape="rle"),
        zstd_compress(b"the entropy of prose " * 9, shape="huf4"),
        encode_ogg_opus(44100, tags={"TITLE": "fz"}),
        encode_ogg_vorbis(12345, sample_rate=22050, tags={"A": "b"}),
        encode_mp3_id3(6, tags={"TIT2": "fz", "TPE1": "zf"}, id3_major=4),
        encode_webm(5000, 320, 240),
        encode_heif(96, 64, brand="avif", rotation=1, alpha=True),
        _tfrecord_seed(),
    ]


def _tfrecord_seed() -> bytes:
    from hive_udf_spark.operators.tfrecordcodec import (
        encode_tf_example,
        encode_tfrecord,
    )

    return encode_tfrecord([
        encode_tf_example({"doc_id": [7], "lang": ["en"],
                           "embed": [0.5, 1.5]}),
        encode_tf_example({"doc_id": [9]}),
    ], "gzip")


SEEDS = _seed_blobs()


@pytest.mark.parametrize("decoder", DECODERS, ids=lambda f: f.__name__)
@settings(max_examples=120, deadline=None)
@given(data=st.data())
def test_decoder_never_leaks_mechanical_exceptions(decoder, data):
    mode = data.draw(st.sampled_from(["random", "truncate", "flip", "splice"]))
    if mode == "random":
        blob = data.draw(st.binary(min_size=0, max_size=200))
    else:
        base = bytearray(data.draw(st.sampled_from(SEEDS)))
        if mode == "truncate":
            cut = data.draw(st.integers(0, len(base)))
            blob = bytes(base[:cut])
        elif mode == "flip":
            for _ in range(data.draw(st.integers(1, 8))):
                i = data.draw(st.integers(0, len(base) - 1))
                base[i] ^= data.draw(st.integers(1, 255))
            blob = bytes(base)
        else:  # splice random junk into the middle
            i = data.draw(st.integers(0, len(base)))
            junk = data.draw(st.binary(min_size=1, max_size=32))
            blob = bytes(base[:i]) + junk + bytes(base[i:])
    try:
        decoder(blob)
    except ValueError:
        pass  # the contract: malformed input is a ValueError


def test_guard_preserves_deliberate_errors_and_causes():
    with pytest.raises(ValueError, match="unsupported image magic"):
        decode_to_gray(b"\x00\x01\x02")
    # a mechanical failure is converted, with the original as __cause__
    try:
        split_zip_entries(b"PK\x05\x06" + b"\x00" * 10)  # EOCD too short
    except ValueError as exc:
        assert exc.__cause__ is not None or "truncated" in str(exc)
