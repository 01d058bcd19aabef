"""Pure-stdlib PNG/WAV codec tests (operators/codecs.py) — the REAL
decode path behind ``decode_media(decoder="real")``.

Strategy mirrors the IVF codebook: fixtures freeze expected outputs as
literals (_media_fixtures.py) and tests pin live == frozen, so decoder
drift trips locally before the driver's oracle compare; compliance is
anchored by an EXTERNALLY produced PNG (libpng blob), not just
self-round-trips.
"""

import base64

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from typebus_spark.operators._media_fixtures import MEDIA_FIXTURES
from typebus_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    real_decode,
    real_resize,
)

# 1x1 RGBA PNG written by libpng (well-known blob): red, alpha 0x7f —
# validates standard compliance independently of our own encoder
_LIBPNG_1X1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQ"
    "DwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def test_decode_external_libpng_blob():
    d = decode_png(_LIBPNG_1X1)
    assert (d["width"], d["height"], d["channels"]) == (1, 1, 4)
    assert d["pixels"] == b"\xff\x00\x00\x7f"


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(color_type, ch, filt):
    w, h = 5, 4
    px = bytes((i * 7 + 3) % 256 for i in range(w * h * ch))
    blob = encode_png(px, w, h, color_type, filters=[filt] * h)
    d = decode_png(blob)
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert d["pixels"] == px


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.sampled_from([0, 2, 6]),
    st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_random(w, h, color_type, seed):
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    px = bytes((seed // (i + 1) + i * i) % 256 for i in range(w * h * ch))
    assert decode_png(encode_png(px, w, h, color_type))["pixels"] == px


def test_png_unsupported_variants_named():
    # 16-bit depth IHDR → NotImplementedError naming the variant
    blob = bytearray(encode_png(b"\x00" * 4, 2, 2, 0))
    assert blob[24] == 8  # bit depth byte inside IHDR
    blob[24] = 16
    import struct
    import zlib

    crc = zlib.crc32(bytes(blob[12:29])) & 0xFFFFFFFF
    blob[29:33] = struct.pack(">I", crc)
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        decode_png(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF....")


def test_wav_roundtrip():
    samples = [((i * 37) % 512) - 256 for i in range(300)]
    blob = encode_wav(samples, 8000, 1, 2)
    d = decode_wav(blob)
    assert d["sample_rate"] == 8000
    assert d["n_channels"] == 1
    assert d["n_samples"] == 300
    assert d["samples"] == samples


def test_wav_stereo_frames_vs_samples():
    samples = list(range(-100, 100))  # 200 interleaved → 100 frames
    d = decode_wav(encode_wav(samples, 16000, 2, 2))
    assert d["n_channels"] == 2
    assert d["n_samples"] == 100
    assert d["samples"] == samples


def test_real_decode_matches_frozen_fixtures():
    """Live decoder output == frozen literals for every fixture — the
    drift tripwire backing the q_multimodal_real_* oracles."""
    for fx in MEDIA_FIXTURES:
        blob = base64.b64decode(fx["b64"])
        d = real_decode(blob, fx["mime"])
        assert d["width"] == fx["decoded"]["width"], fx["name"]
        assert d["height"] == fx["decoded"]["height"], fx["name"]
        assert d["n_frames"] == fx["decoded"]["n_frames"], fx["name"]
        assert d["features"] == fx["decoded"]["features"], fx["name"]
        if "resized" in fx:
            r = real_resize(blob, fx["mime"], 16, 16)
            assert r["out_w"] == fx["resized"]["out_w"], fx["name"]
            assert r["out_h"] == fx["resized"]["out_h"], fx["name"]
            assert r["resized_sha"] == fx["resized"]["resized_sha"], fx["name"]


def test_real_resize_fit_is_identity_on_pixels():
    """An image already inside the box must pass through unresampled:
    sha == sha256(original pixels || tag)."""
    import hashlib

    fx = next(f for f in MEDIA_FIXTURES if f["name"] == "png_gray_9x7")
    blob = base64.b64decode(fx["b64"])
    px = decode_png(blob)["pixels"]
    r = real_resize(blob, "image/png", 16, 16)
    assert (r["out_w"], r["out_h"]) == (9, 7)
    assert r["resized_sha"] == hashlib.sha256(px + b"|9x7").hexdigest()


def test_real_resize_nearest_neighbor_downsample():
    """2x2 → 1x1 nearest-neighbor keeps the top-left pixel (floor
    index map oy*h//oh = 0, ox*w//ow = 0)."""
    import hashlib

    px = bytes([10, 20, 30, 40])
    blob = encode_png(px, 2, 2, 0)
    r = real_resize(blob, "image/png", 1, 1)
    assert (r["out_w"], r["out_h"]) == (1, 1)
    assert r["resized_sha"] == hashlib.sha256(bytes([10]) + b"|1x1").hexdigest()


def test_real_decode_unsupported_mime():
    with pytest.raises(NotImplementedError, match="video/mp4"):
        real_decode(b"x", "video/mp4")
    with pytest.raises(NotImplementedError, match="real resize"):
        real_resize(b"x", "audio/wav", 16, 16)


def test_average_hash_matches_frozen_fixtures():
    from typebus_spark.operators.codecs import average_hash

    for fx in MEDIA_FIXTURES:
        if "phash" not in fx:
            continue
        blob = base64.b64decode(fx["b64"])
        assert average_hash(blob, fx["mime"]) == fx["phash"], fx["name"]


def test_average_hash_invariant_under_integer_nn_upscale():
    """aHash is EXACTLY invariant under nearest-neighbor integer
    upscaling: floor-index algebra gives ((a*f) div 8) div f = a div 8,
    so the 8x8 sample grid lands on the same source pixels."""
    from typebus_spark.operators.codecs import average_hash, decode_png

    for fx in MEDIA_FIXTURES:
        if "phash" not in fx:
            continue
        blob = base64.b64decode(fx["b64"])
        d = decode_png(blob)
        w, h, ch, px = d["width"], d["height"], d["channels"], d["pixels"]
        for f in (2, 3):
            up = bytearray(w * f * h * f * ch)
            for y in range(h * f):
                for x in range(w * f):
                    s = ((y // f) * w + (x // f)) * ch
                    t = (y * w * f + x) * ch
                    up[t : t + ch] = px[s : s + ch]
            ct = {1: 0, 3: 2, 4: 6}[ch]
            up_blob = encode_png(bytes(up), w * f, h * f, ct)
            assert average_hash(up_blob, "image/png") == fx["phash"], (
                fx["name"], f,
            )


def test_average_hash_distinguishes_fixtures():
    """The three fixture textures produce three distinct hashes (the
    dedup key actually separates different images)."""
    from typebus_spark.operators.codecs import average_hash

    hs = {
        average_hash(base64.b64decode(fx["b64"]), fx["mime"])
        for fx in MEDIA_FIXTURES
        if "phash" in fx
    }
    assert len(hs) == 3


def test_shard_shuffle_deterministic_balanced(spark):
    """shard_shuffle: positions are 0..n-1 contiguous per shard, the
    assignment is a pure function of (seed, id) across reruns and
    partitionings, and shards are roughly balanced."""
    import pyspark.sql.functions as F

    from typebus_spark.operators.sampling import shard_shuffle

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = shard_shuffle(df, "doc_id", 8, seed=11)
    rows = a.collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))  # dense 0..n-1
        assert len(poss) > 2000 / 8 * 0.7  # rough balance
    b = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shard_shuffle(df.repartition(13), "doc_id", 8, 11).collect()
    }
    assert b == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_decoders_never_hang_or_crash_on_garbage(blob):
    """Arbitrary bytes must produce a clean exception (never a hang,
    segfault-style error, or silent wrong answer) — the decode stage
    turns these into per-row decode_error strings."""
    import pytest

    from typebus_spark.operators.codecs import average_hash

    for fn in (
        lambda b: decode_png(b),
        lambda b: decode_wav(b),
        lambda b: real_decode(b, "image/png"),
        lambda b: real_decode(b, "audio/wav"),
        lambda b: real_resize(b, "image/png", 8, 8),
        lambda b: average_hash(b, "image/png"),
    ):
        with pytest.raises(Exception):
            fn(blob)


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=8, max_size=200))
def test_png_decoder_rejects_corrupted_tails(tail):
    """A valid signature followed by garbage must still raise cleanly
    (chunk CRC / structure checks), not return bogus pixels."""
    import pytest

    blob = b"\x89PNG\r\n\x1a\n" + tail
    with pytest.raises(Exception):
        decode_png(blob)


def test_media_provider_seam_swaps_all_three_paths(spark):
    """The codec-provider registry (r10 verdict item 7) is a real code
    seam: registering + activating a stub provider reroutes
    decode_media/resize_media/perceptual_hash_media's "real" paths
    with NO operator change, and deactivating restores the pure-Python
    default (provider resolution happens at plan-build time)."""
    import base64

    from typebus_spark.operators._media_fixtures import MEDIA_FIXTURES
    from typebus_spark.operators.media_provider import (
        MediaCodecProvider,
        active_provider,
        provider,
        register_provider,
    )
    from typebus_spark.operators.multimodal import (
        decode_media,
        perceptual_hash_media,
        resize_media,
    )

    fx = next(f for f in MEDIA_FIXTURES if f["mime"] == "image/png")
    df = spark.createDataFrame(
        [(1, (bytearray(base64.b64decode(fx["b64"])), fx["mime"], {}))],
        "id long, media struct<blob binary, mime string, "
        "meta map<string,string>>",
    )

    # closures (not module-level defs): cloudpickle ships them by VALUE
    # into the executor workers, the way a real provider package would
    # be importable there
    register_provider(
        MediaCodecProvider(
            "stub",
            lambda blob, mime: {
                "width": 7, "height": 7, "n_frames": 1, "features": [1.0]
            },
            lambda blob, mime, max_w, max_h: {
                "width": 7, "height": 7, "out_w": 1, "out_h": 1,
                "resized_sha": "stub",
            },
            lambda blob, mime: "0" * 16,
        )
    )
    with provider("stub"):
        d = decode_media(df, "id", decoder="real").first()
        r = resize_media(df, "id", decoder="real").first()
        p = perceptual_hash_media(df, "id").first()
    assert (d["width"], d["height"]) == (7, 7) and d["decode_error"] is None
    assert r["resized_sha"] == "stub" and r["resize_error"] is None
    assert p["phash"] == "0" * 16 and p["phash_error"] is None

    # default restored: the pure-Python provider decodes the real PNG
    assert active_provider().name == "python"
    d2 = decode_media(df, "id", decoder="real").first()
    assert d2["decode_error"] is None and d2["width"] not in (None, 7)
    p2 = perceptual_hash_media(df, "id").first()
    assert p2["phash"] != "0" * 16 and len(p2["phash"]) == 16

    # unknown provider names fail loudly
    import pytest as _pytest

    from typebus_spark.operators.media_provider import activate_provider

    with _pytest.raises(KeyError):
        activate_provider("no-such-provider")
