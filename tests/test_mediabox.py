"""Container-probe tests: synthetic ISO BMFF / EBML files built
byte-by-byte (no codec libs involved — the decode boundary is
mediabox.extract_frames, asserted to raise)."""

from __future__ import annotations

import struct

import pytest

from bd_spark.operators import mediabox as M


# ---------------------------------------------------------- builders
def box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def full(version: int, payload: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + payload


def make_mp4(timescale=1000, duration=90_000, v1=False) -> bytes:
    if v1:
        mvhd = box(b"mvhd", full(1, b"\x00" * 16
                                 + struct.pack(">IQ", timescale, duration)
                                 + b"\x00" * 80))
    else:
        mvhd = box(b"mvhd", full(0, b"\x00" * 8
                                 + struct.pack(">II", timescale, duration)
                                 + b"\x00" * 80))
    tkhd = box(b"tkhd", full(0, b"\x00" * 72
                             + struct.pack(">II", 640 << 16, 360 << 16)))
    hdlr_v = box(b"hdlr", full(0, b"\x00" * 4 + b"vide" + b"\x00" * 12))
    stsd_v = box(b"stsd", full(0, struct.pack(">I", 1)
                               + box(b"avc1", b"\x00" * 70)))
    stsz_v = box(b"stsz", full(0, struct.pack(">II", 0, 240)))
    stbl_v = box(b"stbl", stsd_v + stsz_v)
    trak_v = box(b"trak", tkhd + box(b"mdia", hdlr_v
                                     + box(b"minf", stbl_v)))
    hdlr_a = box(b"hdlr", full(0, b"\x00" * 4 + b"soun" + b"\x00" * 12))
    stsd_a = box(b"stsd", full(0, struct.pack(">I", 1)
                               + box(b"mp4a", b"\x00" * 28)))
    trak_a = box(b"trak", box(b"mdia", hdlr_a
                              + box(b"minf", box(b"stbl", stsd_a))))
    moov = box(b"moov", mvhd + trak_v + trak_a)
    ftyp = box(b"ftyp", b"isom" + b"\x00" * 4 + b"isomavc1")
    return ftyp + moov


def ebml(eid: int, payload: bytes) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    assert len(payload) < 0x80
    return idb + bytes([0x80 | len(payload)]) + payload


def make_webm(duration_ticks=2500.0, scale=1_000_000) -> bytes:
    header = ebml(0x1A45DFA3, b"")
    info = ebml(0x1549A966,
                ebml(0x2AD7B1, scale.to_bytes(4, "big"))
                + ebml(0x4489, struct.pack(">d", duration_ticks)))
    video = ebml(0xE0, ebml(0xB0, (1280).to_bytes(2, "big"))
                 + ebml(0xBA, (720).to_bytes(2, "big")))
    t_v = ebml(0xAE, ebml(0x83, b"\x01") + ebml(0x86, b"V_VP9") + video)
    t_a = ebml(0xAE, ebml(0x83, b"\x02") + ebml(0x86, b"A_OPUS"))
    tracks = ebml(0x1654AE6B, t_v + t_a)
    return header + ebml(0x18538067, info + tracks)


# ------------------------------------------------------------- pure

def test_mp4_probe_v0():
    m = M.probe_mp4(make_mp4())
    assert m["brand"] == "isom"
    assert m["duration_ms"] == 90_000  # 90000 ticks @ 1000/s
    assert len(m["tracks"]) == 2
    v = next(t for t in m["tracks"] if t["handler"] == "vide")
    assert (v["codec"], v["width"], v["height"], v["n_samples"]) == (
        "avc1", 640, 360, 240)
    a = next(t for t in m["tracks"] if t["handler"] == "soun")
    assert a["codec"] == "mp4a"


def test_mp4_probe_v1_64bit_duration():
    m = M.probe_mp4(make_mp4(timescale=600, duration=1_200, v1=True))
    assert m["duration_ms"] == 2_000


def test_mp4_largesize_box():
    inner = make_mp4()
    moov_at = inner.find(b"moov") - 4
    # re-wrap moov as a largesize box (size==1 + 64-bit size)
    size = struct.unpack_from(">I", inner, moov_at)[0]
    body = inner[moov_at + 8: moov_at + size]
    large = struct.pack(">I", 1) + b"moov" + struct.pack(
        ">Q", len(body) + 16) + body
    m = M.probe_mp4(inner[:moov_at] + large)
    assert m["duration_ms"] == 90_000 and len(m["tracks"]) == 2


def test_mp4_truncated_raises():
    with pytest.raises(M.MediaParseError):
        M.probe_mp4(make_mp4()[:-5])
    with pytest.raises(M.MediaParseError):
        M.probe_mp4(box(b"ftyp", b"isom"))  # no moov


def test_webm_probe():
    m = M.probe_webm(make_webm())
    assert m["duration_ms"] == 2_500
    assert [t["handler"] for t in m["tracks"]] == ["vide", "soun"]
    v = m["tracks"][0]
    assert (v["codec"], v["width"], v["height"]) == ("V_VP9", 1280, 720)
    assert m["tracks"][1]["codec"] == "A_OPUS"


def test_webm_timestamp_scale():
    # 0.5 ms ticks: 2500 ticks -> 1250 ms
    m = M.probe_webm(make_webm(duration_ticks=2500.0, scale=500_000))
    assert m["duration_ms"] == 1_250


def test_dispatch_and_unknown_magic():
    assert M.probe_media(make_mp4())["fmt"] == "mp4"
    assert M.probe_media(make_webm())["fmt"] == "webm"
    with pytest.raises(M.MediaParseError):
        M.probe_media(b"RIFFxxxxWAVE" + b"\x00" * 16)


# ------------------------------------------------------------ spark

def test_probe_assets_batch(spark):
    rows = [
        (1, bytearray(make_mp4())),
        (2, bytearray(make_webm())),
        (3, bytearray(b"garbage-not-a-container" * 3)),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = {r.asset_id: r for r in M.probe_assets(df).collect()}
    assert out[1].fmt == "mp4" and out[1].video_codec == "avc1"
    assert out[1].duration_ms == 90_000 and out[1].n_tracks == 2
    assert out[2].fmt == "webm" and out[2].audio_codec == "A_OPUS"
    assert out[2].width == 1280 and out[2].err is None
    assert out[3].fmt is None and out[3].err is not None


def test_frame_extraction_is_documented_boundary(spark):
    """Without pyav, extract_frames raises the documented
    NotImplementedError at plan-build time. Skips where pyav IS
    installed (the real-path test below runs instead)."""
    try:
        import av  # noqa: F401

        pytest.skip("pyav available; boundary contract not exercised")
    except ImportError:
        pass
    df = spark.createDataFrame(
        [(1, bytearray(make_mp4()))], "asset_id long, payload binary")
    with pytest.raises(NotImplementedError, match="pyav/ffmpeg"):
        M.extract_frames(df)


def test_frame_extraction_real_with_pyav(spark):
    """Real decode path (r6 VERDICT next #7): runs wherever pyav is
    importable — synthesize a tiny mpeg4-in-mp4 video with av itself,
    extract every 3rd frame, and decode the emitted PNGs with the
    repo's own stdlib decoder. Skips in codec-less containers (the
    boundary test above covers those)."""
    av = pytest.importorskip("av")
    import io

    import numpy as np

    from bd_spark.operators import codecs

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as c:
        vs = c.add_stream("mpeg4", rate=10)
        vs.width, vs.height, vs.pix_fmt = 32, 16, "yuv420p"
        for i in range(10):
            arr = np.full((16, 32, 3), i * 20, dtype=np.uint8)
            for pkt in vs.encode(
                av.VideoFrame.from_ndarray(arr, format="rgb24")
            ):
                c.mux(pkt)
        for pkt in vs.encode():
            c.mux(pkt)
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "asset_id long, payload binary"
    )
    rows = {r.frame_idx: r for r in M.extract_frames(df, every_n=3).collect()}
    assert set(rows) == {0, 3, 6, 9}
    for r in rows.values():
        assert r.err is None and (r.width, r.height) == (32, 16)
        arr = codecs.decode_image(bytes(r.png))
        assert arr.shape == (16, 32, 3)
