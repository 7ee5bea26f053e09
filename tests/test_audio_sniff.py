"""Lib-free audio header parsing (ops/multimodal.py): FLAC STREAMINFO,
MP3 frame headers (post-ID3v2), Ogg Vorbis/Opus id headers + last-page
granule duration. Fixtures are hand-built from the container specs —
pure byte-level tests, no Spark session needed."""

import struct

from whylogs_spark.ops.multimodal import (_sniff_audio, _sniff_flac,
                                          _sniff_mp3, _sniff_ogg)


def _flac_bytes(rate=44100, channels=2, bits=16, total=441000):
    packed = (rate << 44) | ((channels - 1) << 41) \
        | ((bits - 1) << 36) | total
    streaminfo = (struct.pack(">HH", 1024, 4096)
                  + b"\x00\x00\x10" + b"\x00\xff\xff"
                  + struct.pack(">Q", packed) + b"\x00" * 16)
    assert len(streaminfo) == 34
    return (b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
            + streaminfo)


def test_flac_streaminfo():
    ch, rate, bits, dur = _sniff_flac(_flac_bytes())
    assert (ch, rate, bits) == (2, 44100, 16)
    assert dur == 10.0
    # 24-bit mono at 96k
    ch, rate, bits, dur = _sniff_flac(
        _flac_bytes(rate=96000, channels=1, bits=24, total=96000 * 3))
    assert (ch, rate, bits, dur) == (1, 96000, 24, 3.0)
    assert _sniff_flac(b"fLaC" + b"\x00" * 10) is None
    assert _sniff_flac(b"not flac") is None


_KBPS_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
              256, 320)
_RATES_V1 = (44100, 48000, 32000)


def _mp3_bytes(id3=True, kbps_idx=9, rate_idx=0, mono=False,
               n_frames=100):
    # MPEG1 Layer III header: FF FB (version 11, layer 01, no CRC);
    # spec frame length = 144000 * kbps / rate (no padding bit set)
    b1 = 0xFB
    b2 = (kbps_idx << 4) | (rate_idx << 2)
    b3 = 0xC0 if mono else 0x00
    frame_len = 144000 * _KBPS_V1L3[kbps_idx] // _RATES_V1[rate_idx]
    frame = bytes([0xFF, b1, b2, b3]) + b"\x00" * (frame_len - 4)
    body = frame * n_frames
    if id3:
        tag_body = b"\x00" * 200
        hdr = b"ID3\x03\x00\x00" + bytes(
            [(len(tag_body) >> 21) & 0x7F, (len(tag_body) >> 14) & 0x7F,
             (len(tag_body) >> 7) & 0x7F, len(tag_body) & 0x7F])
        return hdr + tag_body + body
    return body


def test_mp3_frame_header():
    content = _mp3_bytes()  # 128 kbps (idx 9), 44100, stereo
    ch, rate, bits, dur = _sniff_mp3(content)
    assert (ch, rate, bits) == (2, 44100, None)
    audio_bytes = (144000 * 128 // 44100) * 100
    assert abs(dur - audio_bytes * 8 / 128000) < 1e-9
    ch, rate, _, _ = _sniff_mp3(
        _mp3_bytes(id3=False, rate_idx=1, mono=True))
    assert (ch, rate) == (1, 48000)
    assert _sniff_mp3(b"\x00" * 100) is None


def test_mp3_rejects_random_binary():
    # a lone plausible header is common in random bytes; the
    # second-frame check must keep the false-positive rate near zero
    import numpy as np
    rng = np.random.default_rng(0)
    hits = sum(
        _sniff_mp3(rng.integers(0, 256, 8192, dtype=np.uint8)
                   .tobytes()) is not None
        for _ in range(200))
    assert hits <= 2


def test_ogg_truncated_and_payload_sync_safe():
    # truncated OpusHead: None, not struct.error
    trunc = (b"OggS" + b"\x00" * 22 + bytes([1]) + bytes([13])
             + b"OpusHead" + b"\x00" * 5)
    assert _sniff_ogg(trunc) is None
    # 'OggS' inside payload bytes must not be read as a page header
    idh = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
           + struct.pack("<I", 44100) + b"\x00" * 16)
    poison = b"xxOggS\xff\xff" + struct.pack("<q", 10 ** 15) + b"z" * 8
    content = (_ogg_page(idh) + _ogg_page(poison, granule=88200,
                                          first=False))
    ch, rate, bits, dur = _sniff_ogg(content)
    assert dur == 2.0  # the real page's granule, not the poison


def _ogg_page(payload, granule=0, first=True):
    nseg = (len(payload) + 254) // 255 or 1
    segs = []
    remaining = len(payload)
    for _ in range(nseg):
        segs.append(min(remaining, 255))
        remaining -= segs[-1]
    return (b"OggS" + b"\x00" + (b"\x02" if first else b"\x04")
            + struct.pack("<q", granule) + b"\x00" * 4 + b"\x00" * 4
            + b"\x00" * 4 + bytes([nseg]) + bytes(segs) + payload)


def test_ogg_vorbis():
    idh = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
           + struct.pack("<I", 44100) + b"\x00" * 16)
    content = _ogg_page(idh) + _ogg_page(b"\x00" * 10, granule=88200,
                                         first=False)
    ch, rate, bits, dur = _sniff_ogg(content)
    assert (ch, rate, bits) == (2, 44100, None)
    assert dur == 2.0


def test_ogg_opus():
    idh = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
           + struct.pack("<I", 16000) + b"\x00" * 3)
    content = _ogg_page(idh) + _ogg_page(b"\x00" * 10, granule=96000,
                                         first=False)
    ch, rate, bits, dur = _sniff_ogg(content)
    assert (ch, rate) == (1, 16000)
    assert dur == 2.0  # granules are 48 kHz regardless of input rate
    assert _sniff_ogg(b"OggS" + b"\x00" * 10) is None


def test_sniff_audio_dispatch():
    assert _sniff_audio(_flac_bytes())[0] == "flac"
    assert _sniff_audio(_mp3_bytes())[0] == "mp3"
    assert _sniff_audio(b"garbage") is None
