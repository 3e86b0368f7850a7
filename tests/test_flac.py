"""FLAC codec tests: exact round-trips, spec-path coverage, IO integration.

The reference ingests ASVspoof FLAC trees (reference/ASV_dl_func.py:63-75,
:195, :406). No FLAC tool exists in this image, so the in-repo encoder
produces the fixtures and the decoder must invert it sample-exactly (the
residual recurrences are integer-exact by construction).
"""

from __future__ import annotations

import numpy as np
import pytest

from audioanalysisdetector_tpu.io import audio_info, load_audio
from audioanalysisdetector_tpu.io.flac import (
    FlacError,
    _BitWriter,
    _crc8,
    _crc16,
    _SYNC,
    decode_flac,
    flac_stream_info,
    read_flac,
    write_flac,
)


def _tone_int(n, sr=16000, bps=16, f0=440.0, seed=0, channels=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    amp = 0.5 * (1 << (bps - 1))
    out = np.stack(
        [
            amp * np.sin(2 * np.pi * (f0 * (c + 1)) * t)
            + rng.normal(0, amp * 0.01, n)
            for c in range(channels)
        ],
        axis=1,
    )
    x = np.round(out).astype(np.int64)
    return np.clip(x, -(1 << (bps - 1)), (1 << (bps - 1)) - 1)


@pytest.mark.parametrize("mode", ["auto", "verbatim", "fixed", "lpc"])
def test_roundtrip_subframe_modes(tmp_path, mode):
    x = _tone_int(10000)  # 2 full blocks + a short last frame at bs=4096
    p = str(tmp_path / f"{mode}.flac")
    write_flac(p, x, 16000, subframe_mode=mode)
    got, info = decode_flac(p)
    assert info.sample_rate == 16000
    assert info.channels == 1
    assert info.bits_per_sample == 16
    assert info.total_samples == 10000
    np.testing.assert_array_equal(got[:, 0], x[:, 0])


@pytest.mark.parametrize(
    "stereo_mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_stereo_modes(tmp_path, stereo_mode):
    x = _tone_int(5000, channels=2, seed=1)
    p = str(tmp_path / f"{stereo_mode}.flac")
    write_flac(p, x, 16000, stereo_mode=stereo_mode)
    got, info = decode_flac(p)
    assert info.channels == 2
    np.testing.assert_array_equal(got, x)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_roundtrip_bit_depths(tmp_path, bps):
    x = _tone_int(3000, bps=bps, seed=2)
    p = str(tmp_path / f"{bps}.flac")
    write_flac(p, x, 16000, bits_per_sample=bps)
    got, info = decode_flac(p)
    assert info.bits_per_sample == bps
    np.testing.assert_array_equal(got[:, 0], x[:, 0])


def test_roundtrip_constant_and_silence(tmp_path):
    p = str(tmp_path / "c.flac")
    write_flac(p, np.zeros(6000, dtype=np.int64), 16000)
    got, _ = decode_flac(p)
    assert got.shape == (6000, 1)
    assert np.all(got == 0)
    write_flac(p, np.full(300, -123, dtype=np.int64), 8000, block_size=256)
    got, info = decode_flac(p)
    assert info.sample_rate == 8000
    assert np.all(got == -123)


def test_roundtrip_rice_partitions(tmp_path):
    x = _tone_int(8192, seed=3)
    p = str(tmp_path / "part.flac")
    write_flac(p, x, 16000, rice_partition_order=3)
    got, _ = decode_flac(p)
    np.testing.assert_array_equal(got[:, 0], x[:, 0])


def test_roundtrip_rice_escape(tmp_path):
    # a single huge spike forces the raw-bits escape partition
    x = np.zeros(4096, dtype=np.int64)
    x[100] = 30000
    x[101] = -30000
    p = str(tmp_path / "esc.flac")
    write_flac(p, x, 16000, subframe_mode="fixed")
    got, _ = decode_flac(p)
    np.testing.assert_array_equal(got[:, 0], x)


def test_roundtrip_multichannel(tmp_path):
    x = _tone_int(2000, channels=3, seed=4)
    p = str(tmp_path / "mc.flac")
    write_flac(p, x, 44100)
    got, info = decode_flac(p)
    assert info.channels == 3
    assert info.sample_rate == 44100
    np.testing.assert_array_equal(got, x)


def test_roundtrip_nonstandard_sample_rate(tmp_path):
    x = _tone_int(1000, seed=5)
    p = str(tmp_path / "sr.flac")
    write_flac(p, x, 11025)  # not in the 4-bit code table -> 16-bit Hz field
    _, info = decode_flac(p)
    assert info.sample_rate == 11025


def test_stream_info_probe_without_decode(tmp_path):
    x = _tone_int(7000, channels=2, seed=6)
    p = str(tmp_path / "probe.flac")
    write_flac(p, x, 16000)
    si = flac_stream_info(p)
    assert (si.total_samples, si.sample_rate, si.channels, si.bits_per_sample) == (
        7000, 16000, 2, 16,
    )


def test_wasted_bits_decode(tmp_path):
    """Hand-crafted frame with 2 wasted bits (encoder never emits them)."""
    n, val, wasted = 64, -900, 2
    out = bytearray(b"fLaC")
    si = _BitWriter()
    for v, b in [(n, 16), (n, 16), (0, 24), (0, 24), (16000, 20), (0, 3), (15, 5), (n, 36)]:
        si.write(v, b)
    streaminfo = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    bw = _BitWriter()
    bw.write(_SYNC, 14)
    bw.write(0, 2)
    bw.write(7, 4)   # blocksize from 16-bit field
    bw.write(5, 4)   # 16 kHz
    bw.write(0, 4)   # mono
    bw.write(4, 3)   # 16-bit
    bw.write(0, 1)
    bw.write(0, 8)   # frame 0 (utf8)
    bw.write(n - 1, 16)
    header = bw.bytes()
    header += bytes([_crc8(header)])
    body = _BitWriter()
    body.write(0, 1)
    body.write(0, 6)           # CONSTANT
    body.write(1, 1)           # wasted-bits flag
    body.write(1, wasted)      # unary(wasted-1): "01"
    body.write(val >> wasted, 16 - wasted)
    body.align()
    frame = header + body.bytes()
    frame += _crc16(frame).to_bytes(2, "big")
    out += frame
    p = str(tmp_path / "wasted.flac")
    with open(p, "wb") as f:
        f.write(bytes(out))
    got, _ = decode_flac(p)
    assert got.shape == (n, 1)
    assert np.all(got == (val >> wasted) << wasted)


def test_corruption_detected(tmp_path):
    x = _tone_int(4096, seed=7)
    p = str(tmp_path / "ok.flac")
    write_flac(p, x, 16000)
    raw = bytearray(open(p, "rb").read())
    raw[len(raw) // 2] ^= 0xFF  # flip a payload byte -> CRC16 or desync
    bad = str(tmp_path / "bad.flac")
    with open(bad, "wb") as f:
        f.write(bytes(raw))
    with pytest.raises(FlacError):
        decode_flac(bad)


def test_not_flac_raises(tmp_path):
    p = str(tmp_path / "x.flac")
    with open(p, "wb") as f:
        f.write(b"RIFFxxxxWAVE" + b"\x00" * 64)
    with pytest.raises(FlacError):
        decode_flac(p)
    with pytest.raises(FlacError):
        flac_stream_info(p)


def test_load_audio_and_info_integration(tmp_path):
    """load_audio / audio_info route .flac like the reference's librosa/soundfile."""
    sr = 16000
    x = _tone_int(2 * sr, sr=sr, seed=8)
    p = str(tmp_path / "utt.flac")
    write_flac(p, x, sr)
    info = audio_info(p)
    assert (info.frames, info.samplerate, info.channels) == (2 * sr, sr, 1)
    assert info.duration == pytest.approx(2.0)
    y, got_sr = load_audio(p)
    assert got_sr == sr
    assert y.dtype == np.float32
    np.testing.assert_allclose(y, x[:, 0] / 32768.0, atol=1e-7)
    # librosa.load contract: resample when sr differs, offset/duration slicing
    y8, got8 = load_audio(p, sr=8000, offset=0.5, duration=1.0)
    assert got8 == 8000
    assert len(y8) == 8000


def test_read_flac_stereo_downmix(tmp_path):
    x = _tone_int(1000, channels=2, seed=9)
    p = str(tmp_path / "st.flac")
    write_flac(p, x, 16000, stereo_mode="mid_side")
    y, sr = read_flac(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x.mean(axis=1) / 32768.0, atol=1e-6)
